"""Build an N× scale replica of a testdata dir (default 10× of sf0.1).

The SCALE_NOTES.md methodology, now committed: facts are copied N times
with key shifts chosen so join fan-in and dedup semantics stay realistic
at scale —

- ``documents`` / ``embeddings``: ids shift, payloads DON'T — every doc
  and vector gains N exact copies (a worst-ish-case dedup/ANN load:
  candidate clusters grow N-fold).
- ``orders`` / ``lineitem``: order keys shift together (FK intact);
  ``o_custkey`` / ``l_partkey`` / ``l_suppkey`` stay — each customer
  keeps N× history against the same dimension tables.
- ``events``: event ids shift, ``user_id`` stays — N× activity per user.
- dimensions (``region nation customer supplier part``): unchanged —
  dimensions are scale-free at 100 TB too.

Usage: python tools/build_replica.py [src_dir] [dst_dir] [copies]
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SHIFTED = {
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "orders": ["o_orderkey"],
    "lineitem": ["l_orderkey"],
    "events": ["event_id"],
}
UNCHANGED = ["region", "nation", "customer", "supplier", "part"]


def build(src: str, dst: str, copies: int = 10) -> None:
    os.makedirs(dst, exist_ok=True)
    for name in UNCHANGED:
        t = pq.read_table(f"{src}/{name}.parquet")
        pq.write_table(t, f"{dst}/{name}.parquet")
        print(f"{name}: {t.num_rows} rows (unchanged)")
    # one shared shift stride so order keys in lineitem and orders agree
    stride = 0
    for name, keys in SHIFTED.items():
        t = pq.read_table(f"{src}/{name}.parquet")
        for key in keys:
            stride = max(stride, pc.max(t[key]).as_py() + 1)
    for name, keys in SHIFTED.items():
        t = pq.read_table(f"{src}/{name}.parquet")
        parts = []
        for i in range(copies):
            c = t
            for key in keys:
                idx = c.schema.get_field_index(key)
                shifted = pc.add(c[key], i * stride)
                c = c.set_column(idx, c.schema.field(idx), shifted)
            parts.append(c)
        out = pa.concat_tables(parts)
        pq.write_table(out, f"{dst}/{name}.parquet")
        print(f"{name}: {t.num_rows} -> {out.num_rows} rows")


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf0.1-10x"
    copies = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    build(src, dst, copies)
