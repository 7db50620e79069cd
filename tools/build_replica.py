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

VOLUME mode (4th arg ``volume``; VERDICT r5 item 6): the density
replica answers "what if duplicates get 10× denser", not "what does
sf1 cost". Volume mode makes every copy's payload DISTINCT while
preserving the per-row statistics the operators key on:

- ``documents`` copy i>0: the word list is shuffled by a (copy,
  doc_id)-seeded permutation — word counts, word lengths, stopword
  hits, quality scores are IDENTICAL to the base row, but 3-gram
  shingle sets become essentially disjoint, so copies are genuinely
  new documents to the dedup families (like real sf1 rows).
- ``embeddings`` copy i>0: dimensions permuted by a copy-seeded
  permutation — norms and the value distribution are preserved, but
  copies are no longer mutual near-neighbors.

Usage: python tools/build_replica.py [src_dir] [dst_dir] [copies] [volume]
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


def _perturb_documents(c: pa.Table, i: int) -> pa.Table:
    """Copy i>0: shuffle each doc's words with a (copy, doc_id) seed —
    statistics-preserving, shingle-destroying (see module docstring)."""
    import random

    idx = c.schema.get_field_index("text")
    ids = c["doc_id"].to_pylist()
    texts = c["text"].to_pylist()
    out = []
    for doc_id, text in zip(ids, texts):
        words = text.split(" ")
        random.Random((i << 32) ^ doc_id).shuffle(words)
        out.append(" ".join(words))
    return c.set_column(idx, c.schema.field(idx), pa.array(out, type=c["text"].type))


def _perturb_embeddings(c: pa.Table, i: int) -> pa.Table:
    """Copy i>0: permute vector dimensions with a copy-seeded
    permutation — norm- and distribution-preserving, neighbor-breaking."""
    import numpy as np

    idx = c.schema.get_field_index("embedding")
    mat = np.array(c["embedding"].to_pylist())
    perm = np.random.RandomState(1000 + i).permutation(mat.shape[1])
    out = pa.array(list(mat[:, perm]), type=c["embedding"].type)
    return c.set_column(idx, c.schema.field(idx), out)


def build(src: str, dst: str, copies: int = 10, volume: bool = False) -> None:
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
            if volume and i > 0 and name == "documents":
                c = _perturb_documents(c, i)
            if volume and i > 0 and name == "embeddings":
                c = _perturb_embeddings(c, i)
            parts.append(c)
        out = pa.concat_tables(parts)
        pq.write_table(out, f"{dst}/{name}.parquet")
        mode = " (volume-perturbed)" if volume and name in ("documents", "embeddings") else ""
        print(f"{name}: {t.num_rows} -> {out.num_rows} rows{mode}")


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf0.1-10x"
    copies = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    volume = len(sys.argv) > 4 and sys.argv[4] == "volume"
    build(src, dst, copies, volume)
