"""Capture .explain("formatted") output for registry queries.

Usage: python tools/capture_plans.py <out_suffix> <query> [query ...]

Writes plans/$SPARK_GRAFT_PLANS_DIR (default r12)/<query>_<out_suffix>.txt
for each named query (the optimization evidence files: _before /
_after). Building a
query's DataFrame may itself run eager jobs (index builds, iterative
loops) — that cost is paid here, not avoided, so the captured plan is
exactly the one the bench's noop sink executes.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from flink_helloworld_spark.session import build_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plans",
    os.environ.get("SPARK_GRAFT_PLANS_DIR", "r12"),
)


def explain_formatted(df) -> str:
    jqe = df._jdf.queryExecution()
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return jqe.explainString(mode)


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    suffix = sys.argv[1]
    names = sys.argv[2:]
    os.makedirs(OUT_DIR, exist_ok=True)
    spark = build_session(app_name="fhs-capture-plans")
    qs = entrymod.queries()
    from flink_helloworld_spark.operators.dedup import release_shared_caches

    rc = 0
    for name in names:
        if name not in qs:
            print(f"[skip] unknown query {name}")
            rc = 1
            continue
        try:
            df = qs[name](spark, SF_DIR)
            text = explain_formatted(df)
        except Exception as exc:  # noqa: BLE001
            print(f"[FAIL] {name}: {exc}")
            rc = 1
            continue
        finally:
            release_shared_caches()
        path = os.path.join(OUT_DIR, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(text)
        print(f"[ok] {name} -> {path}")
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
