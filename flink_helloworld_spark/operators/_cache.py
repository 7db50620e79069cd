"""Session-scoped registry of DataFrames persisted for intra-plan reuse.

Some operators (MinHash shingle table, IVF cell assignment) feed one
computed intermediate into several plan branches; persisting it turns an
O(branches) recompute into one. Whoever runs many queries in one session
(bench loop, correctness gate) calls ``release_shared_caches()`` between
queries so the executors don't accumulate cached partitions."""

from __future__ import annotations

from pyspark.sql import DataFrame

_SHARED_CACHES: list[DataFrame] = []


def share(df: DataFrame) -> DataFrame:
    """Persist ``df`` and register it for later release."""
    df = df.persist()
    _SHARED_CACHES.append(df)
    return df


def release_shared_caches() -> None:
    """Unpersist every DataFrame cached for intra-plan reuse. Call after
    the action that consumed the query (safe to call any time: Spark
    recomputes unpersisted data if a plan is re-run)."""
    while _SHARED_CACHES:
        _SHARED_CACHES.pop().unpersist()
