"""Skew mitigation (SURVEY §2.9 / 100 TB discipline).

Hot grouping keys (a handful of event types over billions of rows)
overload single reducers. Two standard fixes, both here:

- AQE skew-join splitting — enabled session-wide (session.py).
- **Salting** for aggregations: split each hot key into `buckets`
  sub-keys, partially aggregate per (key, salt), then combine partials.
  Both levels are exact decimal sums, so the result is bit-identical to
  the unsalted aggregation (what the DuckDB oracle computes) while the
  first shuffle spreads each hot key over `buckets` reducers.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from flink_helloworld_spark.functions import dec


def salted_sum(
    df: DataFrame,
    key: str,
    value: str,
    salt_col: str,
    buckets: int = 16,
    alias: str = "total",
) -> DataFrame:
    """Two-level salted sum: groupBy(key, salt) partials → groupBy(key)
    final. ``salt_col`` is any well-distributed existing column (a row
    id); the salt is its hash mod `buckets` — deterministic, no RNG."""
    salted = df.withColumn("_salt", F.pmod(F.xxhash64(F.col(salt_col)), F.lit(buckets)))
    partial = salted.groupBy(key, "_salt").agg(
        F.sum(dec(value)).alias("_partial_sum"),
        F.count(F.lit(1)).alias("_partial_cnt"),
    )
    return partial.groupBy(key).agg(
        F.sum("_partial_sum").cast("double").alias(alias),
        F.sum("_partial_cnt").alias("cnt"),
    )
