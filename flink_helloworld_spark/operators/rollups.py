"""Hypertable-style continuous rollups and a portable distinct sketch.

- ``hypertable_rollup``: the TimescaleDB continuous-aggregate shape —
  one pass producing time-bucketed aggregates at several granularities
  (hour/day/...), each row tagged with its granularity. At scale this is
  the materialized layer a dashboard reads instead of raw events; here
  it is one declarative union whose branches share the scan.

- ``kmv_distinct``: a K-Minimum-Values distinct-count sketch on the
  engine's portable md5 hash. Unlike HLL (engine-private layouts), KMV
  is exactly reproducible in any engine: keep the k smallest 60-bit
  hashes per group; the estimator is (k-1) / (kth_min / 2^60). Mergeable
  (union the value sets, keep k smallest), bounded memory O(k) per key —
  a real sketch, oracle-checkable bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from flink_helloworld_spark.functions import dsum

HASH_SPACE = float(1 << 60)  # 15 hex chars of md5


def hypertable_rollup(
    df: DataFrame,
    time_col: str,
    keys: list[str],
    value: str,
    granularities: tuple[str, ...] = ("1 hour", "1 day"),
) -> DataFrame:
    """Multi-granularity time-bucket rollup: one output row per
    (granularity, bucket, keys) with count + exact sum."""
    parts = []
    for g in granularities:
        parts.append(
            df.groupBy(F.window(time_col, g).alias("w"), *keys)
            .agg(F.count(F.lit(1)).alias("cnt"), dsum(value, "sum_value"))
            .select(
                F.lit(g).alias("granularity"),
                F.col("w.start").alias("bucket_start"),
                *keys,
                "cnt",
                "sum_value",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _h60(col: Column) -> Column:
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def kmv_distinct(
    df: DataFrame, group: str, value: str, k: int = 64
) -> DataFrame:
    """KMV sketch per group: (group, kth_min hash, n_kept, estimate).

    The k smallest *distinct* hashes per group are the sketch; with
    fewer than k distinct values the estimate is exact (the kept count).
    Estimator: (k-1) / (kth_min / 2^60).
    """
    hashed = df.select(
        F.col(group), _h60(F.col(value).cast("string")).alias("h")
    ).distinct()
    w = Window.partitionBy(group).orderBy("h")
    kept = hashed.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") <= k)
    return (
        kept.groupBy(group)
        .agg(F.max("h").alias("kth_min"), F.count(F.lit(1)).alias("n_kept"))
        .select(
            group,
            "kth_min",
            "n_kept",
            F.when(
                F.col("n_kept") < k, F.col("n_kept").cast("double")
            ).otherwise(
                F.lit(float(k - 1)) / (F.col("kth_min").cast("double") / F.lit(HASH_SPACE))
            ).alias("distinct_estimate"),
        )
    )
