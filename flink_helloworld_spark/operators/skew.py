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


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    salt_col: str,
    buckets: int = 8,
) -> DataFrame:
    """Salted equi-join for hot join keys: the fact side gets a
    deterministic salt from an existing row-id column; the dim side is
    replicated ``buckets`` times so every (key, salt) pair still finds
    its match. Results are row-identical to the plain join (the oracle)
    while each hot key's fact rows spread over ``buckets`` reducers.

    This is the manual form of what AQE skew-join does adaptively — the
    explicit version matters when the dim is too big to broadcast AND a
    key is hot enough that one reducer would spill (the 100 TB
    worst case). Replication cost: dim × buckets rows through the
    shuffle, the standard trade.
    """
    salted_fact = fact.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(salt_col)), F.lit(buckets))
    )
    replicated_dim = dim.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i).cast("long") for i in range(buckets)]))
    )
    return salted_fact.join(replicated_dim, [key, "_salt"]).drop("_salt")
