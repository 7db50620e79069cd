"""Deterministic sampling & splitting (training-data pipeline surface).

A 100 TB corpus pipeline needs samples and train/holdout splits that are
(a) reproducible across runs and engines, (b) computable without a
shuffle, and (c) stratifiable. Spark's ``df.sample`` is none of these
(seeded per-partition RNG → changes under repartitioning). These
operators hash a stable id column with md5 instead: a pure per-row
filter — no shuffle, no state, pushes down past column pruning — and the
DuckDB oracles replay the exact same arithmetic.

Hash contract (memory-portable across this repo): bucket =
md5(prefix || id) first 15 hex chars as a bigint, mod ``buckets``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BUCKETS = 10_000


def _hash_bucket(col: Column, salt: str) -> Column:
    h = F.conv(F.substring(F.md5(F.concat(F.lit(salt), col.cast("string"))), 1, 15), 16, 10)
    return F.pmod(h.cast("long"), F.lit(BUCKETS))


def deterministic_sample(
    df: DataFrame, id_col: str, fraction: float, salt: str = "sample"
) -> DataFrame:
    """Keep ~``fraction`` of rows, chosen by id hash — same rows every
    run, every engine, every partitioning."""
    return df.where(_hash_bucket(F.col(id_col), salt) < int(fraction * BUCKETS))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    id_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    salt: str = "strat",
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. language rebalancing:
    keep 10% of English, 100% of low-resource languages). ``fractions``
    maps stratum value → keep fraction; unlisted strata use
    ``default_fraction``."""
    thresh = F.lit(int(default_fraction * BUCKETS))
    for value, frac in fractions.items():
        thresh = F.when(
            F.col(strata_col) == value, F.lit(int(frac * BUCKETS))
        ).otherwise(thresh)
    return df.where(_hash_bucket(F.col(id_col), salt) < thresh)


def train_holdout_split(
    df: DataFrame, id_col: str, holdout_fraction: float = 0.01, salt: str = "split"
) -> DataFrame:
    """Tag every row 'train' or 'holdout' by id hash: disjoint,
    exhaustive, and stable as the corpus grows (a doc never migrates
    between splits when other docs are added — the property random
    splits lack)."""
    cut = int(holdout_fraction * BUCKETS)
    return df.withColumn(
        "split",
        F.when(_hash_bucket(F.col(id_col), salt) < cut, F.lit("holdout")).otherwise(
            F.lit("train")
        ),
    )
