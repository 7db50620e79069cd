"""Similarity search over embedding columns (north-star surface).

Two paths:
- ``cosine_topk``: brute-force exact top-k — the correctness baseline.
  O(N²) dot products but fully distributed (block self-join, no driver
  collection); fine for verification scales and as the verifier for the
  approximate path.
- ``lsh_cosine_topk``: the 100 TB path — random-hyperplane signs bucket
  vectors so only same-bucket pairs are scored. Hyperplanes are derived
  deterministically from md5, so results are reproducible (and the
  operator needs no fitted model state).

Dot products are computed as left-to-right double sums of
``zip_with`` products (pure built-ins, codegen-friendly) — bit-identical
to the DuckDB oracle's indexed ``list_sum`` formulation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def cosine_topk(
    emb: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors per vector (excluding self), ranked
    by (similarity desc, neighbor id) for deterministic ties."""
    from pyspark.sql import Window

    v = emb.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
    pairs = (
        v.alias("q")
        .join(v.alias("c"), F.col("q.id") != F.col("c.id"))
        .select(
            F.col("q.id").alias("query_id"),
            F.col("c.id").alias("neighbor_id"),
            (
                _dot(F.col("q.vec"), F.col("c.vec"))
                / F.nullif(_norm(F.col("q.vec")) * _norm(F.col("c.vec")), F.lit(0.0))
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )


def hyperplane_bucket(vec: Column, planes: int = 8, dims: int = 64) -> Column:
    """Random-hyperplane LSH bucket id for a vector.

    Plane p's component d is a deterministic ±1 derived from one md5 hex
    char of ('p:d') — a reproducible signed random projection. Bucket id
    = the `planes` sign bits packed into an int. Cosine-similar vectors
    agree on most sign bits, so near neighbors collide.
    """
    bucket = F.lit(0).cast("long")
    for p in range(planes):
        # ±1 pattern for this plane, one literal array per plane
        signs = [
            1 if int(_md5_hexchar(f"{p}:{d}"), 16) % 2 == 0 else -1 for d in range(dims)
        ]
        proj = F.aggregate(
            F.zip_with(
                vec,
                F.array(*[F.lit(float(s)) for s in signs]),
                lambda x, s: x.cast("double") * s,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(proj > 0, F.lit(1 << p)).otherwise(F.lit(0)).cast("long")
    return bucket


def _md5_hexchar(s: str) -> str:
    import hashlib

    return hashlib.md5(s.encode()).hexdigest()[0]


def embedding_near_dup_pairs(
    emb: DataFrame,
    threshold: float = 0.9,
    planes: int = 8,
    dims: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate detection: pairs of vectors in the
    same hyperplane bucket with cosine ≥ threshold (id_a < id_b).

    The scale path for semantic dedup: candidate generation is the
    bucket self-join (uniform md5-derived buckets), the exact cosine runs
    only on candidates."""
    v = emb.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        hyperplane_bucket(F.col(vec_col), planes, dims).alias("bucket"),
    )
    return (
        v.alias("q")
        .join(
            v.alias("c"),
            (F.col("q.bucket") == F.col("c.bucket")) & (F.col("q.id") < F.col("c.id")),
        )
        .select(
            F.col("q.id").alias("id_a"),
            F.col("c.id").alias("id_b"),
            (
                _dot(F.col("q.vec"), F.col("c.vec"))
                / F.nullif(_norm(F.col("q.vec")) * _norm(F.col("c.vec")), F.lit(0.0))
            ).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )


def lsh_cosine_topk(
    emb: DataFrame,
    k: int = 5,
    planes: int = 8,
    dims: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k cosine neighbors: score only same-bucket pairs.

    At scale the self-join key is the bucket id (2^planes buckets), so
    compared pairs drop by ~2^planes vs brute force; recall is tunable
    via `planes` (fewer planes → bigger buckets → higher recall)."""
    from pyspark.sql import Window

    v = emb.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        hyperplane_bucket(F.col(vec_col), planes, dims).alias("bucket"),
    )
    pairs = (
        v.alias("q")
        .join(
            v.alias("c"),
            (F.col("q.bucket") == F.col("c.bucket")) & (F.col("q.id") != F.col("c.id")),
        )
        .select(
            F.col("q.id").alias("query_id"),
            F.col("c.id").alias("neighbor_id"),
            (
                _dot(F.col("q.vec"), F.col("c.vec"))
                / F.nullif(_norm(F.col("q.vec")) * _norm(F.col("c.vec")), F.lit(0.0))
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )
