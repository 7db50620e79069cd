"""Embedding clustering: distributed Lloyd k-means + SemDeDup-style
semantic deduplication (north-star surface: curation of a 100 TB
embedding corpus — cluster, then drop semantic near-duplicates within
each cluster).

Determinism contract (what makes this oracle-checkable without fitted
model state): initial centroids are md5-rank samples (seed ``km:id``);
every distance argmin is integer-packed (``round(d·1e6)·K + cid`` then
``% K``) so float ordering never crosses an engine boundary; and the
per-cluster means are computed as SEQUENTIAL folds over id-sorted
values, which makes the sums independent of partitioning/merge order —
the same trick as the engine's decimal aggregates, but for
full-precision doubles where a decimal cast would not round-trip
identically across engines.

Scale shape per Lloyd iteration: one broadcast nested-loop against K
centroid rows (no shuffle), then a posexplode to (cluster, dim) cells
— map-side combinable up to the collect_list, which holds one cluster's
values for ONE dimension per task (bounded by cluster size, not corpus
size; for larger-than-memory clusters production would switch to a
float mean and give up bit-reproducibility — documented tradeoff).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .similarity import _dot, _norm


def _sq_dist(a: Column, b: Column) -> Column:
    diff_sq = F.zip_with(
        a, b,
        lambda x, y: (x.cast("double") - y.cast("double"))
        * (x.cast("double") - y.cast("double")),
    )
    return F.aggregate(diff_sq, F.lit(0.0), lambda acc, d: acc + d)


def kmeans_assign(
    emb: DataFrame,
    k: int = 8,
    n_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_dp: int = 6,
) -> DataFrame:
    """Lloyd k-means with ``n_iter`` fixed iterations; returns
    ``(vec_id, cluster_id, sq_dist)`` — the assignment under the FINAL
    centroids, with the squared L2 distance rounded to ``round_dp``.

    Cluster ids are the 0-based md5-rank of the seed vector; a cluster
    that captures no points in some iteration simply disappears (both
    engines drop it in the group-by), exactly like textbook Lloyd.
    """
    from pyspark.sql import Window

    from flink_helloworld_spark.functions import md5_prefix_long, seed_topk

    v = emb.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
    cent = seed_topk(
        v.withColumn(
            "_h", md5_prefix_long(F.concat(F.lit("km:"), F.col("id").cast("string")))
        ),
        k,
    ).select((F.col("_rn") - 1).alias("cid"), F.col("vec").alias("cvec"))

    def assign(cent_df: DataFrame) -> DataFrame:
        packed = v.crossJoin(F.broadcast(cent_df)).select(
            "id",
            "vec",
            (
                F.round(_sq_dist(F.col("vec"), F.col("cvec")) * 1_000_000.0).cast("long")
                * k
                + F.col("cid")
            ).alias("_p"),
        )
        return packed.groupBy("id", "vec").agg(
            (F.min("_p") % k).cast("int").alias("cid")
        )

    for _ in range(n_iter):
        assigned = assign(cent)
        comp = assigned.select("cid", "id", F.posexplode("vec").alias("pos", "val"))
        means = (
            comp.groupBy("cid", "pos")
            .agg(
                F.aggregate(
                    F.array_sort(F.collect_list(F.struct("id", "val"))),
                    F.lit(0.0),
                    lambda acc, s: acc + s["val"].cast("double"),
                ).alias("_s"),
                F.count(F.lit(1)).cast("double").alias("_n"),
            )
            .select("cid", "pos", (F.col("_s") / F.col("_n")).alias("m"))
        )
        cent = means.groupBy("cid").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "m"))), lambda s: s["m"]
            ).alias("cvec")
        )

    final = v.crossJoin(F.broadcast(cent)).select(
        "id",
        F.col("cid"),
        F.round(_sq_dist(F.col("vec"), F.col("cvec")), round_dp).alias("sq_dist"),
        (
            F.round(_sq_dist(F.col("vec"), F.col("cvec")) * 1_000_000.0).cast("long") * k
            + F.col("cid")
        ).alias("_p"),
    )
    from pyspark.sql import Window as W2

    w = W2.partitionBy("id").orderBy(F.col("_p"))
    return (
        final.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(
            F.col("id").alias(id_col),
            F.col("cid").alias("cluster_id"),
            "sq_dist",
        )
    )


def semantic_dedup(
    emb: DataFrame,
    threshold: float = 0.35,
    k: int = 8,
    n_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup-style semantic deduplication: k-means-cluster the
    corpus, then within each cluster drop every vector that has a
    LOWER-id neighbor with cosine ≥ ``threshold`` (greedy keep-first —
    the same canonical rule as the engine's exact/minhash dedup).

    Returns ``(vec_id, cluster_id, is_kept)`` for every vector. The
    pairwise pass is cluster-blocked: candidates are same-cluster pairs
    only, so the quadratic term is bounded by cluster size (k ≈ √N at
    scale), never the corpus.
    """
    assigned = kmeans_assign(emb, k=k, n_iter=n_iter, id_col=id_col, vec_col=vec_col)
    v = emb.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec")).join(
        assigned.select(F.col(id_col).alias("id"), "cluster_id"), on="id"
    )
    dropped = (
        v.alias("a")
        .join(
            v.alias("b"),
            (F.col("a.cluster_id") == F.col("b.cluster_id"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .where(
            _dot(F.col("a.vec"), F.col("b.vec"))
            / F.nullif(_norm(F.col("a.vec")) * _norm(F.col("b.vec")), F.lit(0.0))
            >= threshold
        )
        .select(F.col("b.id").alias("id"))
        .distinct()
    )
    return (
        v.join(dropped.withColumn("_dropped", F.lit(True)), on="id", how="left")
        .select(
            F.col("id").alias(id_col),
            "cluster_id",
            F.coalesce(~F.col("_dropped"), F.lit(True)).alias("is_kept"),
        )
    )
