"""Windowed aggregation operators (SURVEY.md §2.6).

Batch semantics for the reference's window zoo; the streaming variants
(watermarked, update-mode) live in ``flink_helloworld_spark.streaming``
and share these plan shapes.

Spark's ``window()`` / ``session_window()`` handle tumbling / sliding /
session natively; count windows have no Spark primitive and are expressed
with a row_number bucket (batch) or stateful op (streaming).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from flink_helloworld_spark.functions import dsum


def tumbling_agg(
    df: DataFrame,
    time_col: str,
    size: str,
    keys: list[str],
    aggs: list[F.Column],
) -> DataFrame:
    """Tumbling window + keyed agg (reference
    TumblingProcessingTimeWindows/TumblingEventTimeWindows,
    WindowTest.java:96-111, EventTimeTest.java:86). Window-start/end
    metadata is projected out like Flink's ProcessWindowFunction context
    (WindowTest.java:427-435)."""
    out = df.groupBy(F.window(time_col, size).alias("w"), *keys).agg(*aggs)
    return _project_window(out)


def sliding_agg(
    df: DataFrame,
    time_col: str,
    size: str,
    slide: str,
    keys: list[str],
    aggs: list[F.Column],
) -> DataFrame:
    """Sliding window + keyed agg (reference
    SlidingProcessingTimeWindows.of(size, slide), WindowTest.java:188):
    each element lands in ceil(size/slide) overlapping windows."""
    out = df.groupBy(F.window(time_col, size, slide).alias("w"), *keys).agg(*aggs)
    return _project_window(out)


def session_agg(
    df: DataFrame,
    time_col: str,
    gap: str,
    keys: list[str],
    aggs: list[F.Column],
) -> DataFrame:
    """Merging session windows (reference EventTimeSessionWindows.withGap,
    WindowTest.java:206-261): rows closer than `gap` per key merge into
    one session. Native ``session_window`` (Spark 3.2+)."""
    out = df.groupBy(F.session_window(time_col, gap).alias("w"), *keys).agg(*aggs)
    return _project_window(out)


def count_window_agg(
    df: DataFrame,
    key: str,
    order: list[str],
    n: int,
    value: str,
) -> DataFrame:
    """Keyed count window (reference ``countWindow(n)``,
    HelloWorldFlinkTest.java:98-120): fire a sum every n elements per key;
    **partial windows never fire** (caveat documented at
    HelloWorldFlinkTest.java:99-103 — we reproduce it with the HAVING).

    Batch expression: row_number within key → bucket ⌊(rn-1)/n⌋ →
    group-by → keep only full buckets. One shuffle on the key.
    """
    w = Window.partitionBy(key).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .withColumn("bucket", ((F.col("_rn") - 1) / n).cast("long"))
        .groupBy(key, "bucket")
        .agg(dsum(value, "window_sum"), F.count(F.lit(1)).alias("n_rows"))
        .where(F.col("n_rows") == n)
        .drop("n_rows")
    )


def global_window_every_n_keep_k(
    df: DataFrame,
    key: str,
    order: list[str],
    value: str,
    every: int = 2,
    keep: int = 5,
) -> DataFrame:
    """GlobalWindows + CountTrigger(every) + CountEvictor(keep)
    (reference WindowTest.java:84): per key, fire on every `every`-th
    element, aggregating the last `keep` elements at fire time.

    Batch expression: rows where rn % every == 0 fire; each fire sums the
    trailing `keep` rows — a bounded rows-between window, no buffer-all.
    """
    w = Window.partitionBy(key).orderBy(*order)
    trail = w.rowsBetween(-(keep - 1), 0)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .withColumn("fired_sum", F.sum(F.col(value).cast("decimal(18,4)")).over(trail).cast("double"))
        .where(F.col("_rn") % every == 0)
        .select(key, F.col("_rn").alias("fire_seq"), "fired_sum")
    )

def _project_window(out: DataFrame) -> DataFrame:
    """Flatten the window struct into start/end metadata columns (the
    reference's ProcessWindowFunction Context, WindowTest.java:427-435)."""
    rest = [c for c in out.columns if c != "w"]
    return out.select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        *rest,
    )


def window_topn(
    df: DataFrame,
    time_col: str,
    size: str,
    key_col: str,
    n: int = 3,
) -> DataFrame:
    """Per-window Top-N keys by count — Flink SQL's "Window Top-N"
    (the deduplication/ranking pattern Flink documents as
    ROW_NUMBER() OVER a window TVF; the reference's keyed windowed
    aggregations in WindowTest.java are the manual form of it).

    One windowed hash-aggregate (map-side combinable) then a
    rank-per-window window function over the already-aggregated rows
    (|windows| x |keys| rows, tiny vs input). Tie-break on key asc keeps
    the ranking deterministic across engines and partitionings.
    """
    from pyspark.sql import Window as Wspec

    agg = df.groupBy(F.window(time_col, size).alias("w"), key_col).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    flat = agg.select(
        F.col("w.start").alias("window_start"), key_col, "cnt"
    )
    rank_w = Wspec.partitionBy("window_start").orderBy(
        F.col("cnt").desc(), F.col(key_col)
    )
    return (
        flat.withColumn("rank", F.row_number().over(rank_w).cast("int"))
        .where(F.col("rank") <= n)
    )
