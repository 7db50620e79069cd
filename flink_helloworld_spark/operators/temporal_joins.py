"""Temporal joins Spark lacks as primitives, composed from DataFrame ops
(SURVEY §4: custom operators as compositions, never RDD code).

- **As-of join**: each left row pairs with the latest right row at or
  before its timestamp (market-data / dimension-history semantics; the
  batch analog of the reference's buffer-until-dim CoFlatMap join, where
  "latest dimension wins", StateTest.java:58-81).
- **Range join**: pairs within a bounded time distance — the batch form
  of the interval join Flink documents as the window-join alternative
  (WindowTest.java:565-566); the streaming form is
  ``streaming.event_windows.stream_stream_window_join``.

Scale shape: both are equi-joins on the key with a time predicate —
Spark plans them as hash/sort-merge joins on the key, then filters the
time range; the as-of dedup is one window function over the matched
pairs. Skewed keys fall under AQE skew handling like any join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from flink_helloworld_spark.functions import epoch_millis


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    right_cols: list[str],
    left_id: str = "event_id",
    how: str = "left",
    right_id: str | None = None,
) -> DataFrame:
    """For each left row, attach the right row with the greatest
    ``right_time`` ≤ ``left_time`` for the same key.

    Linear formulation (the 100 TB shape): both sides are tagged and
    unioned, sorted once per key by ``(time, side, right_id)`` with
    right-before-left at equal times, and each left row picks up
    ``last(right_struct, ignorenulls)`` over rows-preceding. Cost is one
    shuffle + one sort over O(L+R) rows — there is NO join node, so a
    hot key with R right rows can never materialize O(L×R) pairs the way
    a pre-rank pair join does (see ``as_of_join_pairs``). Matches the
    plan DuckDB uses for ASOF JOIN.

    Tie rule: among right rows sharing the winning timestamp, the
    greatest ``right_id`` wins — pass ``right_id`` whenever right times
    can tie, otherwise the choice is nondeterministic (and any SQL
    oracle must mirror the same rule). The whole winning right ROW is
    carried as a struct, so a null field in the winning row stays null
    rather than falling back to an older non-null value.

    ``left_id`` is unused here (kept for signature compatibility with
    ``as_of_join_pairs``).
    """
    if how not in ("left", "inner"):
        raise ValueError(f"how must be 'left' or 'inner', got {how!r}")
    tiebreak = (
        F.col("_rtb").asc_nulls_first()
        if right_id is not None
        else F.lit(0)
    )
    r2 = right.select(
        F.col(key),
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_side"),
        *([F.col(right_id).alias("_rtb")] if right_id is not None else []),
        F.struct(*[F.col(c) for c in right_cols]).alias("_rvals"),
    )
    l2 = left.select(*left.columns, F.col(left_time).alias("_t"), F.lit(1).alias("_side"))
    u = l2.unionByName(r2, allowMissingColumns=True)
    w = (
        Window.partitionBy(key)
        .orderBy(F.col("_t").asc(), F.col("_side").asc(), tiebreak)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = u.withColumn("_m", F.last("_rvals", ignorenulls=True).over(w)).where(
        F.col("_side") == 1
    )
    if how == "inner":
        matched = matched.where(F.col("_m").isNotNull())
    return matched.select(
        *[F.col(c) for c in left.columns],
        *[F.col("_m")[c].alias(f"asof_{c}") for c in right_cols],
    )


def as_of_join_pairs(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    right_cols: list[str],
    left_id: str = "event_id",
    how: str = "left",
    right_id: str | None = None,
) -> DataFrame:
    """Pair-join fallback formulation of the as-of join: join ALL right
    rows ≤ t, then keep rank 1 per left row.

    Materializes O(L×R) pairs per key before the rank filter, so it must
    not be the default at scale — it exists for full outer variants and
    as the semantic cross-check for ``as_of_join`` in tests. ``left_id``
    must uniquely identify left rows (the dedup window partitions on
    it)."""
    lt = left.alias("l")
    rt = right.alias("r")
    joined = lt.join(
        rt,
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col(f"r.{right_time}") <= F.col(f"l.{left_time}")),
        how,
    )
    order = [F.col(f"r.{right_time}").desc_nulls_last()]
    if right_id is not None:
        order.append(F.col(f"r.{right_id}").desc_nulls_last())
    w = Window.partitionBy(F.col(f"l.{left_id}")).orderBy(*order)
    return (
        joined.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(
            *[F.col(f"l.{c}") for c in left.columns],
            *[F.col(f"r.{c}").alias(f"asof_{c}") for c in right_cols],
        )
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    range_ms: int,
) -> DataFrame:
    """Pairs of rows on the same key within ``range_ms`` milliseconds of
    each other (|t_l − t_r| ≤ range)."""
    lt = left.alias("l")
    rt = right.alias("r")
    diff_ms = F.abs(
        epoch_millis(f"l.{left_time}") - epoch_millis(f"r.{right_time}")
    )
    return lt.join(
        rt, (F.col(f"l.{key}") == F.col(f"r.{key}")) & (diff_ms <= range_ms)
    )
