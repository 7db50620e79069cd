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


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    right_cols: list[str],
    left_id: str = "event_id",
    how: str = "left",
) -> DataFrame:
    """For each left row, attach the right row with the greatest
    ``right_time`` ≤ ``left_time`` for the same key (ties broken toward
    the larger right timestamp; deterministic given unique right times).
    ``left_id`` must uniquely identify left rows (the as-of dedup window
    partitions on it)."""
    lt = left.alias("l")
    rt = right.alias("r")
    joined = lt.join(
        rt,
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col(f"r.{right_time}") <= F.col(f"l.{left_time}")),
        how,
    )
    w = Window.partitionBy(F.col(f"l.{left_id}")).orderBy(
        F.col(f"r.{right_time}").desc_nulls_last()
    )
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
        F.unix_millis(F.col(f"l.{left_time}")) - F.unix_millis(F.col(f"r.{right_time}"))
    )
    return lt.join(
        rt, (F.col(f"l.{key}") == F.col(f"r.{key}")) & (diff_ms <= range_ms)
    )
