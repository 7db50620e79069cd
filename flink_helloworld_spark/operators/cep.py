"""Complex-event-processing patterns (Flink CEP parity, batch form).

Flink ships a dedicated CEP library (``Pattern.begin(A).followedBy(B)
.within(t)``, with ``notFollowedBy`` negation) that Spark has no native
counterpart for. For the non-looping patterns that cover the common
funnel/alert cases, the NFA is unnecessary: "first B after each A" is
one window-frame minimum per key, so the whole match is a single
shuffle-and-sort — no state machine, no Python.

Semantics are defined on millisecond event time (ties at the same ms
count as simultaneous); sequence order inside a key is (ts_ms,
event_id), which both this plan and the DuckDB oracle sort identically.

Scale shape: one window over (key, ts, id) — the same sort every
sessionization query already pays — plus a key-local join to recover the
matched B event's id. No pair explosion: each A row carries exactly one
candidate B timestamp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from flink_helloworld_spark.functions import epoch_millis


def followed_by_within(
    events: DataFrame,
    key: str,
    ts_col: str,
    type_col: str,
    first: str,
    second: str,
    within_ms: int,
    not_between: str | None = None,
    id_col: str = "event_id",
) -> DataFrame:
    """Match ``first`` followedBy ``second`` within ``within_ms`` per key,
    optionally requiring NO ``not_between`` event strictly between them
    (Flink CEP ``notFollowedBy`` before the closing pattern).

    Returns one row per matched ``first`` event: (key, a_id, b_id,
    a_ts_ms, b_ts_ms, lag_ms). The B event is the EARLIEST qualifying
    ``second`` after A (Flink's relaxed-contiguity semantics); ms ties
    among B events resolve to the smallest ``id_col``.

    Blocking granularity is MILLISECOND, not sequence position: a
    ``not_between`` event sharing B's millisecond blocks the match even
    when its id orders it after B — at ms event-time resolution the two
    are simultaneous and the guard can't claim C happened "after" the
    close. The streaming twin (streaming/cep.py) and the DuckDB oracle
    implement the same rule, so all three stay in lockstep.
    """
    e = events.select(
        F.col(key),
        F.col(id_col),
        F.col(type_col),
        epoch_millis(ts_col).alias("_tsm"),
    )
    frame = (
        Window.partitionBy(key)
        .orderBy("_tsm", id_col)
        .rowsBetween(1, Window.unboundedFollowing)
    )
    b_next = F.min(F.when(F.col(type_col) == second, F.col("_tsm"))).over(frame)
    a = (
        e.withColumn("_b_tsm", b_next)
        .withColumn(
            "_c_tsm",
            F.min(F.when(F.col(type_col) == not_between, F.col("_tsm"))).over(frame)
            if not_between is not None
            else F.lit(None).cast("long"),
        )
        .where(F.col(type_col) == first)
        .where(
            F.col("_b_tsm").isNotNull()
            & (F.col("_b_tsm") - F.col("_tsm") <= within_ms)
            & (F.col("_c_tsm").isNull() | (F.col("_c_tsm") > F.col("_b_tsm")))
        )
        .select(
            key,
            F.col(id_col).alias("a_id"),
            F.col("_tsm").alias("a_ts_ms"),
            F.col("_b_tsm").alias("b_ts_ms"),
        )
    )
    b_events = e.where(F.col(type_col) == second).select(
        F.col(key).alias("_bk"), F.col(id_col).alias("b_id"), F.col("_tsm").alias("_b_tsm")
    )
    return (
        a.join(
            b_events,
            (a[key] == b_events["_bk"])
            & (a["b_ts_ms"] == b_events["_b_tsm"])
            # same-ms Bs that precede A in (ts, id) sequence order are
            # not in A's following frame — exclude them from recovery
            & ((b_events["_b_tsm"] > a["a_ts_ms"]) | (b_events["b_id"] > a["a_id"])),
        )
        .groupBy(key, "a_id", "a_ts_ms", "b_ts_ms")
        .agg(F.min("b_id").alias("b_id"))
        .select(
            key,
            "a_id",
            "b_id",
            "a_ts_ms",
            "b_ts_ms",
            (F.col("b_ts_ms") - F.col("a_ts_ms")).alias("lag_ms"),
        )
    )
