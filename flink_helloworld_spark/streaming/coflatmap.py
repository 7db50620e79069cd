"""Connect-style two-stream keyed join with user state (SURVEY.md §2.5 J3).

The reference's canonical pattern (``connect`` + two-sided ``keyBy`` +
``RichCoFlatMapFunction``, HelloWorldFlinkTest.java:291-327,
StateTest.java:250-303,639-872, func/flat/FlatMapTest.java:22-96): one
side carries a dimension row stored in per-key state; the other side's
rows buffer until the dimension arrives, then flush as joined output.

Spark has no two-input stateful operator, so this is the tag-union
pattern: add a ``_side`` discriminator, union the schemas
(outer-nullable), group by the join key, and run one
``applyInPandasWithState`` function holding {dimension, buffer} state per
key. State is JSON-encoded in a two-field struct — simple, schema-stable,
and bounded by a configurable buffer cap (100 TB discipline: no unbounded
per-key state).

Chaining: Spark rejects multiple ``applyInPandasWithState`` operators in
one streaming query ("Multiple applyInPandasWithStates are not
supported"), so multi-stage pipelines like the reference's 4-stage
capstone (StateTest.java:639-872) stage through sinks: each co-flat-map
stage writes a parquet/Kafka hop the next stage streams from (the same
topology Flink gets from its network shuffles, made durable). The
transformWithState API (streaming/tws.py) lifts this restriction on
Spark 4 clusters with protobuf available.
"""

from __future__ import annotations

import json
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import StringType, StructField, StructType

STATE_SCHEMA = StructType(
    [
        StructField("dim_json", StringType()),
        StructField("buf_json", StringType()),
    ]
)

LEFT, RIGHT = "L", "R"


def tag_union(left: DataFrame, right: DataFrame) -> DataFrame:
    """Union two differently-shaped streams into one schema-tagged stream
    (missing columns become nulls). The reference's ``connect`` analog."""
    lt = left.withColumn("_side", F.lit(LEFT))
    rt = right.withColumn("_side", F.lit(RIGHT))
    return lt.unionByName(rt, allowMissingColumns=True)


def co_flat_map_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_cols: list[str],
    right_cols: list[str],
    seq_col: str = "_seq",
    max_buffer: int = 10_000,
    state_ttl_ms: int | None = None,
) -> DataFrame:
    """Stateful buffer-until-match join of a fact stream (``left``) with a
    dimension stream (``right``) on ``key``.

    Semantics (reference StateTest.java:700-762): dimension rows overwrite
    per-key ValueState; fact rows either join immediately (dimension
    already known) or buffer in state and flush the moment the dimension
    arrives. Output = fact columns + dimension columns, one row per fact.

    - ``seq_col`` (monotonic per key) restores arrival order inside a
      micro-batch, making emission deterministic.
    - ``max_buffer`` caps per-key buffered facts (oldest dropped) —
    - ``state_ttl_ms`` sets a processing-time timeout that clears idle
      keys (reference state TTL, StateTest.java:904-932 / T8).
    """
    out_fields = (
        [StructField(key, left.schema[key].dataType)]
        + [StructField(c, left.schema[c].dataType) for c in left_cols]
        + [StructField(c, right.schema[c].dataType) for c in right_cols]
    )
    out_schema = StructType(out_fields)
    tagged = tag_union(
        left.select(key, seq_col, *left_cols), right.select(key, seq_col, *right_cols)
    )

    def fn(
        key_tuple: Any, batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            yield pd.DataFrame(columns=[f.name for f in out_fields])
            return
        dim_json, buf_json = state.get if state.exists else (None, None)
        dim: dict | None = json.loads(dim_json) if dim_json else None
        buf: list[dict] = json.loads(buf_json) if buf_json else []
        out_rows: list[dict] = []

        def emit(fact: dict) -> None:
            row = {key: key_tuple[0]}
            row.update({c: fact.get(c) for c in left_cols})
            row.update({c: (dim or {}).get(c) for c in right_cols})
            out_rows.append(row)

        for pdf in batches:
            for rec in pdf.sort_values(seq_col).to_dict("records"):
                if rec["_side"] == RIGHT:
                    dim = {c: rec[c] for c in right_cols}
                    for fact in buf:  # flush everything buffered
                        emit(fact)
                    buf = []
                else:
                    fact = {c: rec[c] for c in left_cols}
                    if dim is not None:
                        emit(fact)
                    else:  # buffer until dimension arrives, oldest evicted
                        buf = buf[-(max_buffer - 1) :] + [fact]
        state.update((json.dumps(dim) if dim else None, json.dumps(buf, default=str)))
        if state_ttl_ms is not None:
            state.setTimeoutDuration(state_ttl_ms)
        yield pd.DataFrame(out_rows, columns=[f.name for f in out_fields])

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if state_ttl_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return tagged.groupBy(key).applyInPandasWithState(
        fn, out_schema, STATE_SCHEMA, "append", timeout
    )
