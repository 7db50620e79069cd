"""Multi-stage stateful chaining in ONE streaming query (no hop).

The reference's capstone runs four stateful stages in a single job
(StateTest.java:639-872). Spark rejects a second
``applyInPandasWithState`` in one query, and ``transformWithState``
needs protobuf — but the restriction only bites when consecutive stages
use DIFFERENT keys. In the reference's own topology the expensive chain
(CEM⋈RouteLink → ⋈Order-result) is keyed by ``waybill_code`` at BOTH
stages; Flink inserts no re-key between them. Stages that share a key
need no shuffle between them at all — so we FUSE them: one
``applyInPandasWithState`` holds every stage's {dim, buffer} state under
a namespaced layout and cascades each record through all stage
transitions inside the operator. That is exactly the operator-chaining
Flink performs for same-key pipelines, and it removes the parquet hop
the two-stage capstone previously staged through.

A re-key between stateful stages (the reference's order-id keyed stage
feeding the waybill-keyed stage) requires a second stateful operator;
``streaming/tws.py``'s ``chain_stateful_join_tws`` /
``capstone_single_query`` run that topology as ONE query on
``transformWithStateInPandas`` (two different-key stateful operators
chain; protobuf is vendored). This module remains the
applyInPandasWithState form for same-key fusion — maximally portable,
no protobuf needed — and the durable-hop pattern stays tested as the
fallback for environments without stateful-v2.

State is one JSON string per key: ``[{dim, buf}, ...]`` per stage,
encoded with the typed codec from coflatmap (timestamps/decimals
round-trip). Buffers are capped per stage (no unbounded state).
"""

from __future__ import annotations

import json
from collections.abc import Iterator
from typing import Any

import pandas as pd

from flink_helloworld_spark.streaming._util import concat_chunks
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import StringType, StructField, StructType

from flink_helloworld_spark.streaming.coflatmap import _dec, _enc

CHAIN_STATE_SCHEMA = StructType([StructField("stages_json", StringType())])

FACT_SIDE = "F"


def _dim_side(i: int) -> str:
    return f"D{i}"


def chain_stateful_join(
    facts: DataFrame,
    dims: list[tuple[DataFrame, list[str]]],
    key: str,
    fact_cols: list[str],
    seq_col: str = "_seq",
    max_buffer: int = 10_000,
    state_ttl_ms: int | None = None,
) -> DataFrame:
    """N chained buffer-until-dim joins, all keyed by ``key``, fused into
    ONE ``applyInPandasWithState`` — a single-query multi-stage stateful
    pipeline with no intermediate sink.

    Semantics per stage i (identical to ``co_flat_map_join`` chained i
    times, reference StateTest.java:700-762): a dim row overwrites stage
    i's per-key dim state and flushes stage i's buffer onward; a record
    reaching stage i joins immediately if the dim is known, else buffers
    (oldest evicted at ``max_buffer``). A record only emits once it has
    passed EVERY stage. Output = key + fact_cols + each stage's dim
    cols, one row per fully-joined fact.
    """
    n = len(dims)
    dim_cols = [cols for _, cols in dims]
    out_fields = (
        [StructField(key, facts.schema[key].dataType)]
        + [StructField(c, facts.schema[c].dataType) for c in fact_cols]
        + [
            StructField(c, dims[i][0].schema[c].dataType)
            for i in range(n)
            for c in dim_cols[i]
        ]
    )
    out_schema = StructType(out_fields)
    out_names = [f.name for f in out_fields]

    tagged = facts.select(
        key, seq_col, *fact_cols, F.lit(FACT_SIDE).alias("_side")
    )
    for i, (dim_df, cols) in enumerate(dims):
        tagged = tagged.unionByName(
            dim_df.select(key, seq_col, *cols, F.lit(_dim_side(i)).alias("_side")),
            allowMissingColumns=True,
        )

    def fn(
        key_tuple: Any, batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            yield pd.DataFrame(columns=out_names)
            return
        if state.exists:
            raw = json.loads(state.get[0])
            stages = [
                {
                    "dim": None
                    if s["dim"] is None
                    else {k: _dec(v) for k, v in s["dim"].items()},
                    "buf": [{k: _dec(v) for k, v in r.items()} for r in s["buf"]],
                }
                for s in raw
            ]
        else:
            stages = [{"dim": None, "buf": []} for _ in range(n)]
        out_rows: list[dict] = []

        def cascade(rec: dict, i: int) -> None:
            # push rec through stages i..n-1; it parks at the first stage
            # whose dim is still unknown, else emits fully joined
            while i < n:
                dim = stages[i]["dim"]
                if dim is None:
                    buf = stages[i]["buf"]
                    # (buf + [rec])[-cap:] holds for max_buffer=1 too
                    stages[i]["buf"] = (buf + [rec])[-max_buffer:]
                    return
                rec = {**rec, **dim}
                i += 1
            out_rows.append(rec)

        batch = concat_chunks(batches)
        if batch is not None:
            for rec in batch.sort_values(seq_col).to_dict("records"):
                side = rec["_side"]
                if side == FACT_SIDE:
                    cascade({key: rec[key], **{c: rec[c] for c in fact_cols}}, 0)
                else:
                    i = int(side[1:])
                    stages[i]["dim"] = {c: rec[c] for c in dim_cols[i]}
                    flushed, stages[i]["buf"] = stages[i]["buf"], []
                    for r in flushed:
                        cascade(r, i)
        state.update(
            (
                json.dumps(
                    [
                        {
                            "dim": None
                            if s["dim"] is None
                            else {k: _enc(v) for k, v in s["dim"].items()},
                            "buf": [
                                {k: _enc(v) for k, v in r.items()} for r in s["buf"]
                            ],
                        }
                        for s in stages
                    ]
                ),
            )
        )
        if state_ttl_ms is not None:
            state.setTimeoutDuration(state_ttl_ms)
        yield pd.DataFrame(out_rows, columns=out_names)

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if state_ttl_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return tagged.groupBy(key).applyInPandasWithState(
        fn, out_schema, CHAIN_STATE_SCHEMA, "append", timeout
    )
