"""transformWithStateInPandas upgrade path (SURVEY §7 stage 4).

Spark 4's ``transformWithStateInPandas`` supersedes
``applyInPandasWithState`` with typed state handles (ValueState /
ListState / MapState — the same vocabulary as the reference's Flink
state, StateTest.java), native TTL per state, and timers. The engine's
custom operators live on ``applyInPandasWithState`` (stable since 3.4);
this module carries the forward port of the core pattern so migration
is a swap, not a rewrite.

Runtime requirement: the transformWithState Python worker speaks
protobuf to the JVM (``google.protobuf`` import at query start).
``session.build_session`` calls ``_vendor.ensure_protobuf()`` pre-JVM,
which prefers an installed protobuf and falls back to the vendored
pure-Python runtime — so this module works out of the box here; tests
still skip gracefully if neither copy imports.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

ROLLING_OUTPUT = StructType(
    [
        StructField("k", StringType()),
        StructField("seq", LongType()),
        StructField("v", DoubleType()),
        StructField("running_total", DoubleType()),
    ]
)

from flink_helloworld_spark.streaming._util import (  # noqa: E402
    concat_chunks as _concat_chunks,
)

_STATE_SCHEMA = StructType([StructField("total", DoubleType())])


class RollingSumProcessor(StatefulProcessor):
    """Per-event rolling sum on typed ValueState — the
    ``rolling_sum_stream`` semantics (reference KeyedStream.sum,
    HelloWorldFlinkTest.java:45) on the new API. A TTL would be
    ``state_ttl_duration_ms`` on ``getValueState`` (reference state TTL,
    StateTest.java:904-932)."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._total = handle.getValueState("total", _STATE_SCHEMA)

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        (total,) = self._total.get() if self._total.exists() else (0.0,)
        out = []
        # Concatenate ALL Arrow chunks before sorting: a key whose batch
        # exceeds arrow.maxRecordsPerBatch arrives as multiple pdfs, and
        # per-chunk sorts would make ordering partitioning-dependent.
        batch = _concat_chunks(rows)
        if batch is not None:
            for rec in batch.sort_values("seq").to_dict("records"):
                total = round(total + rec["v"], 9)
                out.append(
                    {"k": key[0], "seq": rec["seq"], "v": rec["v"], "running_total": total}
                )
        self._total.update((total,))
        yield pd.DataFrame(out, columns=[f.name for f in ROLLING_OUTPUT.fields])

    def close(self) -> None:
        pass


def rolling_sum_tws(stream: DataFrame, key: str = "k") -> DataFrame:
    """Rolling per-event sum via transformWithStateInPandas."""
    return (
        stream.selectExpr(f"{key} AS k", "seq", "CAST(v AS DOUBLE) AS v")
        .groupBy("k")
        .transformWithStateInPandas(
            RollingSumProcessor(),
            outputStructType=ROLLING_OUTPUT,
            outputMode="append",
            timeMode="none",
        )
    )


# --------------------------------------------------------------------------
# Cross-key stateful chaining: the reference's 4-stage capstone in ONE query
# --------------------------------------------------------------------------


class ChainJoinProcessor(StatefulProcessor):
    """The fused buffer-until-dim chain of ``chain.chain_stateful_join``
    (reference StateTest.java:639-872 semantics) on typed
    transformWithState state. Unlike ``applyInPandasWithState`` — which
    Spark caps at one per query — transformWithState operators CHAIN:
    two of these with DIFFERENT grouping keys run in a single streaming
    query, which is exactly the re-key seam Flink's capstone topology has
    (order-id keyed join feeding the waybill-keyed join) and that the
    durable-hop workaround previously staged through.

    State: one JSON blob per key — ``[{dim, buf}, ...]`` per stage, the
    same typed codec as coflatmap (timestamps/decimals round-trip).
    """

    def __init__(
        self,
        key: str,
        fact_cols: list[str],
        dim_cols: list[list[str]],
        out_names: list[str],
        seq_col: str,
        max_buffer: int,
        ttl_ms: int | None,
    ) -> None:
        self._key = key
        self._fact_cols = fact_cols
        self._dim_cols = dim_cols
        self._out_names = out_names
        self._seq_col = seq_col
        self._max_buffer = max_buffer
        self._ttl_ms = ttl_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        schema = StructType([StructField("stages_json", StringType())])
        if self._ttl_ms is not None:
            self._state = handle.getValueState("chain", schema, self._ttl_ms)
        else:
            self._state = handle.getValueState("chain", schema)

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        import json

        from flink_helloworld_spark.streaming.coflatmap import _dec, _enc

        n = len(self._dim_cols)
        if self._state.exists():
            raw = json.loads(self._state.get()[0])
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
            while i < n:
                dim = stages[i]["dim"]
                if dim is None:
                    # (buf + [rec])[-cap:] holds the cap for every value,
                    # including max_buffer=1 where buf[-0:] would be the
                    # whole list
                    stages[i]["buf"] = (stages[i]["buf"] + [rec])[-self._max_buffer:]
                    return
                rec = {**rec, **dim}
                i += 1
            out_rows.append(rec)

        # NB: the TWS serializer materializes rows via itertuples, which
        # renames columns that start with "_" to positional names — so the
        # plumbing columns travel as chain_seq/chain_side, and a seq_col
        # carried through as a fact column is read back from chain_seq
        batch = _concat_chunks(rows)
        if batch is not None:
            for rec in batch.sort_values("chain_seq").to_dict("records"):
                side = rec["chain_side"]
                if side == "F":
                    cascade(
                        {
                            self._key: rec[self._key],
                            **{
                                c: (rec["chain_seq"] if c == self._seq_col else rec[c])
                                for c in self._fact_cols
                            },
                        },
                        0,
                    )
                else:
                    i = int(side[1:])
                    stages[i]["dim"] = {c: rec[c] for c in self._dim_cols[i]}
                    flushed, stages[i]["buf"] = stages[i]["buf"], []
                    for r in flushed:
                        cascade(r, i)
        self._state.update(
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
        yield pd.DataFrame(out_rows, columns=self._out_names)

    def close(self) -> None:
        pass


def chain_stateful_join_tws(
    facts: DataFrame,
    dims: list[tuple[DataFrame, list[str]]],
    key: str,
    fact_cols: list[str],
    seq_col: str = "_seq",
    max_buffer: int = 10_000,
    state_ttl_ms: int | None = None,
) -> DataFrame:
    """``chain.chain_stateful_join`` on transformWithStateInPandas —
    same semantics, but composable across re-keys in one query."""
    from pyspark.sql import functions as F

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
    # seq_col may double as a carried fact column (stage outputs feeding a
    # later re-keyed stage keep their seq) — don't select it twice. The
    # plumbing columns avoid leading underscores: the worker-side
    # serializer (itertuples) renames such columns positionally.
    fact_sel = [c for c in fact_cols if c != seq_col]
    tagged = facts.select(
        key,
        F.col(seq_col).alias("chain_seq"),
        *fact_sel,
        F.lit("F").alias("chain_side"),
    )
    for i, (dim_df, cols) in enumerate(dims):
        tagged = tagged.unionByName(
            dim_df.select(
                key,
                F.col(seq_col).alias("chain_seq"),
                *cols,
                F.lit(f"D{i}").alias("chain_side"),
            ),
            allowMissingColumns=True,
        )
    proc = ChainJoinProcessor(
        key=key,
        fact_cols=fact_cols,
        dim_cols=dim_cols,
        out_names=[f.name for f in out_fields],
        seq_col=seq_col,
        max_buffer=max_buffer,
        ttl_ms=state_ttl_ms,
    )
    return tagged.groupBy(key).transformWithStateInPandas(
        proc,
        outputStructType=out_schema,
        outputMode="append",
        timeMode="none",
    )


def capstone_single_query(
    route: DataFrame,
    cem: DataFrame,
    links: DataFrame,
    orders: DataFrame,
    seq_col: str = "_seq",
) -> DataFrame:
    """The COMPLETE 4-stream reference capstone (StateTest.java:639-872)
    as ONE streaming query — no durable hop at the re-key seam.

    Stage A (keyed by order_id): WaybillOrder links buffer until their
    Order header arrives — the one place the reference topology re-keys.
    Stage B (keyed by waybill_code): route facts chain through the CEM
    dimension and the stage-A output. Spark runs both stateful operators
    in the same query because transformWithState chains; the seam is a
    plain shuffle, exactly like Flink's keyBy between operators.
    """
    from pyspark.sql import functions as F

    stage_a = chain_stateful_join_tws(
        facts=links.select("order_id", seq_col, "waybill_code"),
        dims=[(orders.select("order_id", seq_col, "create_time"), ["create_time"])],
        key="order_id",
        fact_cols=["waybill_code", seq_col],
    )
    order_result = stage_a.select(
        "waybill_code",
        seq_col,
        F.col("order_id").alias("order_code"),
        F.col("create_time").alias("order_create_date"),
    )
    return chain_stateful_join_tws(
        facts=route.select("waybill_code", seq_col, "package_code"),
        dims=[
            (
                cem.select(
                    "waybill_code", seq_col, "site_name", "busi_name", "pickup_date"
                ),
                ["site_name", "busi_name", "pickup_date"],
            ),
            (order_result, ["order_code", "order_create_date"]),
        ],
        key="waybill_code",
        fact_cols=["package_code"],
    )


# --------------------------------------------------------------------------
# Event-time TIMERS: session flush built from raw timer primitives
# --------------------------------------------------------------------------

SESSION_FLUSH_OUTPUT = StructType(
    [
        StructField("k", StringType()),
        StructField("session_start_ms", LongType()),
        StructField("session_end_ms", LongType()),
        StructField("total", DoubleType()),
        StructField("cnt", LongType()),
    ]
)

_SESSION_STATE = StructType(
    [
        StructField("start_ms", LongType()),
        StructField("end_ms", LongType()),
        StructField("total", DoubleType()),
        StructField("cnt", LongType()),
        StructField("timer_ms", LongType()),
    ]
)


class SessionFlushProcessor(StatefulProcessor):
    """Session windows rebuilt from the raw stateful-v2 primitives the
    engine's declarative session windows (W5, operators/windows.py /
    session_window) compile away: per-key ValueState + an EVENT-TIME
    TIMER registered at last_event + gap, re-armed on every new event,
    firing when the watermark passes. Flink expresses this as
    KeyedProcessFunction.onTimer; the reference never uses raw timers,
    so this is beyond-reference vocabulary — it exists to prove the
    engine's timer surface end-to-end (register, re-arm via delete,
    expiry callback, emission from the timer path)."""

    def __init__(self, gap_ms: int) -> None:
        self._gap_ms = gap_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._handle = handle
        self._sess = handle.getValueState("sess", _SESSION_STATE)

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        if self._sess.exists():
            start, end, total, cnt, timer_ms = self._sess.get()
        else:
            start, end, total, cnt, timer_ms = None, None, 0.0, 0, None
        out: list[dict] = []
        batch = _concat_chunks(rows)
        if batch is not None:
            for rec in batch.sort_values("ts_ms").to_dict("records"):
                t = int(rec["ts_ms"])
                if end is not None and t - end >= self._gap_ms:
                    # gap reached by a LATER event arriving before the
                    # watermark hit old_end+gap: close the old session
                    # inline — the timer path only covers keys that go
                    # silent. ">=" matches BOTH the timer boundary (the
                    # timer at end+gap fires once the watermark reaches
                    # it) and Spark's batch session windows (an event at
                    # exactly prev+gap is adjacent, not overlapping), so
                    # the session-split rule is identical whichever path
                    # closes it — micro-batch packing can only affect
                    # late-classification, never session boundaries
                    out.append(
                        {
                            "k": key[0],
                            "session_start_ms": start,
                            "session_end_ms": end,
                            "total": total,
                            "cnt": cnt,
                        }
                    )
                    start, end, total, cnt = None, None, 0.0, 0
                start = t if start is None else min(start, t)
                end = t if end is None else max(end, t)
                total = round(total + float(rec["v"]), 9)
                cnt += 1
        if timer_ms is not None:
            self._handle.deleteTimer(timer_ms)  # re-arm: one timer per key
        timer_ms = end + self._gap_ms
        self._handle.registerTimer(timer_ms)
        self._sess.update((start, end, total, cnt, timer_ms))
        if out:
            yield pd.DataFrame(
                out, columns=[f.name for f in SESSION_FLUSH_OUTPUT.fields]
            )

    def handleExpiredTimer(
        self, key, timerValues, expiredTimerInfo
    ) -> Iterator[pd.DataFrame]:
        if not self._sess.exists():
            return
        start, end, total, cnt, _timer = self._sess.get()
        self._sess.clear()
        yield pd.DataFrame(
            {
                "k": [key[0]],
                "session_start_ms": [start],
                "session_end_ms": [end],
                "total": [total],
                "cnt": [cnt],
            }
        )

    def close(self) -> None:
        pass


def session_flush_tws(
    stream: DataFrame,
    gap_ms: int,
    key: str = "k",
    ts_col: str = "ts",
    val_col: str = "v",
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """Timer-based session aggregation: per key, (start, end, sum, count)
    of each burst of events separated by ≥ ``gap_ms``, emitted when the
    event-time watermark passes last_event + gap. ``ts_col`` must be a
    TIMESTAMP column; the watermark is applied here."""
    from pyspark.sql import functions as F

    src = stream.withWatermark(ts_col, watermark_delay).select(
        F.col(key).alias("k"),
        F.unix_millis(F.col(ts_col)).alias("ts_ms"),
        F.col(val_col).cast("double").alias("v"),
        F.col(ts_col).alias("ts"),
    )
    return src.groupBy("k").transformWithStateInPandas(
        SessionFlushProcessor(gap_ms),
        outputStructType=SESSION_FLUSH_OUTPUT,
        outputMode="append",
        timeMode="eventTime",
    )


# --------------------------------------------------------------------------
# Streaming domain cap: per-key counters with typed ValueState
# --------------------------------------------------------------------------

DOMAIN_CAP_OUTPUT = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("source", StringType()),
        StructField("domain_rank", LongType()),
        StructField("kept", BooleanType()),
    ]
)

_COUNT_STATE = StructType([StructField("n", LongType())])


class DomainCapProcessor(StatefulProcessor):
    """Streaming twin of ``sampling.domain_cap``: an unbounded ingest
    can't rank a domain by md5 (the set is never complete), so the
    streaming semantics are FIRST-ARRIVED-KEPT — one ValueState counter
    per domain, every doc emitted with its arrival rank and a kept flag.
    State is one long per domain: bounded by domain cardinality, not
    corpus size."""

    def __init__(self, cap: int) -> None:
        self._cap = cap

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._n = handle.getValueState("n", _COUNT_STATE)

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        (n,) = self._n.get() if self._n.exists() else (0,)
        out = []
        batch = _concat_chunks(rows)
        if batch is not None:
            for rec in batch.sort_values("seq").to_dict("records"):
                n += 1
                out.append(
                    {
                        "doc_id": rec["doc_id"],
                        "source": key[0],
                        "domain_rank": n,
                        "kept": n <= self._cap,
                    }
                )
        self._n.update((n,))
        yield pd.DataFrame(out, columns=[f.name for f in DOMAIN_CAP_OUTPUT.fields])

    def close(self) -> None:
        pass


def streaming_domain_cap(
    stream: DataFrame,
    cap: int,
    domain_col: str = "source",
    id_col: str = "doc_id",
    seq_col: str = "seq",
) -> DataFrame:
    """Arrival-order per-domain cap over an unbounded stream; see
    DomainCapProcessor for the batch-vs-streaming semantic difference."""
    from pyspark.sql import functions as F

    src = stream.select(
        F.col(domain_col).alias("source"),
        F.col(id_col).alias("doc_id"),
        F.col(seq_col).alias("seq"),
    )
    return src.groupBy("source").transformWithStateInPandas(
        DomainCapProcessor(cap),
        outputStructType=DOMAIN_CAP_OUTPUT,
        outputMode="append",
        timeMode="none",
    )


# --------------------------------------------------------------------------
# Streaming weighted reservoir: A-ES in its native habitat
# --------------------------------------------------------------------------

RESERVOIR_OUTPUT = StructType(
    [
        StructField("source", StringType()),
        StructField("doc_id", LongType()),
        StructField("weight", LongType()),
        StructField("res_key", DoubleType()),
        StructField("res_rank", IntegerType()),
        StructField("n_seen", LongType()),
    ]
)

_RES_ROW_STATE = StructType(
    [
        StructField("res_key", DoubleType()),
        StructField("doc_id", LongType()),
        StructField("weight", LongType()),
    ]
)


class WeightedReservoirProcessor(StatefulProcessor):
    """Streaming twin of ``sampling.weighted_reservoir_sample`` —
    Efraimidis-Spirakis reservoir sampling in the setting it was
    INVENTED for (an unbounded stream you see once). Because each row's
    exponential-race key is content-derived (computed upstream by the
    SHARED ``sampling.reservoir_key`` column expression), the final
    reservoir after any arrival order / batch split is BIT-IDENTICAL to
    the batch operator over the same rows — unlike the arrival-order
    domain cap, this twin's contract is full batch parity.

    State per stratum: a ListState of at most k (res_key, doc_id,
    weight) rows + one n_seen counter — O(k) per domain, never
    corpus-proportional. Each batch re-emits the stratum's CURRENT
    reservoir stamped with n_seen, so consumers take the max-n_seen
    emission per stratum as the live sample.
    """

    def __init__(self, k: int) -> None:
        self._k = k

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._res = handle.getListState("res", _RES_ROW_STATE)
        self._n = handle.getValueState("n", _COUNT_STATE)

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        cur: list[tuple[float, int, int]] = [
            (r[0], r[1], r[2]) for r in self._res.get()
        ]
        (n,) = self._n.get() if self._n.exists() else (0,)
        batch = _concat_chunks(rows)
        changed = False
        if batch is not None and len(batch):
            for rec in batch.to_dict("records"):
                n += 1
                cur.append(
                    (
                        float(rec["res_key"]),
                        int(rec["doc_id"]),
                        int(rec["weight"]),
                    )
                )
                changed = True
            # k smallest (key, doc_id) survive — same total order as the
            # batch rank window
            cur.sort(key=lambda t: (t[0], t[1]))
            cur = cur[: self._k]
        if changed:
            self._res.clear()
            self._res.appendList(cur)
            self._n.update((n,))
        out = [
            {
                "source": key[0],
                "doc_id": d,
                "weight": w,
                "res_key": rk,
                "res_rank": i + 1,
                "n_seen": n,
            }
            for i, (rk, d, w) in enumerate(cur)
        ]
        yield pd.DataFrame(out, columns=[f.name for f in RESERVOIR_OUTPUT.fields])

    def close(self) -> None:
        pass


def streaming_weighted_reservoir(
    stream: DataFrame,
    k: int,
    strata_col: str = "source",
    weight_col: str = "weight",
    id_col: str = "doc_id",
    salt: str = "wres",
) -> DataFrame:
    """Per-stratum A-ES weighted reservoir over an unbounded stream;
    rows with weight <= 0 are excluded (never sampleable), keys come
    from the SHARED batch column expression so parity is bit-exact."""
    from pyspark.sql import functions as F

    from flink_helloworld_spark.operators.sampling import reservoir_key

    w = F.col(weight_col).cast("double")
    src = stream.where(w > 0).select(
        F.col(strata_col).alias("source"),
        F.col(id_col).alias("doc_id"),
        F.col(weight_col).cast("long").alias("weight"),
        reservoir_key(id_col, weight_col, salt).alias("res_key"),
    )
    return src.groupBy("source").transformWithStateInPandas(
        WeightedReservoirProcessor(k),
        outputStructType=RESERVOIR_OUTPUT,
        outputMode="append",
        timeMode="none",
    )


# --------------------------------------------------------------------------
# Streaming corpus→manifest: gate → dedup → manifest as chained TWS stages
# --------------------------------------------------------------------------

MANIFEST_OUTPUT = StructType(
    [
        StructField("shard_id", IntegerType()),
        StructField("n_docs", LongType()),
        StructField("total_tokens", LongType()),
        StructField("min_id", LongType()),
        StructField("max_id", LongType()),
        StructField("fingerprint", LongType()),
    ]
)

_SEEN_STATE = StructType([StructField("seen", LongType())])

_DEDUP_PASS = StructType(
    [
        StructField("shard_id", IntegerType()),
        StructField("doc_id", LongType()),
        StructField("tok", LongType()),
        StructField("fp", LongType()),
    ]
)

_MANIFEST_STATE = StructType(
    [
        StructField("n_docs", LongType()),
        StructField("total_tokens", LongType()),
        StructField("min_id", LongType()),
        StructField("max_id", LongType()),
        StructField("fingerprint", LongType()),
    ]
)


class ContentDedupProcessor(StatefulProcessor):
    """First-arrival exact dedup keyed on the content hash: one long of
    ValueState per distinct content ever seen (the watermarkless TWS
    form — pair with TTL where the horizon is bounded). Within a batch,
    ties break on doc_id, so replay is deterministic."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._seen = handle.getValueState("seen", _SEEN_STATE)

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        batch = _concat_chunks(rows)
        out = []
        if not self._seen.exists() and batch is not None and len(batch):
            rec = (
                batch.sort_values("doc_id").iloc[0].to_dict()
            )
            out.append(
                {
                    "shard_id": int(rec["shard_id"]),
                    "doc_id": int(rec["doc_id"]),
                    "tok": int(rec["tok"]),
                    "fp": int(rec["fp"]),
                }
            )
            self._seen.update((1,))
        yield pd.DataFrame(out, columns=[f.name for f in _DEDUP_PASS.fields])

    def close(self) -> None:
        pass


class ManifestProcessor(StatefulProcessor):
    """Incremental per-shard manifest on typed state: five scalars per
    shard (adds, min/max, XOR — all associative+commutative), re-emitted
    whenever the shard is touched; after any batch sequence the values
    equal the batch ``layout.shard_manifest`` over everything kept."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._m = handle.getValueState("m", _MANIFEST_STATE)

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        n, tok, lo, hi, fp = (
            self._m.get() if self._m.exists() else (0, 0, None, None, 0)
        )
        batch = _concat_chunks(rows)
        if batch is not None and len(batch):
            for rec in batch.to_dict("records"):
                n += 1
                tok += int(rec["tok"])
                d = int(rec["doc_id"])
                lo = d if lo is None else min(lo, d)
                hi = d if hi is None else max(hi, d)
                fp ^= int(rec["fp"])
            self._m.update((n, tok, lo, hi, fp))
        yield pd.DataFrame(
            [
                {
                    "shard_id": key[0],
                    "n_docs": n,
                    "total_tokens": tok,
                    "min_id": lo,
                    "max_id": hi,
                    "fingerprint": fp,
                }
            ],
            columns=[f.name for f in MANIFEST_OUTPUT.fields],
        )

    def close(self) -> None:
        pass


def streaming_corpus_manifest_tws(
    stream: DataFrame,
    shards: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The streaming twin of ``dedup.corpus_to_manifest``'s closing
    chain as ONE query with TWO chained transformWithState operators
    across the re-key seam (content_hash → shard_id), the same topology
    trick as ``capstone_single_query``: stateless Gopher-core gate →
    first-arrival content dedup → incremental shard manifest.

    Scale contract: the manifest inputs (shard_id, tok, fp) are computed
    in the stateless projection BEFORE any shuffle, so document TEXT
    never leaves its scan partition — both stateful exchanges carry four
    integers per doc. State: one long per distinct content + five longs
    per shard."""
    from pyspark.sql import functions as F

    from flink_helloworld_spark.functions import md5_prefix_long
    from flink_helloworld_spark.operators.text import _words

    ws = _words(F.col(text_col))
    n_words = F.size(ws)
    n_chars = F.length(text_col)
    mean_wlen = (n_chars - (n_words - 1)).cast("double") / F.nullif(
        n_words.cast("double"), F.lit(0.0)
    )
    gated = stream.where(
        (n_words >= 5) & (mean_wlen >= 3.0) & (mean_wlen <= 10.0)
    )
    tagged = gated.select(
        F.md5(F.col(text_col)).alias("content_hash"),
        (
            md5_prefix_long(
                F.concat(F.lit("shard:"), F.col(id_col).cast("string"))
            )
            % shards
        )
        .cast("int")
        .alias("shard_id"),
        F.col(id_col).alias("doc_id"),
        F.size(_words(F.col(text_col))).cast("long").alias("tok"),
        md5_prefix_long(
            F.concat(F.col(id_col).cast("string"), F.lit(":"), F.col(text_col))
        ).alias("fp"),
    )
    deduped = tagged.groupBy("content_hash").transformWithStateInPandas(
        ContentDedupProcessor(),
        outputStructType=_DEDUP_PASS,
        outputMode="append",
        timeMode="none",
    )
    return deduped.groupBy("shard_id").transformWithStateInPandas(
        ManifestProcessor(),
        outputStructType=MANIFEST_OUTPUT,
        outputMode="append",
        timeMode="none",
    )


# --- streaming LSH near-dup gate --------------------------------------------

_LSH_CLAIM_STATE = StructType([StructField("first_doc", LongType())])
_LSH_CLAIM_OUT = StructType(
    [StructField("doc_id", LongType()), StructField("is_first", BooleanType())]
)
_LSH_VERDICT_STATE = StructType(
    [StructField("n_seen", IntegerType()), StructField("n_first", IntegerType())]
)
LSH_VERDICT_OUTPUT = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bands", IntegerType()),
        StructField("n_first", IntegerType()),
        StructField("kept", BooleanType()),
    ]
)


class BucketClaimProcessor(StatefulProcessor):
    """Per-LSH-bucket first-claim state: ONE long per bucket ever touched
    (the earliest claimant), independent of how many docs hash there.
    Emits (doc_id, is_first[, carry...]) per arrival. In-order contract:
    with doc_id monotone in arrival order (the batch twin's rule), the
    running min equals the true first arrival; the min() form also keeps
    replayed / reordered batches convergent to the batch
    `dedup.lsh_first_arrival` verdict."""

    def __init__(
        self,
        out_fields: list[str] | None = None,
        ttl_ms: int | None = None,
    ) -> None:
        self._out_fields = out_fields or [
            f.name for f in _LSH_CLAIM_OUT.fields
        ]
        self._ttl_ms = ttl_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        # TTL bounds the dedup horizon: an expired bucket claim forgets
        # its first arrival, so a later near-dup is admitted again —
        # the state-size/recall dial an unbounded 100 TB ingest turns
        if self._ttl_ms is not None:
            self._first = handle.getValueState(
                "first", _LSH_CLAIM_STATE, self._ttl_ms
            )
        else:
            self._first = handle.getValueState("first", _LSH_CLAIM_STATE)

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        batch = _concat_chunks(rows)
        if batch is None or not len(batch):
            yield pd.DataFrame(columns=self._out_fields)
            return
        first = self._first.get()[0] if self._first.exists() else None
        m = int(batch["doc_id"].min())
        first = m if first is None else min(first, m)
        self._first.update((first,))
        out = pd.DataFrame(
            {
                "doc_id": batch["doc_id"].astype("int64"),
                "is_first": batch["doc_id"].astype("int64") == first,
            }
        )
        for c in self._out_fields[2:]:
            out[c] = batch[c].values
        yield out[self._out_fields]

    def close(self) -> None:
        pass


class DocVerdictProcessor(StatefulProcessor):
    """Collects the per-band first-claim votes back on the doc key and
    emits ONE verdict row once all `bands` votes are in (they travel in
    the same micro-batch — one input row fans out to `bands` claim rows
    — so state here is transient; the accumulator only persists if a
    future engine splits a doc's claim rows across batches). Carry
    columns (identical on every claim row of a doc) pass through from
    the first row seen."""

    def __init__(self, bands: int, out_fields: list[str] | None = None) -> None:
        self._bands = bands
        self._out_fields = out_fields or [
            f.name for f in LSH_VERDICT_OUTPUT.fields
        ]

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._acc = handle.getValueState("acc", _LSH_VERDICT_STATE)

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        n_seen, n_first = self._acc.get() if self._acc.exists() else (0, 0)
        batch = _concat_chunks(rows)
        carry: dict = {}
        if batch is not None and len(batch):
            n_seen += int(len(batch))
            n_first += int(batch["is_first"].sum())
            carry = {c: batch[c].iloc[0] for c in self._out_fields[4:]}
        if n_seen >= self._bands:
            self._acc.clear()
            yield pd.DataFrame(
                [
                    {
                        "doc_id": int(key[0]),
                        "n_bands": n_seen,
                        "n_first": n_first,
                        "kept": n_seen == n_first,
                        **carry,
                    }
                ],
                columns=self._out_fields,
            )
        else:
            self._acc.update((n_seen, n_first))
            yield pd.DataFrame(columns=self._out_fields)

    def close(self) -> None:
        pass


def streaming_lsh_dedup(
    stream: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 12,
    bands: int = 4,
    shingle_n: int = 3,
    carry_cols: list[str] | None = None,
    state_ttl_ms: int | None = None,
) -> DataFrame:
    """Streaming MinHash-LSH near-dup gate — the streaming twin of
    ``dedup.lsh_first_arrival``, as ONE query with TWO chained
    transformWithState operators across the re-key seam (band bucket →
    doc), the `streaming_corpus_manifest_tws` topology.

    A doc is kept iff it is the first arrival on EVERY one of its band
    buckets; all arrivals claim their buckets. After any in-order batch
    sequence the emitted verdicts are doc-for-doc identical to the batch
    operator over the union of batches (t: test_streaming).

    Scale contract: signatures and band keys are computed in the
    STATELESS projection before any shuffle — document text never leaves
    its scan partition; both stateful exchanges carry (long, int, md5) /
    (long, bool) rows. State: one long per distinct bucket ever claimed,
    transient per-doc accumulators. ``state_ttl_ms`` bounds the dedup
    horizon for a truly unbounded ingest: expired bucket claims forget
    their first arrival (the state-size/recall dial) — setting it flips
    the claim stage to processingTime mode, the only mode TTL states
    are assignable under. Near-dup/LSH was previously documented as
    batch-only (streaming/jobs.py); this closes that gap for the
    single-pass first-arrival contract — pair-verified Jaccard dedup
    (`minhash_dedup_pairs`) stays batch.
    """
    from pyspark.sql import functions as F

    from flink_helloworld_spark.operators.dedup import (
        lsh_band_keys,
        minhash_signature_from_hashes,
        shingle_base_hash,
        shingles_from_words,
    )
    from flink_helloworld_spark.operators.text import _words

    carry = carry_cols or []
    carry_fields = [StructField(c, stream.schema[c].dataType) for c in carry]
    claim_out = StructType(list(_LSH_CLAIM_OUT.fields) + carry_fields)
    verdict_out = StructType(list(LSH_VERDICT_OUTPUT.fields) + carry_fields)

    rows_per = num_hashes // bands
    docs = stream.select(
        F.col(id_col).cast("long").alias("doc_id"),
        _words(F.col(text_col)).alias("ws"),
        *carry,
    )
    short = docs.where(F.size("ws") < shingle_n).select(
        "doc_id",
        F.lit(0).cast("int").alias("n_bands"),
        F.lit(0).cast("int").alias("n_first"),
        F.lit(True).alias("kept"),
        *carry,
    )
    hm = docs.where(F.size("ws") >= shingle_n).select(
        "doc_id",
        F.transform(
            shingles_from_words(F.col("ws"), shingle_n), shingle_base_hash
        ).alias("hm"),
        *carry,
    )
    sig = hm.select(
        "doc_id",
        minhash_signature_from_hashes(F.col("hm"), num_hashes).alias("sig"),
        *carry,
    )
    keys = lsh_band_keys(F.col("sig"), bands, rows_per)
    buckets = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(b).cast("int").alias("band_id"), k.alias("band_key"))
                    for b, k in enumerate(keys)
                ]
            )
        ).alias("bk"),
        *carry,
    ).select(
        "doc_id",
        F.col("bk.band_id").alias("band_id"),
        F.col("bk.band_key").alias("band_key"),
        *carry,
    )
    claims = buckets.groupBy("band_id", "band_key").transformWithStateInPandas(
        BucketClaimProcessor([f.name for f in claim_out.fields], state_ttl_ms),
        outputStructType=claim_out,
        outputMode="append",
        # TTL states are only assignable under a time mode
        timeMode="none" if state_ttl_ms is None else "processingTime",
    )
    verdicts = claims.groupBy("doc_id").transformWithStateInPandas(
        DocVerdictProcessor(bands, [f.name for f in verdict_out.fields]),
        outputStructType=verdict_out,
        outputMode="append",
        timeMode="none",
    )
    return verdicts.unionByName(short)


def streaming_embedding_dedup(
    stream: DataFrame,
    planes: int = 8,
    dims: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    state_ttl_ms: int | None = None,
) -> DataFrame:
    """Embedding-space streaming dedup gate — the vector-side twin of
    ``streaming_lsh_dedup`` and the streaming form of
    ``similarity.embedding_first_arrival``: a vector is admitted iff it
    is the first arrival in its hyperplane bucket (cosine-similar
    vectors agree on most sign bits, so near-dups collide; ``planes``
    is the recall dial, measured on planted data by
    similarity_recall_curve).

    ONE transformWithState operator — the hyperplane bucket is a single
    key per vector (unlike MinHash bands), so there is no re-key seam
    and no verdict stage. Emits ``(vec_id, bucket, kept)`` per arrival.

    Batch-parity precondition: this gate keeps the FIRST ARRIVAL per
    bucket, while the batch twin keeps the LOWEST ``vec_id`` — the
    pinned doc-for-doc parity therefore holds only when ids are
    MONOTONE in arrival order (the in-order contract every streaming
    gate here runs under, and what the parity tests replay). Under
    out-of-order arrival the verdicts converge per-bucket to the
    earliest-seen claimant, which may differ from the batch verdict.

    Scale contract: the bucket is computed in the STATELESS projection,
    so the embedding array never crosses the exchange — the stateful
    shuffle carries (long, long) rows. State: one long per bucket ever
    claimed (≤ 2^planes entries — bounded by construction, no TTL
    required; ``state_ttl_ms`` still composes for horizon semantics
    consistent with the text gate)."""
    from pyspark.sql import functions as F

    from flink_helloworld_spark.operators.similarity import hyperplane_bucket

    out = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("is_first", BooleanType()),
            StructField("bucket", LongType()),
        ]
    )
    b = stream.select(
        F.col(id_col).cast("long").alias("doc_id"),
        hyperplane_bucket(F.col(vec_col), planes, dims).alias("bucket"),
    )
    claims = b.groupBy("bucket").transformWithStateInPandas(
        BucketClaimProcessor([f.name for f in out.fields], state_ttl_ms),
        outputStructType=out,
        outputMode="append",
        timeMode="none" if state_ttl_ms is None else "processingTime",
    )
    return claims.select(
        F.col("doc_id").alias(id_col),
        "bucket",
        F.col("is_first").alias("kept"),
    )


def streaming_embedding_dedup_banded(
    stream: DataFrame,
    planes: int = 8,
    bands: int = 4,
    dims: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    state_ttl_ms: int | None = None,
) -> DataFrame:
    """Streaming banded (OR-construction) embedding gate — the TWS twin
    of ``similarity.embedding_first_arrival_banded`` and the vector-side
    ``streaming_lsh_dedup``: each arrival claims a bucket in ``bands``
    independent md5-rotated hyperplane sets and is admitted iff it is
    the first claimant on EVERY band. This removes the single-band
    gate's 2^planes admission ceiling (VERDICT r6 item 1): total
    capacity is now per-band-bucket first-arrival, recall rises with
    ``bands``, and a FALSE drop needs full sign agreement in some band.

    Topology: the same two chained transformWithState operators across
    the re-key seam as the text gate — (band, bucket) claims → per-doc
    verdict — reusing ``BucketClaimProcessor`` / ``DocVerdictProcessor``
    verbatim (the processors only see ``doc_id``).

    Scale contract: all band buckets are computed in the STATELESS
    projection, so the embedding never crosses an exchange — the claim
    shuffle carries (long, int, long) rows, the verdict shuffle
    (long, bool). State: one long per (band, bucket) ever claimed —
    ≈ bands × distinct-content claims (measured in SCALE_NOTES) —
    plus transient per-doc accumulators. Batch-parity precondition:
    first-arrival vs the batch twin's lowest-id — identical only under
    id-monotone arrival (the in-order contract the parity tests replay).
    ``state_ttl_ms`` bounds the dedup horizon exactly as in
    ``streaming_lsh_dedup``.
    """
    from pyspark.sql import functions as F

    from flink_helloworld_spark.operators.similarity import hyperplane_bucket

    incidence = stream.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).cast("int").alias("band_id"),
                        hyperplane_bucket(
                            F.col(vec_col), planes, dims, seed=f"{b}~"
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select(
        "doc_id",
        F.col("bb.band_id").alias("band_id"),
        F.col("bb.bucket").alias("bucket"),
    )
    claims = incidence.groupBy("band_id", "bucket").transformWithStateInPandas(
        BucketClaimProcessor(
            [f.name for f in _LSH_CLAIM_OUT.fields], state_ttl_ms
        ),
        outputStructType=_LSH_CLAIM_OUT,
        outputMode="append",
        timeMode="none" if state_ttl_ms is None else "processingTime",
    )
    verdicts = claims.groupBy("doc_id").transformWithStateInPandas(
        DocVerdictProcessor(
            bands, [f.name for f in LSH_VERDICT_OUTPUT.fields]
        ),
        outputStructType=LSH_VERDICT_OUTPUT,
        outputMode="append",
        timeMode="none",
    )
    return verdicts.select(
        F.col("doc_id").alias(id_col), "n_bands", "n_first", "kept"
    )


class VerifiedBucketClaimProcessor(StatefulProcessor):
    """Per-(band, bucket) OWNER state for the VERIFIED gate: the lowest
    arrival's id AND vector (the state-size trade the unverified gates
    avoid — ~dims doubles per claimed bucket instead of one long). A
    non-owner arrival is a verified collision iff its rounded cosine
    against the owner is >= threshold; it is emitted as
    ``is_first = NOT verified`` so the standard ``DocVerdictProcessor``
    (kept iff 'first' on every band) composes unchanged downstream.

    With ``sq_mn``/``sq_scale`` (offline-trained per-dimension SQ8
    params — the FAISS scalar-quantizer-training shape; VERDICT r7
    item 3) the owner state holds int8 CODES packed as ``dims`` BYTES
    instead of ``dims`` float64s (~8× smaller), and the cosine runs
    against the RECONSTRUCTED owner — the exact contract the batch
    twin's ``sq=True`` form replays with corpus-trained stats.
    ``ttl_ms`` bounds the dedup horizon like every other gate here
    (ADVICE r7: the verified gate holds the heaviest per-bucket state,
    so it is the one MOST in need of a bounded horizon).

    Malformed vectors (null or wrong length — ADVICE r7) no longer
    kill the query: they are unverifiable, so they are forgiven
    (``is_first = True``), matching the batch twin where a null vector
    yields a null cosine that never passes the threshold. A malformed
    FIRST arrival still claims its bucket (again like the batch twin's
    lowest-id rule) but stores an empty vector, so later collisions
    against it are likewise forgiven.

    In-order contract: with ids monotone in arrival order the owner
    equals the batch twin's lowest-id claimant; within a micro-batch
    rows are processed in id order so the batch's own minimum claims
    before later rows verify against it — doc-for-doc the batch
    ``embedding_first_arrival_verified`` verdict (parity-pinned)."""

    def __init__(
        self,
        threshold: float,
        dims: int,
        out_fields: list[str] | None = None,
        round_dp: int = 6,
        sq_mn: list[float] | None = None,
        sq_scale: list[float] | None = None,
        ttl_ms: int | None = None,
    ) -> None:
        self._threshold = threshold
        self._dims = dims
        self._round_dp = round_dp
        self._out_fields = out_fields or [
            f.name for f in _LSH_CLAIM_OUT.fields
        ]
        if (sq_mn is None) != (sq_scale is None):
            raise ValueError("sq_mn and sq_scale must be given together")
        if sq_mn is not None and (
            len(sq_mn) != dims or len(sq_scale) != dims
        ):
            raise ValueError(
                f"SQ params must have {dims} entries, got "
                f"{len(sq_mn)}/{len(sq_scale)}"
            )
        self._sq_mn = list(sq_mn) if sq_mn is not None else None
        self._sq_scale = list(sq_scale) if sq_scale is not None else None
        self._ttl_ms = ttl_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        from pyspark.sql.types import ArrayType, BinaryType

        vec_field = (
            StructField("owner_codes", BinaryType())
            if self._sq_mn is not None
            else StructField("owner_vec", ArrayType(DoubleType()))
        )
        schema = StructType([StructField("owner_id", LongType()), vec_field])
        if self._ttl_ms is not None:
            self._owner = handle.getValueState("owner", schema, self._ttl_ms)
        else:
            self._owner = handle.getValueState("owner", schema)

    def _encode(self, vec) -> bytes:
        """SQ8-encode one vector to ``dims`` bytes — sq_quantize's
        formula (half-away rounding, clamp to [0, 255], constant dims
        code to 0)."""
        import numpy as np

        x = np.asarray(vec, dtype=np.float64)
        mn = np.asarray(self._sq_mn)
        scale = np.asarray(self._sq_scale)
        with np.errstate(divide="ignore", invalid="ignore"):
            raw = (x - mn) / scale
        raw = np.floor(np.abs(raw) + 0.5) * np.sign(raw)  # half-away
        codes = np.clip(raw, 0.0, 255.0)
        codes[scale <= 0.0] = 0.0
        return bytes(codes.astype(np.uint8))

    def _decode(self, codes: bytes):
        import numpy as np

        c = np.frombuffer(codes, dtype=np.uint8).astype(np.float64)
        return np.asarray(self._sq_mn) + c * np.asarray(self._sq_scale)

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        import numpy as np

        batch = _concat_chunks(rows)
        if batch is None or not len(batch):
            yield pd.DataFrame(columns=self._out_fields)
            return
        batch = batch.sort_values("doc_id", kind="mergesort")
        ids = batch["doc_id"].to_numpy(dtype="int64")
        # tolerate null / ragged embeddings instead of crashing the
        # whole streaming query: invalid rows are unverifiable
        vecs = list(batch["vec"])
        valid = np.array(
            [v is not None and len(v) == self._dims for v in vecs]
        )
        mat = np.zeros((len(vecs), self._dims), dtype=np.float64)
        for i, v in enumerate(vecs):
            if valid[i]:
                mat[i] = np.asarray(v, dtype=np.float64)
        if self._owner.exists():
            owner_id, stored = self._owner.get()
            if stored is not None and len(stored):
                owner_vec = (
                    self._decode(stored)
                    if self._sq_mn is not None
                    else np.asarray(stored, dtype=np.float64)
                )
            else:
                owner_vec = None  # malformed first arrival claimed it
        else:
            owner_id = int(ids[0])
            if valid[0]:
                owner_vec = mat[0]
                stored = (
                    self._encode(vecs[0])
                    if self._sq_mn is not None
                    else [float(x) for x in owner_vec]
                )
                # under SQ the stored side is what later arrivals
                # compare against — reconstruct it for THIS batch too
                if self._sq_mn is not None:
                    owner_vec = self._decode(stored)
            else:
                owner_vec = None
                stored = b"" if self._sq_mn is not None else []
            self._owner.update((owner_id, stored))
        non_owner = ids != owner_id
        if owner_vec is None:
            verified = np.zeros(len(ids), dtype=bool)
        else:
            # rounded cosine vs the ONE owner — half-away rounding, the
            # engine's BLAS/oracle parity contract
            on = float(np.linalg.norm(owner_vec))
            norms = np.linalg.norm(mat, axis=1)
            denom = norms * on
            with np.errstate(divide="ignore", invalid="ignore"):
                cos = mat @ owner_vec / denom
            q = 10 ** self._round_dp
            cos = np.floor(np.abs(cos) * q + 0.5) / q * np.sign(cos)
            verified = non_owner & valid & (denom > 0) & (cos >= self._threshold)
        yield pd.DataFrame(
            {"doc_id": ids, "is_first": ~verified},
            columns=self._out_fields,
        )

    def close(self) -> None:
        pass


def streaming_embedding_dedup_verified(
    stream: DataFrame,
    threshold: float = 0.9,
    planes: int = 8,
    bands: int = 4,
    dims: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sq_mn: list[float] | None = None,
    sq_scale: list[float] | None = None,
    state_ttl_ms: int | None = None,
) -> DataFrame:
    """Streaming VERIFIED banded embedding gate — the TWS twin of
    ``similarity.embedding_first_arrival_verified``: a (band, bucket)
    collision only counts against a vector after an exact rounded
    cosine against the bucket's OWNER; admitted iff no band collision
    verifies at ``threshold``.

    Documented trades vs the unverified streaming gates, now shipped
    instead of deferred: (a) bucket state holds the owner's VECTOR —
    ~``dims`` doubles per claimed bucket instead of one long, or, with
    ``sq_mn``/``sq_scale`` (offline-trained per-dim SQ8 params, e.g.
    one bounded collect of ``similarity.sq_quantize``'s stats row),
    ~``dims`` BYTES of int8 codes (~8× leaner; the cosine then runs
    against the reconstructed owner — the ``sq=True`` batch twin's
    exact contract, whose recall grid shows zero false drops at
    threshold 0.9); (b) the embedding crosses the claim exchange once
    per band (verification needs it), so the claim shuffle carries
    (long, int, long, ``dims``×double) rows. The verdict seam and
    output contract are the standard two-operator topology —
    ``DocVerdictProcessor`` composes unchanged because
    ``is_first := NOT verified-collision`` maps the verified rule onto
    the kept-iff-first-everywhere contract.

    ``state_ttl_ms`` bounds the dedup horizon exactly as in the banded
    and LSH gates (ADVICE r7: this gate's per-bucket state is the
    heaviest of all, so the bounded horizon matters most here); an
    expired owner forgets, and the next arrival re-claims. Malformed
    vectors (null / wrong length) are forgiven rather than fatal —
    the batch twin's null-cosine tolerance.

    Emits ``(vec_id, n_bands, n_first, kept)``; ``n_verified`` of the
    batch twin = n_bands − n_first (parity-pinned under id-monotone
    arrival, the in-order contract of every gate here).
    """
    from pyspark.sql import functions as F

    from flink_helloworld_spark.operators.similarity import hyperplane_bucket

    incidence = stream.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(vec_col).cast("array<double>").alias("vec"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).cast("int").alias("band_id"),
                        hyperplane_bucket(
                            F.col(vec_col), planes, dims, seed=f"{b}~"
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select(
        "doc_id",
        "vec",
        F.col("bb.band_id").alias("band_id"),
        F.col("bb.bucket").alias("bucket"),
    )
    claims = incidence.groupBy("band_id", "bucket").transformWithStateInPandas(
        VerifiedBucketClaimProcessor(
            threshold,
            dims,
            [f.name for f in _LSH_CLAIM_OUT.fields],
            sq_mn=sq_mn,
            sq_scale=sq_scale,
            ttl_ms=state_ttl_ms,
        ),
        outputStructType=_LSH_CLAIM_OUT,
        outputMode="append",
        timeMode="none" if state_ttl_ms is None else "processingTime",
    )
    verdicts = claims.groupBy("doc_id").transformWithStateInPandas(
        DocVerdictProcessor(
            bands, [f.name for f in LSH_VERDICT_OUTPUT.fields]
        ),
        outputStructType=LSH_VERDICT_OUTPUT,
        outputMode="append",
        timeMode="none",
    )
    return verdicts.select(
        F.col("doc_id").alias(id_col), "n_bands", "n_first", "kept"
    )


def streaming_near_dedup_front(
    stream: DataFrame,
    cap: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    domain_col: str = "source",
    num_hashes: int = 12,
    bands: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """The NEAR-DUP streaming pretrain front: Gopher-core quality gate →
    LSH first-arrival near-dup gate → per-domain arrival cap, composed
    as ONE streaming query with THREE chained transformWithState
    operators across two re-key seams (band bucket → doc → domain).
    `streaming_pretrain_front` dedups exact content within a watermark;
    this form catches near-duplicates with unbounded horizon at one long
    of state per claimed bucket — the missing streaming stage that
    previously required a scheduled batch pass over the lake.

    Emits (doc_id, source, domain_rank, kept) for every doc that passes
    the gate AND the near-dup gate; the stateless quality gate runs
    FIRST so stateful operators only pay state for survivable docs.
    Output is doc-for-doc the sequential composition of the three batch
    rules under the in-order contract (t: test_streaming_properties).
    """
    from pyspark.sql import functions as F

    from flink_helloworld_spark.operators.text import _words

    ws = _words(F.col(text_col))
    n_words = F.size(ws)
    mean_wlen = (F.length(text_col) - (n_words - 1)).cast("double") / F.nullif(
        n_words.cast("double"), F.lit(0.0)
    )
    gated = stream.where(
        (n_words >= 5) & (mean_wlen >= 3.0) & (mean_wlen <= 10.0)
    )
    verdicts = streaming_lsh_dedup(
        gated,
        text_col=text_col,
        id_col=id_col,
        num_hashes=num_hashes,
        bands=bands,
        shingle_n=shingle_n,
        carry_cols=[domain_col],
    )
    survivors = verdicts.where(F.col("kept")).select(
        "doc_id", F.col(domain_col), F.col("doc_id").alias("seq")
    )
    return streaming_domain_cap(
        survivors, cap=cap, domain_col=domain_col, id_col="doc_id", seq_col="seq"
    )


# --------------------------------------------------------------------------
# Streaming heavy hitters: sharded Misra-Gries with mergeable-summary batching
# --------------------------------------------------------------------------

HEAVY_HITTERS_OUTPUT = StructType(
    [
        StructField("bucket", IntegerType()),
        StructField("item", StringType()),
        StructField("weight", LongType()),
        StructField("err_total", LongType()),
        StructField("n_seen", LongType()),
    ]
)

_HH_ROW_STATE = StructType(
    [StructField("item", StringType()), StructField("weight", LongType())]
)
_HH_META_STATE = StructType(
    [StructField("n_seen", LongType()), StructField("err_total", LongType())]
)


class HeavyHittersProcessor(StatefulProcessor):
    """Misra-Gries frequent-items sketch over an unbounded stream —
    bounded state (≤ ``capacity`` counters per bucket) with the classic
    deterministic guarantees, NOT a sampling estimate:

    - ``weight ≤ true_count ≤ weight + err_total`` for every tracked
      item (err_total = the bucket's accumulated decrement mass);
    - every item whose true bucket count exceeds
      ``n_seen / (capacity + 1)`` is GUARANTEED tracked;
    - when a bucket's distinct items never exceed ``capacity``, the
      sketch is EXACT (err_total = 0).

    Each micro-batch applies the mergeable-summaries batch step
    (Agarwal et al., PODS'12): exact batch counts merge into the state
    counters; if more than ``capacity`` survive, every counter drops by
    the (capacity+1)-th largest weight and non-positive counters leave
    — one decrement charged to ``err_total``. The guarantees hold for
    ANY arrival order / micro-batch split (the exact weights, like any
    MG summary, are split-dependent; the bounds are not).

    Emission contract = WeightedReservoirProcessor's: every batch
    re-emits the bucket's CURRENT tracked set stamped with ``n_seen``;
    consumers read the max-``n_seen`` emission per bucket.

    State is O(capacity) rows per bucket FOREVER — the entire point of
    a frequent-items sketch at 100 TB: 1024 buckets × 256 counters ≈
    8 MB of state for exact-bounded top talkers over any volume.
    """

    def __init__(self, capacity: int) -> None:
        self._cap = int(capacity)

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._items = handle.getListState("items", _HH_ROW_STATE)
        self._meta = handle.getValueState("meta", _HH_META_STATE)

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        weights: dict[str, int] = {r[0]: int(r[1]) for r in self._items.get()}
        n_seen, err_total = (
            self._meta.get() if self._meta.exists() else (0, 0)
        )
        batch = _concat_chunks(rows)
        if batch is not None and len(batch):
            n_seen += int(len(batch))
            for item, cnt in batch["item"].value_counts().items():
                weights[item] = weights.get(item, 0) + int(cnt)
            if len(weights) > self._cap:
                # (cap+1)-th largest weight is the decrement (ties on
                # weight broken by item so the step is deterministic)
                ordered = sorted(
                    weights.items(), key=lambda kv: (-kv[1], kv[0])
                )
                d = ordered[self._cap][1]
                weights = {k: v - d for k, v in ordered if v - d > 0}
                err_total += d
            self._items.clear()
            if weights:
                self._items.appendList(
                    [(k, v) for k, v in sorted(weights.items())]
                )
            self._meta.update((n_seen, err_total))
        out = [
            {
                "bucket": int(key[0]),
                "item": item,
                "weight": w,
                "err_total": err_total,
                "n_seen": n_seen,
            }
            for item, w in sorted(weights.items())
        ]
        yield pd.DataFrame(
            out, columns=[f.name for f in HEAVY_HITTERS_OUTPUT.fields]
        )

    def close(self) -> None:
        pass


def streaming_heavy_hitters(
    stream: DataFrame,
    item_col: str,
    capacity: int = 256,
    n_buckets: int = 32,
) -> DataFrame:
    """Sharded streaming frequent-items: items hash into ``n_buckets``
    key groups (every occurrence of an item lands in ONE bucket, so
    per-bucket Misra-Gries guarantees apply to the item's full count),
    each group keeps a ``capacity``-counter sketch. The streaming twin
    of the batch ``cms_heavy_hitters`` estimate — deterministic bounds
    instead of probabilistic ones, and O(n_buckets × capacity) state
    instead of a second pass.
    """
    from pyspark.sql import functions as F

    # null items carry no count (COUNT semantics, same as the KMV twin's
    # isNotNull gate) — letting them through would inflate n_seen while
    # value_counts() drops NaN, breaking the exact-under-capacity contract
    src = stream.where(F.col(item_col).isNotNull()).select(
        F.pmod(F.xxhash64(F.col(item_col)), F.lit(int(n_buckets)))
        .cast("int")
        .alias("bucket"),
        F.col(item_col).cast("string").alias("item"),
    )
    return src.groupBy("bucket").transformWithStateInPandas(
        HeavyHittersProcessor(capacity),
        outputStructType=HEAVY_HITTERS_OUTPUT,
        outputMode="append",
        timeMode="none",
    )


# --------------------------------------------------------------------------
# Streaming distinct-count sketch: per-key KMV with exact batch parity
# --------------------------------------------------------------------------

KMV_OUTPUT = StructType(
    [
        StructField("k", StringType()),
        StructField("kth_min", LongType()),
        StructField("n_kept", LongType()),
        StructField("distinct_estimate", DoubleType()),
        StructField("n_seen", LongType()),
    ]
)

_KMV_ROW_STATE = StructType([StructField("h", LongType())])


class KmvDistinctProcessor(StatefulProcessor):
    """Per-key K-Minimum-Values distinct-count sketch over an unbounded
    stream — O(k) state per key forever, and (unlike the MG heavy-hitter
    or the arrival-order domain cap) a sketch whose value is
    ORDER-INDEPENDENT: the k smallest distinct hashes of a set don't
    depend on arrival order or batch splits, so the streaming sketch is
    BIT-IDENTICAL to batch ``rollups.kmv_distinct`` over the same rows —
    full batch parity, the reservoir-twin contract.

    The upstream column expression computes the SAME md5-derived 60-bit
    hash as the batch operator (``rollups._h60``), so estimates (the
    (k-1)/(kth_min/2^60) estimator, exact below k) agree exactly.

    Emission: each batch re-emits the key's current sketch summary
    stamped with n_seen; consumers take the max-n_seen row per key.
    """

    def __init__(self, k: int) -> None:
        self._k = int(k)

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._mins = handle.getListState("mins", _KMV_ROW_STATE)
        self._n = handle.getValueState("n", _COUNT_STATE)

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        cur = sorted(int(r[0]) for r in self._mins.get())
        (n_seen,) = self._n.get() if self._n.exists() else (0,)
        batch = _concat_chunks(rows)
        if batch is not None and len(batch):
            n_seen += int(len(batch))
            merged = sorted(set(cur) | set(int(h) for h in batch["h"]))
            cur = merged[: self._k]
            self._mins.clear()
            if cur:
                self._mins.appendList([(h,) for h in cur])
            self._n.update((n_seen,))
        if cur:
            kth = cur[-1]
            n_kept = len(cur)
            if n_kept < self._k:
                est = float(n_kept)
            elif kth == 0:
                # ~2^-60 event; the batch twin's SQL division yields
                # Infinity rather than raising — match it instead of
                # killing the streaming query with ZeroDivisionError
                est = float("inf")
            else:
                est = float(self._k - 1) / (float(kth) / float(1 << 60))
        else:
            kth, n_kept, est = 0, 0, 0.0
        yield pd.DataFrame(
            [
                {
                    "k": key[0],
                    "kth_min": kth,
                    "n_kept": n_kept,
                    "distinct_estimate": est,
                    "n_seen": n_seen,
                }
            ],
            columns=[f.name for f in KMV_OUTPUT.fields],
        )

    def close(self) -> None:
        pass


def streaming_kmv_distinct(
    stream: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 64,
) -> DataFrame:
    """Streaming per-key distinct-count sketch: the exact-parity twin of
    batch ``rollups.kmv_distinct`` (same md5 hash, same estimator, same
    under-k exactness) with O(k) state per key. The windowless
    approx-COUNT-DISTINCT a live ingest dashboard needs without holding
    the value set."""
    from pyspark.sql import functions as F

    from flink_helloworld_spark.operators.rollups import _h60

    src = stream.where(F.col(value_col).isNotNull()).select(
        F.col(group_col).cast("string").alias("k"),
        _h60(F.col(value_col).cast("string")).alias("h"),
    )
    return src.groupBy("k").transformWithStateInPandas(
        KmvDistinctProcessor(k),
        outputStructType=KMV_OUTPUT,
        outputMode="append",
        timeMode="none",
    )


IVF_POSTING_OUTPUT = StructType(
    [
        StructField("centroid_id", LongType()),
        StructField("member_id", LongType()),
        StructField("mvec", ArrayType(DoubleType())),
    ]
)

_IVF_MEMBER_KEY = StructType([StructField("member_id", LongType())])
_IVF_MEMBER_VAL = StructType([StructField("one", IntegerType())])


class PostingAppendProcessor(StatefulProcessor):
    """Per-CELL posting-list maintenance for the streaming IVF ingest
    (the streaming twin of ``similarity.ivf_index_append`` — VERDICT r8
    item 2): keyed by ``centroid_id``, MapState holds one entry per
    member ever posted to this cell, and an arrival is emitted as a NEW
    posting row iff its ``member_id`` has not posted here before —
    first-arrival commit, the ``BucketClaimProcessor`` contract applied
    to posting lists, so at-least-once redelivery upstream still grows
    the artifact exactly once per vector.

    State: ONE MapState entry (a long key) per distinct posted member —
    the vector itself is NOT state; it rides the emitted posting row
    straight to the sink. O(distinct members) forever, flat under
    redelivery, and ``ttl_ms`` bounds the dedup horizon exactly as in
    the LSH/embedding gates (after expiry a re-arrival re-posts; the
    downstream compaction dedups on member_id)."""

    def __init__(self, ttl_ms: int | None = None) -> None:
        self._ttl_ms = ttl_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        if self._ttl_ms is not None:
            self._seen = handle.getMapState(
                "members", _IVF_MEMBER_KEY, _IVF_MEMBER_VAL, self._ttl_ms
            )
        else:
            self._seen = handle.getMapState(
                "members", _IVF_MEMBER_KEY, _IVF_MEMBER_VAL
            )

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in IVF_POSTING_OUTPUT.fields]
        for pdf in rows:
            if pdf is None or not len(pdf):
                continue
            keep = []
            for i, mid in enumerate(pdf["member_id"]):
                mk = (int(mid),)
                if not self._seen.containsKey(mk):
                    self._seen.updateValue(mk, (1,))
                    keep.append(i)
            if keep:
                yield pdf.iloc[keep][cols]

    def close(self) -> None:
        pass


def streaming_ivf_ingest(
    stream: DataFrame,
    index: DataFrame,
    n_super_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_dp: int = 6,
    state_ttl_ms: int | None = None,
) -> DataFrame:
    """Streaming IVF index MAINTENANCE — the transformWithState twin of
    the batch ``ivf_index_append`` seam (VERDICT r8 'next round' item
    2): vectors arriving on an unbounded stream are routed through the
    FROZEN persisted quantizer (supers + cells of a ``build_ivf_index``
    artifact, never retrained) into incrementally growing posting
    lists. The emitted rows ARE posting rows ``(centroid_id, member_id,
    mvec)`` — append them to the lake artifact (or feed a
    ``bucketBy(centroid_id)`` writer) and ``ivf_index_query`` scans the
    grown index with no other change.

    Parity contract (test-pinned across >=3 micro-batch splits AND
    redelivery): routing is per-row against frozen arrays
    (``similarity.route_frozen_np``, byte-identical to the batch
    ``_route_cells`` rank-1 routing), so the UNION of emitted postings
    equals ``ivf_index_append(index, [], all_rows_distinct)`` no matter
    how the stream is chopped — the KMV order-independence argument,
    here because routing is stateless and commitment is first-arrival
    per (cell, member).

    Scale shape: the quantizer is ONE bounded collect at plan time
    (C + sqrt(C) rows — index metadata, the ``_assign_cells_blas``
    contract) broadcast to the routing workers; the stateless
    ``mapInPandas`` route adds no shuffle; the single exchange is the
    groupBy(centroid_id) claim shuffle carrying (long, long, vector)
    posting rows; MapState holds one long key per distinct posted
    member — flat under redelivery, linear in distinct ingest."""
    import numpy as np
    from pyspark.sql import functions as F

    from flink_helloworld_spark.operators.similarity import (
        collect_ivf_quantizer,
        route_frozen_np,
    )

    quant = collect_ivf_quantizer(index)
    spark = stream.sparkSession
    b_quant = spark.sparkContext.broadcast(quant)

    src = stream.select(
        F.col(id_col).cast("long").alias("member_id"),
        F.col(vec_col).cast("array<double>").alias("mvec"),
    )

    def route(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.array(list(pdf["mvec"]), dtype=np.float64)
            cells = route_frozen_np(
                mat, b_quant.value, n_super_probe, round_dp
            )
            hit = cells >= 0
            if not hit.any():
                continue
            out = pdf.loc[hit, ["member_id", "mvec"]].copy()
            out.insert(0, "centroid_id", cells[hit])
            yield out

    routed = src.mapInPandas(
        route, "centroid_id long, member_id long, mvec array<double>"
    )
    return routed.groupBy("centroid_id").transformWithStateInPandas(
        PostingAppendProcessor(state_ttl_ms),
        outputStructType=IVF_POSTING_OUTPUT,
        outputMode="append",
        timeMode="none" if state_ttl_ms is None else "processingTime",
    )


def streaming_ivf_delete(
    stream: DataFrame,
    postings: DataFrame,
    id_col: str = "vec_id",
    state_ttl_ms: int | None = None,
    manifest: DataFrame | None = None,
) -> DataFrame:
    """Streaming index DELETION — the live twin of
    ``similarity.ivf_index_delete``, completing the streaming
    maintenance pair (ingest grows the artifact, this one retracts
    from it): delete requests (ids) arriving on an unbounded stream
    emit TOMBSTONE posting rows ``(centroid_id, member_id, mvec=NULL)``
    exactly once per (cell, member) — append them to the same lake
    artifact and ``live_postings`` / ``ivf_store_compact`` consume
    them with no other change.

    Each id finds its home cell through a STREAM-STATIC equi-join
    against the LIVE member keys. Pass ``manifest`` (the persisted
    ``ivf_manifest_read`` member→cell projection,
    ``member_bucket``-partitioned two-long rows) and the per-trigger
    static-side read is manifest-sized — it no longer scales with the
    posting payload (vectors) and does no per-batch tombstone
    resolution; this is the operating form at scale. Without it the
    lookup derives from ``live_postings(postings)`` inline (the
    self-contained form — full-artifact read per micro-batch, the
    documented cost of id-only deletes at sandbox scale). Either way
    the lookup side excludes already-tombstoned members, so a member
    deleted in the artifact resolves like an absent id and emits NO
    second tombstone (the batch ``ivf_index_delete`` 'deleting twice'
    contract). Absent ids drop at the join (deleting nothing is a
    no-op, the batch contract).

    Exactly-once under at-least-once redelivery rides the SAME
    ``PostingAppendProcessor`` the ingest twin uses — first-arrival
    commit per (cell, member) on MapState, one long per distinct
    deleted member forever (``state_ttl_ms`` bounds the horizon; a
    post-expiry re-delete re-emits a tombstone, and compaction folds
    duplicates away)."""
    from pyspark.sql import functions as F

    from flink_helloworld_spark.operators.similarity import live_postings

    mvec_t = postings.schema["mvec"].dataType
    ids = stream.select(F.col(id_col).cast("long").alias("member_id"))
    if manifest is not None:
        lookup = manifest.select("centroid_id", "member_id")
    else:
        lookup = (
            live_postings(postings)
            .select("centroid_id", "member_id")
            .distinct()
        )
    tomb = ids.join(lookup, "member_id").select(
        F.col("centroid_id").cast("long").alias("centroid_id"),
        F.col("member_id").cast("long").alias("member_id"),
        F.lit(None).cast(mvec_t).alias("mvec"),
    )
    return tomb.groupBy("centroid_id").transformWithStateInPandas(
        PostingAppendProcessor(state_ttl_ms),
        outputStructType=IVF_POSTING_OUTPUT,
        outputMode="append",
        timeMode="none" if state_ttl_ms is None else "processingTime",
    )


TEXT_POSTING_OUTPUT = StructType(
    [
        StructField("term", StringType()),
        StructField("doc_id", LongType()),
        StructField("pos", LongType()),
    ]
)
TEXT_DELETE_OUTPUT = StructType([StructField("doc_id", LongType())])
_DOC_SEEN_STATE = StructType([StructField("one", LongType())])


class DocFirstArrivalProcessor(StatefulProcessor):
    """First-arrival commit keyed by ``doc_id`` — the exactly-once seam
    for the TEXT index's streaming maintenance, the
    ``PostingAppendProcessor`` contract applied to documents: the first
    time a doc id is ever seen, its payload is emitted; redeliveries
    (same trigger or later) emit nothing. State is ONE ValueState flag
    per distinct doc forever (``ttl_ms`` bounds the horizon; after
    expiry a re-arrival re-emits and the store-side set/compaction
    semantics absorb the duplicate).

    ``emit='postings'`` tokenizes the doc's text EXACTLY like the
    engine-wide ``_words`` split (``split(' ')``, empty tokens
    dropped — the BM25/term_postings contract) and emits the
    ``positional_postings`` rows ``(term, doc_id, pos)``;
    ``emit='delete'`` emits the single ``(doc_id,)`` row a
    ``postings_store_delete`` set append consumes."""

    def __init__(self, emit: str, ttl_ms: int | None = None) -> None:
        assert emit in ("postings", "delete")
        self._emit = emit
        self._ttl_ms = ttl_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        if self._ttl_ms is not None:
            self._seen = handle.getValueState(
                "seen", _DOC_SEEN_STATE, self._ttl_ms
            )
        else:
            self._seen = handle.getValueState("seen", _DOC_SEEN_STATE)

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        if self._seen.exists():
            return
        first = None
        for pdf in rows:
            if pdf is not None and len(pdf):
                first = pdf.iloc[0]
                break
        if first is None:
            return
        self._seen.update((1,))
        doc_id = int(key[0])
        if self._emit == "delete":
            yield pd.DataFrame({"doc_id": [doc_id]})
            return
        text = first["text"]
        words = [
            w for w in (text.split(" ") if isinstance(text, str) else [])
            if w != ""
        ]
        if words:
            yield pd.DataFrame(
                {
                    "term": words,
                    "doc_id": [doc_id] * len(words),
                    "pos": list(range(1, len(words) + 1)),
                }
            )

    def close(self) -> None:
        pass


def streaming_postings_ingest(
    stream: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    state_ttl_ms: int | None = None,
) -> DataFrame:
    """Streaming TEXT-INDEX ingest — the live twin of
    ``ranking.positional_postings`` (the text seam's analog of
    ``streaming_ivf_ingest``): documents arriving on an unbounded
    stream emit their positional posting rows exactly once per doc
    under at-least-once redelivery; append the output to the
    ``postings_store_write`` artifact and every probe/BM25/phrase
    consumer composes with no other change. State: one flag per
    distinct doc (TTL-bounded); the postings themselves ride the
    emitted rows, never state."""
    from pyspark.sql import functions as F

    src = stream.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(text_col).cast("string").alias("text"),
    )
    return src.groupBy("doc_id").transformWithStateInPandas(
        DocFirstArrivalProcessor("postings", state_ttl_ms),
        outputStructType=TEXT_POSTING_OUTPUT,
        outputMode="append",
        timeMode="none" if state_ttl_ms is None else "processingTime",
    )


def streaming_postings_delete(
    stream: DataFrame,
    id_col: str = "doc_id",
    state_ttl_ms: int | None = None,
) -> DataFrame:
    """Streaming TEXT-INDEX deletion — the live twin of
    ``ranking.postings_store_delete``: doc ids arriving on a stream
    emit one ``(doc_id,)`` row each, first-arrival-committed, for the
    store's ``_deletes`` set. The set is distinct-on-read, so
    exactly-once here is a SIZE guarantee (the side table stays
    delta-sized under redelivery), not a correctness requirement —
    the same division of labor as the ivf tombstone/compaction pair."""
    from pyspark.sql import functions as F

    src = stream.select(F.col(id_col).cast("long").alias("doc_id"))
    return src.groupBy("doc_id").transformWithStateInPandas(
        DocFirstArrivalProcessor("delete", state_ttl_ms),
        outputStructType=TEXT_DELETE_OUTPUT,
        outputMode="append",
        timeMode="none" if state_ttl_ms is None else "processingTime",
    )


RATE_ANOMALY_OUTPUT = StructType(
    [
        StructField("k", StringType()),
        StructField("bucket", LongType()),
        StructField("cnt", LongType()),
        StructField("ewma_prev", DoubleType()),
        StructField("score", DoubleType()),
        StructField("is_anomaly", BooleanType()),
        # 'main' = closed-bucket verdict (batch-parity row);
        # 'late' = events for an already-closed bucket (W11
        # sideOutputLateData pattern: tagged, never silently dropped);
        # 'overflow' = events beyond the max-gap horizon (bounded
        # worker protection — see RateAnomalyProcessor)
        StructField("channel", StringType()),
    ]
)

_RATE_CUR_STATE = StructType(
    [
        StructField("bucket", LongType()),
        StructField("cnt", LongType()),
        StructField("rn", LongType()),
    ]
)
_RATE_RING_ROW = StructType([StructField("c", LongType())])


class RateAnomalyProcessor(StatefulProcessor):
    """Per-key LIVE twin of ``rollups.rate_anomaly``: a bucket's verdict
    is emitted the moment a LATER bucket's first event closes it (the
    monitor fires while the storm is still running, not at batch time).
    Gap buckets between the closed bucket and the next arrival emit
    zero-count verdicts, so the dense-timeline semantics — and the
    dyadic EWMA values, computed with the identical 2^-i exact-double
    kernel — match the batch operator row-for-row.

    State per key: the open (bucket, cnt, rn) triple plus a ring of the
    last ``taps`` CLOSED bucket counts — O(taps) longs forever,
    volume-independent. Parity precondition: per-key non-decreasing
    bucket arrival (the in-order contract every batch/streaming twin
    here replays). Two departures from it are SURFACED, never silent
    (the W11 ``sideOutputLateData`` pattern — tagged rows on the same
    stream, split by ``channel``):

    - ``channel='late'``: events for an already-closed bucket. One row
      per (key, late bucket) per trigger with ``cnt`` = late-event
      count; kernel columns are NULL (the verdict for that bucket
      already shipped and is immutable). Main-channel rows are
      byte-identical whether or not late events arrive.
    - ``channel='overflow'``: an arrival whose gap from the open
      bucket exceeds ``max_gap_buckets``. The batch twin distributes
      its dense zero-fill explode across the cluster, but here ONE
      Python worker would synchronously emit gap/bucket_ms rows in a
      single trigger — a far-future/corrupt timestamp must not stall
      the query or balloon memory. Such events do not advance the
      kernel; they surface on the overflow channel (cnt = event
      count, kernel columns NULL). A deployment with real gaps above
      the horizon raises ``max_gap_buckets`` consciously. The horizon
      also guards the FIRST arrival in reverse: a key whose first-ever
      event carries a corrupt far-future timestamp becomes the open
      bucket blind (no earlier state to check against), but as soon as
      a legitimate event lands more than ``max_gap_buckets`` BELOW an
      open bucket that has produced no verdict yet, the anchor is
      recognized as the corrupt one — it is surfaced on the overflow
      channel and the key re-anchors to the legitimate bucket (no
      shipped verdict is rewritten; in-order streams never take the
      branch).

    The key's final open bucket is never emitted (nothing closes it)
    — the batch twin's last row per key.
    """

    def __init__(
        self,
        taps: int,
        threshold: float,
        min_count: int,
        bucket_ms: int,
        max_gap_buckets: int = 10_000,
    ) -> None:
        self._taps = int(taps)
        self._threshold = float(threshold)
        self._min_count = int(min_count)
        self._bucket_ms = int(bucket_ms)
        self._max_gap = int(max_gap_buckets)

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._cur = handle.getValueState("cur", _RATE_CUR_STATE)
        self._ring = handle.getListState("ring", _RATE_RING_ROW)

    def _verdict(self, key, bucket, cnt, rn, ring):
        ew = 0.0
        for i, c in enumerate(ring[: self._taps], start=1):
            ew += float(c) * (2.0 ** -i)
        score = (float(cnt) / ew) if ew > 0 else None
        anom = bool(
            rn > self._taps
            and cnt >= self._min_count
            and (ew == 0.0 or float(cnt) >= self._threshold * ew)
        )
        return {
            "k": key,
            "bucket": bucket,
            "cnt": cnt,
            "ewma_prev": ew,
            "score": score,
            "is_anomaly": anom,
            "channel": "main",
        }

    @staticmethod
    def _side(key, bucket, cnt, channel):
        # late/overflow rows carry the raw event count only; the EWMA
        # kernel never sees them, so its columns are NULL
        return {
            "k": key,
            "bucket": bucket,
            "cnt": cnt,
            "ewma_prev": None,
            "score": None,
            "is_anomaly": None,
            "channel": channel,
        }

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        batch = _concat_chunks(rows)
        if batch is None or not len(batch):
            return
        if self._cur.exists():
            cur_b, cur_c, rn = self._cur.get()
        else:
            cur_b, cur_c, rn = None, 0, 0
        ring = [int(r[0]) for r in self._ring.get()]  # most-recent-first
        out = []
        counts = batch.groupby("bucket").size().sort_index()
        for bucket, n in counts.items():
            bucket, n = int(bucket), int(n)
            if cur_b is None:
                cur_b, cur_c = bucket, n
                continue
            if bucket == cur_b:
                cur_c += n
                continue
            if bucket < cur_b:  # late into a closed bucket: side-output
                if (
                    rn == 0
                    and (cur_b - bucket) // self._bucket_ms > self._max_gap
                ):
                    # the open bucket never closed into a verdict and
                    # sits beyond the gap horizon ABOVE this arrival:
                    # the anchor itself is the corrupt far-future
                    # timestamp (a first-ever event the cur_b-is-None
                    # branch had to accept blind — there is no earlier
                    # state to check against). Without this, every
                    # legitimate event would route to 'late' forever
                    # with no main-channel verdicts. Re-anchor to the
                    # arriving bucket and surface the corrupt one on
                    # the overflow channel; rn == 0 guarantees no
                    # shipped verdict is rewritten, and an in-order
                    # stream never takes this branch (batch parity
                    # untouched).
                    out.append(self._side(key[0], cur_b, cur_c, "overflow"))
                    cur_b, cur_c = bucket, n
                    continue
                out.append(self._side(key[0], bucket, n, "late"))
                continue
            if (bucket - cur_b) // self._bucket_ms > self._max_gap:
                # beyond the gap horizon: bounded-output protection —
                # surface instead of emitting gap/bucket_ms zero rows
                out.append(self._side(key[0], bucket, n, "overflow"))
                continue
            # close cur, then emit the zero-count gap buckets
            b = cur_b
            while b < bucket:
                cnt_b = cur_c if b == cur_b else 0
                rn += 1
                out.append(self._verdict(key[0], b, cnt_b, rn, ring))
                ring = [cnt_b] + ring[: self._taps - 1]
                b += self._bucket_ms
            cur_b, cur_c = bucket, n
        self._cur.update((cur_b, cur_c, rn))
        self._ring.clear()
        if ring:
            self._ring.appendList([(c,) for c in ring])
        if out:
            yield pd.DataFrame(
                out, columns=[f.name for f in RATE_ANOMALY_OUTPUT.fields]
            )

    def close(self) -> None:
        pass


def streaming_rate_anomaly(
    stream: DataFrame,
    key_col: str,
    time_col: str,
    bucket_ms: int = 3_600_000,
    taps: int = 16,
    threshold: float = 4.0,
    min_count: int = 8,
    max_gap_buckets: int = 10_000,
) -> DataFrame:
    """Streaming EWMA rate-spike monitor — the live twin of
    ``rollups.rate_anomaly`` (see ``RateAnomalyProcessor``): per-key
    bucket verdicts emitted as soon as the bucket closes, exact-dyadic
    EWMA parity with the batch operator row-for-row under in-order
    arrival (test-pinned across micro-batch splits). O(taps) state per
    key forever.

    The output carries a ``channel`` column: ``'main'`` verdicts are
    the batch-parity rows; ``'late'`` rows surface events for
    already-closed buckets and ``'overflow'`` rows surface arrivals
    beyond the ``max_gap_buckets`` dense-fill horizon — split with
    ``out.where("channel = 'main'")`` / ``.where("channel != 'main'")``
    exactly like the window family's sideOutputLateData."""
    from pyspark.sql import functions as F

    from flink_helloworld_spark.functions import epoch_millis

    tsm = epoch_millis(time_col)
    src = stream.select(
        F.col(key_col).cast("string").alias("k"),
        (tsm - F.pmod(tsm, F.lit(bucket_ms))).cast("long").alias("bucket"),
    )
    return src.groupBy("k").transformWithStateInPandas(
        RateAnomalyProcessor(
            taps, threshold, min_count, bucket_ms, max_gap_buckets
        ),
        outputStructType=RATE_ANOMALY_OUTPUT,
        outputMode="append",
        timeMode="none",
    )
