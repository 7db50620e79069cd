"""End-to-end streaming jobs (reference HelloWorldFlink.java:61-252).

The reference main(): parallel waybill generator → Kafka → consumer →
Elasticsearch idempotent upsert. Here: rate-source generator → column
transforms → keyed idempotent upsert sink (the Kafka hop is config-only
in this container — kafka.py wires it where a broker exists; the sink
IS the ES-upsert equivalent).

Also the streaming dedup surface (north-star): exact streaming dedup via
``dropDuplicates``/``dropDuplicatesWithinWatermark`` — Spark's native
watermark-scoped dedup keeps state bounded, the 100 TB requirement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_helloworld_spark.sources.generators import waybill_c_stream
from flink_helloworld_spark.streaming.sinks import KeyedUpsertSink


def waybill_etl_job(
    spark: SparkSession,
    sink_path: str,
    checkpoint_dir: str,
    rows_per_second: int = 100,
    rows_per_trigger: int | None = None,
):
    """Generator → enrich → keyed upsert: the HelloWorldFlink main ETL
    reshaped Spark-first. Returns (sink, StreamingQuery) — caller stops
    the query; the sink is queryable parquet keyed by waybill_code.

    ``rows_per_trigger``: expected input rows per micro-batch — when
    given, the stateful partition count is auto-sized by the sqrt
    capacity law (``_util.suggest_stateful_partitions``) before the
    first start pins it at the checkpoint; the session-global conf is
    restored after .start() so shared-session batch work keeps its
    parallelism."""
    from flink_helloworld_spark.streaming._util import (
        apply_stateful_partitions,
    )

    _prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    # try/finally (ADVICE r7): if plan building or .start() raises, the
    # session-global conf must not stay clobbered for later batch work
    try:
        apply_stateful_partitions(spark, rows_per_trigger)
        stream = waybill_c_stream(spark, rows_per_second)
        enriched = stream.select(
            "waybill_code",
            "waybill_sign",
            "site_code",
            "site_name",
            "seq",
            F.length("waybill_sign").alias("sign_len"),
            F.unix_millis(F.col("emit_time")).alias("ts"),
        )
        sink = KeyedUpsertSink(sink_path, "waybill_code", "seq")
        query = (
            enriched.writeStream.foreachBatch(sink)
            .option("checkpointLocation", checkpoint_dir)
            .start()
        )
    finally:
        # the partition count is pinned at the first checkpoint above;
        # restore the session-global conf for subsequent batch work
        spark.conf.set("spark.sql.shuffle.partitions", _prev_parts)
    return sink, query


def streaming_dedup_exact(
    stream: DataFrame, keys: list[str], time_col: str | None = None, delay: str = "10 minutes"
) -> DataFrame:
    """Exact streaming dedup. With ``time_col``, uses
    ``dropDuplicatesWithinWatermark``: duplicate arrivals inside the
    watermark window are suppressed and state for old keys is evicted as
    the watermark advances — bounded state, unlike plain dropDuplicates
    whose key set grows forever (only safe on bounded key spaces)."""
    if time_col is None:
        return stream.dropDuplicates(keys)
    return stream.withWatermark(time_col, delay).dropDuplicatesWithinWatermark(keys)


def streaming_window_topn_job(
    stream: DataFrame,
    sink_path: str,
    checkpoint_dir: str,
    time_col: str = "ts",
    key_col: str = "event_type",
    size: str = "1 day",
    n: int = 3,
    delay: str = "10 minutes",
    rows_per_trigger: int | None = None,
):
    """Continuous Window Top-N (Flink SQL's streaming Top-N): per
    tumbling window, maintain the top-``n`` keys by count as events
    arrive, emitting updates into the keyed upsert sink.

    Spark shape: a watermarked windowed count runs in UPDATE mode (the
    aggregation state is watermark-bounded), so a micro-batch carries
    only the CHANGED (window, key) aggregate rows. Ranking a batch alone
    would therefore drop previously-seen contenders — so the upsert sink
    holds the aggregate rows keyed by window#key (the ES-document analog)
    and each batch re-ranks the sink's state for just the touched windows
    into a second upsert table keyed by window#rank. Both upserts ride
    the sink's batch-id ledger: replays are no-ops end-to-end. Rank slots
    only ever get overwritten (counts are monotone), never orphaned.

    Returns (agg_sink, topn_sink, query); topn_sink's parquet is the
    live Top-N table. ``rows_per_trigger``: expected input rows per
    micro-batch — when given, the stateful partition count is
    auto-sized by the sqrt capacity law before the first start pins it.
    The session-global partition conf is restored after the internal
    .start() (the count is already pinned at the checkpoint by then).
    """
    from flink_helloworld_spark.streaming._util import (
        apply_stateful_partitions,
    )

    _sess = stream.sparkSession
    _prev_parts = _sess.conf.get("spark.sql.shuffle.partitions")
    # try/finally (ADVICE r7): nothing between the conf override and
    # .start() may leak the session-global partition count on error
    try:
        apply_stateful_partitions(_sess, rows_per_trigger)
        agg = (
            stream.withWatermark(time_col, delay)
            .groupBy(F.window(time_col, size).alias("w"), key_col)
            .agg(F.count(F.lit(1)).alias("cnt"))
            .select(
                F.col("w.start").alias("window_start"),
                F.col(key_col).alias("key"),
                "cnt",
            )
        )
        agg_sink = KeyedUpsertSink(f"{sink_path}/agg", "window_key", "cnt")
        # rank slots order by batch RECENCY, not cnt: when a new occupant
        # TIES the old occupant's count at a slot, the freshest ranking must
        # win — ordering by cnt would nondeterministically keep the stale
        # row, duplicating one key across two slots and dropping the other
        topn_sink = KeyedUpsertSink(f"{sink_path}/topn", "window_rank", "_ver")

        def rank_and_upsert(batch: DataFrame, batch_id: int) -> None:
            from pyspark.sql import Window as Wspec

            if batch.isEmpty():
                return
            batch = batch.withColumn(
                "window_key",
                F.concat_ws("#", F.col("window_start").cast("string"), "key"),
            ).localCheckpoint(eager=True)  # update-mode batch is consumed twice
            agg_sink(batch, batch_id)
            # current aggregate state for the touched windows (tiny slice:
            # |touched windows| x |keys|), selected executor-side via a
            # broadcast semi-join against the batch's distinct windows — no
            # driver collect, so a late-data-heavy stream with many open
            # windows never hops window metadata through the driver
            touched = batch.select("window_start").distinct()
            state = agg_sink.read(batch.sparkSession).join(
                F.broadcast(touched), "window_start", "left_semi"
            )
            ranked = (
                state.withColumn(
                    "rank",
                    F.row_number().over(
                        Wspec.partitionBy("window_start").orderBy(
                            F.col("cnt").desc(), F.col("key")
                        )
                    ),
                )
                .where(F.col("rank") <= n)
                .withColumn(
                    "window_rank",
                    F.concat_ws(
                        "#", F.col("window_start").cast("string"), F.col("rank")
                    ),
                )
                .select(
                    "window_rank",
                    "window_start",
                    "rank",
                    "key",
                    "cnt",
                    F.lit(batch_id).alias("_ver"),
                )
            )
            topn_sink(ranked, batch_id)

        query = (
            agg.writeStream.outputMode("update")
            .foreachBatch(rank_and_upsert)
            .option("checkpointLocation", checkpoint_dir)
            .start()
        )
    finally:
        _sess.conf.set("spark.sql.shuffle.partitions", _prev_parts)
    return agg_sink, topn_sink, query


def streaming_kmv_distinct_job(
    stream: DataFrame,
    group: str,
    value: str,
    k: int = 64,
) -> DataFrame:
    """Streaming KMV distinct-count: per group, maintain the k smallest
    distinct md5 hashes ACROSS micro-batches and emit the refreshed
    sketch each batch the group is touched (update semantics).

    This is the streaming twin of ``operators/rollups.kmv_distinct`` and
    demonstrates why KMV (unlike engine-private approx_count_distinct
    state) is the 100 TB streaming sketch: state is an O(k) integer set,
    merging is "union, keep k smallest" — associative and replayable, so
    a restart from checkpoint or a late batch reaches the same sketch.
    Emitted estimates are IDENTICAL to recomputing the batch operator
    over all data seen so far (asserted in tests).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from flink_helloworld_spark.operators.rollups import HASH_SPACE

    key_type = stream.schema[group].dataType
    out_schema = StructType(
        [
            StructField(group, key_type),
            StructField("kth_min", LongType()),
            StructField("n_kept", LongType()),
            StructField("distinct_estimate", DoubleType()),
        ]
    )
    state_schema = StructType([StructField("hashes", StringType())])

    def fn(kk, batches, state: GroupState):
        # state = the k smallest distinct hashes seen so far; merge is
        # "union, keep k smallest" (fn only fires for keys with input)
        seen: set[int] = (
            {int(x) for x in state.get[0].split(",") if x}
            if state.exists
            else set()
        )
        for pdf in batches:
            seen.update(int(h) for h in pdf["_h"])
        kept = sorted(seen)[:k]
        state.update((",".join(str(x) for x in kept),))
        n = len(kept)
        est = float(n) if n < k else (k - 1) / (kept[-1] / HASH_SPACE)
        yield pd.DataFrame(
            [{group: kk[0], "kth_min": kept[-1], "n_kept": n, "distinct_estimate": est}]
        )

    from flink_helloworld_spark.functions import md5_prefix_long

    # nulls carry no distinct value (COUNT DISTINCT semantics) — and
    # md5(NULL) would reach the state fn as NaN; same rule as the batch
    # twin, so streaming-equals-batch still holds
    hashed = stream.where(F.col(value).isNotNull()).select(
        F.col(group), md5_prefix_long(F.col(value).cast("string")).alias("_h")
    )
    return hashed.groupBy(group).applyInPandasWithState(
        fn, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def streaming_ingest_job(
    stream: DataFrame,
    sink_path: str,
    checkpoint_dir: str,
    time_col: str = "event_time",
    text_col: str = "text",
    min_words: int = 3,
    delay: str = "10 minutes",
    rows_per_trigger: int | None = None,
):
    """Streaming corpus ingest: the pretrain-prep front half as one
    continuous query — cheap per-row quality gate (word count + non-empty
    after trim), exact content dedup within the watermark horizon, then
    the partitioned lake sink. Returns ``(writer, restore)`` — the
    started-ready DataStreamWriter plus a zero-arg RESTORE handle.

    CALLER OBLIGATION (ADVICE r7 — stated here, not just in _util):
    with ``rows_per_trigger`` set, this builder overrides the
    session-global ``spark.sql.shuffle.partitions`` and MUST leave it
    live until the caller's first ``.start()`` pins the stateful
    partition count at the checkpoint; call ``restore()`` right after
    that ``.start()``, or all subsequent batch work in the shared
    session silently runs at the streaming partition count.
    ``restore()`` is idempotent and is a no-op when nothing was
    overridden.

    Scale shape: the quality filter is a stateless row predicate (no
    state, pushes into the scan); dedup state is bounded by the
    watermark window; the sink partitions by ingest date so downstream
    batch jobs (corpus_clean's LSH stage, packing) prune to fresh
    partitions. This is the streaming complement of `pretrain_prep` —
    PAIR-VERIFIED near-dup work stays in scheduled batch over the lake;
    the single-pass first-arrival LSH contract runs fully streaming via
    `tws.streaming_lsh_dedup` (one long of state per claimed bucket).
    """
    from flink_helloworld_spark.operators.dedup import _words

    # rows_per_trigger: expected input rows per micro-batch — auto-size
    # the stateful partition count by the sqrt capacity law. This
    # builder RETURNS a writer, so the setting must stay live until the
    # caller's first .start() pins it at the checkpoint — hence the
    # restore handle instead of an in-function finally.
    from flink_helloworld_spark.streaming._util import (
        apply_stateful_partitions,
    )

    sess = stream.sparkSession
    _prev_parts = sess.conf.get("spark.sql.shuffle.partitions")

    def restore() -> None:
        sess.conf.set("spark.sql.shuffle.partitions", _prev_parts)

    apply_stateful_partitions(sess, rows_per_trigger)
    # min_words >= 1 already implies non-blank (the word split drops
    # empty tokens), so the single predicate is the whole quality gate
    filtered = stream.where(F.size(_words(F.col(text_col))) >= min_words)
    deduped = (
        filtered.withWatermark(time_col, delay)
        .withColumn("content_hash", F.md5(F.col(text_col)))
        .dropDuplicatesWithinWatermark(["content_hash"])
    )
    dated = deduped.withColumn("ingest_date", F.to_date(F.col(time_col)))
    from flink_helloworld_spark.streaming.sinks import partitioned_lake_sink

    return (
        partitioned_lake_sink(dated, sink_path, checkpoint_dir, ["ingest_date"]),
        restore,
    )


def streaming_pretrain_front(
    stream: DataFrame,
    domain_cap: int,
    time_col: str = "event_time",
    text_col: str = "text",
    delay: str = "10 minutes",
    classifier_weights: list[float] | None = None,
    classifier_threshold: float = 0.5,
    dsir_model: list[int] | None = None,
    dsir_threshold: float = 0.0,
) -> DataFrame:
    """The full streaming pretrain front-end as ONE query, composing the
    round-3 surface: Gopher rule gate (stateless codegen projection) →
    exact content dedup within the watermark horizon (bounded state) →
    per-domain arrival cap on typed transformWithState counters. The
    stateless gate runs FIRST so both stateful operators hold state only
    for documents that can survive; the TWS stage chains after
    dropDuplicatesWithinWatermark the same way the single-query capstone
    chains across its re-key seam.

    ``classifier_weights`` (learned batch-side by
    ``classifier.train_quality_classifier``) adds the
    train-offline/score-online stage: σ(w·x) as plan constants in the
    same stateless gate, dropping rows under ``classifier_threshold``
    before any state is paid for them.

    ``dsir_model`` (fit batch-side by ``selection.fit_dsir_model``)
    adds the DSIR relevance gate the same way: the 1024-bucket nanolog
    model rides as an array literal, each arriving doc's importance
    log-weight is an exact int64 fold over its tokens (bit-identical to
    batch ``dsir_weights``), and rows under ``dsir_threshold`` drop in
    the same stateless projection — target-irrelevant documents never
    reach the dedup/cap state either.

    Returns the flagged stream (doc_id, source, domain_rank, kept);
    callers route kept=true to the lake sink and the rest to an audit
    topic.
    """
    from flink_helloworld_spark.operators.dedup import _words
    from flink_helloworld_spark.streaming.tws import streaming_domain_cap

    # inline the cheap core of text.gopher_rules (word count + mean word
    # length) — the batch op's full flag set stays a batch projection
    ws = _words(F.col(text_col))
    n_words = F.size(ws)
    n_chars = F.length(text_col)
    mean_wlen = (n_chars - (n_words - 1)).cast("double") / F.nullif(
        n_words.cast("double"), F.lit(0.0)
    )
    gated = stream.where(
        (n_words >= 5) & (mean_wlen >= 3.0) & (mean_wlen <= 10.0)
    )
    if classifier_weights is not None:
        from flink_helloworld_spark.operators.classifier import (
            attach_quality_score,
        )

        gated = (
            attach_quality_score(gated, classifier_weights, text_col)
            .where(F.col("quality_score") >= classifier_threshold)
            .drop("quality_score")
        )
    if dsir_model is not None:
        from flink_helloworld_spark.operators.selection import attach_dsir_score

        gated = (
            attach_dsir_score(gated, dsir_model, text_col)
            .where(F.col("dsir_logw") >= dsir_threshold)
            .drop("dsir_logw")
        )
    deduped = (
        gated.withWatermark(time_col, delay)
        .withColumn("content_hash", F.md5(F.col(text_col)))
        .dropDuplicatesWithinWatermark(["content_hash"])
    )
    # seq must totally order same-domain docs: two docs sharing a
    # millisecond would otherwise tie and the kept/dropped decision at
    # the cap boundary would depend on Arrow chunk arrival order —
    # not replay-stable. 2^20 doc-id low bits break the tie
    # deterministically (millis * 2^20 stays well under 2^63).
    seq = F.unix_millis(F.col(time_col)) * F.lit(1048576) + F.pmod(
        F.col("doc_id"), F.lit(1048576)
    )
    return streaming_domain_cap(
        deduped.withColumn("seq", seq), cap=domain_cap
    )


def streaming_shard_manifest_job(
    stream: DataFrame,
    shards: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Streaming twin of ``operators/layout.shard_manifest``: maintain
    the per-shard manifest incrementally as documents arrive, emitting
    the refreshed row for every shard a micro-batch touches.

    This is the payoff of the manifest's algebra: counts and token sums
    are additive, id bounds fold under min/max, and the content
    fingerprint is a BIT_XOR — all associative + commutative, so state
    is FIVE scalars per shard and the streaming manifest after any batch
    sequence equals the batch operator over everything ingested so far
    (asserted bit-identical in tests). A restart replays to the same
    values from the checkpoint; a backfill engine can verify shard by
    shard without reading documents.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import IntegerType, LongType, StructField, StructType

    out_schema = StructType(
        [
            StructField("shard_id", IntegerType()),
            StructField("n_docs", LongType()),
            StructField("total_tokens", LongType()),
            StructField("min_id", LongType()),
            StructField("max_id", LongType()),
            StructField("fingerprint", LongType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("n_docs", LongType()),
            StructField("total_tokens", LongType()),
            StructField("min_id", LongType()),
            StructField("max_id", LongType()),
            StructField("fingerprint", LongType()),
        ]
    )

    def fn(key, batches, state: GroupState):
        n, tok, lo, hi, fp = (
            state.get if state.exists else (0, 0, None, None, 0)
        )
        for pdf in batches:
            # null tolerance mirrors the batch aggregate EXACTLY:
            # count(*) counts every row, sum/min/max/bit_xor SKIP nulls
            # (pandas renders a null in these long columns as NaN)
            n += len(pdf)
            tok += int(pdf["_tok"].dropna().sum())
            ids = pdf["_id"].dropna()
            if len(ids):
                bmin, bmax = int(ids.min()), int(ids.max())
                lo = bmin if lo is None else min(lo, bmin)
                hi = bmax if hi is None else max(hi, bmax)
            for h in pdf["_fp"].dropna():
                fp ^= int(h)
        state.update((n, tok, lo, hi, fp))
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
            ]
        )

    from flink_helloworld_spark.operators.layout import shard_tagged

    tagged = shard_tagged(stream, shards, text_col=text_col, id_col=id_col)
    return tagged.groupBy("shard_id").applyInPandasWithState(
        fn, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def streaming_filter_funnel_job(
    stream: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Streaming twin of ``operators/text.filter_funnel``: maintain the
    per-rule ablation counters incrementally as documents arrive —
    the live dashboard a 100 TB ingest watches for filter drift (a
    rule whose marginal kill-rate jumps mid-crawl signals a content
    shift long before the batch report would).

    The funnel's algebra is purely additive (per document, each rule
    contributes 0/1 to its marginal-fail and cumulative-pass counters),
    so state is THREE scalars per rule and the streaming funnel after
    any batch sequence equals the batch operator over everything
    ingested (asserted bit-identical in tests). The gopher projection
    itself is stateless and runs before any state is paid.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from flink_helloworld_spark.operators.text import (
        GOPHER_RULE_ORDER,
        gopher_rules,
    )

    flags = gopher_rules(stream, text_col=text_col)
    entries = []
    cum = F.lit(True)
    for i, r in enumerate(GOPHER_RULE_ORDER):
        cum = cum & F.col(r)
        entries.append(
            F.struct(
                F.lit(i + 1).alias("stage"),
                F.lit(r).alias("rule"),
                F.when(F.col(r), 0).otherwise(1).alias("fail"),
                F.when(cum, 1).otherwise(0).alias("cum"),
            )
        )
    contrib = flags.select(F.explode(F.array(*entries)).alias("s")).select(
        "s.*"
    )
    out_schema = StructType(
        [
            StructField("stage", IntegerType()),
            StructField("rule", StringType()),
            StructField("n_docs", LongType()),
            StructField("n_fail_alone", LongType()),
            StructField("n_pass_cum", LongType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("n_docs", LongType()),
            StructField("n_fail_alone", LongType()),
            StructField("n_pass_cum", LongType()),
        ]
    )

    def fn(key, batches, state: GroupState):
        n, f, c = state.get if state.exists else (0, 0, 0)
        for pdf in batches:
            n += len(pdf)
            f += int(pdf["fail"].sum())
            c += int(pdf["cum"].sum())
        state.update((n, f, c))
        yield pd.DataFrame(
            [
                {
                    "stage": key[0],
                    "rule": key[1],
                    "n_docs": n,
                    "n_fail_alone": f,
                    "n_pass_cum": c,
                }
            ]
        )

    return contrib.groupBy("stage", "rule").applyInPandasWithState(
        fn, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def streaming_corpus_manifest_job(
    stream: DataFrame,
    shards: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The streaming twin of ``dedup.corpus_to_manifest``'s closing
    chain, ONE query with TWO chained transformWithState operators
    across the re-key seam (content_hash → shard_id) — the
    capstone_single_query topology trick. Stateless Gopher-core gate →
    first-arrival content dedup → incremental per-shard manifest; the
    manifest after any batch sequence equals the batch
    ``layout.shard_manifest`` over the gate+dedup survivors
    bit-for-bit (t: test_jobs).

    Document TEXT never leaves its scan partition: the manifest inputs
    (shard_id, tok, fp) are computed in the stateless projection before
    either shuffle, so both stateful exchanges carry four integers per
    doc. State: one long per distinct content + five longs per shard —
    pair the dedup state with TTL where the re-ingest horizon allows.

    (An applyInPandasWithState manifest downstream of a dedup operator
    is NOT used here: two stateful operators only compose reliably on
    the transformWithState API — the dedup+apply form silently loses
    late batches to watermark holds.)"""
    from flink_helloworld_spark.streaming.tws import (
        streaming_corpus_manifest_tws,
    )

    return streaming_corpus_manifest_tws(
        stream, shards=shards, text_col=text_col, id_col=id_col
    )
