"""Physical-plan assertions: the 100 TB discipline, checked.

These pin the plan shapes the engine promises: pushdown reaching the
scan, column pruning, broadcast dims, codegen coverage, no needless
exchanges. A regression here is a performance bug even when results
stay correct.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_helloworld_spark.operators import dedup as D
from flink_helloworld_spark.operators import relational as R
from flink_helloworld_spark.plans import explain_str
from flink_helloworld_spark.sources.tables import load_tables


def test_filter_pushdown_reaches_parquet_scan(spark, sf_dir):
    df = load_tables(spark, sf_dir).customer.where(F.col("c_custkey") == 42)
    plan = explain_str(df)
    assert "PushedFilters: [IsNotNull(c_custkey), EqualTo(c_custkey,42)]" in plan


def test_column_pruning_reaches_scan(spark, sf_dir):
    li = load_tables(spark, sf_dir).lineitem.select("l_orderkey", "l_quantity")
    plan = explain_str(li)
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "l_orderkey" in read_schema and "l_quantity" in read_schema
    assert "l_extendedprice" not in read_schema  # unused columns not read


def test_shipdate_predicate_pushdown_in_pricing_summary(spark, sf_dir):
    df = R.pricing_summary(load_tables(spark, sf_dir).lineitem)
    plan = explain_str(df)
    assert "PushedFilters" in plan and "l_shipdate" in plan.split("PushedFilters")[1][:200]


def test_denorm_has_single_fact_shuffle(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    df = R.denormalize_orders(t.lineitem, t.orders, t.customer, t.nation, t.region)
    plan = explain_str(df, "simple")
    # dims broadcast; the only hash exchanges are the lineitem⋈orders pair
    assert plan.count("BroadcastHashJoin") >= 3
    assert plan.count("Exchange hashpartitioning") <= 2


def test_wordcount_partial_aggregates_jvm_side(spark, sf_dir):
    df = R.word_count(load_tables(spark, sf_dir).documents)
    plan = explain_str(df, "simple")
    # map-side partial + final HashAggregate pair; no row-at-a-time
    # Python; scan pruned to the text column (codegen markers only
    # appear in the AQE final plan, so assert the shape instead)
    assert "partial_count" in plan
    assert "BatchEvalPython" not in plan
    assert "ReadSchema: struct<text:string>" in plan


def test_minhash_is_pure_columnar(spark, sf_dir):
    df = D.minhash_lsh_buckets(load_tables(spark, sf_dir).documents)
    plan = explain_str(df)
    # signatures/banding are JVM column exprs: no Python eval, no shuffle
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Exchange hashpartitioning" not in plan


def test_sharded_vectorized_topk_has_no_driver_collect(spark, sf_dir, monkeypatch):
    """The 100 TB ANN kernel must be fully lazy: building the plan may not
    materialize the index on the driver (the old kernel's collect()), and
    the physical plan is one bucket exchange feeding grouped Pandas."""
    from pyspark.sql import DataFrame as SparkDF

    from flink_helloworld_spark.operators import similarity as S

    def _boom(self, *a, **kw):  # any driver materialization fails the test
        raise AssertionError("driver collect() during plan construction")

    monkeypatch.setattr(SparkDF, "collect", _boom)
    monkeypatch.setattr(SparkDF, "toPandas", _boom)
    emb = load_tables(spark, sf_dir).embeddings
    df = S.cosine_topk_vectorized_sharded(emb, k=5, planes=8)
    plan = explain_str(df, "simple")
    assert "FlatMapGroupsInPandas" in plan
    assert plan.count("Exchange hashpartitioning") == 1  # bucket shuffle only


def test_lookup_enrich_broadcasts_dim_no_fact_shuffle(spark, sf_dir):
    """The Redis-GET equivalent must be a broadcast hash join: dim ships
    once, facts stream through with zero exchanges."""
    from flink_helloworld_spark.operators.lookup import lookup_enrich

    t = load_tables(spark, sf_dir)
    df = lookup_enrich(
        t.orders.select("o_orderkey", "o_custkey", "o_totalprice"),
        t.customer,
        on=("o_custkey", "c_custkey"),
        dim_cols=["c_name", "c_mktsegment"],
    )
    plan = explain_str(df, "simple")
    assert "BroadcastHashJoin" in plan
    assert "Exchange hashpartitioning" not in plan  # fact side unshuffled
    # dim column pruning reaches the scan
    full = explain_str(df)
    cust_schema = [l for l in full.splitlines() if "customer.parquet" in l or "ReadSchema" in l]
    assert any("c_custkey" in l and "c_acctbal" not in l for l in cust_schema)


def test_aqe_enabled(spark):
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    assert spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"


def test_observed_metrics(spark, sf_dir):
    from flink_helloworld_spark.plans import observed

    ev = load_tables(spark, sf_dir).events
    df, obs = observed(
        ev, "ingest_metrics",
        F.count(F.lit(1)).alias("rows"),
        F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("sum_value"),
    )
    n = df.count()  # action triggers the observation
    got = obs.get
    assert got["rows"] == n and got["sum_value"] > 0


def test_bm25_topn_is_take_ordered_not_global_window(spark, sf_dir):
    """Top-n must compile to TakeOrderedAndProject (per-partition heads),
    never a single-partition global sort/window over all matches."""
    from flink_helloworld_spark.operators.ranking import bm25_search

    df = bm25_search(load_tables(spark, sf_dir).documents, ("hash", "join"))
    plan = explain_str(df, "simple")
    assert "TakeOrderedAndProject" in plan
    # the rank window runs ABOVE the limit (<= topn rows), never below it
    # (scalar 1-row aggregates below may legitimately use SinglePartition)
    assert plan.index("Window") < plan.index("TakeOrderedAndProject")


def test_hll_is_two_hash_aggregates_no_python(spark, sf_dir):
    from flink_helloworld_spark.operators.rollups import hll_distinct

    ev = load_tables(spark, sf_dir).events
    plan = explain_str(hll_distinct(ev, "event_type", "user_id"), "simple")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # register build + estimate: exactly two shuffle boundaries
    assert plan.count("Exchange hashpartitioning") <= 2
    assert "partial_max" in plan  # register max combines map-side


def test_cms_sketch_single_scan_partial_agg(spark, sf_dir):
    from flink_helloworld_spark.operators.rollups import cms_sketch

    ev = load_tables(spark, sf_dir).events
    plan = explain_str(cms_sketch(ev, "user_id"), "simple")
    assert plan.count("Scan parquet") == 1  # one pass builds all d rows
    assert "partial_count" in plan
    assert "BatchEvalPython" not in plan


def test_zorder_key_stays_in_codegen(spark, sf_dir):
    from flink_helloworld_spark.operators.layout import zorder_layout_stats

    ev = load_tables(spark, sf_dir).events
    keyed = ev.select("user_id", F.col("ts").cast("long").alias("ts_sec"))
    plan = explain_str(zorder_layout_stats(keyed, "user_id", "ts_sec"), "simple")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert plan.count("Exchange hashpartitioning") <= 1  # file_id agg only


def test_q6_filters_and_pruning_reach_scan(spark, sf_dir):
    import __spark_entry__ as entry

    plan = explain_str(entry.queries()["sql_q6_forecast"](spark, sf_dir))
    pushed = plan.split("PushedFilters")[1][:300]
    assert "l_shipdate" in pushed and "l_discount" in pushed and "l_quantity" in pushed
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "l_orderkey" not in read_schema  # 5-column scan, nothing more


def test_q14_broadcasts_part_dim(spark, sf_dir):
    import __spark_entry__ as entry

    plan = explain_str(entry.queries()["sql_q14_promo"](spark, sf_dir), "simple")
    assert "BroadcastHashJoin" in plan
    assert plan.count("Exchange hashpartitioning") == 0  # no shuffle at all


def test_decontaminate_broadcasts_benchmark_grams(spark, sf_dir):
    import __spark_entry__ as entry

    plan = explain_str(entry.queries()["decontaminate"](spark, sf_dir), "simple")
    # benchmark gram set broadcast: corpus side must not hash-exchange
    # for the semi-probe join (only the final doc_id agg/join may)
    assert "BroadcastHashJoin" in plan


def test_cep_pattern_single_sort_no_pair_blowup(spark, sf_dir):
    import __spark_entry__ as entry

    plan = explain_str(entry.queries()["cep_pattern"](spark, sf_dir), "simple")
    # the pattern scan is window-based: no cartesian/broadcast-nested-loop
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Window" in plan


def test_pretrain_prep_stays_jvm_side_with_broadcast_probe(spark, sf_dir):
    import __spark_entry__ as entry

    plan = explain_str(entry.queries()["pretrain_prep"](spark, sf_dir), "simple")
    # five-stage composition must stay declarative: no Python eval, no
    # cartesian blowup; the decontamination probe broadcasts
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_q2_filters_push_below_offers_aggregation(spark, sf_dir):
    import __spark_entry__ as entry

    plan = explain_str(
        entry.queries()["sql_q2_min_cost_supp"](spark, sf_dir), "simple"
    )
    # the decorrelated Q2: part + EU-supplier dims broadcast BELOW the
    # unit-cost aggregation (agg input pre-shrunk), lineitem scanned
    # exactly once — the correlated form would aggregate it twice
    assert plan.count("BroadcastHashJoin") >= 2
    # ONE lineitem scan (the correlated form would read it twice);
    # "lineitem" appears only in the scan's file path in simple mode
    assert plan.count("lineitem") == 1
    assert "partial" in plan  # map-side combine on the offers agg


def test_q4_exists_becomes_semi_join_not_cartesian(spark, sf_dir):
    import __spark_entry__ as entry

    plan = explain_str(entry.queries()["sql_q4_priority"](spark, sf_dir), "simple")
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan


def test_ivfpq_plan_broadcasts_codebook_no_collect(spark, sf_dir):
    """IVF+PQ contract: centroid/codebook sides are broadcast (never a
    hash exchange of the full corpus against 16 rows), the ADC scan has
    no Python eval node, and nothing materializes on the driver."""
    from flink_helloworld_spark.operators import similarity as S
    from flink_helloworld_spark.operators._cache import release_shared_caches

    df = S.ivfpq_topk(load_tables(spark, sf_dir).embeddings, k=5)
    plan = explain_str(df, "simple")
    release_shared_caches()
    assert plan.count("BroadcastHashJoin") + plan.count("BroadcastNestedLoopJoin") >= 2
    assert "BatchEvalPython" not in plan  # ADC is pure column exprs
    assert "CollectLimit" not in plan


def test_seed_sampling_is_distributed_takeordered(spark, sf_dir):
    """Centroid/codebook seed selection must never funnel the full
    embedding table through one task. seed_topk's contract: the k-row
    cut executes as TakeOrderedAndProject (per-partition heaps), and the
    only unpartitioned row_number window runs AFTER that limit — so the
    WindowExec child is bounded by k rows, never the full scan."""
    from flink_helloworld_spark.functions import md5_prefix_long, seed_topk

    emb = load_tables(spark, sf_dir).embeddings
    v = emb.selectExpr("vec_id as id", "embedding as vec").withColumn(
        "_h", md5_prefix_long(F.col("id").cast("string"))
    )
    plan = explain_str(seed_topk(v, 16), "simple")
    assert "TakeOrderedAndProject" in plan
    # the window sits above the limit, not above the scan: walking the
    # plan text, TakeOrdered must appear BELOW (after) the Window node
    assert plan.index("Window") < plan.index("TakeOrderedAndProject")


def test_kmeans_and_ivf_plans_have_no_full_table_sort(spark, sf_dir):
    """kmeans/IVF centroid selection runs as its own TakeOrdered job
    (seed_topk, asserted above) whose k-row result is collected as index
    metadata — so the returned query plan must contain NO global sort at
    all and no full-table single-partition window: assignment is
    MapInPandas, scoring is per-cell FlatMapGroupsInPandas, the only
    window partitions by query_id."""
    from flink_helloworld_spark.operators import similarity as S
    from flink_helloworld_spark.operators._cache import release_shared_caches
    from flink_helloworld_spark.operators.clustering import kmeans_assign

    emb = load_tables(spark, sf_dir).embeddings
    for df, arrow_marker in (
        (kmeans_assign(emb, k=4, n_iter=1), "MapInPandas"),
        (S.ivf_cosine_topk(emb, k=5, n_centroids=8), "FlatMapGroupsInPandas"),
    ):
        plan = explain_str(df, "simple")
        release_shared_caches()
        # a bare global "Sort [...], true" over the scan would be the
        # single-task pattern this test guards against (local
        # per-partition sorts — "], false" — are fine)
        for line in plan.splitlines():
            if "Sort [" in line and "], true" in line:
                raise AssertionError(f"unexpected global sort node: {line}")
        assert "BatchEvalPython" not in plan  # Arrow kernels only
        # EACH plan must run its Arrow kernel (asserted per iteration —
        # checking only the last loop plan would let kmeans regress)
        assert arrow_marker in plan


def test_ivf2_stays_distributed_no_global_sort(spark, sf_dir):
    """Hierarchical IVF contract: no bare global sort, no row-at-a-time
    Python; the corpus stays distributed end to end. Since r12 the
    probe routing is ONE MapInPandas against the broadcast collected
    quantizer (bounded index metadata — the same C-row collect
    `_assign_cells_blas` always performed) and the cell scan is the
    FlatMapGroupsInPandas grouped-BLAS stage; the corpus itself is
    never collected."""
    from flink_helloworld_spark.operators import similarity as S
    from flink_helloworld_spark.operators._cache import release_shared_caches

    emb = load_tables(spark, sf_dir).embeddings
    plan = explain_str(S.ivf2_cosine_topk(emb, k=5), "simple")
    release_shared_caches()
    for line in plan.splitlines():
        if "Sort [" in line and "], true" in line:
            raise AssertionError(f"unexpected global sort node: {line}")
    assert "BatchEvalPython" not in plan
    assert "MapInPandas" in plan
    assert plan.count("FlatMapGroupsInPandas") >= 1


def test_round3_pipeline_ops_plan_contracts(spark, sf_dir):
    """New pipeline ops keep the codegen/shuffle discipline:
    gopher_rules is one scan + projection (no exchange, no Python);
    domain_cap is exactly one hash exchange (the domain window);
    semantic_decontaminate is scan → one Arrow stage, no shuffle."""
    from flink_helloworld_spark.operators import similarity as S
    from flink_helloworld_spark.operators.sampling import domain_cap
    from flink_helloworld_spark.operators.text import gopher_rules

    t = load_tables(spark, sf_dir)

    plan = explain_str(gopher_rules(t.documents), "simple")
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

    plan = explain_str(domain_cap(t.documents, cap=5), "simple")
    assert plan.count("Exchange hashpartitioning") == 1
    assert "BatchEvalPython" not in plan

    plan = explain_str(S.semantic_decontaminate(t.embeddings), "simple")
    assert "Exchange" not in plan  # benchmark is broadcast, corpus streams
    assert "BatchEvalPython" not in plan
    assert "MapInPandas" in plan


def test_bigram_logppl_no_global_window_no_python(spark, sf_dir):
    """The lag window partitions by doc_id (never a single-partition
    sort) and the whole model is JVM-side column expressions."""
    import __spark_entry__ as entry

    plan = explain_str(entry.queries()["bigram_logppl"](spark, sf_dir), "simple")
    assert "Window" in plan
    # the lag window exchanges on doc_id, never a global sort; the ONE
    # SinglePartition exchange allowed is the 1-row token-count gather
    # (partial counts, metadata not data)
    assert "hashpartitioning(doc_id" in plan
    assert plan.count("Exchange SinglePartition") <= 1
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_exact_sharded_topk_plan_is_block_grouped(spark, sf_dir):
    """The exhaustive top-k must never plan a pair blowup: the only
    wide operation is the (qs, cs) group exchange feeding the Arrow
    block kernel, plus the final per-query rank window."""
    from flink_helloworld_spark.operators import similarity as S

    emb = load_tables(spark, sf_dir).embeddings
    plan = explain_str(S.cosine_topk_exact_sharded(emb, k=5), "simple")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "FlatMapGroupsInPandas" in plan  # per-block BLAS kernel
    assert "SinglePartition" not in plan  # rank window partitions by query


def test_classifier_gradient_is_single_partial_agg(spark, sf_dir):
    """One GD step = one hash aggregate with map-side partials over the
    feature projection — pure JVM, no Python, no extra exchanges."""
    from flink_helloworld_spark.operators.classifier import doc_features, _z

    feats = doc_features(load_tables(spark, sf_dir).documents)
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-_z([0.0] * 6)))
    step = feats.agg(
        *[
            F.sum(
                F.round((F.col("y") - p) * F.col(f"f{d}"), 9).cast("decimal(28,9)")
            ).alias(f"s{d}")
            for d in range(6)
        ]
    )
    plan = explain_str(step, "simple")
    assert "partial" in plan  # map-side combine
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert plan.count("Exchange") == 1  # only the final 1-row gather


def test_iterate_fixpoint_null_condition_rows_exit(spark):
    """NULL continue-condition rows must EXIT the loop (the filter_split
    NULL-routing rule) — a bare ~cond would drop them from both
    branches and they would silently vanish from the result."""
    from flink_helloworld_spark.plans import iterate_fixpoint

    df = spark.createDataFrame([(1,), (7,), (None,)], "v int")
    out = iterate_fixpoint(
        df, lambda d: d.withColumn("v", F.col("v") + 1), F.col("v") <= 5
    )
    rows = sorted((r.v if r.v is not None else -1) for r in out.collect())
    assert rows == [-1, 6, 7]


def test_round5_new_ops_plan_contracts(spark, sf_dir):
    from flink_helloworld_spark.operators import layout as L
    from flink_helloworld_spark.operators import similarity as S

    docs = load_tables(spark, sf_dir).documents
    emb = load_tables(spark, sf_dir).embeddings

    # contamination_report: benchmark gram table broadcast, corpus side
    # probes map-side; only the tiny bench_id agg shuffles
    rep = D.decontamination_report(
        docs.where("doc_id % 20 <> 0"), docs.where("doc_id % 20 = 0"), n=5
    )
    plan = explain_str(rep, "simple")
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan

    # shard_manifest: ONE hash exchange (the shard_id agg) with map-side
    # partials; everything else codegen projections
    man = L.shard_manifest(docs, shards=16)
    plan = explain_str(man, "simple")
    assert plan.count("Exchange hashpartitioning") == 1
    assert "partial_count" in plan or "partial_sum" in plan
    assert "BatchEvalPython" not in plan

    # sq_quantize: stats ride as a broadcast 1-row crossJoin (no eager
    # collect), coding is shuffle-free codegen
    coded = S.sq_quantize(emb)
    plan = explain_str(coded, "simple")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "Exchange hashpartitioning" not in plan
    assert "BatchEvalPython" not in plan


def test_winnowing_fingerprint_zero_exchange_pure_codegen(spark, sf_dir):
    """Winnowing is per-row column arithmetic: normalize → gram-hash →
    windowed min → explode. NO shuffle, NO Python stage — the plan is
    scan → project/generate only."""
    from flink_helloworld_spark.operators.text import winnowing_fingerprint

    plan = explain_str(
        winnowing_fingerprint(load_tables(spark, sf_dir).documents), "simple"
    )
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_filter_funnel_is_one_aggregate_no_rescan(spark, sf_dir):
    """The funnel is ONE global aggregate (13 counters) over the gopher
    projection — a per-rule rescan would show multiple scans/unions."""
    from flink_helloworld_spark.operators.text import filter_funnel

    plan = explain_str(
        filter_funnel(load_tables(spark, sf_dir).documents), "simple"
    )
    assert plan.count("Scan parquet") == 1
    assert "partial" in plan  # map-side combine of the counters
    assert plan.count("Exchange SinglePartition") == 1  # the 1-row gather
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_boilerplate_scrub_shuffles_hashes_not_text(spark, sf_dir):
    """The frequency pass groups md5 hashes (map-side partials); the
    verdict join and reassembly key on doc_id/seg_hash — no Python,
    no cartesian pair blowup, and no global sort anywhere."""
    from flink_helloworld_spark.operators.dedup import boilerplate_scrub

    plan = explain_str(
        boilerplate_scrub(load_tables(spark, sf_dir).documents), "simple"
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Exchange SinglePartition" not in plan  # nothing gathers


def test_embedding_audit_single_label_aggregate(spark, sf_dir):
    """One projection + one label-keyed hash aggregate with map-side
    partials; constant state per label."""
    from flink_helloworld_spark.operators.similarity import embedding_audit

    plan = explain_str(
        embedding_audit(load_tables(spark, sf_dir).embeddings), "simple"
    )
    assert plan.count("Exchange hashpartitioning") == 1
    assert "partial" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_selection_ops_plan_contracts(spark, sf_dir):
    """DSIR / ppl-buckets / training-order: the model tables broadcast,
    the corpus shuffles only where the semantics force it."""
    from flink_helloworld_spark.operators import layout as L
    from flink_helloworld_spark.operators.selection import (
        dsir_weights,
        perplexity_buckets,
    )

    docs = load_tables(spark, sf_dir).documents

    # DSIR: the 1024-row bucket model joins the exploded corpus via
    # BROADCAST (never a corpus-sized shuffle on bucket id); no Python
    plan = explain_str(dsir_weights(docs), "simple")
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # shuffles: the two tiny bucket-count aggs + the per-doc agg — the
    # corpus-sized explode must not hash-exchange on the bucket key
    assert plan.count("Exchange hashpartitioning") <= 4

    # ppl_buckets: the per-language cuts table broadcasts back over the
    # scored corpus (langs is tiny), no Python anywhere
    plan = explain_str(perplexity_buckets(docs), "simple")
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan

    # training_order: ONE corpus exchange (by shard) feeding the
    # per-shard sort; no global range partitioning, no Python
    plan = explain_str(L.training_order(docs), "simple")
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Exchange rangepartitioning" not in plan
    assert "BatchEvalPython" not in plan


def test_round5_late_ops_plan_contracts(spark, sf_dir):
    """KN LM / reservoir / selection capstone: model tables broadcast,
    windows partition on bounded keys, no Python in the hot paths."""
    from flink_helloworld_spark.operators import text as T
    from flink_helloworld_spark.operators.sampling import (
        weighted_reservoir_sample,
    )
    from flink_helloworld_spark.operators.selection import selection_pipeline

    docs = load_tables(spark, sf_dir).documents

    # kneser_ney_logppl: scalars (bigram-type total, vocab size) ride as
    # broadcast 1-row aggs — never an eager count; no Python
    plan = explain_str(T.kneser_ney_logppl(docs), "simple")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "BatchEvalPython" not in plan

    # weighted_reservoir: one codegen key projection + the per-stratum
    # rank — exactly ONE corpus exchange (by stratum), no global sort
    plan = explain_str(
        weighted_reservoir_sample(docs, "source", "n_chars", "doc_id"), "simple"
    )
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Exchange rangepartitioning" not in plan
    assert "BatchEvalPython" not in plan

    # selection_prep: the DSIR model and both threshold tables join via
    # broadcast; no Python anywhere in the composed plan
    plan = explain_str(selection_pipeline(docs), "simple")
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan


def test_diff_snm_textrank_plan_contracts(spark, sf_dir):
    from flink_helloworld_spark.operators import dedup as DD
    from flink_helloworld_spark.operators.ranking import textrank_scores

    docs = load_tables(spark, sf_dir).documents

    # snapshot_diff: ONE join, keyed on the id; text never reaches the
    # exchange (only 32-byte hashes travel)
    diff = DD.snapshot_diff(docs, docs.selectExpr("doc_id", "upper(text) AS text"))
    plan = explain_str(diff, "simple")
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan
    import re as _re

    for m in _re.finditer(r"Exchange hashpartitioning\(([^)]*)\)", plan):
        assert "text" not in m.group(1)  # hashes shuffle, text doesn't

    # sorted_neighborhood: windows partition on the 256-block key —
    # never an empty-partition global window (which Spark plans as a
    # single-task sort)
    plan = explain_str(DD.sorted_neighborhood_pairs(docs), "simple")
    assert "Window" in plan
    assert "SinglePartition" not in plan
    assert "BatchEvalPython" not in plan

    # textrank: no Python, no driver round-trips — the 4 iterations are
    # ONE composed plan (joins/aggs only)
    plan = explain_str(textrank_scores(docs), "simple")
    assert "BatchEvalPython" not in plan


def test_corpus_manifest_broadcast_probe_no_python(spark, sf_dir):
    """The end-to-end capstone keeps pretrain_prep's plan guarantees
    through the manifest join: decontamination probe broadcast, no
    Python stage, and the final agg has map-side partials."""
    from flink_helloworld_spark.operators.dedup import corpus_to_manifest

    plan = explain_str(
        corpus_to_manifest(load_tables(spark, sf_dir).documents), "simple"
    )
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "partial_count" in plan or "partial_sum" in plan


def test_ingest_gate_ops_plan_contracts(spark, sf_dir):
    """Plan contracts for the round-5 continuation ops: the LSH commit
    gate and ingest front shuffle hashed incidence rows (never text),
    mixture_temperature's share denominator rides as a broadcast 1-row
    crossJoin, and none of them run a Python stage."""
    from flink_helloworld_spark.operators import sampling as SA

    docs = load_tables(spark, sf_dir).documents

    # lsh_first_arrival: the exchanges carry (doc_id, band_id, band_key)
    # — document text is consumed by the hash projection before any
    # shuffle, and no pair join / Python stage exists
    plan = explain_str(D.lsh_first_arrival(docs), "formatted")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    import re

    for args in re.findall(r"Exchange hashpartitioning\(([^)]*)\)", plan):
        assert "text" not in args

    # near_dedup_front: same guarantee through the composed plan; the
    # domain cap is ONE window (single rank per domain)
    plan = explain_str(D.near_dedup_front(docs), "formatted")
    assert "BatchEvalPython" not in plan
    for args in re.findall(r"Exchange hashpartitioning\(([^)]*)\)", plan):
        assert "text" not in args

    # mixture_temperature: the pw total is a broadcast 1-row agg, not an
    # eager collect; one hash exchange (the per-source token agg) with
    # map-side partials
    plan = explain_str(
        SA.mixture_temperature(docs, alpha=0.7, budget_tokens=30_000), "simple"
    )
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "partial_sum" in plan
    assert "BatchEvalPython" not in plan


def test_embedding_gate_single_exchange_no_python(spark, sf_dir):
    """embedding_first_arrival: the bucket is pure column arithmetic and
    the verdict is one bucket-keyed window — no Python stage, and the
    embedding array never appears in an exchange key."""
    import re

    from flink_helloworld_spark.operators import similarity as S

    df = S.embedding_first_arrival(load_tables(spark, sf_dir).embeddings)
    plan = explain_str(df, "formatted")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    for args in re.findall(r"Exchange hashpartitioning\(([^)]*)\)", plan):
        assert "embedding" not in args


def test_banded_gate_no_python_embedding_stays_on_scan(spark, sf_dir):
    """embedding_first_arrival_banded: every band bucket is computed in
    the stateless scan-side projection — no Python stage anywhere, and
    the embedding array never appears in an exchange key (only
    (band_id, bucket) longs and vec_id shuffle)."""
    import re

    from flink_helloworld_spark.operators import similarity as S

    df = S.embedding_first_arrival_banded(
        load_tables(spark, sf_dir).embeddings, planes=8, bands=4
    )
    plan = explain_str(df, "formatted")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    for args in re.findall(r"Exchange hashpartitioning\(([^)]*)\)", plan):
        assert "embedding" not in args
    # firsts must partial-aggregate map-side before the exchange
    assert "partial_min" in plan


def test_soft_weights_and_split_never_shuffle_text(spark, sf_dir):
    """soft_dedup_weights / leakage_safe_split: the corpus is touched by
    one doc_id-keyed left join against the label table — document text
    must never be an exchange key (it is not even read: only doc_id)."""
    import re

    docs = load_tables(spark, sf_dir).documents
    pairs = D.minhash_dedup_pairs(docs).where("is_dup")
    for df in (
        D.soft_dedup_weights(docs, pairs),
        D.leakage_safe_split(docs, pairs),
    ):
        plan = explain_str(df, "formatted")
        for args in re.findall(r"Exchange hashpartitioning\(([^)]*)\)", plan):
            assert "text" not in args


def test_band_plan_is_one_aggregate_over_bounded_arms(spark, sf_dir):
    """minhash_band_plan: downstream of the audited pair table the plan
    is a union of constant-width projections + ONE hash aggregate — the
    S-curve chains stay in codegen (no Python)."""
    df = D.minhash_band_plan(load_tables(spark, sf_dir).documents)
    plan = explain_str(df, "simple")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "partial_count" in plan or "partial_sum" in plan


def test_indexed_query_plan_is_pure_scan_no_training(spark, sf_dir):
    """The r8 build/query seam, enforced at the PLAN level: querying a
    parquet-reloaded index artifact must contain ZERO quantizer
    training (no 'kmt:'/'km:' md5 seed literals — those mark the Lloyd
    sample and seeding stages), exactly the two Python stages of the
    r12 scan path (frozen-quantizer probe-routing MapInPandas +
    cell-scan grouped BLAS — the probe pipeline's old assignment stage
    and rank window collapsed into the routing pass), and the level
    filters must PUSH DOWN into the artifact's parquet scan (a
    deployment reads only the level it needs)."""
    import tempfile

    from flink_helloworld_spark.operators import similarity as S

    planted = S.planted_embeddings(
        load_tables(spark, sf_dir).embeddings
    ).select("vec_id", "embedding")
    d = tempfile.mkdtemp(prefix="planidx-")
    idx, post = S.build_ivf_index(planted)
    idx.write.parquet(f"{d}/index")
    post.write.parquet(f"{d}/postings")
    q = S.ivf_index_query(
        spark.read.parquet(f"{d}/index"),
        spark.read.parquet(f"{d}/postings"),
        planted.where("vec_id % 8 = 0"),
        k=5,
    )
    simple = explain_str(q, "simple")
    assert "kmt:" not in simple and "md5(concat(km:" not in simple
    assert simple.count("FlatMapGroupsInPandas") == 1
    assert simple.count("MapInPandas") == 1
    # the quantizer collect (query construction, not the scan plan)
    # reads ONLY the level it needs from the artifact: the level filter
    # pushes into the parquet scan of the bounded metadata collect
    idx_read = spark.read.parquet(f"{d}/index")
    collect_plan = explain_str(
        idx_read.where("level = 1").select("centroid_id", "cvec", "super_id"),
        "formatted",
    )
    assert "PushedFilters: [IsNotNull(level), EqualTo(level,1)]" in collect_plan
    # and the BUILD plan does contain the training evidence — the seam
    # exists because the two halves genuinely differ. Under the r11
    # size-gated local kmeans the trainset is consumed at build time
    # (probe collect) and the trained centroids enter the plan as a
    # driver-side relation (Scan ExistingRDD); above the gate the plan
    # carries the 'kmt:' md5 sample literals of the distributed loop.
    # Either marker is training the QUERY half must not contain.
    build_plan = explain_str(idx, "simple")
    assert "kmt:" in build_plan or "ExistingRDD" in build_plan
    # the QUERY half carries neither marker (pure scan, asserted above
    # for kmt:; ExistingRDD would mean driver-trained state leaked in)
    assert "ExistingRDD" not in simple


def test_bucketed_postings_cogroup_scan_never_shuffles_the_corpus(spark, sf_dir):
    """The lake-deployment shape of the indexed scan: posting lists
    stored BUCKETED by centroid_id + the cogroup scan — the corpus
    side satisfies the grouping distribution in-place, so exactly ONE
    centroid_id exchange remains (the small probe side), vs TWO for
    the cogroup over plain parquet. Output parity with the union scan
    is exact."""
    import re
    import tempfile

    from flink_helloworld_spark.operators import similarity as S

    planted = S.planted_embeddings(
        load_tables(spark, sf_dir).embeddings
    ).select("vec_id", "embedding")
    idx, post = S.build_ivf_index(planted)
    d = tempfile.mkdtemp(prefix="bucketidx-")
    idx.write.parquet(f"{d}/index")
    post.write.parquet(f"{d}/postings")
    spark.sql("DROP TABLE IF EXISTS ivf_postings_bucketed_t")
    post.write.bucketBy(8, "centroid_id").sortBy("centroid_id").mode(
        "overwrite"
    ).saveAsTable("ivf_postings_bucketed_t")
    try:
        idxr = spark.read.parquet(f"{d}/index")
        queries = planted.where("vec_id % 8 = 0")
        want = sorted(
            map(
                tuple,
                S.ivf_index_query(
                    idxr, spark.read.parquet(f"{d}/postings"), queries, k=5
                ).collect(),
            )
        )

        def centroid_exchanges(df):
            return len(
                re.findall(
                    r"Exchange hashpartitioning\(centroid_id",
                    explain_str(df, "simple"),
                )
            )

        cg_plain = S.ivf_index_query(
            idxr, spark.read.parquet(f"{d}/postings"), queries, k=5,
            cogroup=True,
        )
        cg_bucketed = S.ivf_index_query(
            idxr, spark.table("ivf_postings_bucketed_t"), queries, k=5,
            cogroup=True,
        )
        assert centroid_exchanges(cg_plain) == 2
        assert centroid_exchanges(cg_bucketed) == 1  # corpus side in-place
        assert sorted(map(tuple, cg_plain.collect())) == want
        assert sorted(map(tuple, cg_bucketed.collect())) == want
    finally:
        spark.sql("DROP TABLE IF EXISTS ivf_postings_bucketed_t")


# --- round-8 second-half plan contracts ---------------------------------------


def test_cdc_chunks_plan_is_shuffle_free(spark, sf_dir):
    """The CDC claim that matters at 100 TB: chunking is ONE pass of
    per-row array arithmetic inside the scan partition — the physical
    plan must contain NO exchange of any kind."""
    from flink_helloworld_spark.operators.dedup import cdc_chunks
    from flink_helloworld_spark.plans import explain_str
    from flink_helloworld_spark.sources.tables import load_tables

    df = cdc_chunks(load_tables(spark, sf_dir).documents)
    plan = explain_str(df, "simple")
    assert "Exchange" not in plan


def test_triangle_counts_plan_has_no_nested_loop(spark, sf_dir):
    """Degree orientation buys pure equality joins: the plan must not
    fall back to a nested-loop/cartesian strategy anywhere (the naive
    OR-join closing-edge probe does, and measured >120s where the
    oriented form runs 1s)."""
    from flink_helloworld_spark.operators import graph as GRAPH
    from flink_helloworld_spark.plans import explain_str
    from flink_helloworld_spark.sources.tables import load_tables

    li = load_tables(spark, sf_dir).lineitem
    df = GRAPH.triangle_counts(GRAPH.copurchase_edges(li, min_support=2))
    plan = explain_str(df, "simple")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_quality_prior_ranking_uses_take_ordered(spark, sf_dir):
    """The prior list's top-k must be TakeOrderedAndProject (distributed
    top-k) — not a global sort feeding a limit."""
    from flink_helloworld_spark.operators.ranking import quality_prior_ranking
    from flink_helloworld_spark.plans import explain_str
    from flink_helloworld_spark.sources.tables import load_tables

    docs = load_tables(spark, sf_dir).documents
    df = quality_prior_ranking(docs, topn=100)
    plan = explain_str(df, "simple")
    assert "TakeOrderedAndProject" in plan


def test_kmv_set_ops_plan_no_corpus_join(spark, sf_dir):
    """The set-algebra claim: snapshots are reduced to sketches BEFORE
    anything crosses — the only joins in the plan sit above windowed
    top-k (sketch) subtrees, so no join input is a raw corpus scan.
    Proxy assertion: every SortMergeJoin/BroadcastHashJoin appears
    AFTER a Window operator in the plan text (sketches are built by
    row_number windows)."""
    from flink_helloworld_spark.operators.rollups import kmv_set_ops
    from flink_helloworld_spark.plans import explain_str
    from flink_helloworld_spark.sources.tables import load_tables

    docs = load_tables(spark, sf_dir).documents
    a = docs.where("doc_id % 3 != 2")
    b = docs.where("doc_id % 2 = 0")
    df = kmv_set_ops(a, b, "lang", "text", k=16)
    plan = explain_str(df, "simple")
    last_window = plan.rfind("Window")
    assert last_window != -1
    # printed top-down, deeper operators appear later: every join must
    # sit ABOVE (= before) the deepest sketch window — a join printed
    # after the last Window would mean a raw corpus scan is being
    # joined below the sketch reduction
    assert "Join" not in plan[last_window:]


def test_adamic_adar_plan_has_no_nested_loop(spark, sf_dir):
    """Wedge generation and the known-edge anti-join must both be hash
    strategies — no cartesian/nested-loop fallback anywhere."""
    from flink_helloworld_spark.operators import graph as GRAPH
    from flink_helloworld_spark.plans import explain_str
    from flink_helloworld_spark.sources.tables import load_tables

    li = load_tables(spark, sf_dir).lineitem
    df = GRAPH.adamic_adar_topk(GRAPH.copurchase_edges(li, min_support=2))
    plan = explain_str(df, "simple")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "TakeOrderedAndProject" in plan


def test_r9_search_ops_are_shuffle_free_scans(spark, sf_dir):
    # phrase/fuzzy search promise ONE linear codegen pass: no Python
    # eval stages, no exchange of any kind before the result
    from flink_helloworld_spark.operators.ranking import (
        fuzzy_term_search,
        phrase_search,
    )

    docs = load_tables(spark, sf_dir).documents
    for df in (
        phrase_search(docs, phrase=("the", "data")),
        fuzzy_term_search(docs, term="data", max_edits=1),
    ):
        plan = explain_str(df, "simple")
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
        assert "Exchange" not in plan


def test_rate_anomaly_single_input_sized_stage(spark, sf_dir):
    # the only input-sized work is the (key, bucket) count agg; the
    # lag window + flag arithmetic run post-reduction. Exchanges:
    # partial->final agg, the span agg, the dense join, the window —
    # all on keys x buckets rows, and zero Python stages
    from flink_helloworld_spark.operators.rollups import rate_anomaly

    ev = load_tables(spark, sf_dir).events
    plan = explain_str(rate_anomaly(ev, "event_type", "ts"), "simple")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # all 16 lags + row_number ride ONE window spec -> one Window node
    assert plan.count("Window ") == 1


def test_hilbert_layout_single_agg_exchange(spark, sf_dir):
    from flink_helloworld_spark.operators.layout import hilbert_layout_stats

    ev = load_tables(spark, sf_dir).events
    keyed = ev.select("user_id", F.col("ts").cast("long").alias("ts_sec"))
    plan = explain_str(
        hilbert_layout_stats(keyed, "user_id", "ts_sec"), "simple"
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert plan.count("Exchange hashpartitioning") <= 1  # file_id agg only


def test_cms_join_size_operating_form_sketch_only(spark, sf_dir):
    # audit=False is the operating form: the plan must contain the two
    # O(d*w) sketch aggregates and NOTHING exact — no per-key count
    # tables (which would add 2 more aggregate exchanges + a
    # key-cardinality join) and no broadcast of a true-size row
    from flink_helloworld_spark.operators.rollups import cms_join_size

    li = load_tables(spark, sf_dir).lineitem
    lean = explain_str(
        cms_join_size(li, "l_partkey", li, "l_partkey", audit=False),
        "simple",
    )
    audit = explain_str(
        cms_join_size(li, "l_partkey", li, "l_partkey", audit=True),
        "simple",
    )
    assert "BatchEvalPython" not in lean and "ArrowEvalPython" not in lean
    # the exact side exists only in the audit plan
    assert "true_join_size" not in lean
    assert "true_join_size" in audit
    # lean exchanges: 2 sketch aggs + inner-product row agg (+ the
    # final 1-row min) — strictly fewer than the audit plan, which
    # adds the per-key count aggregates and their join
    assert lean.count("Exchange hashpartitioning") < audit.count(
        "Exchange hashpartitioning"
    )
    # the lineitem scans in the lean plan feed sketches only: each
    # reads the single join-key column
    for line in lean.splitlines():
        if "FileScan" in line and "lineitem" in line:
            assert "l_partkey" in line and "l_quantity" not in line


def test_live_postings_and_compact_broadcast_only(spark, sf_dir):
    # the deletion seam's scale contract: the merge-on-read view and
    # the compaction resolution broadcast the delta-sized tombstone /
    # touched-cell sides — the posting table itself never crosses a
    # hash exchange for resolution (its only exchanges downstream are
    # the query's own)
    from flink_helloworld_spark.operators import similarity as S

    planted = S.planted_embeddings(
        load_tables(spark, sf_dir).embeddings
    ).select("vec_id", "embedding")
    idx, post = S.build_ivf_index(planted)
    tombstoned = S.ivf_index_delete(
        post, planted.where("vec_id % 7 = 3")
    )
    live_plan = explain_str(S.live_postings(tombstoned), "simple")
    # the anti-join is broadcast: no hashpartitioning exchange for it
    assert "BroadcastHashJoin" in live_plan
    assert "LeftAnti" in live_plan
    compacted, _ = S.ivf_index_compact(tombstoned)
    cplan = explain_str(compacted, "simple")
    # pass-through anti + touched semi + resolution anti: ALL broadcast
    assert cplan.count("BroadcastHashJoin") >= 3
    assert "SortMergeJoin" not in cplan


def test_phrase_indexed_probe_pushes_term_filter(spark, sf_dir):
    # the indexed phrase probe's scale contract: over a PERSISTED
    # postings artifact the m phrase-term filters reach the parquet
    # scan (PushedFilters carries term, plus the matching partition/
    # row-group pruning once the artifact is laid out by term) and
    # only the 3 artifact columns are read
    import tempfile

    from flink_helloworld_spark.operators.ranking import (
        phrase_search_indexed,
        positional_postings,
    )

    docs = load_tables(spark, sf_dir).documents
    d = tempfile.mkdtemp(prefix="pospost-")
    positional_postings(docs).write.parquet(f"{d}/postings")
    post = spark.read.parquet(f"{d}/postings")
    plan = explain_str(
        phrase_search_indexed(docs, ("the", "data"), postings=post)
    )
    pushed = [
        ln for ln in plan.splitlines() if "PushedFilters" in ln
    ]
    # both probe sides: the In(term, [...]) reaches the parquet scan,
    # plus the per-side EqualTo — row groups prune on term stats
    assert len(pushed) >= 2, plan
    assert all("In(term" in ln or "EqualTo(term" in ln for ln in pushed)
    assert "ReadSchema: struct<term:string,doc_id:bigint,pos:bigint>" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_postings_store_probe_partition_prunes(spark, sf_dir):
    # the PERSISTED store's scale contract (the build/probe split):
    # postings_store_probe hands Catalyst LITERAL partition filters
    # (term_bucket ids computed driver-side via the crc32 twin — no
    # lookup job), so both probe-side scans read ONLY the phrase
    # terms' bucket directories; inside them the per-term filters
    # prune row groups; the position-arithmetic intersection
    # BROADCASTs the term-selective next-term side — the postings
    # table never crosses a hash exchange before the final per-doc agg
    import tempfile

    from flink_helloworld_spark.operators.ranking import (
        phrase_search_indexed,
        positional_postings,
        postings_store_probe,
        postings_store_write,
        term_bucket_of,
    )

    docs = load_tables(spark, sf_dir).documents
    path = tempfile.mkdtemp(prefix="ppstore-") + "/postings"
    postings_store_write(positional_postings(docs), path)
    probe = postings_store_probe(spark, path, ("the", "data"))
    plan = explain_str(
        phrase_search_indexed(docs, ("the", "data"), postings=probe),
        "formatted",
    )
    want = sorted({term_bucket_of(t) for t in ("the", "data")})
    blist = ",".join(str(b) for b in want)
    part_lines = [
        ln for ln in plan.splitlines() if "PartitionFilters" in ln
    ]
    # both probe sides prune to exactly the phrase terms' buckets
    assert len(part_lines) == 2, plan
    assert all(f"IN ({blist})" in ln for ln in part_lines), part_lines
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert all("In(term" in ln for ln in pushed)
    # the intersection broadcasts; the only hash exchange is the
    # final per-doc aggregate
    assert "BroadcastHashJoin" in plan
    assert plan.count("Exchange hashpartitioning") <= 1
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # layout-key twin: Spark's crc32 agrees with the driver-side one
    import zlib

    got = {
        r.term: r.b
        for r in spark.createDataFrame(
            [("the",), ("data",), ("ünïcode",)], "term string"
        )
        .select(
            "term",
            F.pmod(F.crc32(F.col("term").cast("binary")), F.lit(64))
            .cast("int")
            .alias("b"),
        )
        .collect()
    }
    for t, b in got.items():
        assert b == zlib.crc32(t.encode("utf-8")) % 64


def test_bm25_store_form_never_rereads_text(spark, sf_dir):
    # the Lucene-layout contract: with postings + norms artifacts
    # supplied, BM25's plan contains NO scan of the documents table —
    # tf/df come from the term-pruned store probe (partition filters on
    # both scans), N/avgdl/dl from the 2-column norms sidecar
    import tempfile

    from flink_helloworld_spark.operators.ranking import (
        bm25_search,
        positional_postings,
        postings_store_norms,
        postings_store_probe,
        postings_store_write,
        postings_store_write_norms,
    )

    docs = load_tables(spark, sf_dir).documents
    path = tempfile.mkdtemp(prefix="bm25store-") + "/postings"
    postings_store_write(positional_postings(docs), path)
    postings_store_write_norms(docs, path)
    plan = explain_str(
        bm25_search(
            docs,
            ("hash", "join"),
            postings=postings_store_probe(spark, path, ("hash", "join")),
            norms=postings_store_norms(spark, path),
        ),
        "formatted",
    )
    assert "documents" not in plan  # text is never re-read
    part_lines = [
        ln for ln in plan.splitlines() if "PartitionFilters" in ln
    ]
    assert len(part_lines) == 2 and all("IN (" in ln for ln in part_lines)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
