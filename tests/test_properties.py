"""Property-based invariants (hypothesis) for the determinism-critical
operators: these hold for ANY input, not just the driver tables, so they
pin the algebraic contracts the oracle gate relies on. Example counts
are kept small — each example pays a Spark job."""

from __future__ import annotations

from hypothesis import example, given, settings, strategies as st
from pyspark.sql import functions as F

_settings = settings(max_examples=5, deadline=None)


@st.composite
def _token_rows(draw):
    n = draw(st.integers(min_value=1, max_value=30))
    return [(i, draw(st.integers(min_value=0, max_value=5000))) for i in range(n)]


@given(rows=_token_rows())
@_settings
def test_pack_sequences_offsets_partition_the_stream(spark, rows):
    """For any token counts: per shard, start offsets are the exclusive
    cumsum (contiguous, gap-free) and chunk ids are consistent."""
    from flink_helloworld_spark.operators.sampling import pack_sequences

    import hashlib

    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    out = pack_sequences(df, "doc_id", "n_tokens", capacity=512, shards=4).collect()
    assert len(out) == len(rows)

    def h(doc_id: int) -> int:  # replay sampling._hash_bucket
        return int(hashlib.md5(f"pack{doc_id}".encode()).hexdigest()[:15], 16) % 10000

    by_shard: dict[int, list] = {}
    for r in out:
        by_shard.setdefault(r.shard, []).append(r)
    for rs in by_shard.values():
        # the operator's order is (hash, doc_id) — zero-token docs make
        # (start_offset, doc_id) ambiguous, so replay the real order
        rs.sort(key=lambda r: (h(r.doc_id), r.doc_id))
        expect = 0
        for r in rs:
            assert r.start_offset == expect
            assert r.chunk_id == r.start_offset // 512
            expect += r.n_tokens


@given(
    rows=st.lists(
        st.tuples(st.sampled_from(["a", "b", "c"]), st.integers(0, 10_000)),
        min_size=1,
        max_size=40,
    )
)
@_settings
def test_salted_sum_equals_plain_sum(spark, rows):
    """Salting must be invisible: exact-decimal two-level aggregation
    equals the plain groupBy for any values and any key mix."""
    from flink_helloworld_spark.operators.skew import salted_sum

    data = [(k, float(v) / 100.0, i) for i, (k, v) in enumerate(rows)]
    df = spark.createDataFrame(data, "k string, v double, rid long")
    salted = {
        r.k: (r.total, r.cnt)
        for r in salted_sum(df, "k", "v", "rid", buckets=4).collect()
    }
    plain = {
        r.k: (r.total, r.cnt)
        for r in df.groupBy("k")
        .agg(
            F.sum(F.col("v").cast("decimal(18,4)")).cast("double").alias("total"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .collect()
    }
    assert salted == plain


@given(
    texts=st.lists(
        st.text(alphabet="ab ", min_size=0, max_size=40), min_size=1, max_size=12
    )
)
@_settings
def test_exact_duplicates_partitions_rows(spark, texts):
    """keep + copies accounting: n_copies sums to the row count and each
    distinct text appears exactly once, for arbitrary (incl. empty and
    whitespace-only) texts."""
    from flink_helloworld_spark.operators.dedup import exact_duplicates

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    out = exact_duplicates(df).collect()
    assert sum(r.n_copies for r in out) == len(texts)
    assert len({r.text_hash for r in out}) == len(out)
    assert len(out) == len(set(texts))


@st.composite
def _word_docs(draw):
    vocab = ["aa", "bb", "cc", "dd", "ee", "ff"]
    n = draw(st.integers(min_value=1, max_value=8))
    docs = []
    for i in range(n):
        k = draw(st.integers(min_value=0, max_value=30))
        docs.append((i, " ".join(draw(st.sampled_from(vocab)) for _ in range(k))))
    return docs


@given(docs=_word_docs())
@_settings
def test_boilerplate_scrub_matches_python_reference(spark, docs):
    """For ANY corpus: the distributed scrub equals a sequential
    reimplementation — same segmentation, same global frequency rule,
    same in-order reassembly. A tiny vocab + w=3 forces real segment
    collisions across documents."""
    from flink_helloworld_spark.operators.dedup import boilerplate_scrub

    w = 3
    segs_by_doc: dict[int, list[str]] = {}
    for i, t in docs:
        ws = [x for x in t.split(" ") if x != ""]
        segs_by_doc[i] = [" ".join(ws[j : j + w]) for j in range(0, len(ws), w)]
    from collections import defaultdict

    doc_count: dict[str, set] = defaultdict(set)
    for i, segs in segs_by_doc.items():
        for s in segs:
            doc_count[s].add(i)
    expect = {}
    for i, segs in segs_by_doc.items():
        kept = [s for s in segs if len(doc_count[s]) < 2]
        expect[i] = (
            " ".join(kept),
            len(segs),
            sum(1 for s in segs if len(doc_count[s]) >= 2),
        )

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r.doc_id: (r.clean_text, r.n_segments, r.n_dropped)
        for r in boilerplate_scrub(df, w=w, min_docs=2).collect()
    }
    assert got == expect


@given(docs=_word_docs())
@_settings
def test_winnowing_matches_python_reference(spark, docs):
    """For ANY corpus: fingerprint sets equal the paper's algorithm run
    sequentially (k-gram md5s, window-of-w minima, distinct)."""
    import hashlib

    from flink_helloworld_spark.operators.text import winnowing_fingerprint

    k, w = 2, 3

    def norm(t: str) -> str:
        import re

        return re.sub(r"\s+", " ", t.strip().lower())

    def md5(s: str) -> str:
        return hashlib.md5(s.encode()).hexdigest()

    expect: dict[int, set] = {}
    for i, t in docs:
        nt = norm(t)
        ws = [x for x in nt.split(" ") if x != ""]
        if len(ws) < k:
            expect[i] = {md5(nt)}
            continue
        grams = [md5(" ".join(ws[j : j + k])) for j in range(len(ws) - k + 1)]
        sel = set()
        for j in range(max(len(grams) - w, 0) + 1):
            sel.add(min(grams[j : j + w]))
        expect[i] = sel

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got: dict[int, set] = {i: set() for i, _ in docs}
    for r in winnowing_fingerprint(df, k=k, w=w).collect():
        got[r.doc_id].add(r.fp)
    assert got == expect


@st.composite
def _sourced_docs(draw):
    vocab = ["aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh"]
    n = draw(st.integers(min_value=2, max_value=8))
    docs = []
    for i in range(n):
        k = draw(st.integers(min_value=0, max_value=20))
        src = draw(st.sampled_from(["src0", "src1", "src2"]))
        docs.append(
            (i, " ".join(draw(st.sampled_from(vocab)) for _ in range(k)), src)
        )
    return docs


@given(docs=_sourced_docs())
@_settings
def test_dsir_weights_match_python_reference(spark, docs):
    """For ANY corpus/source split: the distributed DSIR scorer equals a
    sequential reimplementation of the same smoothed bucket model —
    same md5 bucketing, same Laplace smoothing, same 9dp/6dp rounding
    ladder. Empty raw pools and empty target pools both stay lawful
    (the model smooths to a uniform prior, never divides by zero)."""
    import hashlib
    import math
    from collections import Counter
    from decimal import Decimal

    from flink_helloworld_spark.operators.selection import N_BUCKETS, dsir_weights

    def bucket(w: str) -> int:
        return int(hashlib.md5(("dsir" + w).encode()).hexdigest()[:15], 16) % N_BUCKETS

    tgt_counts: Counter = Counter()
    raw_counts: Counter = Counter()
    raw_docs: dict[int, list[int]] = {}
    for i, t, src in docs:
        ws = [x for x in t.split(" ") if x != ""]
        bs = [bucket(w) for w in ws]
        if src == "src0":
            tgt_counts.update(bs)
        else:
            raw_counts.update(bs)
            raw_docs[i] = bs
    tt, tr = sum(tgt_counts.values()), sum(raw_counts.values())
    pad = 0.5 * N_BUCKETS

    def log_ratio(b: int) -> Decimal:
        x = math.log((tgt_counts.get(b, 0) + 0.5) / (tt + pad)) - math.log(
            (raw_counts.get(b, 0) + 0.5) / (tr + pad)
        )
        # round-half-away at 9dp, as DECIMAL
        s = math.floor(abs(x) * 1e9 + 0.5) / 1e9
        return Decimal(repr(math.copysign(s, x))).quantize(Decimal("0.000000001"))

    expect = {}
    for i, bs in raw_docs.items():
        if not bs:
            continue  # docs with zero tokens produce no scored rows
        total = sum((log_ratio(b) for b in bs), Decimal(0))
        logw = math.floor(abs(float(total)) * 1e6 + 0.5) / 1e6
        expect[i] = (len(bs), math.copysign(logw, float(total)) + 0.0)

    df = spark.createDataFrame(docs, "doc_id long, text string, source string")
    got = {
        r.doc_id: (r.n_tokens, r.logw)
        for r in dsir_weights(df, target_source="src0").collect()
    }
    assert got == expect


@given(docs=_word_docs())
@_settings
def test_training_order_is_deterministic_permutation_any_corpus(spark, docs):
    """For ANY doc set: training_order emits exactly one row per doc,
    dense per-shard positions, unique global positions, and the md5
    order key contract (within a shard, positions sort by md5 hex)."""
    import hashlib
    from collections import defaultdict

    from flink_helloworld_spark.operators import layout as L

    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = L.training_order(df, seed="fz", n_shards=4).collect()
    assert len(out) == len(docs)
    assert len({r.global_pos for r in out}) == len(docs)
    per = defaultdict(list)
    for r in out:
        key = hashlib.md5(f"fz:{r.doc_id}".encode()).hexdigest()
        expected_shard = int(key[:15], 16) % 4
        assert r.shard_id == expected_shard
        per[r.shard_id].append((r.shard_pos, key, r.doc_id))
    for s, rows in per.items():
        rows.sort()
        assert [p for p, _, _ in rows] == list(range(len(rows)))
        assert [k for _, k, _ in rows] == sorted(k for _, k, _ in rows)


@given(
    vals=st.lists(
        st.floats(
            min_value=-100, max_value=100, allow_nan=False, allow_infinity=False
        ),
        min_size=1,
        max_size=40,
    ),
    q=st.sampled_from([1.0 / 3.0, 0.5, 2.0 / 3.0, 0.9]),
)
@_settings
def test_exact_percentile_matches_duckdb_quantile_cont(spark, vals, q):
    """The ppl_buckets / selection_prep oracles assume Spark's exact
    `percentile` and DuckDB's `quantile_cont` interpolate IDENTICALLY
    (both: lower + (higher-lower)·frac at position (n-1)·q over the
    sorted values). Pin that for arbitrary doubles and the quantiles the
    engine actually uses — if either engine changed its rule, every
    bucket-cut oracle would silently start hash-drifting."""
    import duckdb

    # 6dp-rounded inputs, as the engine feeds percentile 6dp scores
    vals = [round(v, 6) for v in vals]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = df.agg(F.expr(f"percentile(x, {q!r}D)").alias("p")).collect()[0].p
    want = duckdb.sql(
        "SELECT quantile_cont(x, ?) FROM (SELECT unnest(?::DOUBLE[]) AS x)",
        params=[q, vals],
    ).fetchone()[0]
    assert got == want or abs(got - want) == 0.0


@st.composite
def _dupish_corpus(draw):
    """Corpora with injected near-dup structure: a few base sentences,
    each replicated 1-4x, words long enough to shingle (n=3)."""
    vocab = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot",
             "golf", "hotel", "india", "juliet"]
    n_base = draw(st.integers(min_value=1, max_value=4))
    docs, i = [], 0
    for _ in range(n_base):
        k = draw(st.integers(min_value=3, max_value=10))
        text = " ".join(draw(st.sampled_from(vocab)) for _ in range(k))
        for _ in range(draw(st.integers(min_value=1, max_value=4))):
            docs.append((i, text))
            i += 1
    return docs


def _docs_df(spark, docs):
    return spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in docs],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


@given(docs=_dupish_corpus())
@_settings
def test_soft_weights_conserve_cluster_mass_any_corpus(spark, docs):
    """For ANY corpus: every doc comes back, weights are uniform within
    a cluster and equal 1/size, and total weight == distinct clusters —
    the equal-expected-mass invariant."""
    from flink_helloworld_spark.operators import dedup as D

    df = _docs_df(spark, docs)
    pairs = D.minhash_dedup_pairs(df).where("is_dup")
    out = D.soft_dedup_weights(df, pairs).collect()
    assert sorted(r.doc_id for r in out) == sorted(i for i, _ in docs)
    by_cluster: dict = {}
    for r in out:
        by_cluster.setdefault(r.cluster_id, []).append(r)
    for cid, rs in by_cluster.items():
        assert all(r.cluster_size == len(rs) for r in rs), cid
        assert all(abs(r.weight - 1.0 / len(rs)) < 1e-12 for r in rs), cid
    assert abs(sum(r.weight for r in out) - len(by_cluster)) < 1e-9


@given(docs=_dupish_corpus())
@_settings
def test_leakage_split_cluster_coherent_any_corpus(spark, docs):
    """For ANY corpus: the split covers every doc, uses only the two
    labels, and never cuts through a near-dup cluster; exact duplicates
    therefore always land on the same side."""
    from flink_helloworld_spark.operators import dedup as D

    df = _docs_df(spark, docs)
    pairs = D.minhash_dedup_pairs(df).where("is_dup")
    out = D.leakage_safe_split(df, pairs).collect()
    assert sorted(r.doc_id for r in out) == sorted(i for i, _ in docs)
    assert {r.split for r in out} <= {"train", "holdout"}
    by_cluster: dict = {}
    for r in out:
        by_cluster.setdefault(r.cluster_id, set()).add(r.split)
    assert all(len(s) == 1 for s in by_cluster.values())
    by_text: dict = {}
    split_of = {r.doc_id: r.split for r in out}
    for i, t in docs:
        by_text.setdefault(t, set()).add(split_of[i])
    assert all(len(s) == 1 for s in by_text.values())


@given(docs=_dupish_corpus())
@_settings
def test_band_plan_monotone_any_corpus(spark, docs):
    """For ANY corpus: all layouts price the same audited pair set, and
    both expected recall and wasted-verification rate are monotone
    non-decreasing in the band count (the S-curve's defining shape)."""
    from flink_helloworld_spark.operators import dedup as D

    rows = sorted(
        D.minhash_band_plan(_docs_df(spark, docs)).collect(),
        key=lambda r: r.bands,
    )
    if not rows:  # corpora too short to shingle produce no pairs
        return
    assert len({r.n_pairs for r in rows}) == 1
    for a, b in zip(rows, rows[1:]):
        if a.dup_recall is not None and b.dup_recall is not None:
            assert b.dup_recall >= a.dup_recall - 1e-12
        if a.nondup_catch_rate is not None and b.nondup_catch_rate is not None:
            assert b.nondup_catch_rate >= a.nondup_catch_rate - 1e-12


@given(
    vecs=st.lists(
        st.lists(
            st.floats(min_value=-1.0, max_value=1.0, allow_nan=False),
            min_size=8,
            max_size=8,
        ),
        min_size=1,
        max_size=24,
    )
)
@_settings
def test_embedding_gate_partitions_by_bucket_any_vectors(spark, vecs):
    """For ANY vectors: exactly one keeper per occupied bucket — the
    lowest id — and every vector gets a verdict."""
    from flink_helloworld_spark.operators.similarity import (
        embedding_first_arrival,
    )

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    out = embedding_first_arrival(df, planes=4, dims=8).collect()
    assert len(out) == len(vecs)
    by_bucket: dict = {}
    for r in out:
        by_bucket.setdefault(r.bucket, []).append(r)
    for bucket, rs in by_bucket.items():
        keepers = [r for r in rs if r.kept]
        assert len(keepers) == 1, bucket
        assert keepers[0].vec_id == min(r.vec_id for r in rs)


def _expected_banded_verdicts(vecs, planes, bands, dims):
    """First-principles replay of the banded gate: per-band hyperplane
    buckets from the md5 seed contract (band b, plane p, dim d →
    md5('{b}~{p}:{d}')), kept iff lowest id on EVERY band. Left-to-right
    float summation matches Spark's aggregate() order."""
    import hashlib

    def sign(b, p, d):
        h = hashlib.md5(f"{b}~{p}:{d}".encode()).hexdigest()[0]
        return 1.0 if int(h, 16) % 2 == 0 else -1.0

    def bucket(vec, b):
        out = 0
        for p in range(planes):
            s = 0.0
            for d in range(dims):
                s += vec[d] * sign(b, p, d)
            if s > 0:
                out += 1 << p
        return out

    firsts: dict = {}
    incid = []
    for i, v in enumerate(vecs):
        for b in range(bands):
            key = (b, bucket(v, b))
            incid.append((i, key))
            if key not in firsts or i < firsts[key]:
                firsts[key] = i
    verdict = {}
    for i, _ in enumerate(vecs):
        nf = sum(1 for j, key in incid if j == i and firsts[key] == i)
        verdict[i] = (bands, nf, nf == bands)
    return verdict


@given(
    vecs=st.lists(
        st.lists(
            st.floats(min_value=-1.0, max_value=1.0, allow_nan=False),
            min_size=8,
            max_size=8,
        ),
        min_size=1,
        max_size=24,
    )
)
@_settings
def test_banded_gate_matches_first_principles_any_vectors(spark, vecs):
    """For ANY vectors: the banded gate's (n_bands, n_first, kept)
    equals an independent pure-Python replay of the per-band
    first-arrival contract, and a doc dropped at bands=k stays dropped
    at bands=k+1 (OR-construction only ever drops MORE)."""
    from flink_helloworld_spark.operators.similarity import (
        embedding_first_arrival_banded,
    )

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    expect = _expected_banded_verdicts(vecs, planes=4, bands=3, dims=8)
    out = {
        r.vec_id: (r.n_bands, r.n_first, r.kept)
        for r in embedding_first_arrival_banded(
            df, planes=4, bands=3, dims=8
        ).collect()
    }
    assert out == expect
    kept2 = {
        r.vec_id
        for r in embedding_first_arrival_banded(
            df, planes=4, bands=2, dims=8
        ).collect()
        if r.kept
    }
    assert {i for i, (_, _, k) in out.items() if k} <= kept2


@given(
    vecs=st.lists(
        st.lists(
            st.floats(min_value=-1.0, max_value=1.0, allow_nan=False),
            min_size=8,
            max_size=8,
        ),
        min_size=1,
        max_size=16,
    )
)
@_settings
def test_verified_gate_matches_first_principles_any_vectors(spark, vecs):
    """For ANY vectors: the verified gate's (n_collisions, n_verified,
    kept) equals a pure-Python replay — per-band owner, one rounded
    cosine per collision vs the owner, kept iff none verifies."""
    import hashlib
    import math

    from flink_helloworld_spark.operators.similarity import (
        embedding_first_arrival_verified,
    )

    planes, bands, dims, thr = 3, 2, 8, 0.9

    def sign(b, p, d):
        h = hashlib.md5(f"{b}~{p}:{d}".encode()).hexdigest()[0]
        return 1.0 if int(h, 16) % 2 == 0 else -1.0

    def bucket(vec, b):
        out = 0
        for p in range(planes):
            s = 0.0
            for d in range(dims):
                s += vec[d] * sign(b, p, d)
            if s > 0:
                out += 1 << p
        return out

    def rhe(x, dp=6):  # round-half-away, the engine contract
        q = 10 ** dp
        return math.floor(abs(x) * q + 0.5) / q * (1 if x >= 0 else -1)

    owners: dict = {}
    for i, v in enumerate(vecs):
        for b in range(bands):
            key = (b, bucket(v, b))
            if key not in owners or i < owners[key]:
                owners[key] = i
    expect = {}
    for i, v in enumerate(vecs):
        ncol = nver = 0
        for b in range(bands):
            o = owners[(b, bucket(v, b))]
            if o == i:
                continue
            ncol += 1
            ov = vecs[o]
            dot = sum(x * y for x, y in zip(v, ov))
            nv = math.sqrt(sum(x * x for x in v))
            no = math.sqrt(sum(x * x for x in ov))
            if nv > 0 and no > 0 and rhe(dot / (nv * no)) >= thr:
                nver += 1
        expect[i] = (ncol, nver, nver == 0)

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    got = {
        r.vec_id: (r.n_collisions, r.n_verified, r.kept)
        for r in embedding_first_arrival_verified(
            df, threshold=thr, planes=planes, bands=bands, dims=dims
        ).collect()
    }
    assert got == expect


def test_verified_gate_zero_false_drops_at_low_planes(spark):
    """The operating point verification buys: at planes=6 (64
    buckets/band — heavy hash collisions, the state-LEAN setting where
    the UNVERIFIED gate wrongly drops cluster-firsts) the verified gate
    must keep EVERY planted cluster's first vector while still dropping
    most true near-dups."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from flink_helloworld_spark.operators.similarity import (
        embedding_first_arrival_banded,
        embedding_first_arrival_verified,
        planted_embeddings,
    )

    ids = spark.range(256).select(
        F.col("id").alias("vec_id"),
        F.array(F.lit(0.0)).cast("array<float>").alias("embedding"),
    )
    planted = planted_embeddings(ids)
    firsts = {
        r.vec_id
        for r in planted.withColumn(
            "_m", F.min("vec_id").over(Window.partitionBy("cluster_id"))
        )
        .where("vec_id = _m")
        .collect()
    }
    pv = planted.select("vec_id", "embedding")
    unverified = {
        r.vec_id: r.kept
        for r in embedding_first_arrival_banded(
            pv, planes=6, bands=4
        ).collect()
    }
    verified = {
        r.vec_id: r.kept
        for r in embedding_first_arrival_verified(
            pv, threshold=0.8, planes=6, bands=4
        ).collect()
    }
    # the unverified gate at this setting DOES wrongly drop firsts
    # (otherwise this test shows nothing)
    assert any(not unverified[i] for i in firsts)
    # the verified gate never does
    assert all(verified[i] for i in firsts)
    # and it still gates: most true near-dups (non-firsts) drop
    dups = [i for i in verified if i not in firsts]
    dropped = sum(1 for i in dups if not verified[i])
    assert dropped / len(dups) > 0.8


def test_verified_gate_recall_curve_on_planted(spark):
    """The verified-gate sweep's contract on planted data: recall
    non-decreasing with bands at fixed planes, ZERO false drops in
    every arm at threshold 0.9 (the property the verification buys),
    and every arm scores the full population."""
    from pyspark.sql import functions as F

    from flink_helloworld_spark.operators.similarity import (
        embedding_gate_verified_recall_curve,
    )

    ids = spark.range(256).select(
        F.col("id").alias("vec_id"),
        F.array(F.lit(0.0)).cast("array<float>").alias("embedding"),
    )
    rows = embedding_gate_verified_recall_curve(
        ids, bands_sweep=(2, 4), planes_sweep=(6, 8)
    ).collect()
    assert len(rows) == 4
    by_arm = {(r.bands, r.planes): r for r in rows}
    for r in rows:
        assert r.n_vectors == 256
        assert r.false_drop_rate == 0.0
        assert r.n_dropped_first == 0
    for p in (6, 8):
        assert by_arm[(2, p)].recall <= by_arm[(4, p)].recall
    assert by_arm[(4, 6)].recall > 0.9


def test_gate_recall_curve_monotone_on_planted(spark):
    """On the planted 16-cluster mixture the banded-gate sweep must show
    its knobs working: recall non-decreasing with bands at fixed planes,
    false-collision non-increasing with planes at fixed bands, and every
    arm scores the full vector population."""
    from pyspark.sql import functions as F

    from flink_helloworld_spark.operators.similarity import (
        embedding_gate_recall_curve,
    )

    ids = spark.range(256).select(
        F.col("id").alias("vec_id"),
        F.array(F.lit(0.0)).cast("array<float>").alias("embedding"),
    )
    rows = embedding_gate_recall_curve(
        ids, bands_sweep=(1, 2, 4), planes_sweep=(6, 8)
    ).collect()
    assert len(rows) == 6
    by_arm = {(r.bands, r.planes): r for r in rows}
    for r in rows:
        assert r.n_vectors == 256
        assert r.n_true_dup == 256 - 16
    for p in (6, 8):
        assert (
            by_arm[(1, p)].recall
            <= by_arm[(2, p)].recall
            <= by_arm[(4, p)].recall
        )
    for k in (1, 2, 4):
        assert (
            by_arm[(k, 8)].false_collision_rate
            <= by_arm[(k, 6)].false_collision_rate
        )
    # the gate must actually gate: the widest arm catches most dups
    assert by_arm[(4, 6)].recall > 0.9


# --- round-8 families: CDC chunking, MG merge step, pagerank -------------------


@st.composite
def _word_texts(draw):
    n_docs = draw(st.integers(min_value=1, max_value=4))
    docs = []
    for i in range(n_docs):
        n = draw(st.integers(min_value=0, max_value=60))
        words = [
            draw(st.sampled_from(["aa", "bb", "cc", "dd", "ee", "ff", "gg"]))
            for _ in range(n)
        ]
        docs.append((i, " ".join(words)))
    return docs


@given(docs=_word_texts())
@_settings
def test_cdc_chunks_tile_any_document(spark, docs):
    """For ANY text: chunks are contiguous, gap-free, start at 0, end at
    the last word, and re-running produces the identical chunking."""
    from flink_helloworld_spark.operators.dedup import cdc_chunks

    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = cdc_chunks(df, w=3, mod=4).collect()
    again = cdc_chunks(df, w=3, mod=4).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, text in docs:
        n_words = len([w for w in text.split(" ") if w])
        if n_words == 0:
            assert doc_id not in by_doc  # empty docs chunkless
            continue
        ch = sorted(by_doc[doc_id], key=lambda r: r.chunk_idx)
        assert ch[0].start_tok == 0
        for a, b in zip(ch, ch[1:]):
            assert b.start_tok == a.start_tok + a.chunk_len
            assert a.chunk_len >= 1
        assert ch[-1].start_tok + ch[-1].chunk_len == n_words


@given(
    items=st.lists(
        st.sampled_from([f"i{j}" for j in range(12)]), min_size=1, max_size=80
    ),
    cap=st.integers(min_value=2, max_value=6),
    split=st.integers(min_value=1, max_value=4),
)
@settings(max_examples=8, deadline=None)
def test_mg_merge_step_bounds_hold_for_any_stream(items, cap, split):
    """Pure-python check of the exact MG batch step the streaming
    processor runs: for ANY stream, ANY capacity, ANY batch split —
    weight ≤ true ≤ weight + err_total, and anything with true count
    > n/(cap+1) stays tracked. (No Spark job: this pins the algorithm
    the processor embeds, so hypothesis can afford real coverage.)"""
    true: dict[str, int] = {}
    for it in items:
        true[it] = true.get(it, 0) + 1

    # replay HeavyHittersProcessor.handleInputRows' merge step
    weights: dict[str, int] = {}
    err_total = 0
    sz = (len(items) + split - 1) // split
    for b in range(split):
        batch = items[b * sz : (b + 1) * sz]
        if not batch:
            continue
        for it in batch:
            weights[it] = weights.get(it, 0) + 1
        if len(weights) > cap:
            ordered = sorted(weights.items(), key=lambda kv: (-kv[1], kv[0]))
            d = ordered[cap][1]
            weights = {k: v - d for k, v in ordered if v - d > 0}
            err_total += d

    assert len(weights) <= cap
    for it, w in weights.items():
        assert w <= true[it] <= w + err_total, (it, w, err_total)
    n = len(items)
    for it, cnt in true.items():
        if cnt > n / (cap + 1):
            assert it in weights, (it, cnt, n, cap)


@st.composite
def _random_graph(draw):
    n = draw(st.integers(min_value=2, max_value=8))
    pairs = set()
    for _ in range(draw(st.integers(min_value=1, max_value=12))):
        a = draw(st.integers(min_value=0, max_value=n - 1))
        b = draw(st.integers(min_value=0, max_value=n - 1))
        if a != b:
            pairs.add((f"n{min(a,b)}", f"n{max(a,b)}"))
    return sorted(pairs)


@given(pairs=_random_graph())
@_settings
def test_pagerank_mass_and_positivity_on_any_graph(spark, pairs):
    """For ANY undirected graph: ranks are positive, total mass is 1
    (within the 9-dp ladder's accumulation), and the result is
    deterministic across re-runs."""
    from flink_helloworld_spark.operators.graph import pagerank

    if not pairs:
        return
    both = list(pairs) + [(b, a) for a, b in pairs]
    e = spark.createDataFrame(both, "src string, dst string")
    out = {r["node"]: r["rank"] for r in pagerank(e, iters=4).collect()}
    nodes = {x for p in pairs for x in p}
    assert set(out) == nodes
    assert all(v > 0 for v in out.values())
    assert abs(sum(out.values()) - 1.0) < 1e-6


@st.composite
def _vec_corpus(draw):
    n = draw(st.integers(min_value=12, max_value=28))
    dims = 8
    vecs = []
    for i in range(n):
        vecs.append(
            (
                i,
                [
                    float(draw(st.integers(min_value=-4, max_value=4)))
                    for _ in range(dims)
                ],
            )
        )
    return vecs


@given(vecs=_vec_corpus())
@_settings
def test_route_frozen_np_equals_batch_routing_any_vectors(spark, vecs):
    """For ANY small-integer vector corpus (including zero vectors and
    exact ties — integer coordinates make rounded-cosine ties likely):
    the collected-quantizer numpy routing the streaming ingest uses
    assigns every appended vector to EXACTLY the cell the batch
    ivf_index_append routing picks. This is the invariant that makes
    streaming-vs-batch posting parity hold for any data, not just the
    driver tables."""
    import numpy as np

    from flink_helloworld_spark.operators import similarity as S

    base = spark.createDataFrame(
        vecs[::2], "vec_id long, embedding array<double>"
    )
    inc_rows = vecs[1::2]
    inc = spark.createDataFrame(
        inc_rows, "vec_id long, embedding array<double>"
    )
    index, postings = S.build_ivf_index(
        base, n_centroids=4, train_floor=8
    )
    index = index.cache()
    expected = sorted(
        (r.centroid_id, r.member_id)
        for r in S.ivf_index_append(index, postings.limit(0), inc).collect()
    )
    quant = S.collect_ivf_quantizer(index)
    mat = np.array([v for _, v in inc_rows], dtype=np.float64)
    cells = S.route_frozen_np(mat, quant, n_super_probe=2)
    got = sorted(
        (int(c), int(i))
        for c, (i, _) in zip(cells, inc_rows)
        if c >= 0
    )
    index.unpersist()
    assert got == expected


@st.composite
def _mixture_corpus(draw):
    n = draw(st.integers(min_value=2, max_value=5))
    rows, weights = [], {}
    for i in range(n):
        u = draw(st.integers(min_value=0, max_value=120))
        rows.append((i, " ".join(["t"] * u), f"s{i}"))
        weights[f"s{i}"] = draw(
            st.sampled_from([0.0, 0.05, 0.1, 0.25, 0.5, 1.0])
        )
    if all(w == 0.0 for w in weights.values()):
        weights[f"s{n - 1}"] = 0.5
    # normalize to a true mixture (sum 1): the >=-naive guarantee
    # assumes the naive plan is FEASIBLE, i.e. sum(w)*B <= B
    tot = sum(weights.values())
    weights = {k: v / tot for k, v in weights.items()}
    budget = draw(st.integers(min_value=1, max_value=2000))
    return rows, weights, budget


@given(cfg=_mixture_corpus())
# the r10 mixed-precision counterexample, pinned deterministically:
# non-9-dp weights (1/21, 20/21) with budget 1 lost 5e-8 of the
# budget because the water level was computed against DECIMAL(28,9)
# weight prefixes while the w·λ target used the full double — fixed
# by quantizing weights to the 9-dp ladder at operator entry
@example(
    cfg=(
        [(0, "t t", "s0"), (1, "", "s1")],
        {"s0": 1.0 / 21.0, "s1": 20.0 / 21.0},
        1,
    )
)
@_settings
def test_mixture_reallocate_conserves_budget_and_beats_naive(spark, cfg):
    """For ANY per-source capacities, weights, and budget: the
    reallocated targets conserve the budget exactly (up to the 9-dp
    per-row rounding, n·5e-10 absolute) whenever capacity can absorb
    it (min(B, sum U over weighted sources)), never exceed capacity in
    the down-case, and total effective tokens are >= the naive w*B
    split's (the naive split is feasible for the same concave
    program)."""
    rows, weights, budget = cfg
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    )
    from flink_helloworld_spark.operators.sampling import mixture_reallocate

    out = mixture_reallocate(docs, weights, budget).collect()
    u = {r.source: r.unique_tokens for r in out}
    tot_u = sum(
        r.unique_tokens for r in out if weights.get(r.source, 0.0) > 0
    )
    got_total = sum(r.realloc_target for r in out)
    want_total = float(min(budget, tot_u)) if budget < tot_u else float(
        budget if tot_u > 0 else 0
    )
    n = len(out)
    assert abs(got_total - want_total) <= n * 1e-8 + 1e-9 * want_total
    if budget < tot_u:  # down-case: all fresh, capacity respected
        for r in out:
            assert r.realloc_target <= u[r.source] + 1e-9
            assert r.effective_tokens == r.realloc_target
    # optimality vs the naive split (>= with float/9dp slack)
    eff = sum(r.effective_tokens for r in out)
    naive = sum(r.naive_effective for r in out)
    assert eff >= naive - n * 1e-8
    # unweighted sources never receive budget
    for r in out:
        if weights.get(r.source, 0.0) == 0.0:
            assert r.realloc_target == 0.0
