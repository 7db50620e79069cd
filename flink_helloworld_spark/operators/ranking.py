"""Term-relevance ranking: TF-IDF and BM25 over the documents table.

The reference fronts its results with Elasticsearch (HelloWorldFlink.java
term-query surface, RedisTest.java lookup cache); ES relevance is BM25.
These operators re-express that scoring Spark-first so a user of the
reference's search surface can rank documents without an external engine:

- ``tfidf_top_terms``: per-document top-k salient terms (the classic
  keyword-extraction pass a training-data pipeline runs for topic
  filtering / source diagnostics).
- ``bm25_search``: score documents against a small bag of query terms
  with Lucene-style BM25 (k1/b defaults match Lucene), returning the
  top-n hits — the batch analog of the ES ``match`` query.

Scale shape (100 TB): everything is exploded-words → hash aggregations
with map-side partial combine. The document-frequency table is
vocabulary-sized — usually broadcastable, but left to AQE to promote
(raw web vocabularies reach 1e8+ terms); corpus scalars (N, avgdl) ride a
1-row broadcast cross join, never a driver collect. No Python UDFs.

Float determinism contract: scores are rounded to 6 dp BEFORE ranking in
both this plan and the DuckDB oracle, and per-term BM25 contributions are
added in fixed expression order (not a variable-order SUM), so value
hashes match across engines and partitionings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import _words

# Lucene defaults (BM25Similarity.java constructor)
BM25_K1 = 1.2
BM25_B = 0.75


def _doc_terms(docs: DataFrame, text_col: str) -> DataFrame:
    """(doc_id, term) — one row per word occurrence (not distinct)."""
    return docs.select(
        "doc_id", F.explode(_words(F.col(text_col))).alias("term")
    )


def tfidf_top_terms(
    docs: DataFrame, k: int = 5, text_col: str = "text"
) -> DataFrame:
    """Per-document top-k terms by TF-IDF (idf = ln(N/df)).

    Output: (doc_id, term, tf, tfidf, rank) with tfidf rounded to 6 dp
    and rank computed ON the rounded value (term asc tiebreak), so the
    ranking is float-summation-order independent.
    """
    terms = _doc_terms(docs, text_col)
    # ONE pass over the token stream; df and N re-aggregate the (doc,
    # term) tf table — already distinct pairs, orders of magnitude
    # smaller than the tokens — instead of re-exploding the corpus
    from ._cache import share

    tf = share(
        terms.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    )
    df_t = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = tf.agg(F.countDistinct("doc_id").alias("n"))
    # df is vocabulary-sized: small for curated corpora but can reach 1e8+
    # terms on raw web text, so no forced broadcast — AQE promotes the
    # join to broadcast at runtime when the measured size allows
    scored = (
        tf.join(df_t, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            F.col("tf").cast("int").alias("tf"),
            F.round(
                F.col("tf")
                * F.log(F.col("n").cast("double") / F.col("df").cast("double")),
                6,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= k)
        .select("doc_id", "term", "tf", "tfidf", "rank")
    )


def bm25_search(
    docs: DataFrame,
    query_terms: tuple[str, ...] = ("the", "data"),
    topn: int = 20,
    k1: float = BM25_K1,
    b: float = BM25_B,
    text_col: str = "text",
    postings: DataFrame | None = None,
    norms: DataFrame | None = None,
) -> DataFrame:
    """BM25 score of every matching document against ``query_terms``,
    top-n by (score desc, doc_id) — the ES ``match`` query, batch-side.

    idf(t) = ln(1 + (N - df + 0.5)/(df + 0.5))          (Lucene BM25)
    w(t,d) = idf * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
    score  = w(t1,d) + w(t2,d) + ...   -- FIXED expression order per doc

    The per-term tf columns come from one conditional aggregation over the
    exploded words (one shuffle on doc_id); df and the N/avgdl scalars are
    broadcast. Scores are rounded to 6 dp before ranking.

    INDEXED form (the Lucene postings+norms layout): pass ``postings``
    (a ``positional_postings`` artifact or, at a persisted deployment,
    the ``postings_store_probe`` of the query terms — tf/df then come
    from a bucket-pruned scan of the m terms' posting lists) and
    ``norms`` (the ``(doc_id, dl)`` sidecar ``postings_store_norms``
    reads — N/avgdl/dl without touching text; N counts EVERY live doc,
    including zero-token ones the posting table can't see). With both,
    the corpus text is never re-read; output is identical to the scan
    form, so the two share one oracle."""
    terms = list(query_terms)
    if postings is not None:
        words = postings.select("doc_id", "term")
    else:
        words = docs.select(
            "doc_id", F.explode(_words(F.col(text_col))).alias("term")
        )
    # one pass: per-doc tf for each query term (conditional agg, map-side
    # combinable) — only docs containing >=1 query term survive
    tf_cols = [
        F.sum(F.when(F.col("term") == t, 1).otherwise(0)).alias(f"tf_{i}")
        for i, t in enumerate(terms)
    ]
    tfs = (
        words.where(F.col("term").isin(terms))
        .groupBy("doc_id")
        .agg(*tf_cols)
    )
    # df per query term from the same filtered stream (vocab-of-|q| rows)
    dfs = (
        words.where(F.col("term").isin(terms))
        .groupBy("term")
        .agg(F.countDistinct("doc_id").alias("df"))
    )
    # corpus scalars: N = all docs, avgdl over all docs (dl = word count)
    if norms is not None:
        dl = norms.select("doc_id", F.col("dl").cast("int").alias("dl"))
        stats = dl.agg(
            F.count("*").alias("n"),
            (F.sum("dl").cast("double") / F.count("*").cast("double"))
            .alias("avgdl"),
        )
    else:
        stats = docs.select(
            F.size(_words(F.col(text_col))).alias("dl")
        ).agg(
            F.count("*").alias("n"),
            (F.sum("dl").cast("double") / F.count("*").cast("double"))
            .alias("avgdl"),
        )
        dl = docs.select(
            "doc_id", F.size(_words(F.col(text_col))).alias("dl")
        )

    base = (
        tfs.join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
    )
    # pivot df values into scalar columns via a broadcast 1-row agg so the
    # score expression stays a fixed-order column formula. The pivot
    # names columns after the raw terms — positionally rename to
    # _df_{i} (explicit pivot values fix the column order) so a query
    # term equal to a plan column ('n', 'dl', ...) or containing a
    # backtick can't collide or break parsing
    df_row = (
        dfs.groupBy()
        .pivot("term", terms)
        .agg(F.first("df"))
        .toDF(*[f"_df_{i}" for i in range(len(terms))])
    )
    base = base.crossJoin(F.broadcast(df_row))

    def contrib(i: int, t: str):
        tf = F.col(f"tf_{i}").cast("double")
        df_c = F.coalesce(F.col(f"_df_{i}"), F.lit(0)).cast("double")
        idf = F.log(
            F.lit(1.0)
            + (F.col("n").cast("double") - df_c + F.lit(0.5)) / (df_c + F.lit(0.5))
        )
        norm = tf + F.lit(k1) * (
            F.lit(1.0 - b) + F.lit(b) * F.col("dl").cast("double") / F.col("avgdl")
        )
        return F.when(tf > 0, idf * tf * F.lit(k1 + 1.0) / norm).otherwise(F.lit(0.0))

    score = contrib(0, terms[0])
    for i, t in enumerate(terms[1:], start=1):
        score = score + contrib(i, t)

    scored = base.select(
        "doc_id", F.round(score, 6).alias("bm25")
    ).where(F.col("bm25") > 0)
    # distributed top-n (TakeOrderedAndProject: per-partition heads merged
    # on the driver — no global sort, no single-partition window), then
    # rank the <= topn survivors with a trivially small window
    top = scored.orderBy(F.col("bm25").desc(), F.col("doc_id")).limit(topn)
    w = Window.orderBy(F.col("bm25").desc(), F.col("doc_id"))
    return top.select(
        F.row_number().over(w).cast("int").alias("rank"), "doc_id", "bm25"
    )


def inverted_index(
    docs: DataFrame, text_col: str = "text", top_terms: int = 50
) -> DataFrame:
    """Build the posting lists of a term index — the batch construction
    of what Elasticsearch maintains incrementally (the reference's search
    backend): per term, the sorted doc_id posting list and its document
    frequency, for the ``top_terms`` highest-df terms.

    One distinct (term, doc) aggregation then one group per term;
    collect_list stays bounded because a posting list is per-term (skewed
    stopword terms are real at corpus scale — production would shard
    postings longer than a block size; df itself comes from the same
    group, not a second pass). Postings serialize to a CSV string so the
    output hashes identically across engines."""
    terms = (
        docs.select("doc_id", F.explode(_words(F.col(text_col))).alias("term"))
        .distinct()
    )
    postings = terms.groupBy("term").agg(
        F.count(F.lit(1)).cast("int").alias("df"),
        F.array_join(
            F.sort_array(F.collect_list("doc_id")), ","
        ).alias("postings"),
    )
    return postings.orderBy(F.col("df").desc(), "term").limit(top_terms)


def textrank_scores(
    docs: DataFrame,
    text_col: str = "text",
    damping: float = 0.85,
    n_iters: int = 4,
    round_dp: int = 6,
) -> DataFrame:
    """TextRank (Mihalcea & Tarau 2004) keyword scoring: PageRank power
    iteration over the corpus-wide word co-occurrence graph (undirected,
    adjacent-token edges, edge weight = co-occurrence count), the
    graph-based rung of the keyword ladder above ``tfidf_top_terms``.
    Extends the iterative-trainer family (BPE / k-means / GD classifier)
    to graph algorithms: fixed ``n_iters`` power-iteration rounds, each
    one hash join + one aggregation, all replayed by a chained-CTE
    DuckDB oracle.

    Update rule (TextRank's, constant teleport — not 1/N):
        PR(v) = (1-d) + d · Σ_{u ∈ adj(v)} (w_uv / W_u) · PR(u)
    with W_u the weighted degree of u. Words with no neighbours
    (single-token documents) keep PR = 1-d.

    Determinism ladder: per-edge contribution rounded to 9 dp, summed as
    DECIMAL(28,9) (order-independent), next PR rounded to 9 dp; final
    score one rounding to ``round_dp``.

    Scale shape: edges come from one lag window per doc (state bounded
    per doc) + one pair-keyed count agg; every iteration is a hash join
    of the V-row rank table against the E-row edge table (both keyed on
    the word — co-partitioned after the first shuffle) and a dst-keyed
    agg. Nothing driver-side, no per-iteration collect; the rank table
    lives distributed (unlike the k-means centroid sync, V is unbounded).
    """
    from pyspark.sql import Window as W

    toks = docs.select(
        "doc_id", F.posexplode(_words(F.col(text_col))).alias("pos", "w")
    ).withColumn(
        "prev", F.lag("w").over(W.partitionBy("doc_id").orderBy("pos"))
    )
    pairs = toks.where(
        F.col("prev").isNotNull() & (F.col("prev") != F.col("w"))
    ).select(
        F.least("prev", "w").alias("a"), F.greatest("prev", "w").alias("b")
    )
    und = pairs.groupBy("a", "b").agg(F.count(F.lit(1)).alias("cnt"))
    edges = und.select(
        F.col("a").alias("src"), F.col("b").alias("dst"), "cnt"
    ).unionAll(und.select(F.col("b").alias("src"), F.col("a").alias("dst"), "cnt"))
    wdeg = edges.groupBy("src").agg(F.sum("cnt").alias("wd"))
    edges = edges.join(wdeg, "src")

    nodes = toks.select(F.col("w").alias("word")).distinct()
    d = float(damping)
    pr = nodes.withColumn("pr", F.lit(1.0))
    for _ in range(n_iters):
        contrib = (
            edges.join(pr.withColumnRenamed("word", "src"), "src")
            .select(
                F.col("dst").alias("word"),
                F.round(
                    F.lit(d)
                    * (F.col("cnt").cast("double") / F.col("wd").cast("double"))
                    * F.col("pr"),
                    9,
                )
                .cast("decimal(28,9)")
                .alias("term"),
            )
            .groupBy("word")
            .agg(F.sum("term").alias("s"))
        )
        pr = nodes.join(contrib, "word", "left").select(
            "word",
            F.round(
                F.lit(1.0 - d)
                + F.coalesce(F.col("s").cast("double"), F.lit(0.0)),
                9,
            ).alias("pr"),
        )
    return pr.select("word", F.round("pr", round_dp).alias("textrank"))


# --- reciprocal rank fusion ---------------------------------------------------


def rrf_fuse(
    rankings: list[DataFrame],
    k: int = 60,
    topn: int = 20,
    id_col: str = "doc_id",
) -> DataFrame:
    """Reciprocal Rank Fusion (Cormack/Clarke/Buettcher, SIGIR'09) of
    N ranked lists — THE standard hybrid-retrieval combiner (lexical
    BM25 ⊕ dense ⊕ priors) because it needs no score calibration:
    rrf(d) = Σ_lists 1/(k + rank_i(d)), summed over the lists that
    contain d, in FIXED list order (IEEE determinism for the oracle).

    Inputs are (id, rank) DataFrames — already top-bounded by their
    producers, so the fusion is a join over candidate lists (≤ Σ topn_i
    rows), never corpus-sized: the scale cost lives in the upstream
    rankers, fusion itself is a driver-light epilogue on tiny lists.
    Output: (id, rrf_score, rank_1..rank_N, fused rank) top ``topn``
    by (score desc, id) — deterministic total order.
    """
    from pyspark.sql import Window

    if len(rankings) < 2:  # not assert: must survive python -O
        raise ValueError("rrf_fuse needs at least two ranked lists")
    fused = None
    for i, r in enumerate(rankings, start=1):
        side = r.select(
            F.col(id_col), F.col("rank").cast("int").alias(f"rank_{i}")
        )
        fused = side if fused is None else fused.join(side, id_col, "full_outer")
    contribs = [
        F.coalesce(
            F.lit(1.0) / (F.lit(float(k)) + F.col(f"rank_{i}").cast("double")),
            F.lit(0.0),
        )
        for i in range(1, len(rankings) + 1)
    ]
    score = contribs[0]
    for c in contribs[1:]:
        score = score + c
    scored = fused.select(
        id_col,
        *[F.col(f"rank_{i}") for i in range(1, len(rankings) + 1)],
        score.alias("rrf_score"),
    )
    # candidate set is bounded (union of top-n lists) — the global
    # window is over ≤ Σ topn_i rows by construction, not the corpus
    w = Window.orderBy(F.col("rrf_score").desc(), F.col(id_col))
    return (
        scored.withColumn("rrf_rank", F.row_number().over(w).cast("int"))
        .where(F.col("rrf_rank") <= topn)
    )


def quality_prior_ranking(
    docs: DataFrame, topn: int = 100, id_col: str = "doc_id"
) -> DataFrame:
    """Static document-quality prior as a ranked list: top ``topn`` by
    (quality_score desc, id) — the query-independent half of a hybrid
    retrieval stack (the host-PageRank slot, when no link graph
    exists). orderBy().limit() executes as TakeOrderedAndProject —
    distributed top-k, no global sort; the row_number window then runs
    over ``topn`` rows only.
    """
    from pyspark.sql import Window

    from flink_helloworld_spark.operators.text import quality_score

    q = quality_score(docs).select(id_col, "quality_score")
    top = q.orderBy(F.col("quality_score").desc(), F.col(id_col)).limit(topn)
    w = Window.orderBy(F.col("quality_score").desc(), F.col(id_col))
    return top.select(
        id_col,
        F.row_number().over(w).cast("int").alias("rank"),
        "quality_score",
    )


def phrase_search(
    docs: DataFrame,
    phrase: tuple[str, ...] = ("the", "data"),
    text_col: str = "text",
) -> DataFrame:
    """Exact-phrase retrieval — the ES ``match_phrase`` query, batch
    side (reference §2.10's term/mget surface, one rung up): every doc
    containing the tokens of ``phrase`` CONSECUTIVELY, with the match
    count and the first match position (1-based token index).

    SHUFFLE-FREE: occurrences are counted per row with pure column
    expressions — ``filter(sequence(1, n-m+1), i -> slice(words, i, m)
    == phrase)`` — one linear pass inside codegen, no explode, no join;
    the engine-side twin of the positional-postings intersection a
    search engine runs (at an indexed deployment you'd probe
    ``inverted_index`` postings instead; this form is the scan path
    and the oracle for it). Tokenization is the engine-wide ``_words``
    split (BM25/term_postings parity).

    Output: (doc_id, n_matches, first_pos) for docs with >=1 match.
    """
    m = len(phrase)
    # escape literals (fuzzy_term_search parity): a token containing a
    # single quote must not break or inject into the SQL expression
    arr = "array(" + ", ".join(
        "'" + t.replace("'", "''") + "'" for t in phrase
    ) + ")"
    ws = _words(F.col(text_col))
    starts = (
        f"filter(sequence(1, size(_ws) - {m} + 1),"
        f" i -> slice(_ws, i, {m}) == {arr})"
    )
    return (
        docs.select("doc_id", ws.alias("_ws"))
        .where(F.size("_ws") >= m)
        .select(
            "doc_id",
            F.expr(f"size({starts})").cast("long").alias("n_matches"),
            F.expr(f"({starts})[0]").cast("long").alias("first_pos"),
        )
        .where(F.col("n_matches") > 0)
    )


def fuzzy_term_search(
    docs: DataFrame,
    term: str = "data",
    max_edits: int = 1,
    text_col: str = "text",
) -> DataFrame:
    """Fuzzy term retrieval — the ES ``fuzziness: 1`` match, batch
    side: every doc containing a token within Levenshtein distance
    ``max_edits`` of ``term``, with the hit count and the distinct
    matched variants (sorted, joined — a stable string for the oracle
    hash).

    SHUFFLE-FREE single pass: ``filter(words, w -> levenshtein(w,
    term) <= k)`` runs the DP distance per token inside codegen
    against the literal — linear in corpus tokens, nothing collected,
    no vocabulary materialized. At an indexed 100 TB deployment the
    dictionary form wins (levenshtein against the DISTINCT-token
    table — vocabulary-sized, then a semi-join back through the
    postings); this operator is that plan's scan-path twin and oracle.
    Both engines implement textbook Levenshtein (integer, exact), so
    the match set is deterministic.

    Output: (doc_id, n_hits, variants) for docs with >=1 hit.
    """
    lit = term.replace("'", "''")
    hits = (
        f"filter(_ws, w -> levenshtein(w, '{lit}') <= {int(max_edits)})"
    )
    return (
        docs.select("doc_id", _words(F.col(text_col)).alias("_ws"))
        .select(
            "doc_id",
            F.expr(f"size({hits})").cast("long").alias("n_hits"),
            F.expr(
                f"array_join(array_sort(array_distinct({hits})), ',')"
            ).alias("variants"),
        )
        .where(F.col("n_hits") > 0)
    )


def positional_postings(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Positional posting table — the index artifact behind
    ``phrase_search_indexed``: one row per token OCCURRENCE,
    ``(term, doc_id, pos)`` with ``pos`` the 1-based token index (the
    ES positional-index layout a ``match_phrase`` probes instead of
    rescanning text). Build once, persist bucketed/sorted by ``term``
    so a phrase probe prunes to its m terms' postings at the scan.

    Tokenization is the engine-wide ``_words`` split (BM25 /
    term_postings / phrase_search parity)."""
    return docs.select(
        "doc_id",
        F.posexplode(_words(F.col(text_col))).alias("_p0", "term"),
    ).select("term", "doc_id", (F.col("_p0") + 1).cast("long").alias("pos"))


def phrase_search_indexed(
    docs: DataFrame,
    phrase: tuple[str, ...] = ("the", "data"),
    text_col: str = "text",
    postings: DataFrame | None = None,
) -> DataFrame:
    """``match_phrase`` via POSITIONAL POSTINGS INTERSECTION — the
    indexed 100 TB form the scan-path ``phrase_search`` docstring
    promises (and whose output it exactly reproduces: same
    ``(doc_id, n_matches, first_pos)`` rows, so the two share one
    oracle and pin each other). Instead of sliding an m-token window
    over every document, probe the m phrase terms' posting lists and
    chain-join on position arithmetic: an occurrence of token i at
    ``pos`` survives iff token i+1 posts at ``pos + 1`` in the same
    doc — m−1 equi-joins over TERM-SELECTIVE subsets (each side is one
    term's postings, a vanishing fraction of the corpus; with the
    artifact persisted ``bucketBy(term)`` the probes are
    bucket-pruned scans).

    ``postings``: pass a prebuilt ``positional_postings`` artifact
    (the build-once/query-many shape of ``ivf_index_query``); omitted,
    it is derived inline from ``docs``.
    """
    m = len(phrase)
    if postings is None:
        postings = positional_postings(docs, text_col)
    # one scan, m term filters: Catalyst pushes the isin to the scan
    base = postings.where(F.col("term").isin(list(set(phrase))))
    cur = base.where(F.col("term") == phrase[0]).select(
        "doc_id", F.col("pos").alias("_start")
    )
    for i, t in enumerate(phrase[1:], start=1):
        nxt = base.where(F.col("term") == t).select(
            "doc_id", (F.col("pos") - F.lit(i)).alias("_start")
        )
        cur = cur.join(nxt, ["doc_id", "_start"], "left_semi")
    return cur.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_matches"),
        F.min("_start").cast("long").alias("first_pos"),
    )


def phrase_search_slop(
    docs: DataFrame,
    phrase: tuple[str, ...] = ("the", "data"),
    slop: int = 2,
    text_col: str = "text",
    postings: DataFrame | None = None,
) -> DataFrame:
    """ES ``match_phrase`` with ``slop`` — ORDERED proximity search
    over the positional postings: a match is a position tuple
    p1 < p2 < … < pm with term i at p_i and TOTAL gap
    Σ(p_{i+1} − p_i − 1) ≤ slop (terms in phrase order, up to ``slop``
    interleaved tokens across all gaps — the deterministic ordered
    subset of Lucene's sloppy matcher, exact and engine-portable;
    reordering costs, which Lucene prices as edit distance, are out of
    scope and documented so).

    At ``slop=0`` this IS the exact phrase: output equals
    ``phrase_search``/``phrase_search_indexed`` row-for-row, so the
    three forms cross-pin on one oracle.

    Plan shape: m−1 chain joins on ``doc_id`` with position-window
    predicates over TERM-SELECTIVE posting subsets (each side one
    term's postings; the per-gap fan-out is slop-bounded, so the
    tuple count cannot blow up combinatorially); with a persisted
    store the probes are bucket-pruned scans
    (``postings_store_probe``).

    Output: (doc_id, n_matches, first_pos) — n_matches counts
    qualifying position TUPLES, first_pos the smallest p1.
    """
    m = len(phrase)
    if postings is None:
        postings = positional_postings(docs, text_col)
    base = postings.where(F.col("term").isin(list(set(phrase))))
    cur = base.where(F.col("term") == phrase[0]).select(
        "doc_id",
        F.col("pos").alias("_p"),
        F.lit(0).cast("long").alias("_used"),
        F.col("pos").alias("_start"),
    )
    for t in phrase[1:]:
        nxt = base.where(F.col("term") == t).select(
            F.col("doc_id"), F.col("pos").alias("_q")
        )
        gap = F.col("_q") - F.col("_p") - F.lit(1)
        cur = (
            cur.join(nxt, "doc_id")
            .where(
                (F.col("_q") > F.col("_p"))
                & (F.col("_used") + gap <= F.lit(int(slop)))
            )
            .select(
                "doc_id",
                F.col("_q").alias("_p"),
                (F.col("_used") + gap).alias("_used"),
                "_start",
            )
        )
    return cur.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_matches"),
        F.min("_start").cast("long").alias("first_pos"),
    )


def fuzzy_term_search_indexed(
    docs: DataFrame,
    term: str = "data",
    max_edits: int = 1,
    text_col: str = "text",
    postings: DataFrame | None = None,
) -> DataFrame:
    """``fuzziness: 1`` via the DICTIONARY — the indexed 100 TB form
    the scan-path ``fuzzy_term_search`` docstring promises (same
    output rows, shared oracle): run the Levenshtein DP against the
    DISTINCT-token vocabulary (vocabulary-sized work — Heaps' law
    says ~√corpus — instead of corpus-token-sized), then semi-join the
    few surviving variants back through the token stream. The variant
    set is edit-ball-bounded (tiny), so the join broadcasts and the
    token stream never shuffles.

    ``postings``: pass a prebuilt ``positional_postings`` artifact
    (``postings_store_read``/``postings_store_probe`` is not
    applicable here — the edit-ball terms aren't known until the DP
    runs — but the vocabulary and count-back derive from the
    artifact's dictionary-encoded ``term`` column alone, never
    re-tokenizing text). Omitted, the token stream is derived inline
    from ``docs``."""
    if postings is not None:
        toks = postings.select("doc_id", F.col("term").alias("w"))
    else:
        toks = docs.select(
            "doc_id", F.explode(_words(F.col(text_col))).alias("w")
        )
    vocab = (
        toks.select("w")
        .distinct()
        .where(F.levenshtein(F.col("w"), F.lit(term)) <= int(max_edits))
    )
    hits = toks.join(F.broadcast(vocab), "w")
    return hits.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_hits"),
        F.array_join(F.array_sort(F.collect_set("w")), ",").alias(
            "variants"
        ),
    )


def term_bucket_of(term: str, num_buckets: int = 64) -> int:
    """Driver-side twin of the store's ``pmod(crc32(term), B)`` layout
    key: CRC-32 is the same public checksum in Spark (``F.crc32``) and
    Python (``zlib.crc32``), so a probe can compute its terms' bucket
    ids WITHOUT a Spark job and hand Catalyst literal partition
    filters — the zero-lookup analog of ``ivf_store_compact``'s
    touched-bucket collect."""
    import zlib

    return zlib.crc32(term.encode("utf-8")) % int(num_buckets)


def postings_store_write(
    postings: DataFrame, path: str, num_buckets: int = 64
) -> None:
    """Persist a ``positional_postings`` artifact as a
    ``term_bucket``-partitioned parquet store — the text-index twin of
    ``ivf_store_write`` (build once, probe many): ``term_bucket =
    pmod(crc32(term), num_buckets)`` directories, so a phrase probe
    prunes to its m terms' buckets at PARTITION granularity before the
    per-term ``EqualTo``/``In`` filters prune row groups on the sorted
    ``term`` stats. First write creates, later writes append (new
    documents' postings — the ``ivf_index_append`` shape; rebuild
    bucket-in-place after deletions with the same dynamic-overwrite
    pattern as ``ivf_store_compact``).

    ``sortWithinPartitions(term, doc_id)`` keeps each file's row
    groups term-clustered — the min/max stats a probe's term filter
    skips on — and doc-ordered within a term (the posting-list layout
    ES/Lucene keeps on disk, reference §2.10's index surface)."""
    postings.withColumn(
        "term_bucket",
        F.pmod(
            F.crc32(F.col("term").cast("binary")), F.lit(int(num_buckets))
        ).cast("int"),
    ).sortWithinPartitions("term", "doc_id").write.partitionBy(
        "term_bucket"
    ).mode("append").parquet(path)


def postings_store_read(spark, path: str) -> DataFrame:
    """Load a postings store back to the ``(term, doc_id, pos)``
    layout every text-index op consumes (drops the layout-only
    ``term_bucket`` partition column). MERGE-ON-READ: documents in the
    store's deleted-docs set (``postings_store_delete``) are resolved
    away through a broadcast delta-sized anti-join — the read is
    always the live view, compacted or not."""
    df = spark.read.parquet(path).select("term", "doc_id", "pos")
    dels = _store_deletes(spark, path)
    if dels is not None:
        df = df.join(F.broadcast(dels), "doc_id", "left_anti")
    return df


def _store_deletes(spark, path: str):
    """The store's deleted-docs set, or None when no delete has ever
    been recorded. Lives at ``{path}/_deletes`` — the leading
    underscore keeps it INVISIBLE to the parquet reader scanning the
    store itself (the ``_SUCCESS``/``_metadata`` convention), so the
    side table rides inside the artifact directory without a second
    path to manage."""
    import os

    d = os.path.join(path, "_deletes")
    if not os.path.isdir(d):
        return None
    return spark.read.parquet(d).select("doc_id").distinct()


def symspell_write(
    postings: DataFrame, path: str, num_buckets: int = 64
) -> None:
    """Build the SYMMETRIC-DELETE fuzzy index (SymSpell, Wolf Garbe's
    public algorithm) over the vocabulary of a postings artifact: for
    every distinct term t, emit ``(dkey, term)`` for t itself and each
    single-character deletion of t. Two terms are within Levenshtein
    distance 1 iff their deletion neighborhoods intersect (delete the
    differing position from one or both sides), so a fuzzy probe
    becomes EXACT key lookups — no vocabulary-wide DP scan at query
    time. max_edits=1 by construction; higher distances would emit
    the k-deletion closure (documented out of scope — the engine's
    fuzzy surface is the ES ``fuzziness: 1`` contract).

    Layout mirrors ``postings_store_write``: ``dkey_bucket =
    pmod(crc32(dkey), num_buckets)`` partitions so the probe's
    driver-computed neighborhood keys prune directories; rows are
    vocabulary-sized × (term length + 1) — a derived artifact,
    overwrite on rebuild."""
    vocab = postings.select("term").distinct()
    dkeys = vocab.select(
        "term",
        F.explode(
            F.array_union(
                F.array(F.col("term")),
                F.expr(
                    "transform(sequence(1, length(term)), i ->"
                    " concat(substring(term, 1, i - 1),"
                    " substring(term, i + 1, length(term) - i)))"
                ),
            )
        ).alias("dkey"),
    )
    dkeys.withColumn(
        "dkey_bucket",
        F.pmod(
            F.crc32(F.col("dkey").cast("binary")), F.lit(int(num_buckets))
        ).cast("int"),
    ).sortWithinPartitions("dkey", "term").write.partitionBy(
        "dkey_bucket"
    ).mode("overwrite").parquet(path)


def symspell_candidates(
    spark, path: str, term: str, max_edits: int = 1, num_buckets: int = 64
) -> DataFrame:
    """Probe the symmetric-delete index for ``term``: the driver
    computes the query's deletion neighborhood (term + its
    single-character deletions — ``len(term) + 1`` literal keys, no
    Spark job), hands bucket + key literals to the scan (partition
    pruning + row-group stats on the sorted ``dkey``), and the
    surviving candidate terms are VERIFIED with the exact integer
    Levenshtein — the SymSpell candidate set over-approximates only
    within the deletion closure, so the verify filter is tiny.
    Returns the distinct matching vocabulary terms ``(w)``."""
    q = [term] + [term[:i] + term[i + 1:] for i in range(len(term))]
    keys = sorted(set(q))
    buckets = sorted({term_bucket_of(k2, num_buckets) for k2 in keys})
    lit = term.replace("'", "''")
    return (
        spark.read.parquet(path)
        .where(F.col("dkey_bucket").isin(buckets))
        .where(F.col("dkey").isin(keys))
        .select(F.col("term").alias("w"))
        .distinct()
        .where(
            F.levenshtein(F.col("w"), F.lit(term)) <= int(max_edits)
        )
    )


def fuzzy_term_search_symspell(
    spark,
    postings_path: str,
    symspell_path: str,
    term: str = "data",
    max_edits: int = 1,
    num_buckets: int = 64,
) -> DataFrame:
    """``fuzziness: 1`` resolved ENTIRELY from persisted artifacts,
    with EVERY scan pruned: candidate variants from the
    symmetric-delete index (bucket-pruned exact key lookups +
    Levenshtein verify — no vocabulary-wide DP), then the count-back
    through the postings store probed on exactly those variants
    (bucket-pruned again; the variant list is the edit-ball-bounded
    metadata collect, the quantizer-artifact pattern). Output is
    identical to ``fuzzy_term_search``/``_indexed``, so all three
    share one oracle. The end state the ``fuzzy_term_search_indexed``
    docstring promises: per-probe work tracks the edit ball and its
    posting lists, not the corpus and not the vocabulary."""
    cand = symspell_candidates(
        spark, symspell_path, term, max_edits, num_buckets
    )
    variants = sorted(r.w for r in cand.collect())
    if not variants:
        return spark.createDataFrame(
            [], "doc_id long, n_hits long, variants string"
        )
    hits = postings_store_probe(
        spark, postings_path, tuple(variants), num_buckets
    ).select("doc_id", F.col("term").alias("w"))
    return hits.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_hits"),
        F.array_join(F.array_sort(F.collect_set("w")), ",").alias(
            "variants"
        ),
    )


def postings_store_write_norms(
    docs: DataFrame, path: str, text_col: str = "text"
) -> None:
    """Write the store's NORMS sidecar — the Lucene per-document norms
    file: ``(doc_id, dl)`` with ``dl`` the token count, at
    ``{path}/_norms`` (underscore-hidden from the main store reader,
    like ``_deletes``). BM25's N/avgdl/dl then come from this
    doc-count-sized table instead of re-tokenizing text — and N stays
    correct for zero-token documents, which the posting table cannot
    represent. Overwrite semantics: the sidecar is a derived
    projection of the corpus snapshot, rebuilt with the store."""
    docs.select(
        "doc_id",
        F.size(_words(F.col(text_col))).alias("dl"),
    ).write.mode("overwrite").parquet(f"{path}/_norms")


def postings_store_norms(spark, path: str) -> DataFrame:
    """Read the norms sidecar as the LIVE ``(doc_id, dl)`` view —
    documents in the store's deleted-docs set are resolved away with
    the same broadcast anti-join as the posting reads, so BM25 over a
    scrubbed store scores exactly the surviving corpus."""
    df = spark.read.parquet(f"{path}/_norms").select("doc_id", "dl")
    dels = _store_deletes(spark, path)
    if dels is not None:
        df = df.join(F.broadcast(dels), "doc_id", "left_anti")
    return df


def postings_store_delete(
    spark, path: str, doc_ids: DataFrame, id_col: str = "doc_id"
) -> None:
    """Document DELETION for the persisted text index — the LUCENE
    deleted-docs-set pattern, not the ivf tombstone-row pattern, and
    deliberately so: a document's postings spray across EVERY term
    bucket its terms hash to, so per-posting tombstones would have to
    be routed into all of them (a write amplified by the doc's
    distinct-term count), while one doc id in a side set kills every
    posting at read time for free. Deletes APPEND ids to
    ``{path}/_deletes``; ``postings_store_read``/``_probe`` resolve
    merge-on-read (broadcast delta-sized anti-join — the
    ``live_postings`` shape); ``postings_store_compact`` folds the set
    into the store rewriting only touched buckets. Deleting an absent
    or already-deleted id is a no-op at every read (the
    ``ivf_index_delete`` contract)."""
    doc_ids.select(
        F.col(id_col).cast("long").alias("doc_id")
    ).distinct().write.mode("append").parquet(f"{path}/_deletes")


def postings_store_compact(
    spark, path: str, num_buckets: int = 64
) -> list[int]:
    """Fold the deleted-docs set into the store IN PLACE, rewriting
    only the ``term_bucket`` partitions that actually hold a deleted
    document's postings — the ``ivf_store_compact`` contract on the
    text index. One column-pruned scan finds the touched buckets
    (``(doc_id, term_bucket)`` only), dynamic partition overwrite
    rewrites them, partitions left EMPTY by the rewrite are dropped
    explicitly (the r10 ADVICE fix, same code shape), and the deletes
    set is cleared — a second compact is a no-op. Returns the touched
    bucket ids (``<= num_buckets``, a metadata collect)."""
    dels = _store_deletes(spark, path)
    if dels is None:
        return []
    dels = dels.localCheckpoint(eager=True)
    store = spark.read.parquet(path)
    touched = sorted(
        r[0]
        for r in store.join(F.broadcast(dels), "doc_id", "left_semi")
        .select("term_bucket")
        .distinct()
        .collect()
    )
    if touched:
        sub = store.where(F.col("term_bucket").isin(touched))
        resolved = (
            sub.join(F.broadcast(dels), "doc_id", "left_anti")
            # sever the file-source lineage before overwriting the
            # path the plan reads (the ivf_store_compact note); the
            # resolved subset is touched-bucket-sized
            .localCheckpoint(eager=True)
        )
        prev = spark.conf.get(
            "spark.sql.sources.partitionOverwriteMode", "static"
        )
        spark.conf.set(
            "spark.sql.sources.partitionOverwriteMode", "dynamic"
        )
        try:
            resolved.write.partitionBy("term_bucket").mode(
                "overwrite"
            ).parquet(path)
        finally:
            spark.conf.set(
                "spark.sql.sources.partitionOverwriteMode", prev
            )
        kept = {
            r[0]
            for r in resolved.select("term_bucket").distinct().collect()
        }
        jvm = spark._jvm
        hconf = spark._jsc.hadoopConfiguration()
        for b in touched:
            if b not in kept:
                part = jvm.org.apache.hadoop.fs.Path(
                    f"{path}/term_bucket={b}"
                )
                part.getFileSystem(hconf).delete(part, True)
    # the norms sidecar (if present) must fold the same deletes BEFORE
    # the set is cleared, or a scrubbed store would keep scoring with
    # the dead docs' N/avgdl (doc-count-sized rewrite: 2 long columns)
    import os

    if os.path.isdir(os.path.join(path, "_norms")):
        live_norms = (
            spark.read.parquet(f"{path}/_norms")
            .select("doc_id", "dl")
            .join(F.broadcast(dels), "doc_id", "left_anti")
            .localCheckpoint(eager=True)
        )
        live_norms.write.mode("overwrite").parquet(f"{path}/_norms")
    # the deletes are folded (or referenced no stored posting): clear
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    dpath = jvm.org.apache.hadoop.fs.Path(f"{path}/_deletes")
    dpath.getFileSystem(hconf).delete(dpath, True)
    return touched


def postings_store_probe(
    spark, path: str, terms: tuple[str, ...], num_buckets: int = 64
) -> DataFrame:
    """Open a postings store pruned to ``terms``: the driver computes
    the terms' bucket ids (``term_bucket_of`` — no Spark job) and
    hands Catalyst LITERAL partition filters plus the term predicate,
    so the scan touches only the probed terms' directories and, inside
    them, only the row groups whose term stats overlap. This is what
    ``phrase_search_indexed`` should receive as ``postings`` at a
    persisted deployment — the probe cost is the m terms' posting
    lists, independent of corpus size and of vocabulary size.

    ``num_buckets`` must match the store's write layout (the caller
    owns the artifact, the ``ivf_store_write`` contract)."""
    tset = sorted(set(terms))
    buckets = sorted({term_bucket_of(t, num_buckets) for t in tset})
    df = (
        spark.read.parquet(path)
        .where(F.col("term_bucket").isin(buckets))
        .where(F.col("term").isin(tset))
        .select("term", "doc_id", "pos")
    )
    dels = _store_deletes(spark, path)
    if dels is not None:
        df = df.join(F.broadcast(dels), "doc_id", "left_anti")
    return df
