"""Distributed quality-classifier training (north-star LLM-data
surface): the GPT-3/CCNet-style pipeline stage that TRAINS a quality
classifier over document features and scores the corpus with it —
expressed as full-batch logistic regression by gradient descent, with
every heavy step a DataFrame aggregation.

Here the training signal is weak supervision distilled from the
published Gopher rule set (label = passes_gopher), so the whole loop is
self-contained and deterministic: features are fixed-order double
arithmetic over integer text statistics, per-row gradient contributions
round to 9 dp and sum as DECIMAL(28,9) (exact, partitioning-independent
— the same contract as the engine's other float aggregates), and
weights round half-away to 9 dp after every step so both engines carry
bit-identical weight vectors into the next iteration. Like the k-means
and BPE trainers, the only driver traffic is one 7-number row per
iteration; the gradient itself is map-side-combinable.

Iterative, and oracle-checkable the same way: the DuckDB oracle replays
every GD step as chained CTEs (weights are 1-row CTEs of scalar
columns).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from flink_helloworld_spark.operators.text import GOPHER_STOPWORDS, _words

FEATURE_NAMES = [
    "bias",
    "words_over_100",
    "mean_word_len_over_10",
    "stopword_frac",
    "alpha_word_ratio",
    "symbol_ratio",
]


def _round9(x: float) -> float:
    """Half-away-from-zero 9-dp rounding (DuckDB round() / Spark
    F.round rule) for driver-side weight updates — Python's round() is
    banker's and would drift from the SQL oracle on exact .5 ties."""
    import math

    s = -1.0 if x < 0 else 1.0
    return s * math.floor(abs(x) * 1e9 + 0.5) / 1e9


def _feature_exprs(text_ref: Column, ws: Column) -> tuple[Column, list[Column]]:
    """(label, [f0..f5]) column expressions over a text column and its
    word array — shared by batch features and the streaming gate so the
    float op sequence is identical wherever scoring runs."""
    n_words = F.size(ws)
    n_chars = F.length(text_ref)
    words_d = n_words.cast("double")
    mean_wlen = (n_chars - (n_words - 1)).cast("double") / words_d
    n_symbols = F.size(F.regexp_extract_all(text_ref, F.lit(r"(#|\.\.\.)"), 0))
    lines = F.split(text_ref, "\n")
    ellipsis_ratio = (
        F.size(F.filter(lines, lambda ln: ln.endswith("..."))).cast("double")
        / F.size(lines).cast("double")
    )
    alpha_ratio = (
        F.size(F.filter(ws, lambda w: w.rlike("[A-Za-z]"))).cast("double") / words_d
    )
    lower_ws = F.transform(ws, lambda w: F.lower(w))
    stop_hits = sum(
        F.when(F.array_contains(lower_ws, s), 1).otherwise(0)
        for s in GOPHER_STOPWORDS
    )
    symbol_ratio = n_symbols.cast("double") / words_d
    passes = (
        (n_words >= 5)
        & (n_words <= 100_000)
        & (mean_wlen >= 3.0)
        & (mean_wlen <= 10.0)
        & (symbol_ratio <= 0.1)
        & (ellipsis_ratio <= 0.3)
        & (alpha_ratio >= 0.8)
        & (stop_hits >= 2)
    )
    label = F.when(passes, 1.0).otherwise(0.0)
    feats = [
        F.lit(1.0),
        words_d / 100.0,
        mean_wlen / 10.0,
        stop_hits.cast("double") / 8.0,
        alpha_ratio,
        symbol_ratio,
    ]
    return label, feats


def doc_features(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, y, f0..f5): bounded continuous features from the same
    integer statistics the Gopher rules use, plus the rule verdict as
    the weak-supervision label. Fixed-order double arithmetic over
    integers — bit-identical across engines."""
    base = docs.select(
        "doc_id", F.col(text_col).alias("_t"),
        _words(F.col(text_col)).alias("ws"),
    )
    label, feats = _feature_exprs(F.col("_t"), F.col("ws"))
    return base.where(F.size("ws") > 0).select(
        "doc_id",
        label.alias("y"),
        *[f.alias(f"f{d}") for d, f in enumerate(feats)],
    )


def _z(weights: list[float]) -> Column:
    """w·x in FIXED left-to-right order — both engines must run the
    identical float op sequence."""
    z: Column = F.lit(weights[0]) * F.col("f0")
    for d in range(1, len(weights)):
        z = z + F.lit(weights[d]) * F.col(f"f{d}")
    return z


def train_quality_classifier(
    docs: DataFrame,
    n_iters: int = 3,
    lr: float = 0.5,
    text_col: str = "text",
    _features: DataFrame | None = None,
) -> list[float]:
    """Full-batch GD on the logistic loss; returns the 6 weights after
    ``n_iters`` steps (each exactly reproducible — see module doc).
    ``_features`` lets a caller that already materialized
    ``doc_features`` (e.g. the train-then-score query) reuse it."""
    feats = (
        _features
        if _features is not None
        else doc_features(docs, text_col).localCheckpoint()
    )
    k = len(FEATURE_NAMES)
    w = [0.0] * k
    for _ in range(n_iters):
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-_z(w)))
        aggs = [
            F.sum(
                F.round((F.col("y") - p) * F.col(f"f{d}"), 9).cast("decimal(28,9)")
            ).alias(f"s{d}")
            for d in range(k)
        ] + [F.count(F.lit(1)).alias("n")]
        row = feats.agg(*aggs).collect()[0]  # 1 row per iteration, like Lloyd
        if row["n"] == 0:  # empty corpus: sums are NULL, weights stay
            break
        n = float(row["n"])
        w = [
            _round9(w[d] + lr * (float(row[f"s{d}"]) / n)) for d in range(k)
        ]
    return w


def quality_classifier_weights(
    docs: DataFrame, n_iters: int = 3, lr: float = 0.5, text_col: str = "text"
) -> DataFrame:
    """Registry form of the trainer: (feature_idx, feature, weight)."""
    w = train_quality_classifier(docs, n_iters=n_iters, lr=lr, text_col=text_col)
    return docs.sparkSession.createDataFrame(
        [(d, FEATURE_NAMES[d], w[d]) for d in range(len(w))],
        "feature_idx int, feature string, weight double",
    )


def attach_quality_score(
    df: DataFrame, weights: list[float], text_col: str = "text"
) -> DataFrame:
    """Attach ``quality_score`` = σ(w·x) (6 dp) to EVERY row, keeping
    the input columns — the train-offline/score-online serving form:
    weights learned batch-side become plan constants in a STATELESS
    codegen projection, so the same expression gates an unbounded
    stream (see streaming_pretrain_front) or a batch table. Rows with
    no words score NULL (no features)."""
    staged = df.withColumn("_qc_ws", _words(F.col(text_col)))
    _, feats = _feature_exprs(F.col(text_col), F.col("_qc_ws"))
    z: Column = F.lit(weights[0]) * feats[0]
    for d in range(1, len(weights)):
        z = z + F.lit(weights[d]) * feats[d]
    score = F.when(
        F.size("_qc_ws") > 0,
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6),
    )
    return staged.withColumn("quality_score", score).drop("_qc_ws")


def quality_classifier_score(
    docs: DataFrame, n_iters: int = 3, lr: float = 0.5, text_col: str = "text"
) -> DataFrame:
    """Train, then score every document with the final weights:
    (doc_id, label, score, pred) — score is σ(w·x) rounded to 6 dp,
    pred the 0.5 threshold. The scoring pass is one codegen projection
    over the SAME checkpointed features training used (the feature
    regexes run once per corpus, not once per phase); only the weights
    (7 numbers × n_iters) ever touch the driver."""
    feats = doc_features(docs, text_col).localCheckpoint()
    w = train_quality_classifier(
        docs, n_iters=n_iters, lr=lr, text_col=text_col, _features=feats
    )
    score = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-_z(w))), 6)
    return feats.select(
        "doc_id",
        F.col("y").cast("int").alias("label"),
        score.alias("score"),
        (score >= 0.5).alias("pred"),
    )
