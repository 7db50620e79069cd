"""Text-analysis operators (north-star LLM-data pipeline surface).

Language-ID, quality scoring, token counting, and document
fingerprinting — all as built-in column expressions (JVM-side, inside
codegen). Ratios are single divisions of exact integer counts, so values
are engine-portable for the DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language marker lexicons for the n-gram/stopword heuristic.
# (The test corpus is synthetic, so these exercise the *mechanism*:
# deterministic scoring + argmax with a fixed tie order.)
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "les", "et", "est"],
    "es": ["el", "los", "las", "es", "una"],
    "zh": ["的", "是", "了", "在", "我"],
}
_LANG_ORDER = ["en", "de", "fr", "es", "zh"]  # fixed tie-break order

# BPE-ish subword pieces: runs of letters, digits, or single punctuation —
# the standard pre-tokenizer regex shape.
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def _words(text: Column) -> Column:
    return F.filter(F.split(text, " "), lambda w: w != "")


def token_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Token counting: whitespace tokens + BPE-ish regex pieces + chars."""
    ws = _words(F.col(text_col))
    return docs.select(
        "doc_id",
        F.size(ws).alias("n_ws_tokens"),
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPE_ISH_PATTERN), 0)).alias(
            "n_bpe_tokens"
        ),
        F.length(text_col).alias("n_chars_measured"),
    )


def quality_score(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic document quality: word-length shape, stopword presence,
    punctuation density — the standard cheap pre-filter for LLM corpora
    (à la C4/Gopher rules), as one pass of column arithmetic."""
    # materialize the word array once: several expressions below use it,
    # and in-projection reuse would recompute the split per reference
    # (CollapseProject keeps a multiply-used non-cheap alias separate)
    base = docs.select("doc_id", F.col(text_col).alias("_t"), _words(F.col(text_col)).alias("ws"))
    ws = F.col("ws")
    n_words = F.size(ws)
    n_chars = F.length("_t")
    stop_hits = F.size(F.filter(ws, lambda w: w.isin(*LANG_MARKERS["en"])))
    n_punct = F.size(F.regexp_extract_all(F.col("_t"), F.lit(r"[^A-Za-z0-9\s]"), 0))
    # nullif guards: empty docs (0 words / 0 chars) yield NULL ratios
    # instead of ANSI-mode DIVIDE_BY_ZERO at scale
    words_d = F.nullif(n_words.cast("double"), F.lit(0.0))
    chars_d = F.nullif(n_chars.cast("double"), F.lit(0.0))
    mean_wlen = (n_chars - (n_words - 1)).cast("double") / words_d
    stop_ratio = stop_hits.cast("double") / words_d
    punct_ratio = n_punct.cast("double") / chars_d
    # fixed weights (4+4+2)/10; integer sum then one division keeps the
    # double exact and engine-portable
    score = (
        F.when((mean_wlen >= 3.0) & (mean_wlen <= 10.0), 4).otherwise(0)
        + F.when(stop_ratio > 0.0, 4).otherwise(0)
        + F.when(punct_ratio < 0.2, 2).otherwise(0)
    ).cast("double") / F.lit(10.0)
    return base.select(
        "doc_id",
        n_words.alias("n_words"),
        mean_wlen.alias("mean_word_len"),
        stop_ratio.alias("stopword_ratio"),
        punct_ratio.alias("punct_ratio"),
        score.alias("quality_score"),
    )


def lang_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-lexicon language ID: count per-language marker hits among
    tokens; predict the argmax with a fixed tie-break order."""
    # word array materialized once, shared by the 5 per-language scores
    base = docs.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        _words(F.lower(F.col(text_col))).alias("ws"),
    )

    def marker_hits(markers: list[str]) -> Column:
        # single-arg lambda: a second param would bind the array index
        return F.size(F.filter(F.col("ws"), lambda w: w.isin(*markers)))

    scores = {lang: marker_hits(markers) for lang, markers in LANG_MARKERS.items()}
    scored = base.select(
        "doc_id",
        "labeled_lang",
        *[scores[lang].alias(f"score_{lang}") for lang in _LANG_ORDER],
    )
    best = F.greatest(*[F.col(f"score_{lang}") for lang in _LANG_ORDER])
    pred = F.lit("und")
    for lang in reversed(_LANG_ORDER):  # earlier in order wins ties
        pred = F.when(F.col(f"score_{lang}") == best, F.lit(lang)).otherwise(pred)
    pred = F.when(best > 0, pred).otherwise(F.lit("und"))
    return scored.withColumn("pred_lang", pred)


def fingerprint(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprinting: md5 of whitespace-normalized lowercase
    text (exact-dup key) + a locality-sensitive piece fingerprint (min
    md5 over word 4-gram pieces — one shared piece ⇒ likely overlap)."""
    norm = F.regexp_replace(F.trim(F.lower(F.col(text_col))), r"\s+", " ")
    ws = _words(norm)
    grams = F.transform(
        F.sequence(F.lit(0), F.size(ws) - 4),
        lambda i: F.md5(F.concat_ws(" ", F.slice(ws, i + 1, 4))),
    )
    piece_min = F.when(F.size(ws) >= 4, F.array_min(grams)).otherwise(F.md5(norm))
    return docs.select(
        "doc_id",
        F.md5(norm).alias("content_fp"),
        piece_min.alias("piece_fp"),
    )
