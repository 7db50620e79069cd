"""Distributed BPE tokenizer training (north-star LLM-data surface).

Byte-pair encoding (Sennrich et al. 2016, public) learned over the
corpus with ALL heavy work distributed: word frequencies are one
wordcount aggregate; each merge round counts adjacent symbol pairs
weighted by word frequency (explode + hash agg, map-side partials) and
applies the winning merge to every word with a pure column-expression
``aggregate`` fold — left-to-right non-overlapping, exactly the
reference BPE semantics. The only driver traffic per round is the
1-row argmax (like Lloyd's centroid sync); vocabularies never collect.

Iterative, but still oracle-checkable: the driver oracle replays every
merge round as chained DuckDB CTEs with the fold replicated exactly
(``__spark_entry__._bpe_train_sql``); exactness is additionally pinned
by tests against a pure-Python reference implementation on the same
corpus (tests/test_llm_ops.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _chars(word: Column) -> Column:
    """Word → initial symbol sequence (single characters)."""
    return F.transform(
        F.sequence(F.lit(1), F.length(word)), lambda i: F.substring(word, i, 1)
    )


def _merge_fold(syms: Column, left: str, right: str) -> Column:
    """Apply one merge (left,right)→left+right to a symbol array as a
    left-to-right non-overlapping fold: carry the previous symbol; when
    (carry, current) is the pair, emit the merged symbol and clear the
    carry so the right element can't start another match."""
    init = F.struct(
        F.array().cast("array<string>").alias("out"),
        F.lit(None).cast("string").alias("carry"),
    )

    def step(acc: Column, s: Column) -> Column:
        return (
            F.when(
                acc["carry"].isNull(),
                F.struct(acc["out"].alias("out"), s.alias("carry")),
            )
            .when(
                (acc["carry"] == F.lit(left)) & (s == F.lit(right)),
                F.struct(
                    F.concat(acc["out"], F.array(F.lit(left + right))).alias("out"),
                    F.lit(None).cast("string").alias("carry"),
                ),
            )
            .otherwise(
                F.struct(
                    F.concat(acc["out"], F.array(acc["carry"])).alias("out"),
                    s.alias("carry"),
                )
            )
        )

    fin = lambda acc: F.when(acc["carry"].isNull(), acc["out"]).otherwise(  # noqa: E731
        F.concat(acc["out"], F.array(acc["carry"]))
    )
    return F.aggregate(syms, init, step, fin)


def bpe_train(
    docs: DataFrame,
    n_merges: int = 8,
    text_col: str = "text",
) -> DataFrame:
    """Learn ``n_merges`` BPE merges over the corpus; returns the merge
    table ``(step, left, right, merged, pair_count)`` in learned order.

    Tie-break: highest weighted pair count, then lexicographically
    smallest (left, right) — fully deterministic, partitioning-free.
    The per-round argmax uses ``orderBy(...).limit(1)`` (distributed
    TakeOrdered, 1-row driver sync); the vocabulary table is
    localCheckpointed per round to truncate the growing fold lineage.

    The checkpoints are LAZY (eager=False): round i's merge fold then
    materializes inside round i+1's argmax job instead of in a
    dedicated job of its own — one job per merge round instead of two,
    and the final round's fold (which ``bpe_train`` never consumes —
    only the merge list leaves this function) is never computed at all.
    Lineage is still cut at every round: each argmax plan folds exactly
    one merge over the previous round's materialized partitions.
    """
    from flink_helloworld_spark.functions import words_of

    vocab = (
        docs.select(F.explode(words_of(F.col(text_col))).alias("w"))
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(_chars(F.col("w")).alias("syms"), "cnt")
    ).localCheckpoint(eager=False)

    merges: list[tuple[int, str, str, str, int]] = []
    for step_i in range(n_merges):
        pairs = vocab.select(
            F.explode(
                F.arrays_zip(
                    F.slice("syms", 1, F.size("syms") - 1).alias("l"),
                    F.slice("syms", 2, F.size("syms") - 1).alias("r"),
                )
            ).alias("p"),
            "cnt",
        ).select(F.col("p.l").alias("l"), F.col("p.r").alias("r"), "cnt")
        best = (
            pairs.groupBy("l", "r")
            .agg(F.sum("cnt").alias("n"))
            .orderBy(F.col("n").desc(), "l", "r")
            .limit(1)
            .collect()
        )
        if not best or best[0]["n"] < 2:
            break
        left, right, n = best[0]["l"], best[0]["r"], int(best[0]["n"])
        merges.append((step_i, left, right, left + right, n))
        vocab = vocab.select(
            _merge_fold(F.col("syms"), left, right).alias("syms"), "cnt"
        ).localCheckpoint(eager=False)
    spark = docs.sparkSession
    return spark.createDataFrame(
        merges, "step int, left string, right string, merged string, pair_count long"
    )


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply a learned merge list to a corpus: per doc, the token count
    under the trained BPE vocabulary (plus the raw char count) — the
    fertility signal used to compare tokenizers.

    The merge folds run over the DISTINCT words only (corpus word
    occurrences join back against the encoded vocabulary and sum) — the
    fold is the expensive interpreted expression, and a natural-language
    corpus repeats words heavily, so encoding per occurrence re-paid it
    per repeat (16 s → ~2 s at sf0.1). Identical output: per-word token
    counts are position-independent, and an empty word (consecutive
    spaces) flows through the same `_chars`/fold path either way."""
    from flink_helloworld_spark.functions import words_of

    syms = _chars(F.col("w"))
    for left, right in merges:
        syms = _merge_fold(syms, left, right)
    occurrences = docs.select(id_col, F.explode(words_of(F.col(text_col))).alias("w"))
    encoded = (
        occurrences.select("w")
        .distinct()
        .select("w", F.size(syms).alias("_nt"), F.length("w").alias("_nc"))
    )
    return (
        occurrences.join(encoded, "w")
        .groupBy(id_col)
        .agg(
            F.sum("_nt").cast("int").alias("n_tokens"),
            F.sum("_nc").cast("int").alias("n_chars"),
        )
    )


def bpe_segmentation(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
) -> DataFrame:
    """The tokenizer-debug view: every DISTINCT corpus word with its
    segmentation under a learned merge list — (w, n_tokens,
    segmentation) with tokens space-joined in order. This is the table a
    tokenizer review actually reads (which words stay whole, where
    merges split morphemes); `bpe_encode` aggregates it away into
    per-doc counts.

    Scale shape: the interpreted merge folds run once per distinct word
    (vocab-sized, not corpus-sized); one distinct exchange on the word.
    """
    from flink_helloworld_spark.functions import words_of

    syms = _chars(F.col("w"))
    for left, right in merges:
        syms = _merge_fold(syms, left, right)
    vocab = (
        docs.select(F.explode(words_of(F.col(text_col))).alias("w"))
        .where(F.col("w") != "")
        .distinct()
    )
    return vocab.select(
        "w",
        F.size(syms).cast("int").alias("n_tokens"),
        F.concat_ws(" ", syms).alias("segmentation"),
    )
