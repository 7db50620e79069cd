"""Shared column-expression helpers.

Everything here is built from JVM-side ``pyspark.sql.functions`` so it
stays inside whole-stage codegen — no Python in the hot path. Helpers
encode two engine-wide contracts:

1. **Exact money math** — the reference does revenue arithmetic in
   BigDecimal (StateTest.java:584-621). We cast DOUBLE inputs to
   DECIMAL(18,4), aggregate exactly (decimal addition is associative, so
   results are independent of partitioning / parallelism), and cast the
   final value back to DOUBLE. This also makes results bit-identical to
   any other engine following the same recipe (our DuckDB oracles do).

2. **Portable hashing** — dedup/minhash/simhash signatures are built on
   ``md5`` (identical across engines) rather than engine-private hashes,
   so correctness oracles can replay them.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(18,4)"


def dec(col: Column | str) -> Column:
    """Cast to the engine's exact-math decimal."""
    return F.col(col).cast(DEC) if isinstance(col, str) else col.cast(DEC)


def dsum(col: Column | str, alias: str) -> Column:
    """Exact, partition-order-independent SUM of a double column."""
    return F.sum(dec(col)).cast("double").alias(alias)


def davg(col: Column | str, alias: str) -> Column:
    """Deterministic AVG: exact decimal sum / count, divided as doubles."""
    c = dec(col)
    return (F.sum(c).cast("double") / F.count(c).cast("double")).alias(alias)


def md5_prefix_long(col: Column, seed: str = "") -> Column:
    """Portable 60-bit integer hash: first 15 hex chars of md5.

    ``conv`` parses hex → decimal string; 15 hex chars = 60 bits < 2^63 so
    the LongType cast never overflows. DuckDB replays this exactly.
    """
    salted = F.concat(F.lit(seed), col) if seed else col
    return F.conv(F.substring(F.md5(salted), 1, 15), 16, 10).cast("long")


def seed_topk(df, k: int, h_col: str = "_h", id_col: str = "id"):
    """Distributed deterministic sample: the ``k`` rows with the lowest
    ``(h_col, id_col)`` — md5-rank seed selection for k-means/IVF/PQ —
    ranked 1..k in ``_rn``.

    ``orderBy(...).limit(k)`` executes as TakeOrderedAndProject (a
    per-partition k-row heap merged on one task's k·P rows), so every
    executor only ships k candidates; the ranking window then runs over
    at most k rows. This replaces the scale-killer alternative —
    ``row_number().over(Window.orderBy(...))`` on the FULL table — which
    funnels every row of a 100 TB scan through a single task before the
    filter drops all but k of them. Output rows/order are identical.
    """
    from pyspark.sql import Window

    order = [F.col(h_col).asc(), F.col(id_col).asc()]
    top = df.orderBy(*order).limit(k)
    return top.withColumn("_rn", F.row_number().over(Window.orderBy(*order)))


def epoch_millis(col: Column | str) -> Column:
    """Epoch milliseconds of a timestamp column, tolerant of both
    TIMESTAMP and TIMESTAMP_NTZ inputs: the cast is a no-op on LTZ and
    reinterprets NTZ under the engine's pinned UTC session zone (the
    same reading DuckDB's naive timestamps get), so the value is
    identical either way. Use this instead of bare ``unix_millis`` at
    any site that touches externally-sourced timestamps."""
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_millis(c.cast("timestamp"))


def words_of(text: Column) -> Column:
    """Whitespace tokenization shared by wordcount / text analysis /
    shingling (reference splits on a single space,
    HelloWorldFlinkTest.java:42)."""
    return F.split(text, " ")


def n_tokens_of(text: Column) -> Column:
    """Non-empty whitespace token count — ONE definition of the
    token-count contract every packing/chunking query mirrors in its
    oracle via the same ``_WS`` replica."""
    return F.size(F.filter(words_of(text), lambda w: w != ""))
