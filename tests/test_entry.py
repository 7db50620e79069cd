"""Driver-contract smoke tests: entry(), queries(), oracle_sql() wiring."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert len(df.schema.fields) > 0


# Iterative algorithms whose recursion no single SQL statement can
# express — the driver contract's documented rows-only class. Anything
# NOT listed here must ship a DuckDB oracle; additions require a
# reference-implementation test instead (BPE: pure-Python reference in
# test_llm_ops).
ROWS_ONLY_OK = {"bpe_train_merges", "bpe_token_fertility"}


def test_every_query_has_oracle_and_runs(spark, sf_dir):
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    missing = [name for name in qs if name not in oracles]
    assert len(qs) > 0
    for name, fn in qs.items():
        df = fn(spark, sf_dir)
        assert df.columns, name
    # every registered query has a SQL oracle unless it is in the
    # explicitly-documented iterative rows-only set
    assert set(missing) <= ROWS_ONLY_OK, missing
