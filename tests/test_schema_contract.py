"""Testdata-drift guard tests.

The driver regenerates the parquet tables between rounds and has already
drifted a physical type once (TIMESTAMP(NANOS) → naive timestamp[us] ⇒
TIMESTAMP_NTZ under Spark 4's default inference), silently breaking six
queries. These tests make the next drift a loud single-line diff: every
table loaded through the engine must come back in the normalized contract
types of ``schemas.TESTDATA_CONTRACT``.
"""

from __future__ import annotations

import pytest

from flink_helloworld_spark.schemas import TESTDATA_CONTRACT, TESTDATA_TABLES
from flink_helloworld_spark.sources.tables import load_tables

SF = "/root/testdata/sf0.01"


@pytest.mark.parametrize("name", TESTDATA_TABLES)
def test_table_matches_contract(spark, name):
    df = load_tables(spark, SF).table(name)
    have = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    for col, want in TESTDATA_CONTRACT[name].items():
        assert have.get(col) == want, (
            f"{name}.{col}: engine normalized type {have.get(col)!r} != "
            f"contract {want!r}"
        )
    # specifically: no NTZ may survive normalization anywhere
    assert "timestamp_ntz" not in set(have.values())


def test_missing_contract_column_fails_loudly(spark):
    from flink_helloworld_spark.sources.tables import _enforce_contract

    df = load_tables(spark, SF).table("events").drop("ts")
    with pytest.raises(ValueError, match="testdata drift"):
        _enforce_contract("events", df)


def test_drifted_column_is_cast_back(spark):
    from pyspark.sql import functions as F

    from flink_helloworld_spark.sources.tables import _enforce_contract

    # simulate NTZ drift explicitly, independent of the reader conf
    df = (
        load_tables(spark, SF)
        .table("events")
        .withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    )
    fixed = _enforce_contract("events", df)
    assert fixed.schema["ts"].dataType.simpleString() == "timestamp"


def test_clean_table_is_not_reprojected(spark):
    # when nothing drifted the guard must return the scan untouched so
    # filter pushdown/column pruning contracts are unaffected
    df = load_tables(spark, SF).table("lineitem")
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert plan.strip().startswith("Relation"), plan
