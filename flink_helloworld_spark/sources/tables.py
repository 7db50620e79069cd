"""Batch table loaders for the driver-generated parquet test tables.

Covers the reference's bounded sources (SURVEY.md §2.1 S1/S2):
``fromElements`` ↦ ``spark.createDataFrame``; ``readTextFile`` ↦
``spark.read.text``; the TPC-H-ish star schema is plain parquet scans —
Catalyst pushes filters/projections into the scan (check with
``df.explain``: PushedFilters / ReadSchema).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from flink_helloworld_spark.schemas import TESTDATA_CONTRACT, TESTDATA_TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


@dataclass(frozen=True)
class Tables:
    """Handle to the star-schema tables of one scale factor."""

    spark: SparkSession
    sf_dir: str

    def table(self, name: str) -> DataFrame:
        if name not in TESTDATA_TABLES:
            raise KeyError(f"unknown table {name!r}; known: {TESTDATA_TABLES}")
        path = f"{self.sf_dir}/{name}.parquet"
        if name == "events":
            df = _read_events(self.spark, path)
        else:
            df = self.spark.read.parquet(path)
        return _enforce_contract(name, df)

    def __getattr__(self, name: str) -> DataFrame:
        if name in TESTDATA_TABLES:
            return self.table(name)
        raise AttributeError(name)

    def register_views(self) -> None:
        """Register every table as a temp view for spark.sql queries."""
        for name in TESTDATA_TABLES:
            self.table(name).createOrReplaceTempView(name)


def load_tables(spark: SparkSession, sf_dir: str | None = None) -> Tables:
    # engine timestamp contract: UTC session semantics (oracle parity —
    # DuckDB timestamps are UTC-naive); safe to set at runtime
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # parquet timestamps without isAdjustedToUTC must still read as
    # TIMESTAMP, not TIMESTAMP_NTZ — the driver's generator writes naive
    # micros and every downstream unix_millis/withWatermark call site
    # requires the LTZ type (values are identical under the pinned UTC
    # session zone, so oracle parity is unaffected)
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    return Tables(spark=spark, sf_dir=sf_dir or DEFAULT_SF_DIR)


def _enforce_contract(name: str, df: DataFrame) -> DataFrame:
    """Schema-drift guard: cast any column whose physical type drifted
    from the engine contract (TESTDATA_CONTRACT) back to it; fail loudly
    if a contract column disappeared. When nothing drifted — the normal
    case — the DataFrame is returned untouched, so there is no extra
    Project over the scan and filter pushdown is unaffected.
    """
    contract = TESTDATA_CONTRACT[name]
    have = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    missing = [c for c in contract if c not in have]
    if missing:
        raise ValueError(
            f"testdata drift: table {name!r} lost contract columns "
            f"{missing}; found {sorted(have)}"
        )
    drifted = {c: t for c, t in contract.items() if have[c] != t}
    if not drifted:
        return df
    # a LongType column where the contract wants a timestamp means the
    # session-wide nanosAsLong conf (set once _read_events runs) turned
    # a TIMESTAMP(NANOS) column into raw int64 nanos. Only events.ts has
    # the explicit ns->us repair; for any OTHER table/column, a silent
    # cast("timestamp") would reinterpret the nanos count as epoch
    # SECONDS — absurd values instead of a loud schema error. Fail here.
    bad_ts = [
        c
        for c, t in drifted.items()
        if t.startswith("timestamp") and have[c] == "bigint"
    ]
    if bad_ts and name != "events":
        raise ValueError(
            f"testdata drift: table {name!r} columns {bad_ts} read as raw "
            f"int64 (likely TIMESTAMP(NANOS) under the nanosAsLong conf); "
            f"add an explicit unit-aware repair like _read_events' before "
            f"casting — a bare timestamp cast would fabricate values"
        )
    from pyspark.sql import functions as F

    return df.select(
        *[
            F.col(c).cast(drifted[c]).alias(c) if c in drifted else F.col(c)
            for c in df.columns
        ]
    )


def read_text(spark: SparkSession, path: str) -> DataFrame:
    """Line-per-record text scan (reference HelloWorldFlinkTest.java:190)."""
    return spark.read.text(path)


def _read_events(spark: SparkSession, path: str) -> DataFrame:
    """The driver has generated events.ts as TIMESTAMP(NANOS) in some
    rounds and timestamp[us]-no-tz in others. Handle both: NANOS is
    rejected by the vectorized reader, so read the raw int64 nanos via
    the legacy conf and truncate to micros with exact integer division
    (matching DuckDB's ns→µs truncation, so oracle comparisons agree);
    the no-tz micros case reads directly as TIMESTAMP because
    inferTimestampNTZ is pinned off in load_tables (and _enforce_contract
    backstops any remaining drift).
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    if isinstance(df.schema["ts"].dataType, LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def read_csv(
    spark: SparkSession,
    path: str,
    schema: str | None = None,
    header: bool = True,
    delimiter: str = ",",
) -> DataFrame:
    """CSV file source. An explicit ``schema`` ("a INT, b STRING") skips
    the inference pass — at scale inference is a full extra read of the
    data, so production paths should always pass one."""
    reader = spark.read.option("header", header).option("delimiter", delimiter)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def read_jsonl(
    spark: SparkSession, path: str, schema: str | None = None
) -> DataFrame:
    """JSON-lines file source (one object per line — the same wire shape
    the reference's Kafka JSON topics carry, as a file; kafka.py's
    from_json projection handles the broker form). Pass ``schema`` for
    the same no-inference reason as read_csv; unparseable lines land in
    ``_corrupt_record`` instead of failing the job."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)
