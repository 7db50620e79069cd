"""Kafka source/sink wiring tests (S12/K2), runnable WITHOUT a broker.

The sandbox has no Kafka broker or connector jar, so these pin the parts
that can regress silently anyway:

- source: every connector option the builder sets (a fake reader records
  them), and the JSON-projection stage executed for real on a
  kafka-shaped batch DataFrame;
- sink: the keyed-JSON serialization stage executed on real rows.

The live end-to-end test runs wherever ``SPARK_GRAFT_KAFKA_BROKERS`` is
set and the connector package is on the session classpath.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from flink_helloworld_spark.sources.kafka import (
    kafka_json_source,
    kafka_json_sink_writer,
    kafka_payload,
)

KAFKA_SHAPE = (
    "key binary, value binary, topic string, partition int, offset long,"
    " timestamp timestamp, timestampType int"
)


class _FakeReader:
    """Records the (format, options) the builder sets; load() hands back a
    real batch DataFrame with the Kafka source's column shape so the
    downstream projection actually runs."""

    def __init__(self, spark, rows):
        self._spark = spark
        self._rows = rows
        self.fmt = None
        self.options: dict[str, str] = {}

    def format(self, fmt):
        self.fmt = fmt
        return self

    def option(self, k, v):
        self.options[k] = v
        return self

    def load(self):
        return self._spark.createDataFrame(self._rows, KAFKA_SHAPE)


class _FakeSession:
    def __init__(self, spark, rows):
        self.reader = _FakeReader(spark, rows)

    @property
    def readStream(self):
        return self.reader


def _sample_rows():
    payload = json.dumps({"waybill_code": "JD01", "amount": 7}).encode()
    return [(b"JD01", payload, "bd_waybill", 0, 42, None, 0)]


def test_kafka_source_option_wiring_and_json_projection(spark):
    fake = _FakeSession(spark, _sample_rows())
    schema = StructType.fromDDL("waybill_code string, amount long")
    df = kafka_json_source(
        fake,  # duck-typed SparkSession
        brokers="broker-1:9092,broker-2:9092",
        topic="bd_waybill",
        schema=schema,
        starting_offsets="earliest",
        group_id="hello-world",
        min_partitions=10,
    )
    opts = fake.reader.options
    assert fake.reader.fmt == "kafka"
    assert opts["kafka.bootstrap.servers"] == "broker-1:9092,broker-2:9092"
    assert opts["subscribe"] == "bd_waybill"
    assert opts["startingOffsets"] == "earliest"
    assert opts["kafka.group.id"] == "hello-world"
    assert opts["minPartitions"] == "10"
    assert opts["failOnDataLoss"] == "false"
    (row,) = df.collect()
    assert (row.waybill_code, row.amount) == ("JD01", 7)
    assert (row.kafka_key, row.topic, row.partition, row.offset) == (
        "JD01",
        "bd_waybill",
        0,
        42,
    )


def test_kafka_source_starting_timestamp_overrides_offsets(spark):
    fake = _FakeSession(spark, _sample_rows())
    schema = StructType.fromDDL("waybill_code string, amount long")
    kafka_json_source(
        fake,
        brokers="b:9092",
        topic="t",
        schema=schema,
        starting_timestamp=1700000000000,
    )
    opts = fake.reader.options
    assert opts["startingTimestamp"] == "1700000000000"
    assert "startingOffsets" not in opts  # offsetsForTimes wins (KafKaTest.java:721)


def test_kafka_payload_keyed_json_round_trip(spark):
    df = spark.createDataFrame(
        [("JD01", 7, "site-A")], "waybill_code string, amount long, site string"
    )
    (row,) = kafka_payload(df, "waybill_code").collect()
    assert row.key == "JD01"
    assert json.loads(row.value) == {"waybill_code": "JD01", "amount": 7, "site": "site-A"}


@pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_KAFKA_BROKERS"),
    reason="live Kafka integration: set SPARK_GRAFT_KAFKA_BROKERS to run",
)
def test_kafka_live_round_trip(spark, tmp_path):  # pragma: no cover - needs broker
    brokers = os.environ["SPARK_GRAFT_KAFKA_BROKERS"]
    schema = StructType.fromDDL("waybill_code string, amount long")
    src = spark.createDataFrame([("JD01", 7)], schema)
    rate = (
        spark.readStream.format("rate").option("rowsPerSecond", "1").load()
        .select(F.lit("JD01").alias("waybill_code"), F.col("value").alias("amount"))
    )
    writer = kafka_json_sink_writer(
        rate, brokers, "fhs_it", "waybill_code", str(tmp_path / "ckpt")
    )
    q = writer.trigger(availableNow=True).start()
    q.awaitTermination(60)
    back = kafka_json_source(spark, brokers, "fhs_it", schema)
    chk = (
        back.writeStream.format("memory")
        .queryName("fhs_it_back")
        .trigger(availableNow=True)
        .start()
    )
    chk.awaitTermination(60)
    assert spark.sql("SELECT count(*) FROM fhs_it_back").collect()[0][0] > 0
    _ = src  # silence lint
