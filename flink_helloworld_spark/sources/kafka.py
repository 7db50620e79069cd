"""Kafka source/sink wrappers (SURVEY.md §2.1 S12, §2.2 K2, §2.10).

Maps the reference's Kafka usage onto Spark's Kafka connector options:

- ``FlinkKafkaConsumer`` + JSON deserialization + ``auto.offset.reset=
  earliest`` (HelloWorldFlink.java:164-193) ↦ ``readStream.format
  ("kafka")`` + ``startingOffsets=earliest`` + ``from_json(value)``.
- consumer protocol semantics the reference exercises directly
  (KafKaTest.java): seek/offsetsForTimes ↦ ``startingOffsets`` JSON /
  ``startingTimestamp``; commit bookkeeping ↦ checkpoint-managed offsets;
  record metadata key/value/topic/partition/offset/timestamp
  (KafKaTest.java:49-57) ↦ the source's built-in metadata columns.
- ``FlinkKafkaProducer`` keyed JSON with EXACTLY_ONCE
  (HelloWorldFlink.java:145-162) ↦ keyed ``to_json`` write + checkpoint;
  Spark's Kafka sink is at-least-once — exactly-once parity is reached
  downstream via idempotent keyed upsert (streaming/sinks.py), the same
  trick the reference's ES sink uses (id=waybillCode upsert,
  HelloWorldFlink.java:206-207).

No Kafka broker exists in the test container; these builders are
config/plan-level (unit-tested for option wiring, exercised end-to-end
only where a broker is available).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def kafka_json_source(
    spark: SparkSession,
    brokers: str,
    topic: str,
    schema: StructType,
    starting_offsets: str = "earliest",
    starting_timestamp: int | None = None,
    group_id: str | None = None,
    min_partitions: int | None = None,
) -> DataFrame:
    """JSON-over-Kafka stream → typed columns + Kafka metadata columns.

    ``starting_offsets`` accepts 'earliest' / 'latest' / per-partition
    JSON (the reference's seek()); ``starting_timestamp`` maps
    offsetsForTimes (KafKaTest.java:721-725). ``min_partitions``
    oversplits partitions for parallelism beyond the topic's partition
    count (reference consumer parallelism 10, HelloWorldFlink.java:193).
    """
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("subscribe", topic)
        .option("failOnDataLoss", "false")
    )
    if starting_timestamp is not None:
        reader = reader.option("startingTimestamp", str(starting_timestamp))
    else:
        reader = reader.option("startingOffsets", starting_offsets)
    if group_id:
        reader = reader.option("kafka.group.id", group_id)
    if min_partitions:
        reader = reader.option("minPartitions", str(min_partitions))
    try:
        raw = reader.load()
    except Exception as e:  # connector jar not on classpath
        if "Failed to find data source: kafka" in str(e):
            raise RuntimeError(
                "Kafka connector not available: add the "
                "org.apache.spark:spark-sql-kafka-0-10_2.13 package to the "
                "session (spark.jars.packages) to use kafka_json_source"
            ) from e
        raise
    return raw.select(
        F.from_json(F.col("value").cast("string"), schema).alias("data"),
        F.col("key").cast("string").alias("kafka_key"),
        "topic",
        "partition",
        "offset",
        F.col("timestamp").alias("kafka_timestamp"),
    ).select("data.*", "kafka_key", "topic", "partition", "offset", "kafka_timestamp")


def kafka_payload(df: DataFrame, key_col: str) -> DataFrame:
    """The sink's serialization step, separated so it's testable without
    a broker: key = key_col as string bytes, value = whole-row JSON
    (reference KafkaSerializationSchema, HelloWorldFlink.java:145-162)."""
    return df.select(
        F.col(key_col).cast("string").alias("key"),
        F.to_json(F.struct(*[c for c in df.columns])).alias("value"),
    )


def kafka_json_sink_writer(
    df: DataFrame,
    brokers: str,
    topic: str,
    key_col: str,
    checkpoint_dir: str,
):
    """Keyed JSON Kafka sink (reference KafkaSerializationSchema:
    key = waybillCode bytes, value = JSON, HelloWorldFlink.java:145-162).

    Returns the configured DataStreamWriter (caller starts it). Delivery
    is at-least-once under checkpointing; see module docstring for the
    exactly-once mapping."""
    payload = kafka_payload(df, key_col)
    return (
        payload.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint_dir)
    )
