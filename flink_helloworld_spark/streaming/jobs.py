"""End-to-end streaming jobs (reference HelloWorldFlink.java:61-252).

The reference main(): parallel waybill generator → Kafka → consumer →
Elasticsearch idempotent upsert. Here: rate-source generator → column
transforms → keyed idempotent upsert sink (the Kafka hop is config-only
in this container — kafka.py wires it where a broker exists; the sink
IS the ES-upsert equivalent).

Also the streaming dedup surface (north-star): exact streaming dedup via
``dropDuplicates``/``dropDuplicatesWithinWatermark`` — Spark's native
watermark-scoped dedup keeps state bounded, the 100 TB requirement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_helloworld_spark.sources.generators import waybill_c_stream
from flink_helloworld_spark.streaming.sinks import KeyedUpsertSink


def waybill_etl_job(
    spark: SparkSession,
    sink_path: str,
    checkpoint_dir: str,
    rows_per_second: int = 100,
):
    """Generator → enrich → keyed upsert: the HelloWorldFlink main ETL
    reshaped Spark-first. Returns (sink, StreamingQuery) — caller stops
    the query; the sink is queryable parquet keyed by waybill_code."""
    stream = waybill_c_stream(spark, rows_per_second)
    enriched = stream.select(
        "waybill_code",
        "waybill_sign",
        "site_code",
        "site_name",
        "seq",
        F.length("waybill_sign").alias("sign_len"),
        F.unix_millis(F.col("emit_time")).alias("ts"),
    )
    sink = KeyedUpsertSink(sink_path, "waybill_code", "seq")
    query = (
        enriched.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
    return sink, query


def streaming_dedup_exact(
    stream: DataFrame, keys: list[str], time_col: str | None = None, delay: str = "10 minutes"
) -> DataFrame:
    """Exact streaming dedup. With ``time_col``, uses
    ``dropDuplicatesWithinWatermark``: duplicate arrivals inside the
    watermark window are suppressed and state for old keys is evicted as
    the watermark advances — bounded state, unlike plain dropDuplicates
    whose key set grows forever (only safe on bounded key spaces)."""
    if time_col is None:
        return stream.dropDuplicates(keys)
    return stream.withWatermark(time_col, delay).dropDuplicatesWithinWatermark(keys)
