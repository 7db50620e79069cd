"""Sinks with the reference's delivery semantics (SURVEY.md §2.2, T9).

The reference's Elasticsearch sink is an idempotent keyed upsert
(UpdateRequest.docAsUpsert, id = waybillCode, retryOnConflict —
HelloWorldFlink.java:194-250): replaying the same record converges. The
Spark-native equivalent is ``foreachBatch`` + keyed parquet upsert with
batch-id dedup: checkpointing gives at-least-once batch delivery, and
the idempotent merge turns it into effective exactly-once — the same
argument the reference makes for ES.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class KeyedUpsertSink:
    """foreachBatch upsert into a parquet "index" keyed by `key_col`.

    Latest row per key wins (doc-id upsert); a replayed micro-batch
    (same batch_id) is skipped — the batch-id ledger is the dedup the
    reference gets from ES document versioning. With ``tombstone_col``,
    a latest row where that column is true DELETES the key (ES
    bulk-delete / delete-by-key, ElasticsearchTest.java:331-349)."""

    def __init__(
        self,
        path: str,
        key_col: str,
        order_col: str | None = None,
        tombstone_col: str | None = None,
    ):
        self.path = path
        self.key_col = key_col
        self.order_col = order_col
        self.tombstone_col = tombstone_col
        self._seen_path = os.path.join(path, "_batches")
        os.makedirs(self._seen_path, exist_ok=True)

    def _data_path(self) -> str:
        return os.path.join(self.path, "data")

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        marker = os.path.join(self._seen_path, f"{batch_id}.done")
        if os.path.exists(marker):  # replayed batch → idempotent skip
            return
        spark = batch_df.sparkSession
        incoming = batch_df.persist()
        try:
            data = self._data_path()
            if os.path.exists(data):
                current = spark.read.parquet(data)
                merged = current.unionByName(incoming, allowMissingColumns=True)
            else:
                merged = incoming
            order = F.col(self.order_col) if self.order_col else F.monotonically_increasing_id()
            from pyspark.sql import Window

            w = Window.partitionBy(self.key_col).orderBy(order.desc())
            latest = (
                merged.withColumn("_rn", F.row_number().over(w))
                .where(F.col("_rn") == 1)
                .drop("_rn")
            )
            if self.tombstone_col and self.tombstone_col in latest.columns:
                # a winning tombstone removes the key entirely
                latest = latest.where(
                    ~F.coalesce(F.col(self.tombstone_col), F.lit(False))
                )
            tmp = data + ".tmp"
            latest.write.mode("overwrite").parquet(tmp)
            if os.path.exists(data):
                import shutil

                shutil.rmtree(data)
            os.rename(tmp, data)
            open(marker, "w").close()
        finally:
            incoming.unpersist()

    def read(self, spark) -> DataFrame:
        return spark.read.parquet(self._data_path())


def partitioned_lake_sink(
    df: DataFrame, path: str, checkpoint_dir: str, partition_cols: list[str]
):
    """Append-mode partitioned parquet lake writer: the data-lake sink a
    100 TB pipeline lands in (hive-style partition dirs → partition
    pruning for readers). Exactly-once per file via the sink's
    checkpointed manifest."""
    return (
        df.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint_dir)
        .partitionBy(*partition_cols)
        .outputMode("append")
    )


def console_sink(df: DataFrame, label: str = "out", num_rows: int = 20):
    """print()/print(label) (K1, HelloWorldFlinkTest.java:46,105):
    console streaming sink, label ↦ queryName."""
    return (
        df.writeStream.format("console")
        .queryName(label)
        .option("numRows", str(num_rows))
        .option("truncate", "false")
    )
