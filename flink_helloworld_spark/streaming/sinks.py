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
    """foreachBatch upsert into a hash-sharded parquet "index" keyed by
    `key_col`.

    Latest row per key wins (doc-id upsert); a replayed micro-batch
    (same batch_id) is skipped — the batch-id ledger is the dedup the
    reference gets from ES document versioning. With ``tombstone_col``,
    a latest row where that column is true DELETES the key (ES
    bulk-delete / delete-by-key, ElasticsearchTest.java:331-349).

    Scale contract (the part ES gives the reference for free):

    - the index is hash-sharded into ``num_shards`` directories
      (``data/_shard=K/``); a micro-batch rewrites ONLY the shards its
      keys land in, so write amplification per batch is
      O(index/num_shards × touched_shards), not O(index);
    - each shard swap is rename-aside (``shard -> shard.old``,
      ``tmp -> shard``, drop ``.old``): a crash at ANY point leaves a
      readable shard (``_recover`` rolls a half-swapped shard back on
      the next batch), never an empty index;
    - the batch ledger is a parquet table inside the store itself
      (``_ledger/``), written AFTER all shard swaps: a crash before the
      ledger append replays the batch, and the merge is idempotent
      (latest-per-key of (new ∪ same-incoming) = new).

    In production the same contract is one ``MERGE INTO`` on a
    Delta/Iceberg table; this sink keeps the engine dependency-free
    while preserving the partition-scoped-rewrite shape.
    """

    def __init__(
        self,
        path: str,
        key_col: str,
        order_col: str | None = None,
        tombstone_col: str | None = None,
        num_shards: int = 16,
    ):
        self.path = path
        self.key_col = key_col
        self.order_col = order_col
        self.tombstone_col = tombstone_col
        self.num_shards = num_shards
        os.makedirs(self._data_path(), exist_ok=True)
        # observability: shards rewritten per applied batch (tests assert
        # the partition-scoped contract through this)
        self.last_touched_shards: list[int] = []

    def _data_path(self) -> str:
        return os.path.join(self.path, "data")

    def _ledger_path(self) -> str:
        return os.path.join(self.path, "_ledger")

    def _shard_dir(self, shard: int) -> str:
        return os.path.join(self._data_path(), f"_shard={shard}")

    def _shard_col(self):
        return F.pmod(F.xxhash64(F.col(self.key_col).cast("string")), F.lit(self.num_shards))

    def _recover(self) -> None:
        """Roll back any half-finished shard swap from a crash."""
        import shutil

        data = self._data_path()
        for name in os.listdir(data):
            if not name.endswith(".old"):
                continue
            final = os.path.join(data, name[: -len(".old")])
            old = os.path.join(data, name)
            if os.path.exists(final):
                shutil.rmtree(old)  # swap completed; drop the backup
            else:
                os.rename(old, final)  # crashed mid-swap; restore
        for name in os.listdir(data):
            if name.endswith(".tmp"):
                shutil.rmtree(os.path.join(data, name))

    def _applied(self, spark, batch_id: int) -> bool:
        ledger = self._ledger_path()
        if not os.path.exists(ledger) or not any(
            f.endswith(".parquet") for f in os.listdir(ledger)
        ):
            return False
        return (
            spark.read.parquet(ledger)
            .where(F.col("batch_id") == batch_id)
            .limit(1)
            .count()
            > 0
        )

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        import shutil

        spark = batch_df.sparkSession
        if self._applied(spark, batch_id):  # replayed batch → idempotent skip
            return
        self._recover()
        incoming = batch_df.persist()
        try:
            touched = sorted(
                r[0]
                for r in incoming.select(self._shard_col().alias("_shard"))
                .distinct()
                .collect()  # shard IDs only: bounded by num_shards, metadata not data
            )
            existing = [s for s in touched if os.path.exists(self._shard_dir(s))]
            merged = incoming
            if existing:
                current = spark.read.parquet(*[self._shard_dir(s) for s in existing])
                merged = current.unionByName(incoming, allowMissingColumns=True)
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
            # one job writes every touched shard (hive-style dirs), then
            # each shard dir swaps in atomically
            tmp = os.path.join(self._data_path(), f"batch-{batch_id}.tmp")
            latest.withColumn("_shard", self._shard_col()).write.mode(
                "overwrite"
            ).partitionBy("_shard").parquet(tmp)
            for s in touched:
                shard, old = self._shard_dir(s), self._shard_dir(s) + ".old"
                new = os.path.join(tmp, f"_shard={s}")
                if os.path.exists(shard):
                    os.rename(shard, old)
                if os.path.exists(new):
                    os.rename(new, shard)
                # else: every key in this shard tombstoned → shard dropped
                if os.path.exists(old):
                    shutil.rmtree(old)
            shutil.rmtree(tmp)
            spark.createDataFrame(
                [(int(batch_id),)], "batch_id long"
            ).write.mode("append").parquet(self._ledger_path())
            self.last_touched_shards = touched
        finally:
            incoming.unpersist()

    def read(self, spark) -> DataFrame:
        return spark.read.parquet(self._data_path()).drop("_shard")


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
