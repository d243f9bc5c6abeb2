"""Streaming sinks — the keyed upsert store (A2) with exactly-once
micro-batch semantics, on plain parquet.

The reference stores each accepted event as ``SET event:{id}`` inside
a per-batch Redis pipeline and commits offsets after the flush
(auto_kafka_redis.py:368-405) — at-least-once with replay dedup. Our
sink is strictly stronger: a log-structured keyed store where each
micro-batch lands as one epoch partition with *dynamic partition
overwrite*, so a replayed epoch (restart between write and WAL
commit) overwrites itself instead of duplicating — idempotent ⇒
effectively exactly-once. In production this is one Delta/Iceberg
MERGE; the log+compaction shape here is the same pattern without the
table-format dependency, and scales: appends are partition-local,
compaction is one keyed arg-max (SURVEY §2.A A2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


class ParquetKeyedStore:
    """Latest-write-wins KV store over an epoch-partitioned parquet log."""

    def __init__(self, path: str, key: str = "event_id", ts_col: str = "ts"):
        self.path = path
        self.key = key
        self.ts_col = ts_col

    def upsert_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        """foreachBatch hook — idempotent per epoch."""
        spark = batch_df.sparkSession
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        (
            batch_df.withColumn("_epoch", F.lit(int(epoch_id)))
            .write.partitionBy("_epoch")
            .mode("overwrite")
            .parquet(self.path)
        )

    def log(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(self.path)

    def compact(self, spark: SparkSession) -> None:
        """Log-structured compaction: rewrite the epoch log as a single
        epoch holding only the latest row per key. Run periodically (a
        maintenance job, exactly like table-format compaction) so read
        amplification stays bounded while appends remain cheap."""
        latest = self.compacted(spark)
        max_epoch = (
            self.log(spark).agg(F.max("_epoch")).first()[0]
        )
        tmp = self.path + ".compacting"
        (
            latest.withColumn("_epoch", F.lit(int(max_epoch)))
            .write.partitionBy("_epoch")
            .mode("overwrite")
            .parquet(tmp)
        )
        import shutil

        shutil.rmtree(self.path)
        shutil.move(tmp, self.path)

    def compacted(self, spark: SparkSession) -> DataFrame:
        """The KV view: latest write per key wins (ties broken by the
        later epoch — replay order, mirroring 'latest SET wins')."""
        log = self.log(spark)
        w = Window.partitionBy(self.key).orderBy(
            F.col(self.ts_col).desc(), F.col("_epoch").desc()
        )
        return (
            log.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn", "_epoch")
        )
