"""foreachBatch sink: stream → per-micro-batch MERGE into a parquet
target.

``foreachBatch`` is the bridge between Structured Streaming and batch
sinks that have no native streaming writer (here: plain parquet with
the MERGE emulation from ``operators.upsert``). Each micro-batch
arrives as a bounded DataFrame with a monotonically increasing
``batch_id``; writing ``batch_id`` into a ledger column makes the sink
IDEMPOTENT — on restart-and-replay, an already-applied batch is
detected and skipped, which together with the checkpoint's exactly-once
source tracking gives end-to-end exactly-once into an
overwrite-capable store. At 100 TB the same pattern targets a
lakehouse MERGE INTO; the per-batch dataflow below is what those
engines run internally.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ror_etl_spark.operators.upsert import upsert


class ParquetUpsertSink:
    """Maintains latest-state-per-user at ``path`` from an update stream."""

    def __init__(self, spark: SparkSession, path: str, key: str = "user_id"):
        self.spark = spark
        self.path = path
        self.key = key

    def _applied_batches(self) -> set[int]:
        if not os.path.exists(self.path):
            return set()
        return {
            r["__batch_id"]
            for r in self.spark.read.parquet(self.path)
            .select("__batch_id").distinct().collect()
        }

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        if batch_id in self._applied_batches():
            return  # replayed batch after restart — already applied
        incoming = batch_df.withColumn("__batch_id", F.lit(batch_id).cast("long"))
        if os.path.exists(self.path):
            target = self.spark.read.parquet(self.path)
            merged = upsert(target, incoming, self.key)
        else:
            merged = incoming
        # full-replace write through a staging location would be atomic on
        # an object store; local parquet overwrite is sufficient here
        merged.localCheckpoint(eager=True).write.mode("overwrite").parquet(self.path)

    def attach(self, df: DataFrame, checkpoint_dir: str):
        """Start the stream writing into this sink (availableNow)."""
        return (
            df.writeStream.outputMode("update")
            .option("checkpointLocation", checkpoint_dir)
            .foreachBatch(self.process_batch)
            .trigger(availableNow=True)
            .start()
        )
