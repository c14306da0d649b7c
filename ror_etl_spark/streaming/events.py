"""Structured Streaming demos over the events table.

The batch queries in ``queries/temporal.py`` and ``queries/windows.py``
use ``F.window`` / sessionization expressions that work identically on
streaming DataFrames; this module wires the same logic behind
``readStream`` with watermarks so the engine's streaming surface is real
and testable offline (file source feeding the parquet fixtures, memory
sink, ``processAllAvailable`` for deterministic completion).

At scale: the file source becomes Kafka, the memory sink becomes a
Parquet/Delta sink with checkpointing; watermark + windowed state is
partitioned by group key across executors, and
``dropDuplicatesWithinWatermark`` bounds dedup state by event time.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events parquet, schema derived from a
    batch probe of the same file so stream and batch can never disagree
    on the ts dtype. The driver has shipped events.ts both as
    timestamp[us] (surfaces as TIMESTAMP_NTZ) and as TIMESTAMP(NANOS)
    (surfaces as long under nanosAsLong) across rounds; the batch path in
    tables.py adapts at read time, and this mirrors it — probe the batch
    schema, feed it to readStream, then apply the identical ns→us
    conversion when the raw dtype is bigint. Watermarks demand TIMESTAMP
    (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE) — the final cast keeps the
    wall-clock value, so stream results collect identically to the batch
    twins."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw_schema = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).schema
    # the streaming file source wants a directory — point it at sf_dir and
    # glob-filter down to the single events file
    raw = (
        spark.readStream.schema(raw_schema)
        .option("pathGlobFilter", "events.parquet")
        .format("parquet")
        .load(sf_dir)
    )
    if dict((f.name, f.dataType.simpleString()) for f in raw_schema.fields).get("ts") == "bigint":
        raw = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return raw.withColumn("ts", F.col("ts").cast("timestamp"))


def tumbling_counts(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Hourly tumbling counts with late-data tolerance — the streaming twin
    of queries/temporal.py::tumbling_window_counts."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("total"))
        .select(F.col("w.start").alias("wstart"), "event_type", "n", "total")
    )


def sliding_counts(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("wstart"), "n")
    )


def session_counts(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Event-time session windows (30-min inactivity gap) — the streaming
    twin of queries/windows.py::sessionize_events."""
    return (
        events.withWatermark("ts", "10 minutes")
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


def dedup_within_watermark(events: DataFrame, watermark: str = "30 minutes") -> DataFrame:
    """Streaming dedup with bounded state: duplicate event_ids arriving
    within the watermark horizon are dropped; state for older keys is
    reclaimed — the only dedup that survives an unbounded stream."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def run_to_memory(spark: SparkSession, df: DataFrame, name: str, mode: str = "append"):
    """Drive a streaming frame to completion against the bounded file
    source and return the collected result table."""
    q = (
        df.writeStream.outputMode(mode)
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.sql(f"SELECT * FROM {name}")
