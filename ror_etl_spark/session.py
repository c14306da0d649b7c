"""SparkSession construction.

One builder for both test (local[N]) and cluster use. The knobs that matter
at 100 TB are set explicitly so the same code scales:

- AQE on (runtime partition coalescing, skew-join splitting, dynamic
  broadcast conversion) — at 1000 executors this is what absorbs skewed
  keys and mis-estimated shuffle sizes.
- ``spark.sql.shuffle.partitions`` defaults to ~cores locally; on a real
  cluster AQE's coalescing makes a high static value safe.
- Session timezone pinned UTC so results are engine-portable (and match
  the DuckDB oracle).
- Arrow enabled: every pandas_udf / applyInPandas crossing is batched.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "ror_etl_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with scale-aware defaults."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or os.environ.get("SPARK_MASTER", f"local[{cpus}]")
    nparts = shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(nparts))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # rank-filter pushdown (WindowGroupLimit) stops at limits above
        # 1000 by default; the KMV sketch keeps the bottom k=2048 hashes
        # per day, and the partial (map-side) group limit is what caps
        # each scan partition's contribution BEFORE the day exchange —
        # at 100 TB that's the difference between shuffling every
        # distinct (day, hash) pair and shuffling ≤k·partitions rows.
        # 4096 covers every registered top-k with headroom; semantics
        # are untouched (the filter result is identical, it just runs
        # earlier), so the vanilla-session oracle path is unaffected.
        .config("spark.sql.optimizer.windowGroupLimitThreshold", "4096")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # testdata events.parquet stores TIMESTAMP(NANOS); Spark has no
        # nanos timestamp type — read as long, Tables converts to micros
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
