"""Source/sink connectors: Parquet (default), JSONL, CSV — schema-enforced
reads (never inferSchema in production paths) and partitioned writes.

Scale notes:
- JSONL and CSV are line-splittable: a single 1 TB file still parallelizes
  across executors. Multi-line JSON arrays do not — convert on ingest
  (sources.fetch does exactly that for the ROR dump).
- ``write_partitioned`` lays out hive-style ``key=value`` directories so
  downstream reads prune partitions from the path alone.
- ``write_bucketed`` persists a bucketed table through the session catalog:
  two tables bucketed on the same key by the same count join WITHOUT a
  shuffle (SortMergeJoin with no Exchange) — the cheapest repeated-join
  layout at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_jsonl(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """Schema-enforced JSONL read; FAILFAST mirrors warehouse load-time
    rejection (BigQuery semantics in the reference, ror_dag.py:166-175)."""
    return spark.read.schema(schema).option("mode", "FAILFAST").json(path)


def read_csv(
    spark: SparkSession, path: str, schema: T.StructType, header: bool = True
) -> DataFrame:
    return (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .option("mode", "FAILFAST")
        .csv(path)
    )


def write_jsonl(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").json(path)


def write_csv(df: DataFrame, path: str, header: bool = True) -> None:
    df.write.mode("overwrite").option("header", str(header).lower()).csv(path)


def write_parquet(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").parquet(path)


def write_partitioned(df: DataFrame, path: str, *partition_cols: str) -> None:
    """Hive-layout partitioned parquet: partition pruning happens at file
    listing, before any IO."""
    df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 16,
    path: str | None = None,
) -> None:
    """Catalog-managed bucketed table (bucketBy requires saveAsTable);
    pass ``path`` for an external table outside the warehouse dir."""
    w = (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .format("parquet")
    )
    if path:
        w = w.option("path", path)
    w.saveAsTable(table)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """Columnar ORC source — same pushdown/pruning properties as parquet
    (vectorized reader, predicate pushdown, column pruning)."""
    return spark.read.orc(path)


def write_orc(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").orc(path)


def read_text(spark: SparkSession, path: str) -> DataFrame:
    """Line-oriented text source: one string column ``value`` per line —
    the raw-ingest path for document corpora before schema imposition."""
    return spark.read.text(path)


def write_text(df: DataFrame, path: str) -> None:
    """Text sink: requires a single string column."""
    df.write.mode("overwrite").text(path)


def compact_parquet(
    spark: SparkSession,
    src: str,
    dst: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> dict:
    """Small-file compaction: rewrite a parquet directory into
    ``ceil(total_bytes / target_file_bytes)`` files.

    The small-files problem is the silent killer of long-lived ingest at
    scale — a streaming sink or hourly batch leaves thousands of KB-sized
    files per partition and every downstream scan pays per-file open
    cost, footer reads and scheduler pressure. Compaction is a pure
    re-write: file sizes come from the driver-side listing (no data
    scan), the data itself moves through one narrow round-robin shuffle.

    Returns a manifest dict (files/bytes before and after) so callers
    can log or assert on the layout — the shape a table-maintenance job
    (OPTIMIZE in lakehouse formats) reports."""
    import math
    import os

    def listing(path: str) -> tuple[int, int]:
        n, total = 0, 0
        for root, _dirs, files in os.walk(path):
            for fn in files:
                if fn.endswith(".parquet"):
                    n += 1
                    total += os.path.getsize(os.path.join(root, fn))
        return n, total

    n_before, bytes_before = listing(src)
    n_target = max(1, math.ceil(bytes_before / target_file_bytes))
    df = spark.read.parquet(src)
    # repartition (not coalesce): coalesce to few partitions also narrows
    # the READ parallelism of the same stage; a round-robin shuffle keeps
    # the scan wide and only the write narrow
    df.repartition(n_target).write.mode("overwrite").parquet(dst)
    n_after, bytes_after = listing(dst)
    return {
        "files_before": n_before,
        "bytes_before": bytes_before,
        "files_after": n_after,
        "bytes_after": bytes_after,
        "target_files": n_target,
    }


def read_jsonl_quarantine(
    spark: SparkSession, path: str, schema: T.StructType
) -> tuple[DataFrame, DataFrame]:
    """PERMISSIVE ingest with quarantine: returns (good, bad) frames.

    The FAILFAST readers above are the warehouse-load gate; at crawl
    scale a single malformed line must not kill a 100 TB ingest, so the
    production pattern is PERMISSIVE parse with the raw text of bad
    records captured in ``_corrupt_record``, split into a clean frame
    (quarantine column dropped) and a quarantine frame (raw line + file)
    for replay/triage. Spark requires the corrupt column to be cached or
    re-read for filtering — a cache() on the parsed frame keeps this one
    scan."""
    from pyspark.sql import functions as F

    with_corrupt = schema.add("_corrupt_record", T.StringType())
    parsed = (
        spark.read.schema(with_corrupt)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
        # input_file_name() must be captured at scan time — it evaluates
        # empty once rows come back out of the cache
        .withColumn("_src_file", F.input_file_name())
        .cache()
    )
    good = parsed.filter(F.col("_corrupt_record").isNull()).drop(
        "_corrupt_record", "_src_file"
    )
    bad = parsed.filter(F.col("_corrupt_record").isNotNull()).select(
        F.col("_corrupt_record").alias("raw"),
        F.col("_src_file").alias("src_file"),
    )
    return good, bad


def export_sorted_shards(
    df: DataFrame, path: str, sort_col: str, n_shards: int
) -> None:
    """Globally-sorted sharded export: repartitionByRange splits the key
    space into ``n_shards`` contiguous ranges (sampled boundaries),
    sortWithinPartitions orders inside each, so shard k's every key <
    shard k+1's — a total order across files without a single-reducer
    global sort. The layout training loaders want for sequential reads
    and range-based resume, and the same plan shape at any scale."""
    (
        df.repartitionByRange(n_shards, sort_col)
        .sortWithinPartitions(sort_col)
        .write.mode("overwrite")
        .parquet(path)
    )
