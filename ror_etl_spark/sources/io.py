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
