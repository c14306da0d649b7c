"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, target: int | None = None) -> DataFrame:
    """Repartition up to the session's default parallelism when the input
    has fewer partitions.

    Small-file inputs (one parquet file → one partition) serialize
    compute-heavy per-row operators (signatures, hashing, vector math)
    onto a single core; one round-robin shuffle of the narrow input is
    far cheaper than running 32× longer on one task. At 100 TB inputs
    already have thousands of partitions and this is a no-op."""
    sc = df.sparkSession.sparkContext
    target = target or sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
