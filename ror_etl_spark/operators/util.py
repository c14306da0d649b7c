"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, target: int | None = None) -> DataFrame:
    """Repartition small inputs up to the session's default parallelism.

    Small-file inputs (one parquet file → one partition) serialize
    compute-heavy per-row operators (signatures, hashing, vector math)
    onto a single core; one round-robin shuffle of the narrow input is
    far cheaper than running 32× longer on one task.

    Gated on ``spark.ror.spread.enabled`` (default true; set false on a
    real cluster where inputs already have thousands of partitions) —
    a conf check instead of ``df.rdd.getNumPartitions()``, which forces a
    plan→RDD conversion per call and pins an RDD scan into every query
    plan. AQE coalesces any excess partitions after the fact, so an
    unconditional repartition of an already-wide input only costs one
    narrow shuffle at small scale and is disabled where it would matter."""
    spark = df.sparkSession
    if spark.conf.get("spark.ror.spread.enabled", "true") != "true":
        return df
    target = target or spark.sparkContext.defaultParallelism
    return df.repartition(target)
