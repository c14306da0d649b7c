"""Loaders for the driver test tables (TESTDATA.md / FIXTURES.md §B).

``Tables`` is a thin lazy facade: ``t.lineitem`` returns the DataFrame for
``{sf_dir}/lineitem.parquet``. Reads are plain ``spark.read.parquet`` so
Catalyst column pruning / predicate pushdown reach the scan — never
pre-select or cache here; each query declares what it needs.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


class Tables:
    def __init__(self, spark: SparkSession, sf_dir: str):
        self.spark = spark
        self.sf_dir = sf_dir

    def __getattr__(self, name: str) -> DataFrame:
        if name not in TABLE_NAMES:
            raise AttributeError(name)
        if name == "events":
            # the driver may hand us a vanilla session — this legacy conf is
            # runtime-settable and required to read TIMESTAMP(NANOS) parquet
            self.spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = self.spark.read.parquet(os.path.join(self.sf_dir, f"{name}.parquet"))
        if name == "events" and dict(df.dtypes).get("ts") == "bigint":
            # Some driver datasets write events.ts as TIMESTAMP(NANOS),
            # surfaced as long ns under nanosAsLong; current ones write
            # micros (read natively as timestamp). When ns-as-long shows
            # up, integer-divide to micros — exact, and identical to
            # DuckDB's ns→us truncation.
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df

    def view(self, name: str) -> DataFrame:
        """Read a table and register it as a temp view (for spark.sql use)."""
        df = getattr(self, name)
        df.createOrReplaceTempView(name)
        return df

    def register_all(self) -> None:
        for name in TABLE_NAMES:
            self.view(name)
