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

# Schema cache — METADATA only, the same role a catalog/metastore plays in
# production (a 100 TB deployment never re-infers schemas per query).
# ``spark.read.parquet`` runs driver-side footer reading + schema
# inference on every call: measured ~90 ms per table, ~0.6 s per
# construction of a 7-table TPC-H query — pure fixed driver latency paid
# inside every timed bench rep (guide §5: the driver should do almost no
# data work). Keyed by (absolute path, mtime_ns) so any rewrite of the
# files invalidates the entry; no DATA or query RESULTS are ever cached
# here — every execution still scans the parquet inputs.
_SCHEMA_CACHE: dict = {}


class Tables:
    def __init__(self, spark: SparkSession, sf_dir: str):
        self.spark = spark
        self.sf_dir = sf_dir

    def _read(self, path: str) -> DataFrame:
        try:
            key = (os.path.abspath(path), os.stat(path).st_mtime_ns)
        except OSError:
            return self.spark.read.parquet(path)
        schema = _SCHEMA_CACHE.get(key)
        if schema is None:
            df = self.spark.read.parquet(path)
            _SCHEMA_CACHE[key] = df.schema
            return df
        return self.spark.read.schema(schema).parquet(path)

    def __getattr__(self, name: str) -> DataFrame:
        if name not in TABLE_NAMES:
            raise AttributeError(name)
        if name == "events":
            # the driver may hand us a vanilla session — this legacy conf is
            # runtime-settable and required to read TIMESTAMP(NANOS) parquet
            self.spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = self._read(os.path.join(self.sf_dir, f"{name}.parquet"))
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
