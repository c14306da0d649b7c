"""Query registry backing the driver contract (__spark_entry__.py).

Every implemented operator registers a named query callable
``(spark, sf_dir) -> DataFrame`` and, when SQL-expressible, the equivalent
DuckDB oracle SQL. Registration happens at import time of the
``ror_etl_spark.queries`` subpackage.

Correctness discipline (driver hashes values order-insensitively after
sorting columns by name):
- alias every computed column identically in Spark code and oracle SQL;
- round floating-point aggregates to a fixed number of decimals on BOTH
  sides so fp summation order can't flip the hash;
- make every ORDER BY / top-k deterministic with an explicit tiebreak key.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a driver-contract query; ``oracle`` is DuckDB SQL or None
    for non-SQL-expressible operators (driver then does a rows-only check).
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = " ".join(oracle.split())
        return fn

    return deco


def load_all() -> None:
    """Import every query module (idempotent)."""
    from ror_etl_spark import queries  # noqa: F401

    queries.load()
