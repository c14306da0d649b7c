"""Set operations: UNION (ALL), INTERSECT, EXCEPT (ALL)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ror_etl_spark.registry import query
from ror_etl_spark.tables import Tables


def _big_spenders(t: Tables) -> DataFrame:
    return (
        t.orders.filter(F.col("o_totalprice") > 350000)
        .select(F.col("o_custkey").alias("custkey"))
    )


def _building_customers(t: Tables) -> DataFrame:
    return (
        t.customer.filter(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_custkey").alias("custkey"))
    )


_BIG_SQL = "SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 350000"
_BLD_SQL = "SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'"


@query(
    "set_union",
    oracle=f"""
    SELECT custkey FROM ({_BIG_SQL} UNION {_BLD_SQL}) ORDER BY custkey
    """,
)
def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) of two key sets."""
    t = Tables(spark, sf_dir)
    return _big_spenders(t).union(_building_customers(t)).distinct().orderBy("custkey")


@query(
    "set_union_all",
    oracle=f"""
    SELECT custkey, count(*) AS n
    FROM ({_BIG_SQL} UNION ALL {_BLD_SQL})
    GROUP BY custkey ORDER BY custkey
    """,
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL preserving duplicates (counted to keep the check exact)."""
    t = Tables(spark, sf_dir)
    return (
        _big_spenders(t)
        .union(_building_customers(t))
        .groupBy("custkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("custkey")
    )


@query(
    "set_intersect",
    oracle=f"""
    SELECT custkey FROM ({_BIG_SQL} INTERSECT {_BLD_SQL}) ORDER BY custkey
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BUILDING-segment customers who also placed a >350k order."""
    t = Tables(spark, sf_dir)
    return _big_spenders(t).intersect(_building_customers(t)).orderBy("custkey")


@query(
    "set_except",
    oracle=f"""
    SELECT custkey FROM ({_BLD_SQL} EXCEPT {_BIG_SQL}) ORDER BY custkey
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BUILDING-segment customers with no >350k order (EXCEPT DISTINCT)."""
    t = Tables(spark, sf_dir)
    return _building_customers(t).subtract(_big_spenders(t)).orderBy("custkey")
