"""Subquery surface: scalar, IN, correlated EXISTS, HAVING — authored via
spark.sql (Catalyst rewrites them into joins; DuckDB runs the same ANSI
SQL, so these oracles are near-verbatim)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ror_etl_spark.registry import query
from ror_etl_spark.tables import Tables

_SCALAR_SQL = """
    SELECT o_orderkey, round(o_totalprice, 2) AS price
    FROM orders
    WHERE o_totalprice > 3 * (SELECT avg(o_totalprice) FROM orders)
    ORDER BY o_orderkey
"""


@query("subquery_scalar", oracle=_SCALAR_SQL)
def subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery (broadcast as a literal after one agg)."""
    Tables(spark, sf_dir).view("orders")
    return spark.sql(_SCALAR_SQL)


_IN_SQL = """
    SELECT l_orderkey, l_partkey, round(l_extendedprice, 2) AS price
    FROM lineitem
    WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_type = 'PROMO' AND p_size > 40)
      AND l_quantity > 45
    ORDER BY l_orderkey, l_partkey, price
"""


@query("subquery_in", oracle=_IN_SQL)
def subquery_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subquery → left-semi join on the filtered dimension."""
    t = Tables(spark, sf_dir)
    t.view("lineitem"), t.view("part")
    return spark.sql(_IN_SQL)


_EXISTS_SQL = """
    SELECT c_custkey, c_name
    FROM customer c
    WHERE EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey
        AND o.o_orderdate >= TIMESTAMP '2001-01-01 00:00:00'
    )
    AND c_acctbal < 0
    ORDER BY c_custkey
"""


@query("subquery_correlated_exists", oracle=_EXISTS_SQL)
def subquery_correlated_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS (decorrelated by Catalyst into a semi join)."""
    t = Tables(spark, sf_dir)
    t.view("customer"), t.view("orders")
    return spark.sql(_EXISTS_SQL)


_HAVING_SQL = """
    SELECT o_custkey, count(*) AS n_orders, round(sum(o_totalprice), 2) AS total
    FROM orders
    GROUP BY o_custkey
    HAVING count(*) >= 15 AND sum(o_totalprice) > 1500000
    ORDER BY o_custkey
"""


@query("agg_having", oracle=_HAVING_SQL)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-aggregation HAVING filter."""
    Tables(spark, sf_dir).view("orders")
    return spark.sql(_HAVING_SQL)


_Q18_SQL = """
    SELECT c_custkey, o_orderkey, round(o_totalprice, 2) AS price, qty
    FROM (
      SELECT o.o_custkey AS c_custkey, o.o_orderkey, o.o_totalprice,
             round(sum(l.l_quantity), 2) AS qty
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      GROUP BY o.o_custkey, o.o_orderkey, o.o_totalprice
      HAVING sum(l.l_quantity) > 150
    )
    ORDER BY price DESC, o_orderkey
    LIMIT 20
"""


@query("q18_large_orders", oracle=_Q18_SQL)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: HAVING over a join aggregate, then top-k."""
    t = Tables(spark, sf_dir)
    t.view("orders"), t.view("lineitem")
    return spark.sql(_Q18_SQL)
