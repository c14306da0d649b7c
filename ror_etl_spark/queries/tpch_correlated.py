"""TPC-H shapes with correlated aggregates and multi-condition anti joins
— the queries that exercise Catalyst's decorrelation machinery."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ror_etl_spark.registry import query
from ror_etl_spark.tables import Tables


_Q7_SQL = """
    SELECT supp_nation, cust_nation, l_year,
           round(sum(volume), 2) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation,
             n2.n_name AS cust_nation,
             CAST(year(l_shipdate) AS INT) AS l_year,
             l_extendedprice * (1 - l_discount) AS volume
      FROM supplier
        JOIN lineitem ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    )
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
"""


@query("q7_nation_volume", oracle=_Q7_SQL)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bidirectional nation-pair trade volume by year.
    Same-table double role (nation n1/n2) + disjunctive pair filter."""
    t = Tables(spark, sf_dir)
    for name in ("supplier", "lineitem", "orders", "customer", "nation"):
        t.view(name)
    return spark.sql(_Q7_SQL)


_Q17_SQL = """
    SELECT round(sum(l_extendedprice) / 7.0 + 1e-9, 4) AS avg_yearly
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_brand = 'Brand#3'
      AND l.l_quantity < (
        SELECT 0.5 * avg(l2.l_quantity) FROM lineitem l2
        WHERE l2.l_partkey = l.l_partkey)
"""


@query("q17_small_quantity", oracle=_Q17_SQL)
def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated scalar aggregate subquery (per-part
    average), decorrelated by Catalyst into an aggregate + join."""
    t = Tables(spark, sf_dir)
    t.view("lineitem"), t.view("part")
    return spark.sql(_Q17_SQL)


_Q22_SQL = """
    SELECT cntrycode,
           count(*) AS numcust,
           round(sum(c_acctbal), 2) AS totacctbal
    FROM (
      SELECT substr(c_name, 10, 1) AS cntrycode, c_acctbal
      FROM customer c
      WHERE c_acctbal > (
          SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
        AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    )
    GROUP BY cntrycode
    ORDER BY cntrycode
"""


@query("q22_global_sales_opportunity", oracle=_Q22_SQL)
def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar subquery + correlated NOT EXISTS (anti
    join) + substring bucketing."""
    t = Tables(spark, sf_dir)
    t.view("customer"), t.view("orders")
    return spark.sql(_Q22_SQL)


_Q2_SQL = """
    SELECT s.s_suppkey, s.s_name, p.p_partkey, round(p.p_retailprice, 2) AS price
    FROM part p JOIN supplier s ON p.p_partkey % 10 = s.s_suppkey
    WHERE p.p_retailprice = (
      SELECT min(p2.p_retailprice) FROM part p2
      WHERE p2.p_type = p.p_type)
    ORDER BY s.s_suppkey, p.p_partkey
"""


@query("q2_min_cost_supplier", oracle=_Q2_SQL)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: correlated min over a peer group selects the
    cheapest part per type (synthetic supplier link via key mod)."""
    t = Tables(spark, sf_dir)
    t.view("part"), t.view("supplier")
    return spark.sql(_Q2_SQL)
