"""Final operator-surface batch: cross join, row-wise extrema, struct
construction/access, array slicing, union-by-name with missing columns."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ror_etl_spark.registry import query
from ror_etl_spark.tables import Tables
from ror_etl_spark.queries.util import r2


@query(
    "cross_join_small",
    oracle="""
    SELECT r_name, n_name
    FROM region CROSS JOIN nation
    ORDER BY r_name, n_name
    """,
)
def cross_join_small(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit cartesian product of two small dimensions."""
    t = Tables(spark, sf_dir)
    return (
        t.region.select("r_name").crossJoin(t.nation.select("n_name"))
        .orderBy("r_name", "n_name")
    )


@query(
    "scalar_greatest_least",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(greatest(l_quantity, l_discount * 100, l_tax * 100), 4) AS g,
           round(least(l_quantity, l_extendedprice / 1000), 6)           AS l,
           round(greatest(l_quantity - 25, 0), 4)                        AS over25
    FROM lineitem
    WHERE l_orderkey <= 200
    ORDER BY l_orderkey, l_linenumber
    """,
)
def scalar_greatest_least(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-wise extrema across expressions."""
    li = Tables(spark, sf_dir).lineitem.filter(F.col("l_orderkey") <= 200)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(
            F.greatest(F.col("l_quantity"), F.col("l_discount") * 100, F.col("l_tax") * 100), 4
        ).alias("g"),
        # 6 dp: 2-decimal prices / 1000 give exact 5-decimal values that sit
        # ON the 4-dp rounding boundary; 6 dp keeps every digit
        F.round(F.least(F.col("l_quantity"), F.col("l_extendedprice") / 1000), 6).alias("l"),
        F.round(F.greatest(F.col("l_quantity") - 25, F.lit(0.0)), 4).alias("over25"),
    ).orderBy("l_orderkey", "l_linenumber")


@query(
    "struct_build_access",
    oracle="""
    SELECT o_orderkey,
           struct_extract(s, 'status') AS status,
           round(struct_extract(s, 'price'), 2) AS price
    FROM (
      SELECT o_orderkey,
             {'status': o_orderstatus, 'price': o_totalprice} AS s
      FROM orders WHERE o_orderkey <= 200)
    ORDER BY o_orderkey
    """,
)
def struct_build_access(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct construction and field access (flat outputs for portability)."""
    o = Tables(spark, sf_dir).orders.filter(F.col("o_orderkey") <= 200)
    s = F.struct(
        F.col("o_orderstatus").alias("status"), F.col("o_totalprice").alias("price")
    )
    return (
        o.select("o_orderkey", s.alias("s"))
        .select(
            "o_orderkey",
            F.col("s.status").alias("status"),
            r2(F.col("s.price")).alias("price"),
        )
        .orderBy("o_orderkey")
    )


@query(
    "array_slice_ops",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
               FROM documents WHERE doc_id <= 100)
    SELECT doc_id,
           array_to_string(list_slice(toks, 2, 4), '-')   AS mid,
           array_to_string(list_reverse(list_slice(toks, 1, 3)), '-') AS rev_head,
           list_extract(toks, array_length(toks))          AS last_tok,
           CAST(array_length(list_concat(toks, toks)) AS INT) AS doubled_len
    FROM t
    ORDER BY doc_id
    """,
)
def array_slice_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array slice / reverse / tail indexing / concat."""
    d = Tables(spark, sf_dir).documents.filter(F.col("doc_id") <= 100)
    toks = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.array_join(F.slice(toks, 2, 3), "-").alias("mid"),
        F.array_join(F.reverse(F.slice(toks, 1, 3)), "-").alias("rev_head"),
        F.element_at(toks, -1).alias("last_tok"),
        F.size(F.concat(toks, toks)).alias("doubled_len"),
    ).orderBy("doc_id")


@query(
    "union_by_name_missing",
    oracle="""
    SELECT src, custkey, acctbal FROM (
      SELECT 'cust' AS src, c_custkey AS custkey, round(c_acctbal, 2) AS acctbal
      FROM customer WHERE c_custkey <= 50
      UNION ALL
      SELECT 'supp' AS src, s_suppkey AS custkey, NULL AS acctbal
      FROM supplier)
    ORDER BY src, custkey
    """,
)
def union_by_name_missing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unionByName with allowMissingColumns: the narrower side null-pads."""
    t = Tables(spark, sf_dir)
    cust = (
        t.customer.filter(F.col("c_custkey") <= 50)
        .select(
            F.lit("cust").alias("src"),
            F.col("c_custkey").alias("custkey"),
            r2(F.col("c_acctbal")).alias("acctbal"),
        )
    )
    supp = t.supplier.select(
        F.lit("supp").alias("src"), F.col("s_suppkey").alias("custkey")
    )
    return cust.unionByName(supp, allowMissingColumns=True).orderBy("src", "custkey")


@query(
    "join_null_safe",
    oracle="""
    SELECT a.nk AS k_nation, count(*) AS n_pairs
    FROM (SELECT nullif(c_nationkey, 5) AS nk FROM customer) a
    JOIN (SELECT nullif(s_nationkey, 5) AS nk FROM supplier) b
      ON a.nk IS NOT DISTINCT FROM b.nk
    GROUP BY a.nk
    ORDER BY k_nation NULLS FIRST
    """,
)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi join (<=> / IS NOT DISTINCT FROM): NULL keys match
    each other instead of dropping out."""
    t = Tables(spark, sf_dir)
    a = t.customer.select(F.nullif(F.col("c_nationkey"), F.lit(5)).alias("a_nk"))
    b = t.supplier.select(F.nullif(F.col("s_nationkey"), F.lit(5)).alias("b_nk"))
    return (
        a.join(b, a["a_nk"].eqNullSafe(b["b_nk"]))
        .groupBy(F.col("a_nk").alias("k_nation"))
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .orderBy(F.col("k_nation").asc_nulls_first())
    )
