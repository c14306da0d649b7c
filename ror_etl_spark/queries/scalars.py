"""Scalar function surface: string, date/time, math, conditional, array,
and JSON functions — all JVM-side ``pyspark.sql.functions`` (whole-stage
codegen; no Python in the hot path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ror_etl_spark.registry import query
from ror_etl_spark.tables import Tables
from ror_etl_spark.queries.util import r4, ravg4


@query(
    "scalar_string_funcs",
    oracle="""
    SELECT c_custkey,
           upper(c_name)                              AS name_upper,
           lower(c_mktsegment)                        AS seg_lower,
           CAST(length(c_name) AS INT)                AS name_len,
           substr(c_name, 1, 8)                       AS name_prefix,
           concat(c_mktsegment, '#', c_name)          AS tagged,
           replace(c_name, 'Customer', 'Cust')        AS name_short,
           contains(c_name, '1')                      AS has_one,
           lpad(CAST(c_custkey AS VARCHAR), 8, '0')   AS key_padded
    FROM customer
    WHERE c_custkey <= 200
    ORDER BY c_custkey
    """,
)
def scalar_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Tables(spark, sf_dir).customer.filter(F.col("c_custkey") <= 200)
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.lower("c_mktsegment").alias("seg_lower"),
        F.length("c_name").alias("name_len"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.concat_ws("#", "c_mktsegment", "c_name").alias("tagged"),
        F.replace(F.col("c_name"), F.lit("Customer"), F.lit("Cust")).alias("name_short"),
        F.contains(F.col("c_name"), F.lit("1")).alias("has_one"),
        F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("key_padded"),
    ).orderBy("c_custkey")


@query(
    "scalar_regexp_funcs",
    oracle="""
    SELECT c_custkey,
           regexp_extract(c_name, '([0-9]+)', 1)              AS name_num,
           regexp_matches(c_name, '^Customer_[0-9]+$')        AS name_wellformed,
           regexp_replace(c_name, '[0-9]', 'x', 'g')          AS name_masked
    FROM customer
    WHERE c_custkey <= 200
    ORDER BY c_custkey
    """,
)
def scalar_regexp_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Tables(spark, sf_dir).customer.filter(F.col("c_custkey") <= 200)
    return c.select(
        "c_custkey",
        F.regexp_extract("c_name", r"([0-9]+)", 1).alias("name_num"),
        F.col("c_name").rlike(r"^Customer_[0-9]+$").alias("name_wellformed"),
        F.regexp_replace("c_name", r"[0-9]", "x").alias("name_masked"),
    ).orderBy("c_custkey")


@query(
    "scalar_date_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT)                    AS o_year,
           CAST(month(o_orderdate) AS INT)                   AS o_month,
           CAST(dayofmonth(o_orderdate) AS INT)              AS o_day,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
           strftime(o_orderdate, '%Y-%m-%d')                 AS o_date,
           CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS INT) AS days_to_2002
    FROM orders
    WHERE o_orderkey <= 300
    ORDER BY o_orderkey
    """,
)
def scalar_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Tables(spark, sf_dir).orders.filter(F.col("o_orderkey") <= 300)
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("o_year"),
        F.month("o_orderdate").alias("o_month"),
        F.dayofmonth("o_orderdate").alias("o_day"),
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias("month_start"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_date"),
        F.datediff(F.lit("2002-01-01").cast("date"), F.col("o_orderdate").cast("date")).alias(
            "days_to_2002"
        ),
    ).orderBy("o_orderkey")


@query(
    "scalar_math_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(abs(l_extendedprice - 30000), 2)      AS dev,
           CAST(ceil(l_quantity) AS BIGINT)            AS qty_ceil,
           CAST(floor(l_extendedprice / 1000) AS BIGINT) AS price_k,
           round(sqrt(l_extendedprice), 4)             AS price_sqrt,
           round(ln(l_extendedprice + 1), 6)           AS price_ln,
           round(pow(1 + l_discount, 2), 6)            AS disc_sq,
           CAST(l_orderkey % 7 AS BIGINT)              AS key_mod
    FROM lineitem
    WHERE l_orderkey <= 100
    ORDER BY l_orderkey, l_linenumber
    """,
)
def scalar_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Tables(spark, sf_dir).lineitem.filter(F.col("l_orderkey") <= 100)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.abs(F.col("l_extendedprice") - 30000), 2).alias("dev"),
        F.ceil("l_quantity").alias("qty_ceil"),
        F.floor(F.col("l_extendedprice") / 1000).alias("price_k"),
        F.round(F.sqrt("l_extendedprice"), 4).alias("price_sqrt"),
        F.round(F.log(F.col("l_extendedprice") + 1), 6).alias("price_ln"),
        F.round(F.pow(F.lit(1) + F.col("l_discount"), 2), 6).alias("disc_sq"),
        (F.col("l_orderkey") % 7).alias("key_mod"),
    ).orderBy("l_orderkey", "l_linenumber")


@query(
    "scalar_case_when",
    oracle="""
    SELECT CASE WHEN o_totalprice < 50000  THEN 'small'
                WHEN o_totalprice < 200000 THEN 'medium'
                ELSE 'large' END AS bucket,
           o_orderstatus,
           count(*) AS n,
           round(sum(o_totalprice), 2) AS total
    FROM orders
    GROUP BY bucket, o_orderstatus
    ORDER BY bucket, o_orderstatus
    """,
)
def scalar_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Tables(spark, sf_dir).orders
    bucket = (
        F.when(F.col("o_totalprice") < 50000, "small")
        .when(F.col("o_totalprice") < 200000, "medium")
        .otherwise("large")
    )
    return (
        o.select(bucket.alias("bucket"), "o_orderstatus", "o_totalprice")
        .groupBy("bucket", "o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("o_totalprice"), 2).alias("total"))
        .orderBy("bucket", "o_orderstatus")
    )


@query(
    "scalar_array_funcs",
    oracle="""
    SELECT doc_id,
           CAST(array_length(string_split(text, ' ')) AS INT)                AS n_tokens,
           list_extract(string_split(text, ' '), 1)                          AS first_token,
           CAST(array_length(list_distinct(string_split(text, ' '))) AS INT) AS n_unique_tokens,
           array_to_string(list_sort(list_distinct(string_split(substr(text, 1, 40), ' '))), ',') AS head_sorted
    FROM documents
    WHERE doc_id <= 100
    ORDER BY doc_id
    """,
)
def scalar_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array functions over tokenized text: size, indexing, distinct, sort,
    join — the building blocks the dedup/text operators reuse."""
    d = Tables(spark, sf_dir).documents.filter(F.col("doc_id") <= 100)
    toks = F.split(F.col("text"), " ")
    head_toks = F.split(F.substring(F.col("text"), 1, 40), " ")
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.element_at(toks, 1).alias("first_token"),
        F.size(F.array_distinct(toks)).alias("n_unique_tokens"),
        F.array_join(F.array_sort(F.array_distinct(head_toks)), ",").alias("head_sorted"),
    ).orderBy("doc_id")


@query(
    "json_extract_events",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)) + 1e-9, 4) AS avg_k,
           max(CAST(json_extract_string(props, '$.k') AS BIGINT))           AS max_k
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def json_extract_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON scalar extraction from the events.props string column."""
    e = Tables(spark, sf_dir).events
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            ravg4(F.avg("k")).alias("avg_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )
