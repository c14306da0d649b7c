"""Additional TPC-H-shaped queries: conditional aggregation, disjunctive
predicates, promo share, date bucketing."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ror_etl_spark.registry import query
from ror_etl_spark.tables import Tables
from ror_etl_spark.queries.util import r2, r4


@query(
    "q12_priority_by_status",
    oracle="""
    SELECT l_linestatus,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1999-01-01 00:00:00'
    GROUP BY l_linestatus
    ORDER BY l_linestatus
    """,
)
def q12_priority_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: conditional counts over a fact join."""
    t = Tables(spark, sf_dir)
    li = t.lineitem.filter(
        (F.col("l_shipdate") >= F.lit("1998-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1999-01-01 00:00:00").cast("timestamp"))
    ).select("l_orderkey", "l_linestatus")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(t.orders.select("o_orderkey", "o_orderpriority"),
                F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("long").alias("low_count"),
        )
        .orderBy("l_linestatus")
    )


@query(
    "q14_promo_share",
    oracle="""
    SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                                  THEN l_extendedprice * (1 - l_discount)
                                  ELSE 0 END)
                 / sum(l_extendedprice * (1 - l_discount)) + 1e-9, 4) AS promo_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1999-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1999-07-01 00:00:00'
    """,
)
def q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: ratio of conditional to total revenue."""
    t = Tables(spark, sf_dir)
    li = t.lineitem.filter(
        (F.col("l_shipdate") >= F.lit("1999-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1999-07-01 00:00:00").cast("timestamp"))
    ).select("l_partkey", "l_extendedprice", "l_discount")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(t.part.select("p_partkey", "p_type")),
                F.col("l_partkey") == F.col("p_partkey"))
        .agg(F.round(F.lit(100.0) * F.sum(promo) / F.sum(rev) + 1e-9, 4).alias("promo_pct"))
    )


@query(
    "q19_disjunctive_predicates",
    oracle="""
    SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           count(*) AS n
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity >= 1 AND l_quantity <= 25)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 10 AND 30 AND l_quantity >= 10 AND l_quantity <= 35)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 20 AND 50 AND l_quantity >= 20 AND l_quantity <= 45)
    """,
)
def q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs selection across both join sides."""
    t = Tables(spark, sf_dir)
    li = t.lineitem.select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    p = t.part.select("p_partkey", "p_brand", "p_size")
    j = li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
    c1 = (F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(1, 25)
    c2 = (F.col("p_brand") == "Brand#23") & F.col("p_size").between(10, 30) & F.col("l_quantity").between(10, 35)
    c3 = (F.col("p_brand") == "Brand#34") & F.col("p_size").between(20, 50) & F.col("l_quantity").between(20, 45)
    return j.filter(c1 | c2 | c3).agg(
        r2(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "date_bucket_revenue",
    oracle="""
    SELECT strftime(o_orderdate, '%Y-%m') AS ym,
           count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS revenue
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
    GROUP BY ym
    ORDER BY ym
    """,
)
def date_bucket_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly revenue buckets via date formatting."""
    o = Tables(spark, sf_dir).orders
    return (
        o.filter(F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp"))
        .groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("ym"))
        .agg(F.count(F.lit(1)).alias("n_orders"), r2(F.sum("o_totalprice")).alias("revenue"))
        .orderBy("ym")
    )


@query(
    "events_band_self_join",
    oracle="""
    SELECT e1.user_id, count(*) AS n_pairs
    FROM events e1 JOIN events e2
      ON e1.user_id = e2.user_id
     AND e2.event_id <> e1.event_id
     AND e2.ts BETWEEN e1.ts - INTERVAL 5 MINUTE AND e1.ts + INTERVAL 5 MINUTE
    GROUP BY e1.user_id
    ORDER BY e1.user_id
    """,
)
def events_band_self_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Band (interval) self-join: event pairs of the same user within ±5
    minutes. The equi key (user_id) keeps it a hash join with the band as
    a residual filter — no nested-loop blowup; at scale add coarse time
    bucketing to the equi key to tighten the residual."""
    e = Tables(spark, sf_dir).events
    a = e.select("user_id", F.col("event_id").alias("ida"), F.col("ts").alias("tsa"))
    b = e.select(F.col("user_id").alias("ub"), F.col("event_id").alias("idb"), F.col("ts").alias("tsb"))
    five = F.expr("INTERVAL 5 MINUTES")
    j = a.join(
        b,
        (F.col("user_id") == F.col("ub"))
        & (F.col("idb") != F.col("ida"))
        & (F.col("tsb") >= F.col("tsa") - five)
        & (F.col("tsb") <= F.col("tsa") + five),
    )
    return j.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_pairs")).orderBy("user_id")


@query(
    "agg_count_if_any",
    oracle="""
    SELECT event_type,
           CAST(count_if(value > 100) AS BIGINT)      AS n_big,
           bool_or(value > 190)                       AS any_huge,
           bool_and(value >= 0)                       AS all_nonneg,
           round(max_by(value, event_id) + 0, 4)      AS last_value_by_id
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def agg_count_if_any(spark: SparkSession, sf_dir: str) -> DataFrame:
    """count_if / bool_or / bool_and / max_by aggregate battery."""
    e = Tables(spark, sf_dir).events
    return (
        e.groupBy("event_type")
        .agg(
            F.count_if(F.col("value") > 100).alias("n_big"),
            F.bool_or(F.col("value") > 190).alias("any_huge"),
            F.bool_and(F.col("value") >= 0).alias("all_nonneg"),
            r4(F.max_by("value", "event_id")).alias("last_value_by_id"),
        )
        .orderBy("event_type")
    )
