"""Remaining operator surface: string/array aggregation, advanced window
functions, unpivot, set ops with duplicates, null-handling semantics,
typed JSON parsing."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ror_etl_spark.registry import query
from ror_etl_spark.tables import Tables
from ror_etl_spark.queries.util import r2, r6


@query(
    "string_agg_per_group",
    oracle="""
    SELECT n_regionkey,
           string_agg(n_name, ',' ORDER BY n_name) AS nations,
           count(*) AS n
    FROM nation
    GROUP BY n_regionkey
    ORDER BY n_regionkey
    """,
)
def string_agg_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (listagg): collect → sort → join keeps
    the result deterministic regardless of partitioning."""
    n = Tables(spark, sf_dir).nation
    return (
        n.groupBy("n_regionkey")
        .agg(
            F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias("nations"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("n_regionkey")
    )


@query(
    "array_agg_distinct",
    oracle="""
    SELECT c_mktsegment,
           array_to_string(list_sort(list(DISTINCT o_orderstatus)), '|') AS statuses
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)
def array_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-set aggregation rendered as a sorted joined string (arrays
    as output cells normalize differently across engines)."""
    t = Tables(spark, sf_dir)
    j = t.orders.join(
        F.broadcast(t.customer.select("c_custkey", "c_mktsegment")),
        F.col("o_custkey") == F.col("c_custkey"),
    )
    return (
        j.groupBy("c_mktsegment")
        .agg(
            F.array_join(F.array_sort(F.collect_set("o_orderstatus")), "|").alias("statuses")
        )
        .orderBy("c_mktsegment")
    )


@query(
    "window_ntile_percent",
    oracle="""
    SELECT o_orderkey,
           CAST(ntile(4) OVER w AS INT)            AS quartile,
           round(percent_rank() OVER w + 1e-9, 6)  AS pr,
           round(cume_dist() OVER w + 1e-9, 6)     AS cd
    FROM orders
    WHERE o_orderkey <= 1000
    WINDOW w AS (ORDER BY o_totalprice, o_orderkey)
    ORDER BY o_orderkey
    """,
)
def window_ntile_percent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile / percent_rank / cume_dist distribution functions."""
    o = Tables(spark, sf_dir).orders.filter(F.col("o_orderkey") <= 1000)
    w = W.orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w) + 1e-9, 6).alias("pr"),
        F.round(F.cume_dist().over(w) + 1e-9, 6).alias("cd"),
    ).orderBy("o_orderkey")


@query(
    "window_first_last_nth",
    oracle="""
    SELECT o_custkey, o_orderkey,
           round(first_value(o_totalprice) OVER w, 2) AS first_price,
           round(last_value(o_totalprice)  OVER w, 2) AS latest_price,
           round(nth_value(o_totalprice, 2) OVER w, 2) AS second_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    ORDER BY o_custkey, o_orderkey
    """,
)
def window_first_last_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last/nth value over a full-partition frame."""
    o = Tables(spark, sf_dir).orders
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        r2(F.first("o_totalprice").over(w)).alias("first_price"),
        r2(F.last("o_totalprice").over(w)).alias("latest_price"),
        r2(F.nth_value("o_totalprice", 2).over(w)).alias("second_price"),
    ).orderBy("o_custkey", "o_orderkey")


@query(
    "unpivot_status_counts",
    oracle="""
    WITH p AS (
      SELECT c_mktsegment,
             count(*) FILTER (WHERE o_orderstatus = 'O') AS n_open,
             count(*) FILTER (WHERE o_orderstatus = 'F') AS n_filled,
             count(*) FILTER (WHERE o_orderstatus = 'P') AS n_partial
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY c_mktsegment)
    SELECT c_mktsegment, status, n FROM (
      SELECT c_mktsegment, 'O' AS status, n_open    AS n FROM p
      UNION ALL SELECT c_mktsegment, 'F', n_filled  FROM p
      UNION ALL SELECT c_mktsegment, 'P', n_partial FROM p)
    ORDER BY c_mktsegment, status
    """,
)
def unpivot_status_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot then unpivot back via stack() — the wide→long direction."""
    t = Tables(spark, sf_dir)
    j = t.orders.join(
        F.broadcast(t.customer.select("c_custkey", "c_mktsegment")),
        F.col("o_custkey") == F.col("c_custkey"),
    )
    wide = (
        j.groupBy("c_mktsegment")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.count(F.lit(1)))
        .select(
            "c_mktsegment",
            F.coalesce(F.col("O"), F.lit(0)).alias("n_open"),
            F.coalesce(F.col("F"), F.lit(0)).alias("n_filled"),
            F.coalesce(F.col("P"), F.lit(0)).alias("n_partial"),
        )
    )
    return (
        wide.selectExpr(
            "c_mktsegment",
            "stack(3, 'O', n_open, 'F', n_filled, 'P', n_partial) AS (status, n)",
        )
        .orderBy("c_mktsegment", "status")
    )


@query(
    "setop_intersect_all",
    oracle="""
    SELECT custkey FROM (
      (SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 250000)
      INTERSECT ALL
      (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
    ) ORDER BY custkey
    """,
)
def setop_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL — multiplicity-preserving intersection."""
    o = Tables(spark, sf_dir).orders
    a = o.filter(F.col("o_totalprice") > 250000).select(F.col("o_custkey").alias("custkey"))
    b = o.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("custkey"))
    return a.intersectAll(b).orderBy("custkey")


@query(
    "setop_except_all",
    oracle="""
    SELECT custkey FROM (
      (SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 250000)
      EXCEPT ALL
      (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
    ) ORDER BY custkey
    """,
)
def setop_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL — multiplicity-aware difference."""
    o = Tables(spark, sf_dir).orders
    a = o.filter(F.col("o_totalprice") > 250000).select(F.col("o_custkey").alias("custkey"))
    b = o.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("custkey"))
    return a.exceptAll(b).orderBy("custkey")


@query(
    "null_semantics",
    oracle="""
    SELECT c.c_custkey,
           coalesce(agg.n, 0)                      AS n_orders,
           nullif(c.c_mktsegment, 'BUILDING')      AS seg_or_null,
           (agg.n IS NULL)                         AS never_ordered,
           CASE WHEN agg.n IS NULL THEN 'none'
                WHEN agg.n < 5 THEN 'few' ELSE 'many' END AS bucket
    FROM customer c
    LEFT JOIN (SELECT o_custkey, count(*) AS n FROM orders GROUP BY o_custkey) agg
      ON c.c_custkey = agg.o_custkey
    ORDER BY c.c_custkey
    """,
)
def null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-propagation battery: coalesce / nullif / IS NULL / CASE."""
    t = Tables(spark, sf_dir)
    agg = t.orders.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n"))
    j = t.customer.join(agg, F.col("c_custkey") == F.col("o_custkey"), "left")
    return j.select(
        "c_custkey",
        F.coalesce(F.col("n"), F.lit(0)).alias("n_orders"),
        F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")).alias("seg_or_null"),
        F.col("n").isNull().alias("never_ordered"),
        F.when(F.col("n").isNull(), "none")
        .when(F.col("n") < 5, "few")
        .otherwise("many")
        .alias("bucket"),
    ).orderBy("c_custkey")


@query(
    "from_json_typed",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INT) AS k,
           (CAST(json_extract_string(props, '$.k') AS INT) % 10 = 0) AS k_round
    FROM events
    WHERE event_id <= 500
    ORDER BY event_id
    """,
)
def from_json_typed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed JSON parsing: from_json with an explicit struct schema (vs
    the path-extraction variant in json_extract_events)."""
    e = Tables(spark, sf_dir).events.filter(F.col("event_id") <= 500)
    parsed = F.from_json(F.col("props"), T.StructType([T.StructField("k", T.IntegerType())]))
    return e.select(
        "event_id",
        parsed["k"].alias("k"),
        ((parsed["k"] % 10) == 0).alias("k_round"),
    ).orderBy("event_id")


@query(
    "higher_order_exists_forall",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents WHERE doc_id <= 200)
    SELECT doc_id,
           list_has_any(t, ['spark', 'join'])                          AS mentions_engine,
           length(list_filter(t, x -> length(x) > 5)) > 0              AS has_long_token,
           length(list_filter(t, x -> length(x) >= 1)) = length(t)     AS all_nonempty
    FROM toks
    ORDER BY doc_id
    """,
)
def higher_order_exists_forall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order predicates over arrays: exists / forall."""
    d = Tables(spark, sf_dir).documents.filter(F.col("doc_id") <= 200)
    t = F.split(F.col("text"), " ")
    engine_words = F.array(F.lit("spark"), F.lit("join"))
    return d.select(
        "doc_id",
        F.arrays_overlap(t, engine_words).alias("mentions_engine"),
        F.exists(t, lambda x: F.length(x) > 5).alias("has_long_token"),
        F.forall(t, lambda x: F.length(x) >= 1).alias("all_nonempty"),
    ).orderBy("doc_id")


@query(
    "map_functions",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           round(min(value), 4) AS minv,
           round(max(value), 4) AS maxv
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed intermediate processing: build a map per row, explode it
    back — outputs the equivalent flat stats so the oracle stays ANSI."""
    e = Tables(spark, sf_dir).events
    m = e.select(
        F.create_map(
            F.lit("type"), F.col("event_type"), F.lit("val"), F.col("value").cast("string")
        ).alias("kv")
    )
    back = m.select(
        F.col("kv")["type"].alias("event_type"), F.col("kv")["val"].cast("double").alias("value")
    )
    return (
        back.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("value"), 4).alias("minv"),
            F.round(F.max("value"), 4).alias("maxv"),
        )
        .orderBy("event_type")
    )
