"""Aggregation surface: multi-stat aggs, DISTINCT, ROLLUP/CUBE/GROUPING
SETS, pivot, exact percentiles, approximate aggregates.

All of these are single-shuffle partial+final HashAggregates in Spark;
ROLLUP/CUBE expand grouping sets before the shuffle (Expand operator), so
one pass over the fact table serves every grouping combination.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ror_etl_spark.registry import query
from ror_etl_spark.tables import Tables
from ror_etl_spark.queries.util import r2, r4, ravg4


@query(
    "agg_stats",
    oracle="""
    SELECT l_returnflag,
           count(*)                          AS n_rows,
           round(sum(l_quantity), 2)         AS sum_qty,
           round(min(l_extendedprice), 2)    AS min_price,
           round(max(l_extendedprice), 2)    AS max_price,
           round(avg(l_extendedprice) + 1e-9, 4) AS avg_price,
           round(stddev_samp(l_extendedprice), 4) AS sd_price,
           count(DISTINCT l_suppkey)         AS n_suppliers
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide aggregate battery incl. count-distinct (Expand + two-phase agg)."""
    li = Tables(spark, sf_dir).lineitem
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            r2(F.sum("l_quantity")).alias("sum_qty"),
            r2(F.min("l_extendedprice")).alias("min_price"),
            r2(F.max("l_extendedprice")).alias("max_price"),
            ravg4(F.avg("l_extendedprice")).alias("avg_price"),
            r4(F.stddev_samp("l_extendedprice")).alias("sd_price"),
            F.count_distinct(F.col("l_suppkey")).alias("n_suppliers"),
        )
    )


@query(
    "distinct_exact",
    oracle="""
    SELECT DISTINCT l_returnflag, l_linestatus
    FROM lineitem
    ORDER BY l_returnflag, l_linestatus
    """,
)
def distinct_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Tables(spark, sf_dir).lineitem
    return (
        li.select("l_returnflag", "l_linestatus")
        .distinct()
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "rollup_status_priority",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS total
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
)
def rollup_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OLAP ROLLUP (hierarchical subtotals + grand total)."""
    o = Tables(spark, sf_dir).orders
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"), r2(F.sum("o_totalprice")).alias("total"))
        .orderBy(F.col("o_orderstatus").asc_nulls_first(),
                 F.col("o_orderpriority").asc_nulls_first())
    )


@query(
    "cube_status_segment",
    oracle="""
    SELECT o_orderstatus, c_mktsegment,
           count(*) AS n_orders,
           round(avg(o_totalprice) + 1e-9, 4) AS avg_price
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY CUBE (o_orderstatus, c_mktsegment)
    ORDER BY o_orderstatus NULLS FIRST, c_mktsegment NULLS FIRST
    """,
)
def cube_status_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OLAP CUBE over a join result (all 4 grouping combinations, one scan)."""
    t = Tables(spark, sf_dir)
    j = t.orders.join(
        F.broadcast(t.customer.select("c_custkey", "c_mktsegment")),
        F.col("o_custkey") == F.col("c_custkey"),
    )
    return (
        j.cube("o_orderstatus", "c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_orders"), ravg4(F.avg("o_totalprice")).alias("avg_price"))
    )


@query(
    "grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
)
def grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS via Spark SQL (same Expand-based plan)."""
    Tables(spark, sf_dir).view("lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST
        """
    )


@query(
    "pivot_segment_status",
    oracle="""
    SELECT c_mktsegment,
           count(*) FILTER (WHERE o_orderstatus = 'O') AS n_open,
           count(*) FILTER (WHERE o_orderstatus = 'F') AS n_filled,
           count(*) FILTER (WHERE o_orderstatus = 'P') AS n_partial
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)
def pivot_segment_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot orders-per-status into columns per market segment.

    Uses ``groupBy().pivot(values=...)`` — supplying the pivot values
    up-front avoids the extra distinct-values job at scale.
    """
    t = Tables(spark, sf_dir)
    j = t.orders.join(
        F.broadcast(t.customer.select("c_custkey", "c_mktsegment")),
        F.col("o_custkey") == F.col("c_custkey"),
    )
    p = (
        j.groupBy("c_mktsegment")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.count(F.lit(1)))
    )
    return (
        p.select(
            "c_mktsegment",
            F.coalesce(F.col("O"), F.lit(0)).alias("n_open"),
            F.coalesce(F.col("F"), F.lit(0)).alias("n_filled"),
            F.coalesce(F.col("P"), F.lit(0)).alias("n_partial"),
        )
        .orderBy("c_mktsegment")
    )


@query(
    "percentile_exact",
    oracle="""
    SELECT event_type,
           round(quantile_cont(value, 0.5), 4)  AS p50,
           round(quantile_cont(value, 0.95), 4) AS p95,
           round(quantile_cont(value, 0.99), 4) AS p99
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def percentile_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (Spark ``percentile`` == DuckDB
    ``quantile_cont``). The approximate scale path is
    ``approx_distinct_quantiles`` (KMV + bottom-k sample, also
    oracle-checked since r4)."""
    e = Tables(spark, sf_dir).events
    # one percentile aggregate with an array of percentages: three
    # separate exact-percentile expressions each buffer the whole group,
    # so the array form carries a third of the per-group state at scale
    return (
        e.groupBy("event_type")
        .agg(F.expr("percentile(value, array(0.5, 0.95, 0.99))").alias("ps"))
        .select(
            "event_type",
            r4(F.col("ps")[0]).alias("p50"),
            r4(F.col("ps")[1]).alias("p95"),
            r4(F.col("ps")[2]).alias("p99"),
        )
        .orderBy("event_type")
    )


_ADQ_KU = 2048  # KMV sketch size for per-group distinct users
_ADQ_KS = 4096  # bottom-k row-sample size for the quantile estimate
_ADQ_SCALE = float(1 << 52)

_UH52 = "('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 13))::BIGINT"
_EH52 = "('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 13))::BIGINT"


@query(
    "approx_distinct_quantiles",
    oracle=f"""
    WITH uh AS (
      SELECT event_type, h, row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
      FROM (SELECT DISTINCT event_type, {_UH52} / {_ADQ_SCALE!r} AS h FROM events)),
    users AS (
      SELECT event_type,
             CASE WHEN count(*) < {_ADQ_KU} THEN CAST(count(*) AS DOUBLE)
                  ELSE round({_ADQ_KU - 1} / max(h), 4) END AS approx_users
      FROM uh WHERE rn <= {_ADQ_KU} GROUP BY event_type),
    sample AS (
      SELECT event_type, value,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY {_EH52}, event_id) AS rn
      FROM events),
    p50 AS (
      SELECT event_type, round(quantile_cont(value, 0.5), 4) AS approx_p50
      FROM sample WHERE rn <= {_ADQ_KS} GROUP BY event_type)
    SELECT users.event_type, approx_users, approx_p50
    FROM users JOIN p50 USING (event_type)
    ORDER BY event_type
    """,
    priority=3,
)
def approx_distinct_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate per-group aggregates on DETERMINISTIC sketches, so the
    scale path stays hash-checkable: distinct users via a KMV bottom-k
    sketch of md5-hashed ids (estimate (k-1)/h_k, exact below k), and the
    median via exact percentile over a bottom-k-by-hash row sample (a
    uniform deterministic sample — rank error ~1/sqrt(k)). The
    engine-internal twins (HLL++ ``approx_count_distinct``,
    ``percentile_approx``) produce engine-specific estimates no oracle
    can replay; they remain pytest-bounded via this query's error test,
    which asserts both estimators against exact answers. At 100 TB both
    sketches shuffle only (group, hash) pairs capped at k per group."""
    e = Tables(spark, sf_dir).events
    from pyspark.sql import Window

    uh = (
        e.select(
            "event_type",
            (
                F.conv(
                    F.substring(F.md5(F.col("user_id").cast("string")), 1, 13), 16, 10
                ).cast("long")
                / F.lit(_ADQ_SCALE)
            ).alias("h"),
        )
        .distinct()
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("event_type").orderBy("h")
            ),
        )
        .filter(F.col("rn") <= _ADQ_KU)
    )
    users = uh.groupBy("event_type").agg(
        F.when(F.count(F.lit(1)) < _ADQ_KU, F.count(F.lit(1)).cast("double"))
        .otherwise(F.round(F.lit(float(_ADQ_KU - 1)) / F.max("h"), 4))
        .alias("approx_users")
    )
    eh = F.conv(
        F.substring(F.md5(F.col("event_id").cast("string")), 1, 13), 16, 10
    ).cast("long")
    sample = (
        e.select("event_type", "value", "event_id", eh.alias("h"))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("event_type").orderBy("h", "event_id")
            ),
        )
        .filter(F.col("rn") <= _ADQ_KS)
    )
    p50 = sample.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 4).alias("approx_p50")
    )
    return users.join(p50, "event_type").orderBy("event_type")


@query(
    "check_id_unique",
    oracle="""
    SELECT (count(DISTINCT o_orderkey) = count(o_orderkey)) AS ids_unique,
           count(*) AS n_rows
    FROM orders
    """,
)
def check_id_unique(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality check Q1 of the reference (ror_dag.py:179-183):
    id uniqueness as a single boolean row."""
    o = Tables(spark, sf_dir).orders
    return o.agg(
        (F.count_distinct(F.col("o_orderkey")) == F.count("o_orderkey")).alias("ids_unique"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@query(
    "histogram_width_bucket",
    oracle="""
    SELECT event_type,
           least(greatest(CAST(floor(value / 1000.0 * 20) AS BIGINT) + 1, 0), 21) AS bucket,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(value), 4) AS total
    FROM events
    GROUP BY event_type, bucket
    ORDER BY event_type, bucket
    """,
)
def histogram_width_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of event values per type via width_bucket
    (20 buckets over [0, 1000), bucket 0/21 = out-of-range sentinels) —
    the single-pass distributed histogram; DuckDB lacks width_bucket so
    the oracle replays the bucket formula with floor arithmetic."""
    e = Tables(spark, sf_dir).events
    return (
        e.select(
            "event_type",
            F.width_bucket(F.col("value"), F.lit(0.0), F.lit(1000.0), F.lit(20)).alias(
                "bucket"
            ),
            "value",
        )
        .groupBy("event_type", "bucket")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("total"))
        .orderBy("event_type", "bucket")
    )


@query(
    "decimal_exact_totals",
    oracle="""
    SELECT l_returnflag,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS exact_total,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))
                    * CAST(1 - l_discount AS DECIMAL(18,4))) AS DOUBLE) AS exact_disc,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def decimal_exact_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact money arithmetic: revenue totals aggregated in DECIMAL(18,4)
    (no float drift — the sum is exact and associative, so partial/final
    aggregation order can't change the answer, unlike double sums whose
    result depends on partitioning). Cast to DOUBLE only at output; both
    engines agree bit-for-bit because the internal arithmetic is exact."""
    li = Tables(spark, sf_dir).lineitem
    price = F.col("l_extendedprice").cast("decimal(18,4)")
    disc = (F.lit(1) - F.col("l_discount")).cast("decimal(18,4)")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.sum(price).cast("double").alias("exact_total"),
            F.sum(price * disc).cast("double").alias("exact_disc"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "agg_linear_regression",
    oracle="""
    SELECT l_returnflag,
           round(regr_slope(l_extendedprice, l_quantity) + 1e-9, 4)     AS slope,
           round(regr_intercept(l_extendedprice, l_quantity) + 1e-9, 4) AS intercept,
           round(regr_r2(l_extendedprice, l_quantity) + 1e-9, 6)        AS r2,
           CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT)      AS n
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def agg_linear_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-database least squares (regr_* aggregate family): price ~
    quantity per return flag. One distributed pass accumulating the five
    sufficient moments — the way a 100 TB feature pipeline fits per-group
    trend lines without collecting anything."""
    li = Tables(spark, sf_dir).lineitem
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.expr("regr_slope(l_extendedprice, l_quantity)") + 1e-9, 4).alias("slope"),
            F.round(F.expr("regr_intercept(l_extendedprice, l_quantity)") + 1e-9, 4).alias("intercept"),
            F.round(F.expr("regr_r2(l_extendedprice, l_quantity)") + 1e-9, 6).alias("r2"),
            F.expr("regr_count(l_extendedprice, l_quantity)").cast("long").alias("n"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "agg_string_concat_sorted",
    oracle="""
    SELECT n_regionkey,
           string_agg(n_name, ',' ORDER BY n_name) AS nations,
           CAST(count(*) AS BIGINT) AS n
    FROM nation
    GROUP BY n_regionkey
    ORDER BY n_regionkey
    """,
)
def agg_string_concat_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (LISTAGG/string_agg): collect_list is
    non-deterministic under parallel merge, so the portable form sorts
    the collected array before joining — same answer on any partitioning,
    which is what makes it hash-checkable at all."""
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
    "correlation_matrix_lineitem",
    oracle="""
    WITH m AS (
      SELECT corr(l_quantity, l_extendedprice) AS c_qty_price,
             corr(l_quantity, l_discount)      AS c_qty_disc,
             corr(l_quantity, l_tax)           AS c_qty_tax,
             corr(l_extendedprice, l_discount) AS c_price_disc,
             corr(l_extendedprice, l_tax)      AS c_price_tax,
             corr(l_discount, l_tax)           AS c_disc_tax
      FROM lineitem)
    SELECT 'l_quantity' AS col_a, 'l_extendedprice' AS col_b,
           round(c_qty_price + 1e-9, 6) AS corr FROM m
    UNION ALL SELECT 'l_quantity', 'l_discount', round(c_qty_disc + 1e-9, 6) FROM m
    UNION ALL SELECT 'l_quantity', 'l_tax', round(c_qty_tax + 1e-9, 6) FROM m
    UNION ALL SELECT 'l_extendedprice', 'l_discount', round(c_price_disc + 1e-9, 6) FROM m
    UNION ALL SELECT 'l_extendedprice', 'l_tax', round(c_price_tax + 1e-9, 6) FROM m
    UNION ALL SELECT 'l_discount', 'l_tax', round(c_disc_tax + 1e-9, 6) FROM m
    ORDER BY col_a, col_b
    """,
    priority=3,
)
def correlation_matrix_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation matrix of the four lineitem numeric
    columns in ONE aggregation pass — the feature-engineering profiling
    step before model training.

    All six corr() aggregates accumulate their moments in the same
    map-side partial pass over one scan (Catalyst collapses them into a
    single HashAggregate), so the cost at 100 TB is one table scan and
    one single-row reduce, not six. The six scalars are then unpivoted
    into tidy (col_a, col_b, corr) rows driver-side-free via a literal
    stack."""
    li = Tables(spark, sf_dir).lineitem
    m = li.agg(
        *[
            F.corr(a, b).alias(f"c{i}")
            for i, (a, b) in enumerate(_CORR_PAIRS)
        ]
    )
    stacked = m.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(a).alias("col_a"),
                        F.lit(b).alias("col_b"),
                        F.round(F.col(f"c{i}") + 1e-9, 6).alias("corr"),
                    )
                    for i, (a, b) in enumerate(_CORR_PAIRS)
                ]
            )
        ).alias("r")
    ).select("r.col_a", "r.col_b", "r.corr")
    return stacked.orderBy("col_a", "col_b")


_CORR_PAIRS = [
    ("l_quantity", "l_extendedprice"),
    ("l_quantity", "l_discount"),
    ("l_quantity", "l_tax"),
    ("l_extendedprice", "l_discount"),
    ("l_extendedprice", "l_tax"),
    ("l_discount", "l_tax"),
]
