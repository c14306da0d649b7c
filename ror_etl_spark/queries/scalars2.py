"""Second scalar/aggregate battery: median, bitwise ops, trigonometry,
vector normalization via higher-order functions, LIMIT/OFFSET pagination."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ror_etl_spark.registry import query
from ror_etl_spark.tables import Tables
from ror_etl_spark.queries.util import epoch_us, r2, r6


@query(
    "agg_median",
    oracle="""
    SELECT event_type,
           round(median(value), 4) AS med,
           round(min(value), 4) AS mn,
           round(max(value), 4) AS mx
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def agg_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact median (interpolated for even counts in both engines)."""
    e = Tables(spark, sf_dir).events
    return (
        e.groupBy("event_type")
        .agg(
            F.round(F.median("value"), 4).alias("med"),
            F.round(F.min("value"), 4).alias("mn"),
            F.round(F.max("value"), 4).alias("mx"),
        )
        .orderBy("event_type")
    )


@query(
    "scalar_bitwise",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderkey & 255 AS BIGINT)  AS k_and,
           CAST(o_orderkey | 4096 AS BIGINT) AS k_or,
           CAST(xor(o_orderkey, 85) AS BIGINT) AS k_xor,
           CAST(o_orderkey << 2 AS BIGINT)   AS k_shl,
           CAST(o_orderkey >> 3 AS BIGINT)   AS k_shr,
           CAST(bit_count(o_orderkey) AS INT) AS k_bits
    FROM orders
    WHERE o_orderkey <= 300
    ORDER BY o_orderkey
    """,
)
def scalar_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise expression battery."""
    o = Tables(spark, sf_dir).orders.filter(F.col("o_orderkey") <= 300)
    k = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        k.bitwiseAND(F.lit(255)).alias("k_and"),
        k.bitwiseOR(F.lit(4096)).alias("k_or"),
        k.bitwiseXOR(F.lit(85)).alias("k_xor"),
        F.shiftleft(k, 2).cast("long").alias("k_shl"),
        F.shiftright(k, 3).cast("long").alias("k_shr"),
        F.bit_count(k).alias("k_bits"),
    ).orderBy("o_orderkey")


@query(
    "scalar_trig",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(sin(l_discount * pi()), 6)              AS s,
           round(cos(l_discount * pi()), 6)              AS c,
           round(atan2(l_discount, 0.05) + 1e-9, 6)      AS a2,
           round(degrees(l_discount), 6)                 AS deg,
           round(exp(l_discount), 6)                     AS e
    FROM lineitem
    WHERE l_orderkey <= 50
    ORDER BY l_orderkey, l_linenumber
    """,
)
def scalar_trig(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trigonometric/exponential scalars (libm differences vanish at 6 dp
    for O(1) magnitudes)."""
    li = Tables(spark, sf_dir).lineitem.filter(F.col("l_orderkey") <= 50)
    d = F.col("l_discount")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        r6(F.sin(d * F.lit(3.141592653589793))).alias("s"),
        r6(F.cos(d * F.lit(3.141592653589793))).alias("c"),
        F.round(F.atan2(d, F.lit(0.05)) + 1e-9, 6).alias("a2"),
        r6(F.degrees(d)).alias("deg"),
        r6(F.exp(d)).alias("e"),
    ).orderBy("l_orderkey", "l_linenumber")


@query(
    "vector_normalize_head",
    oracle="""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
               FROM embeddings WHERE vec_id <= 50)
    SELECT vec_id,
           round(v[1] / sqrt(list_dot_product(v, v)), 6) AS n0,
           round(v[2] / sqrt(list_dot_product(v, v)), 6) AS n1,
           CAST(array_length(v) AS INT) AS dim
    FROM e
    ORDER BY vec_id
    """,
)
def vector_normalize_head(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2-normalize embeddings via transform + aggregate; emit the first
    two normalized components (full arrays don't compare portably)."""
    emb = Tables(spark, sf_dir).embeddings.filter(F.col("vec_id") <= 50)
    v = F.col("embedding").cast("array<double>")
    norm = F.sqrt(
        F.aggregate(F.zip_with(v, v, lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x)
    )
    unit = F.transform(v, lambda x: x / norm)
    return emb.select(
        "vec_id",
        r6(F.element_at(unit, 1)).alias("n0"),
        r6(F.element_at(unit, 2)).alias("n1"),
        F.size(v).alias("dim"),
    ).orderBy("vec_id")


@query(
    "sort_limit_offset",
    oracle="""
    SELECT o_orderkey, round(o_totalprice, 2) AS price
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10 OFFSET 20
    """,
)
def sort_limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pagination: ORDER BY ... LIMIT with OFFSET."""
    o = Tables(spark, sf_dir).orders
    return (
        o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .offset(20)
        .limit(10)
        .select("o_orderkey", r2(F.col("o_totalprice")).alias("price"))
    )


@query(
    "window_range_frame",
    oracle="""
    SELECT user_id, event_id,
           count(*) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
                          RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS n_last_hour,
           round(sum(value) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
                          RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW), 4) AS v_last_hour
    FROM events
    ORDER BY user_id, event_id
    """,
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-range window frame: per-user trailing-hour count/sum keyed on
    the microsecond timestamp (RANGE, not ROWS — rows at equal offsets
    share frames)."""
    from pyspark.sql import Window as W

    e = Tables(spark, sf_dir).events
    w = (
        W.partitionBy("user_id")
        .orderBy(epoch_us("ts"))
        .rangeBetween(-3_600_000_000, 0)
    )
    return e.select(
        "user_id",
        "event_id",
        F.count(F.lit(1)).over(w).alias("n_last_hour"),
        F.round(F.sum("value").over(w), 4).alias("v_last_hour"),
    ).orderBy("user_id", "event_id")


@query(
    "agg_corr_covar",
    oracle="""
    SELECT l_returnflag,
           round(corr(l_quantity, l_extendedprice) + 1e-9, 6)       AS corr_qp,
           round(covar_samp(l_quantity, l_extendedprice) + 1e-9, 4) AS cov_qp,
           round(var_samp(l_quantity) + 1e-9, 4)                    AS var_q,
           round(var_pop(l_discount) + 1e-9, 6)                     AS varp_d
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def agg_corr_covar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bivariate statistics: correlation, covariance, variance."""
    li = Tables(spark, sf_dir).lineitem
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.corr("l_quantity", "l_extendedprice") + 1e-9, 6).alias("corr_qp"),
            F.round(F.covar_samp("l_quantity", "l_extendedprice") + 1e-9, 4).alias("cov_qp"),
            F.round(F.var_samp("l_quantity") + 1e-9, 4).alias("var_q"),
            F.round(F.var_pop("l_discount") + 1e-9, 6).alias("varp_d"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "pandas_udaf_weighted_avg",
    oracle="""
    SELECT l_returnflag,
           round(sum(l_extendedprice * l_quantity) / sum(l_quantity) + 1e-9, 4) AS wavg_price
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def pandas_udaf_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate pandas UDF (Arrow-batched UDAF) computing a
    quantity-weighted price — oracle-checked against the pure-SQL
    formulation. Demonstrates the UDAF surface; the native twin is what
    the hot path would use."""
    from ror_etl_spark.functions.udfs import weighted_mean

    li = Tables(spark, sf_dir).lineitem
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(weighted_mean("l_extendedprice", "l_quantity") + 1e-9, 4).alias(
                "wavg_price"
            )
        )
        .orderBy("l_returnflag")
    )


@query(
    "collation_insensitive_match",
    oracle="""
    SELECT n_nationkey, n_name FROM nation
    WHERE lower(n_name) = 'nation_7' ORDER BY n_nationkey
    """,
)
def collation_insensitive_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collation-aware comparison (Spark 4 COLLATE): UTF8_LCASE equality
    matches case-insensitively without rewriting both sides through
    lower() — the collation is part of the comparison operator, so it
    stays sargable for pushdown/pruning paths that understand it. Oracle
    models the semantics with lower()."""
    n = Tables(spark, sf_dir).nation
    return (
        n.filter(F.expr("n_name = 'nation_7' COLLATE UTF8_LCASE"))
        .select("n_nationkey", "n_name")
        .orderBy("n_nationkey")
    )
