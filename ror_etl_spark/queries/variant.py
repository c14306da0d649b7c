"""Semi-structured data via Spark 4's VARIANT type.

``parse_json`` produces a binary-encoded VARIANT (shredded, typed) —
unlike ``get_json_object`` (string re-parse per access), a VARIANT
column parses once and supports typed path extraction
(``variant_get``), which is the 100 TB path for JSON-heavy event
payloads: parse at ingest, store VARIANT in parquet, push typed
extraction into codegen. The DuckDB oracle reads the same JSON with its
native json functions — the values must agree exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ror_etl_spark.registry import query
from ror_etl_spark.tables import Tables


@query(
    "variant_props_stats",
    oracle="""
    SELECT event_type,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k,
           count(*) AS n
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def variant_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed aggregation over a VARIANT-parsed JSON payload column."""
    e = Tables(spark, sf_dir).events
    k = F.expr("variant_get(parse_json(props), '$.k', 'long')")
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.sum("k").alias("sum_k"),
            F.max("k").alias("max_k"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("event_type")
    )


@query(
    "variant_filter_pushref",
    oracle="""
    SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
           count(*) AS n
    FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) >= 95
    GROUP BY k ORDER BY k
    """,
)
def variant_filter_pushref(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter + group on a VARIANT-extracted field: the extraction is a
    plain codegen expression, so the filter applies during the scan
    stage (no separate pass), and the groupBy key is already typed."""
    e = Tables(spark, sf_dir).events
    k = F.expr("variant_get(parse_json(props), '$.k', 'long')")
    return (
        e.select(k.alias("k"))
        .filter(F.col("k") >= 95)
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("k")
    )
