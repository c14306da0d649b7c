"""Catalog surface (M1 metadata parity with a metastore) and physical
data-layout controls (range partitioning, cache reuse)."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from ror_etl_spark.tables import Tables
from tests.conftest import SF_SMALL


def test_catalog_table_and_comment_propagation(spark):
    # M1 with a metastore: descriptions become table properties / column
    # comments instead of the sidecar JSON (ror_dag.py:203-213 parity)
    spark.sql("DROP TABLE IF EXISTS nation_cat")
    # a stale warehouse dir without a metastore entry blocks saveAsTable
    import shutil

    shutil.rmtree("spark-warehouse/nation_cat", ignore_errors=True)
    Tables(spark, SF_SMALL).nation.write.mode("overwrite").saveAsTable("nation_cat")
    spark.sql(
        "ALTER TABLE nation_cat SET TBLPROPERTIES "
        "('comment' = 'TPC-H nation dim', 'owner_team' = 'etl')"
    )
    spark.sql("ALTER TABLE nation_cat ALTER COLUMN n_name COMMENT 'nation name'")
    # 'comment' is absorbed into the catalog description; custom keys stay
    # visible as properties
    assert spark.catalog.getTable("nation_cat").description == "TPC-H nation dim"
    props = {
        r["key"]: r["value"]
        for r in spark.sql("SHOW TBLPROPERTIES nation_cat").collect()
    }
    assert props.get("owner_team") == "etl"
    cols = {r["col_name"]: r["comment"] for r in spark.sql("DESCRIBE nation_cat").collect()}
    assert cols["n_name"] == "nation name"
    # catalog tables are queryable alongside path-based reads
    assert spark.sql("SELECT count(*) n FROM nation_cat").collect()[0]["n"] == 25
    spark.sql("DROP TABLE nation_cat")


def test_insert_into_appends(spark):
    spark.sql("DROP TABLE IF EXISTS region_cat")
    import shutil

    shutil.rmtree("spark-warehouse/region_cat", ignore_errors=True)
    Tables(spark, SF_SMALL).region.write.mode("overwrite").saveAsTable("region_cat")
    spark.sql("INSERT INTO region_cat VALUES (99, 'ATLANTIS')")
    assert spark.table("region_cat").count() == 6
    spark.sql("DROP TABLE region_cat")


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_repartition_by_range_layout(spark):
    # range partitioning orders data across files — the layout for
    # min/max-pruned time-series scans
    e = Tables(spark, SF_SMALL).events
    ranged = e.repartitionByRange(4, "ts").sortWithinPartitions("ts")
    assert "rangepartitioning" in _plan(ranged).lower()
    # partitions are contiguous, non-overlapping ts ranges
    bounds = (
        ranged.select(F.spark_partition_id().alias("p"), "ts")
        .groupBy("p").agg(F.min("ts").alias("lo"), F.max("ts").alias("hi"))
        .orderBy("p").collect()
    )
    for a, b in zip(bounds, bounds[1:]):
        assert a["hi"] <= b["lo"]


def test_cache_reuses_inmemory_scan(spark):
    li = Tables(spark, SF_SMALL).lineitem.select("l_orderkey", "l_quantity").cache()
    try:
        li.count()  # materialize
        agg = li.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("q"))
        assert "InMemoryTableScan" in _plan(agg)
    finally:
        li.unpersist()
