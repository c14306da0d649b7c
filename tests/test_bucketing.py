"""Bucketed-table layout: equal bucketing on the join key must let
SortMergeJoin run without any shuffle Exchange — the repeated-join layout
for 100 TB fact tables."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from ror_etl_spark.sources.io import write_bucketed
from ror_etl_spark.tables import Tables
from tests.conftest import SF_SMALL


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
    try:
        t = Tables(spark, SF_SMALL)
        write_bucketed(
            t.orders, "b_orders", "o_orderkey", n_buckets=8,
            path=str(tmp_path / "b_orders"),
        )
        write_bucketed(
            t.lineitem.select("l_orderkey", "l_quantity"), "b_lineitem", "l_orderkey", 8,
            path=str(tmp_path / "b_lineitem"),
        )
        joined = spark.table("b_orders").join(
            spark.table("b_lineitem"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            joined.explain("formatted")
        plan = buf.getvalue()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, "bucketed join must not shuffle"
        # and it computes the right thing
        assert joined.count() == t.lineitem.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_compact_parquet_merges_small_files(spark, tmp_path):
    from ror_etl_spark.sources.io import compact_parquet

    src = str(tmp_path / "frag")
    dst = str(tmp_path / "compact")
    # fragment: 40 tiny files
    spark.range(0, 4000).repartition(40).write.parquet(src)
    manifest = compact_parquet(spark, src, dst, target_file_bytes=10 * 1024 * 1024)
    assert manifest["files_before"] == 40
    assert manifest["files_after"] == 1  # everything fits one target file
    # content preserved
    assert spark.read.parquet(dst).count() == 4000
    got = spark.read.parquet(dst).agg({"id": "sum"}).collect()[0][0]
    assert got == sum(range(4000))


def test_export_sorted_shards_total_order(spark, tmp_path):
    import glob

    from ror_etl_spark.sources.io import export_sorted_shards

    dst = str(tmp_path / "shards")
    df = spark.range(0, 5000).selectExpr(
        "cast(hash(id) % 10000 as long) as k", "id as payload"
    )
    export_sorted_shards(df, dst, "k", 4)
    files = sorted(glob.glob(dst + "/part-*.parquet"))
    assert len(files) == 4
    # each file internally sorted; file ranges non-overlapping -> total order
    ranges = []
    for f in files:
        ks = [r["k"] for r in spark.read.parquet(f).collect()]
        assert ks == sorted(ks)
        if ks:
            ranges.append((min(ks), max(ks)))
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2
    # nothing lost
    assert spark.read.parquet(dst).count() == 5000
