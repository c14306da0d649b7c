"""Pandas-UDF surface tests: the Arrow-batched UDFs must agree with their
native-function twins."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from ror_etl_spark.functions.udfs import char_entropy, weighted_mean
from ror_etl_spark.tables import Tables
from tests.conftest import SF_SMALL


def test_char_entropy_known_values(spark):
    df = spark.createDataFrame([("aaaa",), ("abab",), ("",)], "text string")
    got = [r["e"] for r in df.select(char_entropy("text").alias("e")).collect()]
    assert got[0] == 0.0  # single symbol → zero entropy
    assert abs(got[1] - 1.0) < 1e-12  # two equiprobable symbols → 1 bit
    assert got[2] == 0.0


def test_weighted_mean_udaf_matches_native(spark):
    li = Tables(spark, SF_SMALL).lineitem
    udaf = (
        li.groupBy("l_returnflag")
        .agg(weighted_mean("l_extendedprice", "l_quantity").alias("wm"))
        .collect()
    )
    native = (
        li.groupBy("l_returnflag")
        .agg(
            (
                F.sum(F.col("l_extendedprice") * F.col("l_quantity"))
                / F.sum("l_quantity")
            ).alias("wm")
        )
        .collect()
    )
    a = {r["l_returnflag"]: r["wm"] for r in udaf}
    b = {r["l_returnflag"]: r["wm"] for r in native}
    assert set(a) == set(b)
    for k in a:
        assert math.isclose(a[k], b[k], rel_tol=1e-9)


def test_apply_in_pandas_zscore_matches_window(spark):
    from pyspark.sql import Window as W

    from ror_etl_spark.functions.udfs import zscore_per_user

    e = Tables(spark, SF_SMALL).events
    got = {r["event_id"]: r["zscore"] for r in zscore_per_user(e).collect()}
    w = W.partitionBy("user_id")
    native = e.select(
        "event_id",
        (
            (F.col("value") - F.avg("value").over(w)) / F.stddev_samp("value").over(w)
        ).alias("z"),
    )
    want = {r["event_id"]: r["z"] for r in native.collect()}
    assert set(got) == set(want)
    for k in got:
        assert math.isclose(got[k], want[k], rel_tol=1e-9, abs_tol=1e-12)
