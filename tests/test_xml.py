"""XML scalar functions (Spark 4 built-in): struct -> XML -> struct
roundtrip and schema inference."""

from __future__ import annotations

from pyspark.sql import functions as F

from ror_etl_spark.tables import Tables
from tests.conftest import SF_SMALL


def test_xml_roundtrip_preserves_rows(spark):
    n = Tables(spark, SF_SMALL).nation
    xml = n.select(
        F.to_xml(F.struct("n_nationkey", "n_name", "n_regionkey"),
                 {"rowTag": "nation"}).alias("x")
    )
    back = (
        xml.select(F.from_xml("x", "n_nationkey int, n_name string, n_regionkey int",
                              {"rowTag": "nation"}).alias("r"))
        .select("r.*")
    )
    assert sorted(tuple(r) for r in back.collect()) == sorted(
        tuple(r) for r in n.collect()
    )


def test_xml_handles_special_characters(spark):
    df = spark.createDataFrame([(1, 'a <b> & "c"')], "id int, s string")
    xml = df.select(F.to_xml(F.struct("id", "s"), {"rowTag": "r"}).alias("x"))
    back = xml.select(
        F.from_xml("x", "id int, s string", {"rowTag": "r"}).alias("r")
    ).select("r.*")
    assert back.collect()[0]["s"] == 'a <b> & "c"'
