"""Python DataSource API connector: distributed partition planning and
end-to-end compatibility with the rollup pipeline."""

from __future__ import annotations

from pyspark.sql import functions as F

from ror_etl_spark.operators.rollup import extract_parent_edges, ultimate_parent
from ror_etl_spark.sources.pydatasource import register


def _read(spark, **opts):
    register(spark)
    r = spark.read.format("ror_synth")
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_source_schema_and_count(spark):
    df = _read(spark, n_orgs=100, n_partitions=4)
    assert df.count() == 100
    assert set(df.columns) == {"id", "status", "relationships"}


def test_source_partition_plan_is_distributed(spark):
    df = _read(spark, n_orgs=100, n_partitions=4)
    assert df.rdd.getNumPartitions() == 4


def test_pipeline_runs_on_custom_source(spark):
    # the connector's forest: chains of 10, roots at org_{10k}
    df = _read(spark, n_orgs=50, chain_len=10, n_partitions=2)
    edges = extract_parent_edges(df)
    mapping = ultimate_parent(edges, max_depth=16).mapping
    got = {r["id"]: r["ultimate_parent"] for r in mapping.collect()}
    assert len(got) == 50
    for i in range(50):
        assert got[f"org_{i}"] == f"org_{(i // 10) * 10}", i


def test_case_insensitive_parent_type_from_source(spark):
    # connector emits type='Parent' (mixed case) — extraction must match it
    df = _read(spark, n_orgs=12, chain_len=10)
    edges = extract_parent_edges(df)
    non_self = edges.filter(F.col("id") != F.col("parent")).count()
    assert non_self == 10  # all but the two roots (org_0, org_10)
