"""As-of join operator tests: hand cases with ties, no-match rows, and
strict mode."""

from __future__ import annotations

from ror_etl_spark.operators.asof import asof_join


def _frames(spark):
    left = spark.createDataFrame(
        [(1, 10, "l1"), (1, 20, "l2"), (1, 5, "l0"), (2, 15, "l3")],
        "k long, t long, name string",
    )
    right = spark.createDataFrame(
        [(1, 10, 100.0), (1, 18, 200.0), (2, 99, 300.0)],
        "k long, rt long, rv double",
    )
    return left, right


def test_asof_latest_prior_or_equal(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, on="k", left_time="t", right_time="rt", right_values=["rv"])
    got = {r["name"]: r["rv"] for r in out.collect()}
    # l0 (t=5): nothing at/before 5 → null; l1 (t=10): tie matches 100;
    # l2 (t=20): latest ≤20 is 18 → 200; l3 (t=15): right at 99 is later → null
    assert got == {"l0": None, "l1": 100.0, "l2": 200.0, "l3": None}


def test_asof_strict_excludes_equal_time(spark):
    left, right = _frames(spark)
    out = asof_join(
        left, right, on="k", left_time="t", right_time="rt", right_values=["rv"], strict=True
    )
    got = {r["name"]: r["rv"] for r in out.collect()}
    assert got["l1"] is None  # t=10 tie no longer visible
    assert got["l2"] == 200.0


def test_asof_preserves_left_rowcount(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, on="k", left_time="t", right_time="rt", right_values=["rv"])
    assert out.count() == left.count()
    assert set(out.columns) == {"k", "t", "name", "rv"}
