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


def test_nearest_asof_prefers_closer_and_breaks_ties_backward(spark):
    """Hand-built fixture covering all nearest-join branches: closer
    forward wins, closer backward wins, exact tie prefers backward,
    equal-time purchase is distance 0, user with no purchases gets
    nulls."""
    from ror_etl_spark.registry import QUERIES, load_all

    load_all()
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    def ts(s):
        return t0 + dt.timedelta(seconds=s)

    rows = [
        # user 1: purchases at t=0 and t=100; clicks at 10 (closer back),
        # 95 (closer fwd), 50 (exact tie -> backward)
        (1, 1001, "purchase", ts(0), 5.0),
        (1, 1002, "purchase", ts(100), 7.0),
        (1, 1, "click", ts(10), 0.0),
        (1, 2, "click", ts(95), 0.0),
        (1, 3, "click", ts(50), 0.0),
        # user 2: click exactly at the purchase time -> dt 0
        (2, 2001, "purchase", ts(30), 9.0),
        (2, 4, "click", ts(30), 0.0),
        # user 3: click with no purchases
        (3, 5, "click", ts(1), 0.0),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, event_type string, ts timestamp_ntz, value double"
    )
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/events.parquet")
        for t in ("region", "nation", "customer", "supplier", "part",
                  "orders", "lineitem", "documents", "embeddings"):
            spark.createDataFrame([], "x long").write.parquet(f"{d}/{t}.parquet")
        got = {r["event_id"]: r for r in
               QUERIES["asof_join_nearest"](spark, d).collect()}
    assert got[1]["nearest_purchase_id"] == 1001 and got[1]["dt_us"] == -10_000_000
    assert got[2]["nearest_purchase_id"] == 1002 and got[2]["dt_us"] == 5_000_000
    assert got[3]["nearest_purchase_id"] == 1001 and got[3]["dt_us"] == -50_000_000
    assert got[4]["nearest_purchase_id"] == 2001 and got[4]["dt_us"] == 0
    assert got[5]["nearest_purchase_id"] is None and got[5]["dt_us"] is None
