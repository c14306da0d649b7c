"""Upsert / SCD2 operator tests."""

from __future__ import annotations

from ror_etl_spark.operators.upsert import scd2_apply, upsert


def test_upsert_replaces_and_appends(spark):
    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "k long, name string, v double"
    )
    source = spark.createDataFrame(
        [(2, "b2", 21.0), (4, "d", 40.0)], "k long, name string, v double"
    )
    out = {r["k"]: (r["name"], r["v"]) for r in upsert(target, source, "k").collect()}
    assert out == {1: ("a", 10.0), 2: ("b2", 21.0), 3: ("c", 30.0), 4: ("d", 40.0)}


def test_scd2_closes_and_opens_rows(spark):
    history = spark.createDataFrame(
        [(1, "alice", 100, None), (2, "bob", 100, None), (1, "al", 50, 100)],
        "k long, name string, valid_from long, valid_to long",
    )
    updates = spark.createDataFrame([(1, "alicia", 200)], "k long, name string, ts long")
    out = scd2_apply(history, updates, key="k", ts_col="ts")
    rows = {(r["k"], r["name"]): (r["valid_from"], r["valid_to"]) for r in out.collect()}
    assert rows[(1, "al")] == (50, 100)        # already closed, untouched
    assert rows[(1, "alice")] == (100, 200)    # closed by the update
    assert rows[(1, "alicia")] == (200, None)  # new open row
    assert rows[(2, "bob")] == (100, None)     # unrelated key stays open
    assert out.count() == 4
