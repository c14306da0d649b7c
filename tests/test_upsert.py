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


def test_scd2_multiple_updates_same_key_chain(spark):
    import pytest

    history = spark.createDataFrame(
        [(1, "alice", 100, None)], "k long, name string, valid_from long, valid_to long"
    )
    updates = spark.createDataFrame(
        [(1, "a2", 200), (1, "a3", 300), (1, "a4", 400)],
        "k long, name string, ts long",
    )
    out = scd2_apply(history, updates, key="k", ts_col="ts")
    rows = {r["name"]: (r["valid_from"], r["valid_to"]) for r in out.collect()}
    # the open row closes exactly once, at the earliest update
    assert rows["alice"] == (100, 200)
    # updates chain: each closes at the next one's start; only last open
    assert rows["a2"] == (200, 300)
    assert rows["a3"] == (300, 400)
    assert rows["a4"] == (400, None)
    assert out.count() == 4
    open_rows = [n for n, (_, vt) in rows.items() if vt is None]
    assert open_rows == ["a4"]

    dup_ts = spark.createDataFrame(
        [(1, "x", 200), (1, "y", 200)], "k long, name string, ts long"
    )
    with pytest.raises(ValueError, match="timestamps must be unique"):
        scd2_apply(history, dup_ts, key="k", ts_col="ts")
