"""Streaming demos driven to completion on the bounded events fixture;
windowed aggregates must match their batch twins exactly."""

from __future__ import annotations

from pyspark.sql import functions as F

from ror_etl_spark.streaming.events import (
    dedup_within_watermark,
    read_events_stream,
    run_to_memory,
    session_counts,
    tumbling_counts,
)
from ror_etl_spark.tables import Tables
from tests.conftest import SF_SMALL


def test_tumbling_stream_matches_batch(spark):
    stream = read_events_stream(spark, SF_SMALL)
    out = run_to_memory(spark, tumbling_counts(stream), "t_tumbling", mode="complete")
    got = {
        (r["wstart"], r["event_type"]): (r["n"], r["total"]) for r in out.collect()
    }
    batch = (
        Tables(spark, SF_SMALL)
        .events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("total"))
        .select(F.col("w.start").alias("wstart"), "event_type", "n", "total")
    )
    want = {
        (r["wstart"], r["event_type"]): (r["n"], r["total"]) for r in batch.collect()
    }
    assert got == want and len(got) > 0


def test_session_stream_produces_sessions(spark):
    stream = read_events_stream(spark, SF_SMALL)
    out = run_to_memory(spark, session_counts(stream), "t_sessions", mode="complete")
    rows = out.collect()
    assert len(rows) > 0
    assert all(r["session_end"] > r["session_start"] for r in rows)
    # total events across sessions == total events
    total = sum(r["n_events"] for r in rows)
    assert total == Tables(spark, SF_SMALL).events.count()


def test_dedup_within_watermark_drops_dupes(spark):
    stream = read_events_stream(spark, SF_SMALL)
    out = run_to_memory(spark, dedup_within_watermark(stream), "t_dedup")
    n = out.count()
    assert n == Tables(spark, SF_SMALL).events.select("event_id").distinct().count()


def test_stream_stream_join_matches_batch(spark):
    from ror_etl_spark.streaming.joins import clicks_with_recent_purchases

    stream = read_events_stream(spark, SF_SMALL)
    out = run_to_memory(
        spark, clicks_with_recent_purchases(stream), "t_ssjoin"
    )
    got = {(r["click_id"], r["purchase_id"]) for r in out.collect()}

    e = Tables(spark, SF_SMALL).events
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("cu"), F.col("event_id").alias("cid"), F.col("ts").alias("cts")
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu"), F.col("event_id").alias("pid"), F.col("ts").alias("pts")
    )
    batch = clicks.join(
        purchases,
        (F.col("cu") == F.col("pu"))
        & (F.col("pts") >= F.col("cts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("pts") <= F.col("cts")),
    )
    want = {(r["cid"], r["pid"]) for r in batch.collect()}
    assert got == want and len(got) > 0


def test_stream_static_enrich_matches_batch(spark):
    from ror_etl_spark.streaming.joins import enrich_with_static_dim

    # static dimension derived deterministically: user_id % 3 → segment
    dim = (
        Tables(spark, SF_SMALL)
        .events.select("user_id")
        .distinct()
        .filter(F.col("user_id") % 2 == 0)  # half the users have a row
        .select(
            F.col("user_id").alias("dim_user_id"),
            F.concat(F.lit("seg_"), (F.col("user_id") % 3).cast("string")).alias(
                "user_segment"
            ),
        )
    )
    stream = read_events_stream(spark, SF_SMALL)
    out = run_to_memory(spark, enrich_with_static_dim(stream, dim), "t_enrich")
    batch = enrich_with_static_dim(Tables(spark, SF_SMALL).events, dim)
    got = {(r["event_id"], r["user_segment"]) for r in out.collect()}
    want = {(r["event_id"], r["user_segment"]) for r in batch.collect()}
    assert got == want and len(got) > 0
    # left join: unmatched users fall back to 'unknown'
    assert any(s == "unknown" for _, s in got)
