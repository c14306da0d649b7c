"""Stream-stream joins: correlating two live streams with bounded state.

A watermark on BOTH sides plus a time-range join condition lets Spark
evict join state once rows age past the horizon — without both, one side's
state grows forever. The demo correlates click events with the same user's
purchases within the preceding hour, the canonical attribution join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def clicks_with_recent_purchases(
    events: DataFrame, watermark: str = "30 minutes"
) -> DataFrame:
    """Inner stream-stream join: each click paired with every purchase by
    the same user in the hour before it (state bounded by watermark +
    range condition on both event times)."""
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", watermark)
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("p_ts"),
            F.col("value").alias("purchase_value"),
        )
        .withWatermark("p_ts", watermark)
    )
    return clicks.join(
        purchases,
        F.expr(
            """
            c_user = p_user AND
            p_ts >= c_ts - INTERVAL 1 HOUR AND
            p_ts <= c_ts
            """
        ),
        "inner",
    ).select("click_id", "purchase_id", "c_user", "c_ts", "p_ts", "purchase_value")


def enrich_with_static_dim(events: DataFrame, dim: DataFrame) -> DataFrame:
    """Stream-static enrichment join: each event decorated from a static
    dimension table (no watermark needed — the static side is re-read per
    micro-batch, so a dim refresh is picked up without restarting).

    The static side should be broadcast when small (Spark plans this
    automatically under the threshold); the stream side then never
    shuffles — the canonical 100 TB/day ingest-enrich shape."""
    small = F.broadcast(dim)
    return events.join(small, events["user_id"] == dim["dim_user_id"], "left").select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        "value",
        F.coalesce(F.col("user_segment"), F.lit("unknown")).alias("user_segment"),
    )
