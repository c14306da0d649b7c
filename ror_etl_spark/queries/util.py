"""Shared helpers for oracle-checked queries."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def r2(c: Column | str) -> Column:
    """Round to 2 decimals — for large-magnitude money sums where fp
    accumulation order (Spark partial aggs vs DuckDB sequential) can differ
    in the last ulps but never by 0.005."""
    return F.round(c, 2)


def r4(c: Column | str) -> Column:
    """Round to 4 decimals — for averages/ratios of moderate magnitude."""
    return F.round(c, 4)


def ravg4(c: Column) -> Column:
    """Round an AVG of fixed-2-decimal data to 4 dp with an epsilon shift.

    avg(2-decimal values) over counts like 8 or 32 yields exact decimal
    values with 5 digits ending in 5 — exactly on the 4-dp rounding
    boundary, where the last-ulp difference between Spark's partial-agg
    summation and DuckDB's sequential sum flips the rounded digit. Adding
    1e-9 (identically in the oracle SQL — see SQL_AVG_EPS) moves the
    boundary off every such point."""
    return F.round(c + 1e-9, 4)


# Oracle-side twin of ravg4: use round(<expr> + 1e-9, 4) in DuckDB SQL.
SQL_AVG_EPS = "+ 1e-9"


def r6(c: Column | str) -> Column:
    return F.round(c, 6)


def epoch_us(c: Column | str) -> Column:
    """Microseconds since epoch for a TIMESTAMP_NTZ column, timezone-free
    (``unix_micros`` only accepts TIMESTAMP and a ntz→ltz cast would drag
    the session timezone into the result). Matches DuckDB ``epoch_us``."""
    col = F.col(c) if isinstance(c, str) else c
    return F.timestamp_diff(
        "MICROSECOND", F.lit("1970-01-01 00:00:00").cast("timestamp_ntz"), col
    )



def ordered(df, *cols):
    """Total-order a full result set without re-executing its plan.

    A global ``orderBy`` range-partitions, and RangePartitioner's
    bound-sampling pass executes the ENTIRE child plan a second time
    just to sketch the sort keys — for queries whose dominant cost is
    map-side work directly under the sort (per-row projections,
    broadcast-join probe sides, post-shuffle verify stages), the whole
    expensive computation runs TWICE (measured exactly 2× on the winnow
    fingerprint query at the sf1 tier: 18.1 → 9.6 s with this helper —
    SCALING.md round 6). The lazy localCheckpoint materializes the
    result once, during the sampling job; the sort then reads blocks.

    Use for presentation ordering of full result sets. Top-k queries
    (orderBy + limit) compile to TakeOrderedAndProject, which does not
    range-sample — leave those alone. Queries whose sort sits directly
    on an aggregate/join EXCHANGE also don't need it (the sampling pass
    reuses the exchange's shuffle files; only the cheap post-shuffle
    tail re-runs).

    ``spark.ror.ordered.checkpoint=false`` falls back to a plain sort —
    the checkpoint rewrites the logical plan to an RDD scan, which hides
    the upstream plan from the invariants tests' explain() inspection."""
    if df.sparkSession.conf.get("spark.ror.ordered.checkpoint", "true") == "false":
        return df.orderBy(*cols)
    # DISK_ONLY: the blocks are read twice (range sampling + sort) and
    # then dead; keeping every query's result frame in storage MEMORY
    # starves later broadcast builds when many queries share one
    # small-heap session (r9 endurance sweep)
    from pyspark.storagelevel import StorageLevel

    return df.localCheckpoint(
        eager=False, storageLevel=StorageLevel.DISK_ONLY
    ).orderBy(*cols)
