"""Query registry backing the driver contract (__spark_entry__.py).

Every implemented operator registers a named query callable
``(spark, sf_dir) -> DataFrame`` and, when SQL-expressible, the equivalent
DuckDB oracle SQL. Registration happens at import time of the
``ror_etl_spark.queries`` subpackage.

Correctness discipline (driver hashes values order-insensitively after
sorting columns by name):
- alias every computed column identically in Spark code and oracle SQL;
- round floating-point aggregates to a fixed number of decimals on BOTH
  sides so fp summation order can't flip the hash;
- make every ORDER BY / top-k deterministic with an explicit tiebreak key.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}
PRIORITY: dict[str, int] = {}


def query(
    name: str, oracle: str | None = None, priority: int = 0
) -> Callable[[QueryFn], QueryFn]:
    """Register a driver-contract query; ``oracle`` is DuckDB SQL or None
    for non-SQL-expressible operators (driver then does a rows-only check).
    ``priority`` > 0 moves the query earlier within its evidence tier (see
    ``ordered_queries``) — use for newly added queries that should reach
    the driver's capped correctness run this round.
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = " ".join(oracle.split())
        if priority:
            PRIORITY[name] = priority
        return fn

    return deco


# Queries whose results depend on the events.ts timestamp encoding — the
# one column the driver's testdata regenerator has already drifted (r4:
# TIMESTAMP(NANOS) -> timestamp[us]). Kept at elevated priority so every
# round's capped driver window re-confirms them against freshly generated
# data instead of spending all 50 slots on drift-immune re-confirmations.
_DRIFT_SENSITIVE = [
    "asof_join_events",
    "sessionize_events",
    "tumbling_window_counts",
    "sliding_window_counts",
    "session_window_batch",
    "gapfill_hourly_purchases",
    "interpolate_hourly_gaps",
    "outlier_iqr_events",
    "hypertable_daily_from_hourly",
    "funnel_signup_click_purchase",
    "cohort_retention",
    "events_band_self_join",
    "sketch_distinct_users_rollup",
    # r7 session-3 additions that read events.ts
    "asof_join_nearest",
    "sessionize_timeout_sweep",
    "funnel_conversion_latency",
    "outlier_mad_events",
]


# r8: the judge asked (VERDICT r7, item 5) that the newest floating-point
# kernels — the semdedup/ANN-recall family — land inside the driver's
# 50-slot window this round. 52 queries are tier-0 (driver-unverified), so
# without a bump the last two registered (which are two of these) would
# miss the window. Bumped within tier 0 only; already-green queries are
# unaffected (tier 2 sorts after all tier 0 regardless of priority).
_R8_WINDOW_PRIORITY = [
    "embedding_semdedup_prune",
    "embedding_semdedup_prune_tuned",
    "embedding_ann_recall",
    "embedding_pq_recall",
    "embedding_ivf_nprobe_sweep",
    "embedding_semdedup_sweep",
    "embedding_dim_truncation_sweep",
]

# Queries whose IMPLEMENTATION changed in r9 (LANE_POOL cap on the tuned
# minhash banding): already driver-green, but the change must be
# re-proven, so they lead the re-confirmation tier of the r9 window.
_R9_CHANGED = [
    "dedup_minhash_lsh_tuned",
    "dedup_funnel_keep_tuned",
]

# Queries whose IMPLEMENTATION changed in r10 (loop-internal checkpoints
# moved to DISK_ONLY per the r9 endurance rule, now pinned by
# tests/test_checkpoint_discipline.py): already driver-green, but the
# change must be re-proven, so they lead the re-confirmation tier of the
# r10 window — right after the 28 newly registered staged_r10 names.
_R10_CHANGED = [
    "hierarchy_depth_layers",
    "kcore_trade_graph",
    "cheapest_path_bounded_hops",
    "hierarchy_subtree_totals",
    "bfs_levels_trade_graph",
]

# Queries whose IMPLEMENTATION changed in r12 (trade-graph family
# re-based from the vacuous complete K25 onto the sparsified top-90
# graph — VERDICT r11 item 2): already driver-green, but the new graph
# changes their hashes, so they lead the re-confirmation tier of the
# r12 window — right after the 44 tier-0 names (44 + 3 = 47 <= 50).
_R12_CHANGED = [
    "hits_nation_trade",
    "degree_assortativity_trade",
    "modularity_lpa_communities",
]

# Queries whose IMPLEMENTATION changed in r13 (optimization round 2 —
# results identical, shapes changed): jaccard_verify's single shingle
# materialization (all eight consumers), lsh_near_dup_pairs' pinned
# verify-group exchange (three twins), and the wide rollup's lag-window
# edge derivation. Already driver-green, but the changed paths must be
# re-proven, so they lead the re-confirmation tier of the r13 window.
_R13_CHANGED = [
    "ultimate_parent_rollup_wide",
    "dedup_minhash_lsh",
    "dedup_minhash_lsh_tuned",
    "dedup_near_clusters",
    "dedup_funnel_keep",
    "dedup_funnel_keep_tuned",
    "dedup_threshold_sweep",
    "train_test_split_leakage_safe",
    "golden_record_survivorship",
    "embedding_near_dup_pairs",
    "embedding_near_dup_pairs_tuned",
    "embedding_near_dup_pairs_prod",
]


def load_all() -> None:
    """Import every query module (idempotent)."""
    from ror_etl_spark import queries  # noqa: F401

    queries.load()
    for name in _DRIFT_SENSITIVE:
        if name in QUERIES:
            PRIORITY[name] = max(PRIORITY.get(name, 0), 4)
    for name in _R8_WINDOW_PRIORITY:
        if name in QUERIES:
            PRIORITY[name] = max(PRIORITY.get(name, 0), 6)
    for name in _R9_CHANGED:
        if name in QUERIES:
            PRIORITY[name] = max(PRIORITY.get(name, 0), 7)
    for name in _R10_CHANGED:
        if name in QUERIES:
            PRIORITY[name] = max(PRIORITY.get(name, 0), 8)
    for name in _R12_CHANGED:
        if name in QUERIES:
            PRIORITY[name] = max(PRIORITY.get(name, 0), 9)
    for name in _R13_CHANGED:
        if name in QUERIES:
            PRIORITY[name] = max(PRIORITY.get(name, 0), 10)


def _past_verdicts(repo_root: str) -> dict[str, bool]:
    """name -> True if some past CORRECTNESS_r*.json has it fully green
    (hash_match), False if it appeared but never green. Absent = never
    checked by the driver."""
    import glob
    import json
    import os

    seen: dict[str, bool] = {}
    for path in sorted(glob.glob(os.path.join(repo_root, "CORRECTNESS_r*.json"))):
        try:
            with open(path) as f:
                data = json.load(f)
        except (OSError, ValueError):
            continue
        for name, row in data.items():
            green = bool(isinstance(row, dict) and row.get("hash_match"))
            seen[name] = seen.get(name, False) or green
    return seen


def ordered_queries(repo_root: str) -> dict[str, QueryFn]:
    """Registry in driver-priority order.

    The external driver checks queries in dict order with a cap (r1
    recorded exactly the first 50 of 133), so ordering decides which
    queries accumulate hard correctness evidence. Priority:

    0. oracle available but no green driver hash yet — never checked, or
       checked rows-only/failed before an oracle or fix landed
    1. never checked, no oracle  (weaker rows-only signal)
    2. already green in a past round  (re-confirmation only)

    Within each tier, PRIORITY (desc) then registration order. Self-
    maintaining: each round's artifact pushes newly-green names to the
    back.
    """
    seen = _past_verdicts(repo_root)
    def tier(name: str) -> int:
        has_oracle = name in ORACLES
        if has_oracle:
            return 0 if not seen.get(name, False) else 2
        return 1 if name not in seen else 2

    names = list(QUERIES)
    ranked = sorted(
        range(len(names)),
        key=lambda i: (tier(names[i]), -PRIORITY.get(names[i], 0), i),
    )
    return {names[i]: QUERIES[names[i]] for i in ranked}
