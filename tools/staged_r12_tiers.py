"""Decade tier rows for the r12-staged batch (pre-registration scale
evidence, same discipline as the r10/r11 staged tiers in SCALING.md):
cold-first / best-of-2 timings of the staged operators across the
events decade (ev-1m/10m/100m — events.parquet only) and the
sf0.1 → tpch10 decade for the fact-join operators. Usage:

    python tools/staged_r12_tiers.py --events   # events-decade ops
    python tools/staged_r12_tiers.py --tpch     # fact-join ops
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ror_etl_spark.queries.staged_r12 import STAGED  # noqa: E402
from ror_etl_spark.session import get_spark  # noqa: E402

EV_TIERS = [
    ("ev-1m", "/tmp/sparkgraft_ev1m"),
    ("ev-10m", "/tmp/sparkgraft_ev10m"),
    ("ev-100m", "/tmp/sparkgraft_ev100m"),
]
TPCH_TIERS = [
    ("sf0.1", "/root/testdata/sf0.1"),
    ("tpch10", "/tmp/sparkgraft_tpch10"),
]

# events.parquet-only staged ops (the tier dirs carry no other table)
EVENTS_OPS = [
    "anderson_darling_click_purchase",
    "weibull_fit_time_to_purchase",
    "session_bounce_depth",
    "dau_wau_stickiness",
    "capture_recapture_users",
    "dp_noisy_counts_laplace",
    "geo_zorder_cell_counts",
    "spectral_entropy_daily_revenue",
    "aalen_johansen_cif",
    "entropy_rate_markov",
    "growth_accounting_weekly",
]
# fact-join ops on the tpch decade
TPCH_OPS = [
    "iptw_ate_urgent_revenue",
    "rdd_acctbal_threshold",
    "price_index_laspeyres_paasche",
    "quantile_treatment_effects",
    "woe_iv_acctbal_band",
    "conformal_interval_totalprice",
    "l_diversity_order_priority",
    "ipf_raking_segment_priority",
    "closeness_centrality_trade",
    "cmh_test_segment_strata",
]


def run(ops: list[str], tiers: list[tuple[str, str]]) -> None:
    spark = get_spark("staged-r12-tiers")
    hdr = " ".join(f"{lbl + ' cold':>12s} {lbl + ' best':>12s}" for lbl, _ in tiers)
    print(f"{'query':36s} {hdr}", flush=True)
    for name in ops:
        fn, _ = STAGED[name]
        cells = []
        for lbl, sf_dir in tiers:
            if not os.path.isdir(sf_dir):
                cells.append(f"{'—':>12s} {'—':>12s}")
                continue
            print(f"  ... {name} @ {lbl}", flush=True)
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            cold = time.perf_counter() - t0
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            warm = time.perf_counter() - t0
            cells.append(f"{cold:12.2f} {min(cold, warm):12.2f}")
        print(f"{name:36s} {' '.join(cells)}", flush=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", action="store_true")
    ap.add_argument("--tpch", action="store_true")
    args = ap.parse_args()
    if args.events:
        run(EVENTS_OPS, EV_TIERS)
    if args.tpch:
        run(TPCH_OPS, TPCH_TIERS)
