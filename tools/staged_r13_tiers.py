"""Decade tier rows for the r13-staged batch (pre-registration scale
evidence, same discipline as the r10/r11/r12 staged tiers in
SCALING.md): cold-first / best-of-2 timings across the events decade
(ev-1m/10m/100m), the sf0.1 → tpch10 fact decade, and the embedding
decade (sf0.1 → emb10x). Usage:

    python tools/staged_r13_tiers.py --events
    python tools/staged_r13_tiers.py --tpch
    python tools/staged_r13_tiers.py --emb
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ror_etl_spark.queries.staged_r13 import STAGED  # noqa: E402
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
EMB_TIERS = [
    ("sf0.1", "/root/testdata/sf0.1"),
    ("emb10x", "/tmp/sparkgraft_emb10x"),
]

# events.parquet-only staged ops (the ev tier dirs carry no other table)
EVENTS_OPS = [
    "jarque_bera_daily_revenue",
    "durbin_watson_daily_revenue",
    "breusch_pagan_daily_revenue",
    "grubbs_outlier_daily_revenue",
    "max_drawdown_daily_revenue",
    "changepoint_binseg_daily_revenue",
    "hurst_rs_daily_revenue",
    "permutation_entropy_daily_revenue",
    "haar_energy_daily_revenue",
    "theil_u_forecast_daily_revenue",
    "cf_distance_click_purchase",
    "incremental_sessionize_merge",
    "session_depth_halflife_fit",
    # wave 9/10
    "odds_ratio_click_purchase",
    "dickey_fuller_daily_revenue",
    "granger_causality_click_purchase",
    "wasserstein_value_click_purchase",
    "holt_linear_daily_revenue",
    "pinball_loss_forecast_daily",
    "gaussian_mixture_em_value",
    "markov_absorption_time_purchase",
    # wave 11
    "cronbach_alpha_event_types",
    "page_hinkley_daily_revenue",
    "hotelling_t2_click_purchase",
]
# ops needing the full table set (tpch10 carries every table at ~10x)
TPCH_OPS = [
    "welch_anova_value_by_priority",
    "bartlett_value_by_priority",
    "tukey_q_pairwise_priority",
    "t_closeness_order_priority",
    "dp_exponential_topk_nations",
    "personalized_pagerank_trade",
    "ktruss_trade_graph",
    "geo_knn_cell_blocked",
    "tokenizer_fertility_by_language",
    # wave 9/10
    "atkinson_index_customer_revenue",
    "income_share_ratios_revenue",
    "goodman_kruskal_gamma_priority_status",
    "harmonic_centrality_trade",
    "spectral_radius_trade_graph",
    "term_burstiness_topk",
    "text_rake_keyphrases",
    "ridge_elasticity_qty_price",
    "huber_irls_elasticity",
    # wave 8 (rows recorded together with waves 9-11)
    "weighted_quantiles_quantity",
    "simpson_paradox_screen",
    # wave 11
    "chao1_vocab_richness",
]
EMB_OPS = [
    "embedding_pca_power_iteration",
    "embedding_kmeans_elbow",
    # wave 9/10
    "embedding_hubness_koccurrence",
    "embedding_participation_ratio",
    # wave 11
    "calinski_harabasz_embeddings",
]


def run(ops: list[str], tiers: list[tuple[str, str]]) -> None:
    spark = get_spark("staged-r13-tiers")
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
    ap.add_argument("--emb", action="store_true")
    args = ap.parse_args()
    if args.events:
        run(EVENTS_OPS, EV_TIERS)
    if args.tpch:
        run(TPCH_OPS, TPCH_TIERS)
    if args.emb:
        run(EMB_OPS, EMB_TIERS)
