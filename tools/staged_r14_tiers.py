"""Decade tier rows for the r14-staged batch (pre-registration scale
evidence, same discipline as the r10-r13 staged tiers in SCALING.md):
cold-first / best-of-2 timings across the events decade
(ev-1m/10m/100m), the sf0.1 → tpch10 fact decade, and the embedding
decade (sf0.1 → emb10x). Tier dirs come from ``tools/gen_tiers.py``.
Usage:

    python tools/staged_r14_tiers.py --events --tpch --emb
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ror_etl_spark.queries import staged_r14  # noqa: E402
from tools.staged_r13_tiers import (  # noqa: E402
    EMB_TIERS,
    EV_TIERS,
    TPCH_TIERS,
    run,
)

# events.parquet-only staged ops
EVENTS_OPS = [
    "kuiper_value_click_purchase",
    "kendall_w_weekday_type_ranks",
    "logistic_irls_purchase_hour",
    "hosmer_lemeshow_logistic_hour",
    "kalman_local_level_daily",
    "grid_dbscan_user_clusters",
    # wave 2
    "cox_ph_time_to_purchase",
    "isotonic_purchase_rate_by_hour",
    "dtw_weekday_weekend_profiles",
    # waves 3-5 (events-only)
    "morans_i_planted_plane",
    "bradley_terry_event_types",
    "obrien_fleming_daily_monitor",
    "ucb1_bandit_replay_event_types",
    "fleiss_kappa_first_events",
    # wave 6
    "holt_winters_weekday_daily",
    # wave 7
    "garch11_filter_daily",
    "hmm_viterbi_daily_regimes",
    # wave 10
    "zero_inflated_poisson_errors",
    # wave 11
    "dagostino_k2_daily_revenue",
    "hodges_lehmann_weekend_shift",
    "prr_disproportionality_events",
    # wave 12
    "variance_ratio_daily_revenue",
    "taylor_power_law_users",
    "poisson_glm_irls_daily",
    "ansari_bradley_weekend_scale",
    # wave 13
    "pettitt_change_point_daily",
    "generalized_esd_daily",
    "ripley_k_quantized_plane",
    "decision_stump_purchase_hour",
]
# ops needing the full table set (tpch10 carries every table at ~10x)
TPCH_OPS = [
    "fisher_exact_nation_revenue",
    "breslow_day_or_homogeneity",
    "causal_aipw_ate",
    "stupid_backoff_trigram_score",
    "textrank_keywords",
    "misra_gries_heavy_tokens",
    # wave 5
    "cochran_armitage_trend_priority",
    "sobel_mediation_urgent_items_revenue",
    "iv_wald_orderkey_items_revenue",
    "smr_indirect_standardization_asia",
    # wave 6
    "blinder_oaxaca_region_revenue",
    "uplift_qini_by_segment",
    "linear_shapley_attribution",
    # wave 7
    "weighted_sssp_trade",
    "mst_kruskal_trade_backbone",
    # wave 8
    "sinkhorn_ot_priority_mix",
    "spectral_bisection_trade",
    # wave 9
    "region_homophily_trade",
    "trade_percolation_sweep",
    "trade_graph_period_jaccard",
    # wave 10
    "twfe_price_qty_elasticity",
    # wave 11
    "yule_k_lexical_diversity",
    "katz_centrality_trade",
    # wave 12
    "bhattacharyya_hellinger_regions",
    # wave 13
    "dunn_posthoc_ship_delay_priority",
]
EMB_OPS = [
    "embedding_cka_halves",
    "knn_distance_outliers_embeddings",
    # wave 9
    "embedding_pca2_deflation",
]


def run_r14(ops: list[str], tiers: list[tuple[str, str]]) -> None:
    # reuse the r13 runner but source functions from the r14 STAGED dict
    import tools.staged_r13_tiers as base

    saved = base.STAGED
    try:
        base.STAGED = staged_r14.STAGED
        run(ops, tiers)
    finally:
        base.STAGED = saved


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", action="store_true")
    ap.add_argument("--tpch", action="store_true")
    ap.add_argument("--emb", action="store_true")
    args = ap.parse_args()
    if args.events:
        run_r14(EVENTS_OPS, EV_TIERS)
    if args.tpch:
        run_r14(TPCH_OPS, TPCH_TIERS)
    if args.emb:
        run_r14(EMB_OPS, EMB_TIERS)
