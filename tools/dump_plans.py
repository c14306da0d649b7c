"""Regenerate PLANS.md: physical-plan evidence for representative queries.

Usage: python tools/dump_plans.py [--sf /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PICKS = {
    "q1_pricing_summary": "scan-heavy aggregate: pushdown + pruning + partial/final HashAggregate",
    "q5_local_supplier_volume": "6-way star join: every dimension broadcast, facts never shuffle for dims",
    "topk_global": "global top-k: TakeOrderedAndProject, no full sort",
    "ultimate_parent_rollup": "iterative fixpoint: checkpointed RDD scans (truncated lineage)",
    "dedup_minhash_lsh": "LSH funnel: signatures cached (InMemoryTableScan), candidate join on banded buckets",
    "q8_market_share": "8-table star: 4+ BroadcastHashJoins, only fact-side edges shuffle",
    "q21_waiting_supplier": "EXISTS/NOT EXISTS as LeftSemi/LeftAnti self-joins co-partitioned on l_orderkey",
    "text_chunk_documents": "LLM chunking entirely in codegen: split/sequence/explode/slice, no Python",
    "lateral_top_event_per_user": "correlated LATERAL decorrelated by Catalyst (no per-row execution)",
    "bitmap_distinct_users": "exact COUNT(DISTINCT) as two-level bitmap aggregate",
    "dedup_winnow_pairs": "winnowing near-dup: outer-explode (no pushed re-eval), window min, capped fp self-join",
    "pack_token_bins": "token packing: keyed cumsum window, single shuffle per source partition",
    "sample_hash_bernoulli": "deterministic sampling: md5 filter evaluated post-scan, pure codegen",
    "pagerank_nation_trade": "iterative PageRank: per-iteration single shuffle (join on u, reduce on v), checkpointed edge fractions",
    "equidepth_bin_assign": "equi-depth binning: exact decile bounds as 1-row broadcast, no global sort of the fact side",
    "text_repetition_filter": "Gopher repetition rule: fan-out repartition, explode, two map-side-combined aggregations",
    "salted_join_segment_revenue": "8-way salted join: dim exploded per salt, fact hot keys spread across reducers",
    "dedup_prefix_filter_jaccard": "exact similarity join: prefix-bucket candidates (no NLJ), forward-index verify via array_intersect (r5 rewrite)",
    "fuzzy_dedup_sorted_neighborhood": "sorted-neighborhood: range-partitioned distributed sort + per-pid window, broadcast boundary overlap (r5 rewrite)",
    "multimodal_frame_sample_stats": "APNG frame sampling: metadata-pruned scan feeding chained Arrow-batched mapInPandas stages",
    "dedup_events_debounce": "stateful debounce: ONE hash exchange + partition-local sort feeding a single MapInPandas (no per-group pandas)",
    "skyline_pareto_parts": "Pareto skyline: per-cost max aggregate, distributed exclusive cummax, broadcast frontier join-back",
    "scd2_point_in_time_join": "PIT join as as-of: union + per-key window, no range-join explosion",
    "market_basket_lift": "basket pair mining: map-side C(k,2) explode, broadcast supports, TakeOrdered top-40",
    "best_split_gini_totalprice": "tree split finding: prefix class counts via range-partitioned cumsum, TakeOrdered argmin",
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from ror_etl_spark import registry
    from ror_etl_spark.session import get_spark

    registry.load_all()
    spark = get_spark("dump_plans")
    # reveal the real plan under queries/util.ordered(): its lazy
    # localCheckpoint otherwise truncates explain() to a LogicalRDD scan
    spark.conf.set("spark.ror.ordered.checkpoint", "false")

    out = [
        "# PLANS — physical-plan evidence for the headline shapes",
        "",
        'Generated from `.explain("formatted")` at sf0.1 (regenerate with',
        "`python tools/dump_plans.py`). The invariants asserted in",
        "`tests/test_plan_invariants.py` are visible here.",
        "",
    ]
    for name, why in PICKS.items():
        df = registry.QUERIES[name](spark, args.sf)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        lines = buf.getvalue().splitlines()
        tree_end = next(
            (i for i, l in enumerate(lines) if l.strip() == "" and i > 3), len(lines)
        )
        details = [
            l
            for l in lines
            if any(k in l for k in ("PushedFilters", "ReadSchema", "Arguments: [plan"))
        ]
        out += [f"## {name}", "", f"*{why}*", "", "```"]
        out += lines[:tree_end][:40]
        if details:
            out += ["...", *details[:8]]
        out += ["```", ""]

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print(f"wrote PLANS.md ({len(out)} lines)")


if __name__ == "__main__":
    main()
