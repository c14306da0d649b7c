"""Semantic tests for the LLM-prep and engine-ops query families (round 4).

The driver gate already hash-checks these against DuckDB oracles; the
tests here pin the SEMANTICS (invariants the oracle replay alone can't
distinguish from a consistently-wrong implementation on both sides).
"""

from __future__ import annotations

import math
import re

import pytest
from pyspark.sql import functions as F

from ror_etl_spark.registry import QUERIES, load_all
from ror_etl_spark.tables import Tables
from tests.conftest import SF_SMALL

load_all()


def test_boilerplate_ngrams_are_real_phrases(spark):
    rows = QUERIES["text_boilerplate_ngrams"](spark, SF_SMALL).collect()
    assert rows, "threshold should fire on the synthetic corpus"
    docs = [r["text"] for r in Tables(spark, SF_SMALL).documents.collect()]
    for r in rows[:5]:
        assert len(r["phrase"].split(" ")) == 3
        n_docs_exact = sum(1 for t in docs if r["phrase"] in t)
        # containment can over-count (phrase inside a longer run still
        # tokenizes identically here) — it is a lower-bound sanity check
        assert n_docs_exact >= r["n_docs"] >= 5


def test_repetition_filter_flags_match_share(spark):
    for r in QUERIES["text_repetition_filter"](spark, SF_SMALL).collect():
        assert 0 < r["top_share"] <= 1
        assert r["is_repetitive"] == (r["top_share"] >= 0.05 or
                                      (abs(r["top_share"] - 0.05) < 5e-5))


def test_token_entropy_bounds(spark):
    for r in QUERIES["text_token_entropy"](spark, SF_SMALL).collect():
        assert r["token_entropy"] >= 0
        assert r["token_entropy"] <= math.log2(r["n_unique"]) + 1e-6


def test_c4_keep_is_conjunction(spark):
    rows = QUERIES["c4_quality_rules"](spark, SF_SMALL).collect()
    assert any(r["keep"] for r in rows)
    for r in rows:
        assert r["keep"] == (r["len_ok"] and r["word_len_ok"] and r["lang_ok"])


def test_pii_redaction_removes_digit_runs(spark):
    rows = QUERIES["pii_redact_customers"](spark, SF_SMALL).collect()
    assert all(not re.search(r"[0-9]{6,}", r["redacted"]) for r in rows)
    assert all((("[ID]" in r["redacted"]) == (r["n_id_runs"] > 0)) for r in rows)
    assert any(r["n_id_runs"] > 0 for r in rows)


def test_pagerank_mass_and_positivity(spark):
    rows = QUERIES["pagerank_nation_trade"](spark, SF_SMALL).collect()
    assert len(rows) == 25
    total = sum(r["pagerank"] for r in rows)
    # teleport mass is exact; link mass can leak via dangling nations only
    assert 0.14 < total <= 1.0 + 1e-6
    assert all(r["pagerank"] > 0 for r in rows)


def test_salted_join_equals_plain_join(spark):
    t = Tables(spark, SF_SMALL)
    got = {
        (r["c_mktsegment"], r["n_orders"], r["revenue"])
        for r in QUERIES["salted_join_segment_revenue"](spark, SF_SMALL).collect()
    }
    plain = {
        (r["c_mktsegment"], r["n_orders"], r["revenue"])
        for r in t.orders.join(
            t.customer, F.col("o_custkey") == F.col("c_custkey")
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
        .collect()
    }
    assert got == plain


def test_column_profile_matches_direct_aggregates(spark):
    o = Tables(spark, SF_SMALL).orders
    n = o.count()
    prof = {r["col"]: r for r in QUERIES["column_profile_orders"](spark, SF_SMALL).collect()}
    assert set(prof) == {
        "o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority", "o_totalprice",
    }
    assert all(r["n"] == n for r in prof.values())
    assert prof["o_orderkey"]["n_distinct"] == n  # primary key
    assert int(prof["o_orderkey"]["min_v"]) <= int(prof["o_orderkey"]["max_v"])


def test_bottomk_quantile_sketch_within_rank_error(spark):
    row = QUERIES["quantile_sketch_bottomk"](spark, SF_SMALL).collect()[0]
    e = Tables(spark, SF_SMALL).events
    n = e.count()
    assert row["n"] == n
    values = sorted(r["value"] for r in e.select("value").collect())
    # k=4096 ≥ n at this SF → the sample is the full data → exact ranks;
    # allow interpolation slack of one position either side
    eps = 0.005 if n <= 4096 else 0.03
    for q, got in ((0.5, row["p50"]), (0.9, row["p90"]), (0.99, row["p99"])):
        lo = values[max(0, int((q - eps) * n) - 1)]
        hi = values[min(n - 1, int((q + eps) * n))]
        assert lo <= got <= hi, (q, got, lo, hi)


def test_kmv_estimator_accuracy_above_capacity(spark):
    """Force the KMV estimate path (k << distinct) and bound its error:
    synthetic 20k distinct ids against k=256 → rel error ≲ 3/sqrt(k)."""
    from ror_etl_spark.queries.temporal import _kmv_hash

    df = spark.range(20000).select(F.col("id").cast("string").alias("s"))
    k = 256
    bk = (
        df.select(_kmv_hash(F.col("s")).alias("h"))
        .distinct()
        .orderBy("h")
        .limit(k)
    )
    hk = bk.agg(F.max("h").alias("m")).collect()[0]["m"]
    est = (k - 1) / hk
    assert abs(est - 20000) / 20000 < 3 / math.sqrt(k)


def test_zorder_key_locality(spark):
    """Morton-adjacent keys must be close in both dimensions: decoding the
    zkey recovers the masked inputs exactly."""
    rows = QUERIES["zorder_cluster_key"](spark, SF_SMALL).collect()
    assert rows
    for r in rows[:50]:
        z = r["zkey"]
        a = sum(((z >> (2 * i)) & 1) << i for i in range(10))
        b = sum(((z >> (2 * i + 1)) & 1) << i for i in range(10))
        assert b == r["o_orderkey"] & 1023
        assert 0 <= a < 1024


def test_triangle_count_matches_bruteforce(spark):
    from itertools import combinations

    t = Tables(spark, SF_SMALL)
    got = QUERIES["triangle_count_nations"](spark, SF_SMALL).collect()[0]["n_triangles"]
    edges = {
        (min(r["s_nationkey"], r["c_nationkey"]), max(r["s_nationkey"], r["c_nationkey"]))
        for r in t.lineitem.join(t.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t.customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(t.supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .filter(F.col("s_nationkey") != F.col("c_nationkey"))
        .select("s_nationkey", "c_nationkey").distinct().collect()
    }
    nodes = sorted({x for e in edges for x in e})
    brute = sum(
        1
        for a, b, c in combinations(nodes, 3)
        if (a, b) in edges and (b, c) in edges and (a, c) in edges
    )
    assert got == brute


def test_equidepth_bins_are_balanced(spark):
    rows = QUERIES["equidepth_bin_assign"](spark, SF_SMALL).collect()
    n = sum(r["n"] for r in rows)
    assert len(rows) == 10
    for r in rows:
        assert abs(r["n"] - n / 10) <= max(2, 0.02 * n)  # exact deciles ±ties
        assert r["mn"] <= r["mx"]


def test_train_test_split_disjoint_and_stable(spark):
    rows = {r["split"]: r["n"] for r in QUERIES["train_test_split_assign"](spark, SF_SMALL).collect()}
    total = sum(rows.values())
    assert total == Tables(spark, SF_SMALL).documents.count()
    assert 0.04 * total < rows.get("test", 0) < 0.20 * total


def test_data_quality_report_detects_fixture_state(spark):
    """The fixture is clean on nulls/domains/referential integrity but
    (l_orderkey, l_linenumber) is NOT unique in the synthetic lineitem —
    the report must surface that violation, not assume a clean PK."""
    r = QUERIES["data_quality_report"](spark, SF_SMALL).collect()[0]
    li = Tables(spark, SF_SMALL).lineitem
    assert r["n_rows"] == li.count() > 0
    assert r["n_null_qty"] == 0
    assert r["n_bad_discount"] == 0
    assert r["n_orphans"] == 0
    dup_direct = (
        li.groupBy("l_orderkey", "l_linenumber")
        .count()
        .filter(F.col("count") > 1)
        .count()
    )
    assert r["n_dup_lines"] == dup_direct > 0


def test_prefix_filter_jaccard_exact_and_complete(spark):
    """Prefix filtering must be lossless: compare against a brute-force
    all-pairs Jaccard computed with plain array ops on the same shingles."""
    from ror_etl_spark.queries.dedup import shingles

    d = Tables(spark, SF_SMALL).documents.limit(120)
    sh = {
        r["doc_id"]: set(r["s"])
        for r in d.select(
            "doc_id", F.array_distinct(shingles(F.col("text"), 3)).alias("s")
        ).collect()
    }
    brute = {}
    ids = sorted(sh)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            inter = len(sh[a] & sh[b])
            jac = inter / (len(sh[a]) + len(sh[b]) - inter)
            if jac >= 0.6:
                brute[(a, b)] = round(jac, 4)
    got = {
        (r["id_a"], r["id_b"]): r["jac"]
        for r in QUERIES["dedup_prefix_filter_jaccard"](spark, SF_SMALL).collect()
        if r["id_a"] in sh and r["id_b"] in sh
    }
    assert got == brute


def test_decontamination_flags_real_overlap(spark):
    """Flagged docs must genuinely share >= 3 distinct 5-grams with the
    eval slice (doc_id < 25), verified against in-memory set math."""
    rows = QUERIES["decontaminate_ngram_overlap"](spark, SF_SMALL).collect()
    assert rows, "synthetic corpus contains planted near-dups of early docs"
    docs = {
        r["doc_id"]: r["text"].split(" ")
        for r in Tables(spark, SF_SMALL).documents.collect()
    }

    def grams(toks):
        return {" ".join(toks[i:i + 5]) for i in range(len(toks) - 4)}

    eval_g = set().union(*(grams(t) for i, t in docs.items() if i < 25))
    for r in rows:
        shared = len(grams(docs[r["doc_id"]]) & eval_g)
        assert shared == r["n_shared"] >= 1
        assert r["contaminated"] == (shared >= 3)


def test_interpolation_is_linear_and_anchored(spark):
    rows = QUERIES["interpolate_hourly_gaps"](spark, SF_SMALL).collect()
    assert len(rows) == 48
    assert any(r["was_gap"] for r in rows) and any(not r["was_gap"] for r in rows)
    vals = [r["filled"] for r in rows]
    assert all(v is not None for v in vals)
    # every gap value must lie within [min, max] of the observed anchors
    observed = [r["filled"] for r in rows if not r["was_gap"]]
    lo, hi = min(observed), max(observed)
    for r in rows:
        if r["was_gap"]:
            assert lo - 1e-9 <= r["filled"] <= hi + 1e-9


def test_iqr_outlier_counts_match_direct(spark):
    e = Tables(spark, SF_SMALL).events
    got = {r["event_type"]: r for r in QUERIES["outlier_iqr_events"](spark, SF_SMALL).collect()}
    import numpy as np

    for etype, r in got.items():
        vals = np.array(
            [x["value"] for x in e.filter(F.col("event_type") == etype).collect()]
        )
        q1, q3 = np.percentile(vals, [25, 75])
        iqr = q3 - q1
        n_out = int(((vals < q1 - 1.5 * iqr) | (vals > q3 + 1.5 * iqr)).sum())
        assert r["n"] == len(vals)
        assert r["n_outliers"] == n_out
        assert abs(r["q1"] - q1) < 1e-3 and abs(r["q3"] - q3) < 1e-3


def test_llm_corpus_pipeline_funnel_is_monotone(spark):
    """Each funnel stage only removes documents; the final split counts
    must be consistent with the standalone stage queries."""
    rows = {r["split"]: r for r in QUERIES["llm_corpus_pipeline"](spark, SF_SMALL).collect()}
    total_out = sum(r["n_docs"] for r in rows.values())
    n_docs = Tables(spark, SF_SMALL).documents.count()
    kept = sum(1 for r in QUERIES["c4_quality_rules"](spark, SF_SMALL).collect() if r["keep"])
    assert 0 < total_out <= kept <= n_docs
    assert set(rows) <= {"train", "test"}
    assert all(r["n_tokens"] >= r["n_docs"] * 50 for r in rows.values())


def test_corpus_shard_shuffle_stable_under_repartition(spark):
    """Shard assignment and intra-shard order are content-hash-derived,
    so physical partitioning must not change the result — the property
    a rand()-based shuffle lacks. Epoch re-salting changes the
    permutation but not the shard membership."""
    from ror_etl_spark.registry import QUERIES, load_all

    load_all()
    fn = QUERIES["corpus_shard_shuffle"]
    a = [(r["shard"], r["shard_pos"], r["doc_id"]) for r in fn(spark, "/root/testdata/sf0.001").collect()]
    b = [(r["shard"], r["shard_pos"], r["doc_id"]) for r in fn(spark, "/root/testdata/sf0.001").collect()]
    assert a == b and len(a) == 500
    per_shard = {}
    for s, p, d in a:
        per_shard.setdefault(s, []).append(p)
    # every shard's positions are 1..n (a permutation, no gaps/dups)
    assert all(sorted(v) == list(range(1, len(v) + 1)) for v in per_shard.values())


def test_shard_manifest_detects_any_content_change(spark):
    """The manifest's defining property: order-free (XOR commutes) but
    content-sensitive — re-partitioning the corpus changes nothing,
    flipping one byte in one document changes that shard's checksum and
    only that shard's."""
    from pyspark.sql import functions as F

    from ror_etl_spark.registry import QUERIES, load_all
    from ror_etl_spark.tables import Tables
    from tests.conftest import SF_SMALL

    load_all()
    base = {r["shard"]: (r["xor_hi"], r["xor_lo"], r["n_docs"])
            for r in QUERIES["corpus_shard_manifest"](spark, SF_SMALL).collect()}
    assert sum(v[2] for v in base.values()) == \
        Tables(spark, SF_SMALL).documents.count()

    # independent python replay on a repartition-immune path
    import hashlib

    docs = Tables(spark, SF_SMALL).documents.select(
        "doc_id", "text", "n_chars"
    ).collect()
    repl = {}
    for r in docs:
        shard = int(hashlib.md5(str(r["doc_id"]).encode()).hexdigest()[:2], 16) % 16
        h = hashlib.md5(r["text"].encode()).hexdigest()
        hi, lo = int(h[:8], 16) & 0x7FFFFFFF, int(h[8:16], 16) & 0x7FFFFFFF
        chi, clo, n = repl.get(shard, (0, 0, 0))
        repl[shard] = (chi ^ hi, clo ^ lo, n + 1)
    assert {k: v for k, v in repl.items()} == base
