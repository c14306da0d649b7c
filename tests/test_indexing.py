"""Independent-reference tests for the indexing/graph batch
(queries/indexing.py + bfs_levels_trade_graph): BFS vs a pure-Python
reference, negatives sanity, zone-map cross-check vs direct filters,
posting-cap semantics."""

from __future__ import annotations

from collections import deque

from ror_etl_spark.registry import QUERIES, load_all
from tests.conftest import SF_SMALL

load_all()

SF_MID = "/root/testdata/sf0.01"


def test_bfs_levels_match_python_bfs(spark):
    import pyspark.sql.functions as F

    from ror_etl_spark.tables import Tables

    t = Tables(spark, SF_MID)
    edges = (
        t.lineitem.join(t.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t.customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(t.supplier, F.col("s_suppkey") == F.col("l_suppkey"))
        .where(F.col("s_nationkey") != F.col("c_nationkey"))
        .groupBy(F.col("s_nationkey").alias("u"), F.col("c_nationkey").alias("v"))
        .agg(F.count(F.lit(1)).alias("w"))
        .collect()
    )
    by_u: dict[int, list] = {}
    for r in edges:
        by_u.setdefault(r["u"], []).append((-r["w"], r["v"]))
    adj = {u: [v for _, v in sorted(nbrs)[:3]] for u, nbrs in by_u.items()}
    levels = {0: 0}
    q = deque([0])
    while q:
        n = q.popleft()
        for v in adj.get(n, []):
            if v not in levels:
                levels[v] = levels[n] + 1
                q.append(v)
    got = {
        r["nationkey"]: r["level"]
        for r in QUERIES["bfs_levels_trade_graph"](spark, SF_MID).collect()
    }
    assert got == {k: v for k, v in levels.items() if v <= 8}
    assert max(got.values()) >= 2  # fixture actually has multi-hop structure


def test_contrastive_negatives_distinct_and_never_anchor(spark):
    rows = QUERIES["contrastive_negatives_sample"](spark, SF_SMALL).collect()
    by_anchor: dict[int, list] = {}
    for r in rows:
        by_anchor.setdefault(r["doc_id"], []).append(r["neg_doc_id"])
    n_docs = len(by_anchor)
    assert len(rows) == 3 * n_docs
    for anchor, negs in by_anchor.items():
        assert len(negs) == 3 and len(set(negs)) == 3
        assert anchor not in negs
    # hash offsets actually vary across anchors (not one constant stride)
    strides = {tuple(sorted(v)) for v in by_anchor.values()}
    assert len(strides) > n_docs // 2


def test_zone_map_report_matches_direct_filters(spark):
    import pyspark.sql.functions as F

    from ror_etl_spark.tables import Tables

    rows = {
        (r["layout"], r["predicate"]): r
        for r in QUERIES["zone_map_pruning_report"](spark, SF_SMALL).collect()
    }
    assert len(rows) == 4
    o = Tables(spark, SF_SMALL).orders
    total = o.count()
    # month layout must make the 1996 date predicate near-perfectly
    # prunable: scanned fraction == true selectivity (no false keeps)
    sel_1996 = (
        o.where(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
        ).count()
        / total
    )
    m_date = rows[("month", "date_1996")]
    assert abs(m_date["scan_fraction"] - sel_1996) < 1e-3
    # and the uncorrelated pairs prune nothing
    assert rows[("month", "price_gt_400k")]["n_pruned"] == 0
    assert rows[("price_bucket", "date_1996")]["n_pruned"] == 0
    # price layout prunes most shards for the price predicate
    p_price = rows[("price_bucket", "price_gt_400k")]
    assert p_price["n_pruned"] > p_price["n_shards"] // 2


def test_inverted_index_postings_capped_and_consistent(spark):
    rows = QUERIES["inverted_index_postings"](spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        ids = [int(x) for x in r["postings_head"].split(",")]
        assert ids == sorted(ids) and len(ids) == len(set(ids))
        assert len(ids) == min(r["df"], 10)
        assert r["cf"] >= r["df"] >= 1


def test_join_cardinality_actual_is_exact_and_estimates_bracket(spark):
    from collections import Counter

    rows = {
        r["method"]: r["est_rows"]
        for r in QUERIES["join_cardinality_estimate"](spark, SF_SMALL).collect()
    }
    e = spark.read.parquet(f"{SF_SMALL}/events.parquet")
    counts = Counter(r["user_id"] for r in e.select("user_id").collect())
    assert rows["actual"] == sum(c * c for c in counts.values())
    # uniform assumption can only under- or exactly estimate sum(c^2)
    # (Cauchy-Schwarz); the heavy-hitter correction moves toward actual
    assert rows["uniform"] <= rows["actual"]
    assert abs(rows["topk_corrected"] - rows["actual"]) <= abs(
        rows["uniform"] - rows["actual"]
    )


def test_pmi_matches_python_reference(spark):
    import math
    from collections import Counter

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").collect()
    uni: Counter = Counter()
    pairs: Counter = Counter()
    for r in docs:
        ts = [t for t in " ".join(r["text"].lower().split()).split(" ") if t]
        uni.update(ts)
        for k in (1, 2):
            pairs.update(zip(ts[:-k], ts[k:]))
    t = sum(uni.values())
    p = sum(pairs.values())
    expect = {}
    for (w1, w2), n in pairs.items():
        if n >= 5:
            expect[(w1, w2)] = round(
                math.log((n * t * t) / (p * uni[w1] * uni[w2])) + 1e-9, 4
            )
    got = QUERIES["cooccurrence_pmi_topk"](spark, SF_SMALL).collect()
    assert len(got) == min(50, len(expect))
    top = sorted(expect.items(), key=lambda kv: (-kv[1], kv[0]))[: len(got)]
    for row, ((w1, w2), pmi) in zip(got, top):
        assert (row["w1"], row["w2"]) == (w1, w2)
        assert abs(row["pmi"] - pmi) < 5e-4


def test_global_rank_equals_single_task_window(spark):
    import pyspark.sql.functions as F
    from pyspark.sql import Window as W

    from ror_etl_spark.operators.util import global_rank

    df = spark.range(0, 997).select(
        (F.col("id") * 2654435761 % 1000003).alias("k"), F.col("id").alias("id")
    )
    expect = {
        (r["k"], r["id"]): r["pos"]
        for r in df.withColumn(
            "pos", F.row_number().over(W.orderBy("k", "id")) - 1
        ).collect()
    }
    got = {
        (r["k"], r["id"]): r["pos"]
        for r in global_rank(df, "k", "id", out="pos", n_parts=7).collect()
    }
    assert got == expect


def test_systematic_sample_exact_size_and_spacing(spark):
    rows = QUERIES["sample_systematic_every_k"](spark, SF_SMALL).collect()
    n = spark.read.parquet(f"{SF_SMALL}/customer.parquet").count()
    assert len(rows) == (n + 49) // 50
    assert [r["pos"] for r in rows] == list(range(0, n, 50))
    assert len({r["c_custkey"] for r in rows}) == len(rows)


def test_quantile_normalize_is_uniform_and_monotone(spark):
    rows = QUERIES["quantile_normalize_acctbal"](spark, SF_SMALL).collect()
    n = len(rows)
    qs = sorted(r["q"] for r in rows)
    assert qs[0] == 0.0 and abs(qs[-1] - 1.0) < 1e-6
    # rank transform is monotone in the source value
    by_val = sorted(rows, key=lambda r: (r["acctbal"], r["c_custkey"]))
    assert all(
        a["q"] <= b["q"] + 1e-9 for a, b in zip(by_val, by_val[1:])
    )
    # uniform: mean q ~ 0.5
    assert abs(sum(qs) / n - 0.5) < 0.01


def test_fd_report_flags_known_violations(spark):
    rows = {r["fd"]: r for r in QUERIES["fd_violation_report"](spark, SF_SMALL).collect()}
    assert len(rows) == 3
    # a repeat customer's orders change status across time — violated
    assert rows["o_custkey->o_orderstatus"]["n_violating"] > 0
    # 5 priorities vs 3 statuses: every priority sees every status
    pr = rows["o_orderpriority->o_orderstatus"]
    assert pr["n_violating"] == pr["n_lhs"]
    for r in rows.values():
        assert 0.0 <= r["violation_rate"] <= 1.0


def test_correlation_matrix_matches_numpy(spark):
    import numpy as np

    li = (
        spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
        .select("l_quantity", "l_extendedprice", "l_discount", "l_tax")
        .toPandas()
    )
    got = {
        (r["col_a"], r["col_b"]): r["corr"]
        for r in QUERIES["correlation_matrix_lineitem"](spark, SF_SMALL).collect()
    }
    assert len(got) == 6
    for (a, b), c in got.items():
        expect = float(np.corrcoef(li[a], li[b])[0, 1])
        assert abs(c - expect) < 1e-5


def test_snapshot_diff_counts_reconcile(spark):
    rows = {
        r["change_type"]: r
        for r in QUERIES["snapshot_diff_orders"](spark, SF_SMALL).collect()
    }
    assert set(rows) == {"added", "removed", "changed", "unchanged"}
    o = spark.read.parquet(f"{SF_SMALL}/orders.parquet")
    n = o.count()
    # A-side rows partition into removed/changed/unchanged
    assert (
        rows["removed"]["n"] + rows["changed"]["n"] + rows["unchanged"]["n"] == n
    )
    assert rows["added"]["first_key"] < 0  # inserted rows are negative-key


def test_nucleus_vocab_is_minimal_prefix(spark):
    from collections import Counter

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").collect()
    by_lang: dict[str, Counter] = {}
    for r in docs:
        ts = [t for t in " ".join(r["text"].lower().split()).split(" ") if t]
        by_lang.setdefault(r["lang"], Counter()).update(ts)
    got = {r["lang"]: r for r in QUERIES["vocab_nucleus_topp"](spark, SF_SMALL).collect()}
    assert set(got) == set(by_lang)
    for lang, cnt in by_lang.items():
        t = sum(cnt.values())
        toks = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
        run = 0
        kept = 0
        for _, c in toks:
            if run < 0.9 * t:
                kept += 1
            run += c
        assert got[lang]["vocab_kept"] == kept
        assert got[lang]["vocab_total"] == len(toks)
        assert got[lang]["mass_kept"] >= 0.9 - 1e-9


def test_bootstrap_ci_replays_exactly_in_python(spark):
    import hashlib

    rows = spark.read.parquet(f"{SF_SMALL}/orders.parquet").select(
        "o_orderkey", "o_totalprice"
    ).collect()
    TH = [
        (0.36787944117144233, 0),
        (0.7357588823428847, 1),
        (0.9196986029286058, 2),
        (0.9810118431238462, 3),
        (0.9963401531726563, 4),
    ]

    def pois(u):
        for t, w in TH:
            if u < t:
                return w
        return 5

    means = []
    for b in range(32):
        sw = swx = 0
        for r in rows:
            h = hashlib.md5(f"{r['o_orderkey']}:{b}".encode()).hexdigest()
            u = int(h[:13], 16) / float(1 << 52)
            w = pois(u)
            sw += w
            swx += w * r["o_totalprice"]
        means.append(swx / sw)
    means.sort()
    # percentile_disc(q) = smallest value at cumulative fraction >= q
    import math

    lo = means[math.ceil(0.025 * 32) - 1]
    hi = means[math.ceil(0.975 * 32) - 1]
    got = QUERIES["bootstrap_mean_ci_revenue"](spark, SF_SMALL).collect()[0]
    assert abs(got["ci_lo"] - round(lo + 1e-9, 4)) < 1e-6
    assert abs(got["ci_hi"] - round(hi + 1e-9, 4)) < 1e-6
    assert got["ci_lo"] <= got["mean"] <= got["ci_hi"]


def test_robust_means_bracket_and_count_tails(spark):
    got = QUERIES["robust_mean_revenue"](spark, SF_SMALL).collect()[0]
    n = spark.read.parquet(f"{SF_SMALL}/orders.parquet").count()
    # ~10% of rows are at-or-beyond the 5%/95% cut values
    assert 0.05 * n < got["n_tail"] < 0.2 * n
    lo = min(got["mean_raw"], got["mean_trimmed"], got["mean_winsorized"])
    hi = max(got["mean_raw"], got["mean_trimmed"], got["mean_winsorized"])
    # winsorized lies between trimmed and raw by construction
    assert lo <= got["mean_winsorized"] <= hi


def test_bloom_fpr_close_to_load_factor_prediction(spark):
    got = QUERIES["bloom_fpr_calibration"](spark, SF_SMALL).collect()[0]
    assert got["n_build"] > 0 and got["n_probes"] > 0
    assert 0 < got["set_bits"] <= 16384
    assert 0.0 <= got["fpr_measured"] <= 1.0
    # measured FPR within a small absolute band of (set_bits/m)^k —
    # binomial noise at n_probes ~ thousands
    import math

    sigma = math.sqrt(
        max(got["fpr_expected"] * (1 - got["fpr_expected"]), 1e-9)
        / got["n_probes"]
    )
    assert abs(got["fpr_measured"] - got["fpr_expected"]) < 5 * sigma + 1e-3


def test_bootstrap_hex_case_matches_u_case(spark):
    """The r12 hex-string Poisson CASE must agree with the u-based CASE
    it replaced on every boundary's neighbours (where a rounding slip
    would flip the weight) and on the domain endpoints."""
    from pyspark.sql import functions as F

    from ror_etl_spark.queries.stats import (
        _P_THRESH,
        _SCALE,
        _hex_boundary,
        _poisson_case_hex_sql,
        _poisson_case_sql,
    )

    hs = []
    for t, _ in _P_THRESH:
        b = int(_hex_boundary(float(t)), 16)
        hs += [max(b - 1, 0), b, min(b + 1, (1 << 52) - 1)]
    hs += [0, (1 << 52) - 1, 0x123456789ABCD]
    df = spark.createDataFrame(
        [(format(h, "013x"), float(h) / _SCALE) for h in hs], "h: string, u: double"
    )
    rows = df.select(
        "h",
        F.expr(_poisson_case_sql("u")).alias("wu"),
        F.expr(_poisson_case_hex_sql("h")).alias("wh"),
    ).collect()
    for r in rows:
        assert r["wu"] == r["wh"], r
