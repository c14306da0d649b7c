"""Connected-components clustering + IVF search tests."""

from __future__ import annotations

from ror_etl_spark.operators.components import connected_components, dedup_clusters
from ror_etl_spark.operators.similarity import brute_force_topk, ivf_topk


def test_components_transitive_chain(spark):
    # A~B, B~C, D~E: clusters {1,2,3} and {4,5}; 3 and 1 never share a pair
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (4, 5)], "id_a long, id_b long"
    )
    res = connected_components(pairs)
    labels = {r["id"]: r["component"] for r in res.labels.collect()}
    assert labels == {1: 1, 2: 1, 3: 1, 4: 4, 5: 4}
    assert res.converged


def test_components_star_and_bridge(spark):
    # star around 10 plus a bridge 3-20 merging two stars
    pairs = spark.createDataFrame(
        [(10, 11), (10, 12), (10, 3), (20, 21), (3, 20)], "id_a long, id_b long"
    )
    labels = {r["id"]: r["component"] for r in connected_components(pairs).labels.collect()}
    assert set(labels.values()) == {3}


def test_dedup_clusters_with_singletons(spark):
    docs = spark.createDataFrame([(i,) for i in range(1, 7)], "doc_id long")
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")
    out = {r["id"]: (r["cluster"], r["is_keeper"]) for r in dedup_clusters(docs, pairs).collect()}
    assert out[1] == (1, True) and out[2] == (1, False) and out[3] == (1, False)
    for singleton in (4, 5, 6):
        assert out[singleton] == (singleton, True)


def _corpus(spark):
    rows = [(i, [float(i % 7), float((i * 3) % 5), 1.0, 0.5]) for i in range(40)]
    rows.append((100, [1.0, 0.0, 0.0, 0.0]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_ivf_topk_contains_true_top1(spark):
    corpus = _corpus(spark)
    q = [1.0, 0.0, 0.0, 0.0]
    true_top = brute_force_topk(corpus, q, k=1).collect()[0]
    got = ivf_topk(corpus, q, k=5, n_centroids=8, nprobe=4).collect()
    assert true_top["vec_id"] in {r["vec_id"] for r in got}


def test_ivf_probe_restriction_reduces_candidates(spark):
    corpus = _corpus(spark)
    q = [1.0, 0.0, 0.0, 0.0]
    all_cells = ivf_topk(corpus, q, k=100, n_centroids=8, nprobe=8).count()
    few_cells = ivf_topk(corpus, q, k=100, n_centroids=8, nprobe=2).count()
    assert few_cells < all_cells


def test_dedup_clusters_nonconvergence_raises_or_alerts(spark):
    import pytest

    from ror_etl_spark.operators.components import ConvergenceError, dedup_clusters

    # a 30-edge path graph has diameter 30 > max_iters=3
    docs = spark.createDataFrame([(i,) for i in range(31)], "doc_id long")
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(30)], "id_a long, id_b long"
    )
    with pytest.raises(ConvergenceError, match="diameter"):
        dedup_clusters(docs, pairs, max_iters=3).collect()

    alerts: list[str] = []
    out = dedup_clusters(docs, pairs, max_iters=3, alert=alerts.append)
    assert out.count() == 31  # alert-and-continue still yields labels
    assert len(alerts) == 1 and "diameter" in alerts[0]

    # with enough rounds the same graph converges to one cluster, silently
    alerts.clear()
    ok = dedup_clusters(docs, pairs, max_iters=40, alert=alerts.append)
    assert alerts == []
    assert {r["cluster"] for r in ok.collect()} == {0}


def test_bloom_prefilter_is_transparent_and_selective(spark):
    """The bloom rewrite must (a) produce the identical aggregate as the
    plain semi-join and (b) actually filter: the pre-filtered scan keeps
    every true match plus only a small false-positive tail."""
    from pyspark.sql import functions as F

    from ror_etl_spark.registry import QUERIES, load_all
    from ror_etl_spark.tables import Tables
    from tests.conftest import SF_SMALL

    load_all()
    got = QUERIES["bloom_prefilter_join"](spark, SF_SMALL).collect()[0]
    t = Tables(spark, SF_SMALL)
    keys = t.orders.filter(F.col("o_orderstatus") == "P").select("o_orderkey")
    li = t.lineitem
    semi = li.join(keys, li["l_orderkey"] == keys["o_orderkey"], "left_semi")
    plain = semi.agg(
        F.count(F.lit(1)).alias("n_items"),
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
        .alias("revenue"),
    ).collect()[0]
    assert got["n_items"] == plain["n_items"]
    assert abs(got["revenue"] - plain["revenue"]) < 0.01
    # every true match survives the bloom (no false negatives by
    # construction), and the final count equals the exact semi-join
    assert got["n_items"] == semi.count()


def test_cms_never_underestimates_and_replays_in_python(spark):
    """CMS invariant (est >= true, always) plus an exact Python replay of
    the 4x1024 sketch."""
    import hashlib
    from collections import Counter

    from ror_etl_spark.registry import QUERIES, load_all
    from ror_etl_spark.tables import Tables
    from tests.conftest import SF_SMALL

    load_all()
    rows = QUERIES["sketch_count_min_heavy_hitters"](spark, SF_SMALL).collect()
    assert rows
    true = Counter(
        r["user_id"] for r in Tables(spark, SF_SMALL).events
        .select("user_id").collect()
    )
    counters = [Counter() for _ in range(4)]
    for u, n in true.items():
        for d in range(4):
            b = int(hashlib.md5(f"{d}:{u}".encode()).hexdigest()[:8], 16) % 1024
            counters[d][b] += n
    for r in rows:
        assert r["overestimate"] >= 0
        assert r["true_n"] == true[r["user_id"]]
        est = min(
            counters[d][
                int(hashlib.md5(f"{d}:{r['user_id']}".encode()).hexdigest()[:8], 16)
                % 1024
            ]
            for d in range(4)
        )
        assert r["est_n"] == est


def test_pps_sample_replays_and_skews_toward_heavy_docs(spark):
    """Exact Python replay of the A-ES ranking, plus the PPS property:
    the sampled docs' mean weight must exceed the corpus mean (long
    docs are proportionally likelier)."""
    import hashlib
    import math

    from ror_etl_spark.registry import QUERIES, load_all
    from ror_etl_spark.tables import Tables
    from tests.conftest import SF_SMALL

    load_all()
    docs = Tables(spark, SF_SMALL).documents.select("doc_id", "n_chars").collect()
    keys = {}
    for r in docs:
        if r["n_chars"] <= 0:
            continue
        u = (int(hashlib.md5(str(r["doc_id"]).encode()).hexdigest()[:4], 16) + 1) / 65536.0
        keys[r["doc_id"]] = -math.log(u) / r["n_chars"]
    want = sorted(keys, key=lambda d: (keys[d], d))[:20]
    rows = QUERIES["sample_weighted_pps"](spark, SF_SMALL).collect()
    assert [r["doc_id"] for r in rows] == want
    assert [r["rank"] for r in rows] == list(range(1, 21))
    corpus_mean = sum(r["n_chars"] for r in docs) / len(docs)
    sample_mean = sum(r["n_chars"] for r in rows) / len(rows)
    assert sample_mean > corpus_mean
