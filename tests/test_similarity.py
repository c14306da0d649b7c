"""Similarity-search operator tests on planted vectors."""

from __future__ import annotations

import math

from ror_etl_spark.operators.similarity import (
    all_pairs_above,
    brute_force_topk,
    lsh_topk,
    random_hyperplanes,
)


def _corpus(spark):
    # vec 1 ≈ query; vec 2 orthogonal-ish; vec 3 = −query; vec 4 near query
    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.0, 1.0, 0.0, 0.0]),
        (3, [-1.0, 0.0, 0.0, 0.0]),
        (4, [0.9, 0.1, 0.0, 0.0]),
        (5, [0.5, 0.5, 0.5, 0.5]),
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


QUERY = [1.0, 0.0, 0.0, 0.0]


def test_brute_force_topk_order_and_values(spark):
    top = brute_force_topk(_corpus(spark), QUERY, k=3).collect()
    assert [r["vec_id"] for r in top] == [1, 4, 5]
    assert top[0]["cos"] == 1.0
    assert abs(top[1]["cos"] - 0.9 / math.sqrt(0.81 + 0.01)) < 1e-6
    assert abs(top[2]["cos"] - 0.5) < 1e-6


def test_lsh_topk_finds_identical_vector(spark):
    # identical vector shares every hyperplane sign with the query
    top = lsh_topk(_corpus(spark), QUERY, k=2, n_planes=3).collect()
    assert top and top[0]["vec_id"] == 1 and top[0]["cos"] == 1.0


def test_lsh_bucket_excludes_antipode(spark):
    got = {r["vec_id"] for r in lsh_topk(_corpus(spark), QUERY, k=5, n_planes=3).collect()}
    assert 3 not in got  # −query flips every sign bit


def test_all_pairs_above_threshold(spark):
    pairs = {(r["id_a"], r["id_b"]): r["cos"] for r in all_pairs_above(_corpus(spark), 0.9).collect()}
    assert (1, 4) in pairs
    assert all(c >= 0.9 for c in pairs.values())
    assert (1, 3) not in pairs


def test_hyperplanes_deterministic():
    assert random_hyperplanes(8, 4, seed=7) == random_hyperplanes(8, 4, seed=7)
    assert random_hyperplanes(8, 4, seed=7) != random_hyperplanes(8, 4, seed=8)
    for plane in random_hyperplanes(16, 4):
        assert all(-1.0 <= x <= 1.0 for x in plane)


def _real_corpus(spark):
    from ror_etl_spark.tables import Tables
    from tests.conftest import SF_SMALL
    from pyspark.sql import functions as F

    emb = Tables(spark, SF_SMALL).embeddings
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    return emb.filter(F.col("vec_id") != 0), qv


def _recall_at_10(approx_rows, exact_rows):
    exact = {r["vec_id"] for r in exact_rows}
    return len({r["vec_id"] for r in approx_rows} & exact) / len(exact)


def test_multiprobe_recall_dominates_single_probe(spark):
    corpus, qv = _real_corpus(spark)
    exact = brute_force_topk(corpus, qv, k=10).collect()
    # recall@10 is monotone in the probe set: a candidate that displaces a
    # true top-10 item from the approx answer must outscore it, so it is
    # itself in the exact top-10. nprobe=16 probes everything → recall 1.
    recalls = [
        _recall_at_10(
            lsh_topk(corpus, qv, k=10, n_planes=4, nprobe=p).collect(), exact
        )
        for p in (1, 4, 16)
    ]
    assert recalls == sorted(recalls)
    assert recalls[-1] == 1.0
    assert recalls[1] > 0.0


def test_multiprobe_full_probe_equals_brute_force(spark):
    # probing every bucket = no restriction at all
    corpus, qv = _real_corpus(spark)
    exact = {r["vec_id"] for r in brute_force_topk(corpus, qv, k=10).collect()}
    full = {r["vec_id"] for r in lsh_topk(corpus, qv, k=10, n_planes=4, nprobe=16).collect()}
    assert full == exact


def test_kmeans_trained_ivf_recall(spark):
    from ror_etl_spark.operators.similarity import ivf_topk, kmeans_centroids

    corpus, qv = _real_corpus(spark)
    exact = brute_force_topk(corpus, qv, k=10).collect()
    trained = ivf_topk(corpus, qv, k=10, n_centroids=16, nprobe=2, train_iters=3).collect()
    # per-query recall dominance over the untrained quantizer is NOT a
    # theorem (training optimizes quantization error, not one query's
    # neighborhood) — assert the guarantees that do hold: probing finds
    # something real, and probing every cell is exhaustive.
    assert _recall_at_10(trained, exact) > 0.0
    full = ivf_topk(corpus, qv, k=10, n_centroids=16, nprobe=16, train_iters=3).collect()
    assert {r["vec_id"] for r in full} == {r["vec_id"] for r in exact}
    cents = kmeans_centroids(corpus, n_centroids=4, n_iters=2)
    assert len(cents) == 4 and all(len(c) == 64 for c in cents)


def test_kmeans_centroids_move_toward_data(spark):
    import math
    from ror_etl_spark.operators.similarity import kmeans_centroids
    from pyspark.sql import functions as F

    corpus, _ = _real_corpus(spark)
    init = kmeans_centroids(corpus, n_centroids=8, n_iters=0)
    trained = kmeans_centroids(corpus, n_centroids=8, n_iters=3)
    # quantization error (mean distance to nearest centroid) must not increase
    vecs = [
        [float(x) for x in r["embedding"]]
        for r in corpus.select("embedding").limit(200).collect()
    ]

    def qerr(cents):
        tot = 0.0
        for v in vecs:
            tot += min(
                math.fsum((a - b) ** 2 for a, b in zip(v, c)) for c in cents
            )
        return tot / len(vecs)

    assert qerr(trained) <= qerr(init) + 1e-9


def test_tuned_lsh_params_hold_candidate_growth_linear(spark):
    """Auto-tuned LSH parameters must keep candidate-pair counts ~linear
    in corpus size (fixed parameters grow them quadratically — the sf1
    rehearsal's x8-11 step), while still finding the planted near-dup
    pairs. Same generative family at n and 4n; the candidate ratio under
    tuning must come in well under the quadratic 16x."""
    import numpy as np

    from ror_etl_spark.operators.similarity import lsh_near_dup_pairs, tuned_lsh_params

    def corpus(n, seed):
        rng = np.random.default_rng(seed)
        base = rng.normal(size=(n, 16))
        base /= np.linalg.norm(base, axis=1, keepdims=True)
        # plant a near-dup twin for every 20th vector
        for i in range(0, n - 1, 20):
            base[i + 1] = base[i] + rng.normal(scale=0.02, size=16)
            base[i + 1] /= np.linalg.norm(base[i + 1])
        return spark.createDataFrame(
            [(i, [float(x) for x in row]) for i, row in enumerate(base)],
            "vec_id long, embedding array<double>",
        )

    threshold = 0.9
    counts = {}
    for n in (1500, 6000):
        t, p = tuned_lsh_params(n, threshold)
        df = corpus(n, 7)
        cands = lsh_near_dup_pairs(
            df, dim=16, threshold=threshold, n_tables=t, n_planes=p
        )
        found = {(r["id_a"], r["id_b"]) for r in cands.collect()}
        planted = {(i, i + 1) for i in range(0, n - 1, 20)}
        recall = len(found & planted) / len(planted)
        assert recall >= 0.85, (n, t, p, recall)
        # occupancy-normalized candidate volume: count in-bucket pairs
        # (pre-verify) the way the operator generates them
        from ror_etl_spark.operators.similarity import random_hyperplanes, _table_buckets_udf
        from pyspark.sql import functions as F

        tables = [random_hyperplanes(16, p, 101 + i) for i in range(t)]
        buckets = df.select(
            F.col("vec_id").alias("id"),
            _table_buckets_udf(tables)(F.col("embedding")).alias("bs"),
        ).select("id", F.posexplode("bs").alias("tbl", "bucket"))
        occ = buckets.groupBy("tbl", "bucket").count()
        n_cand = occ.select(
            F.sum(F.col("count") * (F.col("count") - 1) / 2).alias("c")
        ).collect()[0]["c"]
        counts[n] = float(n_cand)

    growth = counts[6000] / max(counts[1500], 1.0)
    # 4x the corpus: linear-ish growth stays well under the quadratic 16x
    assert growth <= 8.0, counts


def test_lsh_near_dup_bucket_cap_drops_superbuckets(spark):
    """max_bucket drops over-full (table, bucket) groups from candidate
    generation: a dense clump hashed into one bucket stops contributing
    quadratic in-bucket pairs, while pairs in small buckets survive
    unchanged. (The sf10 rehearsal measured the uncapped form filling the
    spill disk on a clustered corpus — SCALING.md round 6.)"""
    import numpy as np

    from ror_etl_spark.operators.similarity import lsh_near_dup_pairs

    rng = np.random.default_rng(11)
    # 200 vectors in one tight clump (one super-bucket per table) plus an
    # isolated twin pair far from the clump
    clump = rng.normal(size=16) ; clump /= np.linalg.norm(clump)
    rows = []
    for i in range(200):
        v = clump + rng.normal(scale=0.01, size=16)
        rows.append((i, [float(x) for x in (v / np.linalg.norm(v))]))
    twin = -clump + rng.normal(scale=0.3, size=16); twin /= np.linalg.norm(twin)
    t2 = twin + rng.normal(scale=0.01, size=16); t2 /= np.linalg.norm(t2)
    rows += [(500, [float(x) for x in twin]), (501, [float(x) for x in t2])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    kw = dict(threshold=0.9, dim=16, n_tables=4, n_planes=4)
    uncapped = lsh_near_dup_pairs(df, **kw).count()
    capped_pairs = lsh_near_dup_pairs(df, max_bucket=50, **kw)
    capped = {(r["id_a"], r["id_b"]) for r in capped_pairs.collect()}
    # the clump's ~19900 in-bucket pairs are gone...
    assert len(capped) < uncapped
    assert not any(a < 200 and b < 200 for a, b in capped)
    # ...but the isolated twin pair (its bucket holds 2 ids) survives
    assert (500, 501) in capped


def test_semdedup_prune_planted_clusters(spark):
    from ror_etl_spark.operators.similarity import semdedup_prune

    # two tight clusters far apart; within each, later ids duplicate id 1/10
    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.99, 0.01, 0.0, 0.0]),   # dup of 1
        (3, [0.98, -0.01, 0.0, 0.0]),  # dup of 1 (and of 2 — min witness is 1)
        (10, [0.0, 0.0, 1.0, 0.0]),
        (11, [0.0, 0.0, 0.99, 0.02]),  # dup of 10
        (20, [0.0, 1.0, 0.0, 0.0]),    # singleton direction — kept
    ]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {
        r["vec_id"]: (r["pruned"], r["dup_of"])
        for r in semdedup_prune(
            corpus, threshold=0.95, n_centroids=3, train_iters=2
        ).collect()
    }
    assert got[1] == (False, None)
    assert got[2] == (True, 1)
    assert got[3] == (True, 1)  # id-dominance: min earlier witness, not chain
    assert got[10] == (False, None)
    assert got[11] == (True, 10)
    assert got[20] == (False, None)


def test_semdedup_cross_cluster_pairs_not_compared(spark):
    from ror_etl_spark.operators.similarity import semdedup_prune

    # all vectors pairwise-similar (one tight cone) but k-means splits
    # them — only WITHIN-cell witnesses count, the SemDeDup contract
    rows = [(i, [1.0, 0.001 * i, 0.0, 0.0]) for i in range(1, 7)]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = semdedup_prune(corpus, threshold=0.99, n_centroids=1, train_iters=1)
    got = {r["vec_id"]: r["dup_of"] for r in out.collect()}
    # single cell: everyone after 1 is witnessed by 1
    assert got == {1: None, 2: 1, 3: 1, 4: 1, 5: 1, 6: 1}


def test_semdedup_max_cell_diverts_super_cell(spark):
    from ror_etl_spark.operators.similarity import semdedup_prune

    rows = [(i, [1.0, 0.001 * i, 0.0, 0.0]) for i in range(1, 7)]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = semdedup_prune(
        corpus, threshold=0.99, n_centroids=1, train_iters=1, max_cell=3
    )
    assert all(not r["pruned"] for r in out.collect())


def test_tuned_semdedup_k_occupancy_rule():
    from ror_etl_spark.operators.similarity import tuned_semdedup_k

    assert tuned_semdedup_k(500) == 16
    assert tuned_semdedup_k(2000) == 64
    assert tuned_semdedup_k(200_000) == 4096
    prev = 0
    for n in (10, 100, 1_000, 10_000, 100_000, 204_800):
        k = tuned_semdedup_k(n)
        assert k * 50 >= n  # expected occupancy bounded
        assert k >= prev    # monotone in corpus size
        prev = k
    assert tuned_semdedup_k(10**9) == 4096  # clamps at max_exp


def test_ann_recall_nprobe_all_cells_is_perfect(spark):
    """Recall semantics sanity: the report's brute side IS ground truth,
    so (a) n_hits ∈ [0, 10] with recall = n_hits/10 exactly, and (b) an
    independent numpy replay of brute-force top-10 per query agrees with
    perfect recall when every cell is probed — i.e. the IVF side's only
    loss mechanism is the probe cut, not the ranking."""
    import numpy as np

    from ror_etl_spark.registry import QUERIES, load_all
    from ror_etl_spark.tables import Tables
    from tests.conftest import SF_SMALL

    load_all()
    rows = QUERIES["embedding_ann_recall"](spark, SF_SMALL).collect()
    assert [r["qid"] for r in rows] == list(range(10))
    for r in rows:
        assert 0 <= r["n_hits"] <= 10
        assert abs(r["recall"] - r["n_hits"] / 10.0) < 1e-9

    emb = Tables(spark, SF_SMALL).embeddings.collect()
    vecs = {int(r["vec_id"]): np.array(r["embedding"], dtype=np.float64) for r in emb}
    corpus_ids = sorted(i for i in vecs if i >= 10)
    M = np.stack([vecs[i] for i in corpus_ids])
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)

    from ror_etl_spark.operators.similarity import ivf_topk

    corpus_df = Tables(spark, SF_SMALL).embeddings.filter("vec_id >= 10")
    for qid in range(3):
        q = vecs[qid]
        cos = Mn @ (q / np.linalg.norm(q))
        order = sorted(range(len(corpus_ids)), key=lambda j: (-cos[j], corpus_ids[j]))
        brute = {corpus_ids[j] for j in order[:10]}
        got = ivf_topk(
            corpus_df, [float(x) for x in q], k=10,
            n_centroids=16, nprobe=16, train_iters=3, round_means=6,
        ).collect()
        assert {int(r["vec_id"]) for r in got} == brute


def test_pq_recall_matches_numpy_replay(spark):
    """Independent numpy replay of the PQ recall report at SF_SMALL:
    re-encode with the trained codebooks, rebuild the ADC ranking and
    the exact squared-L2 ranking, and require identical n_hits."""
    import numpy as np

    from ror_etl_spark.queries.vector import _PQ_DSUB, _PQ_M, _pq_encode
    from ror_etl_spark.registry import QUERIES, load_all
    from ror_etl_spark.tables import Tables
    from tests.conftest import SF_SMALL

    load_all()
    rows = QUERIES["embedding_pq_recall"](spark, SF_SMALL).collect()
    assert [r["qid"] for r in rows] == list(range(10))

    codes_df, books = _pq_encode(spark, SF_SMALL)
    codes = {
        int(r["vec_id"]): [int(r[f"c{m}"]) for m in range(_PQ_M)]
        for r in codes_df.collect()
    }
    emb = {
        int(r["vec_id"]): np.array(r["embedding"], dtype=np.float64)
        for r in Tables(spark, SF_SMALL).embeddings.collect()
    }
    corpus = sorted(i for i in emb if i >= 10)
    for r in rows[:3]:
        qid = r["qid"]
        q = emb[qid]
        tables = []
        for m in range(_PQ_M):
            qm = q[m * _PQ_DSUB : (m + 1) * _PQ_DSUB]
            C = np.array(books[m], dtype=np.float64)
            tables.append(((qm - C) ** 2).sum(axis=1))
        adc = {
            v: round(sum(tables[m][codes[v][m]] for m in range(_PQ_M)) + 1e-9, 6)
            for v in corpus
        }
        pq_top = set(sorted(corpus, key=lambda v: (adc[v], v))[:10])
        l2 = {v: float(((emb[v] - q) ** 2).sum()) for v in corpus}
        brute = set(sorted(corpus, key=lambda v: (l2[v], v))[:10])
        assert r["n_hits"] == len(pq_top & brute)
        assert abs(r["recall"] - r["n_hits"] / 10.0) < 1e-9


def test_nprobe_sweep_monotone_and_consistent_with_recall_query(spark):
    """Recall must be non-decreasing in nprobe (probing more cells can
    only add candidates), and the nprobe=2 sweep point must equal the
    standalone embedding_ann_recall's total hits — two independently
    written plans, one truth."""
    from ror_etl_spark.registry import QUERIES, load_all
    from tests.conftest import SF_SMALL

    load_all()
    sweep = {r["nprobe"]: r for r in
             QUERIES["embedding_ivf_nprobe_sweep"](spark, SF_SMALL).collect()}
    assert sorted(sweep) == [1, 2, 4, 8]
    recalls = [sweep[p]["mean_recall"] for p in (1, 2, 4, 8)]
    assert all(a <= b + 1e-9 for a, b in zip(recalls, recalls[1:]))
    for r in sweep.values():
        assert 0 <= r["n_hits"] <= 100
        assert abs(r["mean_recall"] - r["n_hits"] / 100.0) < 1e-9
    standalone = QUERIES["embedding_ann_recall"](spark, SF_SMALL).collect()
    assert sweep[2]["n_hits"] == sum(r["n_hits"] for r in standalone)


def test_semdedup_sweep_consistent_with_prune_query(spark):
    """Monotone: higher threshold can only prune fewer; and the 0.4
    sweep point must equal embedding_semdedup_prune's pruned count —
    two independently written plans, one truth."""
    from ror_etl_spark.registry import QUERIES, load_all
    from tests.conftest import SF_SMALL

    load_all()
    sweep = {r["threshold"]: r for r in
             QUERIES["embedding_semdedup_sweep"](spark, SF_SMALL).collect()}
    assert sorted(sweep) == [0.3, 0.4, 0.5, 0.6]
    counts = [sweep[t]["n_pruned"] for t in (0.3, 0.4, 0.5, 0.6)]
    assert counts == sorted(counts, reverse=True)
    pruned = sum(
        1 for r in QUERIES["embedding_semdedup_prune"](spark, SF_SMALL).collect()
        if r["pruned"]
    )
    assert sweep[0.4]["n_pruned"] == pruned


def test_dim_truncation_sweep_full_dim_is_perfect(spark):
    """At dim=64 the 'truncated' search IS the ground truth, so recall
    must be exactly 1.0; and recall is non-decreasing in dim on
    average-aggregated hits... not guaranteed pointwise, so only the
    endpoints are pinned plus range checks."""
    from ror_etl_spark.registry import QUERIES, load_all
    from tests.conftest import SF_SMALL

    load_all()
    rows = {r["dim"]: r for r in
            QUERIES["embedding_dim_truncation_sweep"](spark, SF_SMALL).collect()}
    assert sorted(rows) == [8, 16, 32, 64]
    assert rows[64]["n_hits"] == 100 and rows[64]["mean_recall"] == 1.0
    for r in rows.values():
        assert 0 <= r["n_hits"] <= 100
        assert abs(r["mean_recall"] - r["n_hits"] / 100.0) < 1e-9
