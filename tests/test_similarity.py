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
