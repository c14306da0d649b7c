"""Semantic tests for the corpus mixture/selection operators (round 7):
language sampling weights, BM25 retrieval, DSIR importance weights.
The driver gate hash-checks these against DuckDB; here we pin the
invariants a consistently-wrong-on-both-sides implementation would
still violate."""

from __future__ import annotations

import pytest

from ror_etl_spark.registry import QUERIES, load_all
from tests.conftest import SF_SMALL

load_all()


def test_language_weights_flatten_toward_uniform(spark):
    rows = QUERIES["corpus_language_sampling_weights"](spark, SF_SMALL).collect()
    assert len(rows) >= 2
    assert abs(sum(r["weight"] for r in rows) - 1.0) < 1e-4
    assert abs(sum(r["token_share"] for r in rows) - 1.0) < 1e-4
    top = max(rows, key=lambda r: r["token_share"])
    low = min(rows, key=lambda r: r["token_share"])
    # temperature < 1 shifts mass from the head language to the tail
    assert top["weight"] < top["token_share"] and top["boost"] < 1
    assert low["weight"] > low["token_share"] and low["boost"] > 1
    # sqrt temperature preserves the share ORDER, just flattens it
    by_share = sorted(rows, key=lambda r: r["token_share"])
    assert [r["lang"] for r in by_share] == [
        r["lang"] for r in sorted(rows, key=lambda r: r["weight"])
    ]


def test_bm25_topk_scores_positive_and_sorted(spark):
    rows = QUERIES["text_bm25_topk"](spark, SF_SMALL).collect()
    assert 0 < len(rows) <= 20
    scores = [r["bm25"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(s > 0 for s in scores)
    assert all(1 <= r["matched_terms"] <= 3 for r in rows)


def test_bm25_more_matched_terms_beats_fewer_at_same_tf(spark):
    # matching more distinct query terms adds whole idf-weighted terms;
    # within the top-k the max-matched doc must outrank the min-matched
    rows = QUERIES["text_bm25_topk"](spark, SF_SMALL).collect()
    best = rows[0]
    assert best["matched_terms"] == max(r["matched_terms"] for r in rows)


def test_dsir_separates_target_from_source(spark):
    from ror_etl_spark.tables import Tables

    langs = {
        r["doc_id"]: r["lang"]
        for r in Tables(spark, SF_SMALL).documents.select("doc_id", "lang").collect()
    }
    rows = QUERIES["llm_dsir_importance_weights"](spark, SF_SMALL).collect()
    assert len(rows) == len(langs)
    en = [r["log_ratio"] for r in rows if langs[r["doc_id"]] == "en"]
    other = [r["log_ratio"] for r in rows if langs[r["doc_id"]] != "en"]
    assert en and other
    # the synthetic corpus's languages SHARE most vocabulary, so the
    # separation is statistical, not total: the target slice must score
    # higher on average and be likelier to clear the keep threshold
    assert sum(en) / len(en) > sum(other) / len(other)
    frac = lambda xs: sum(1 for x in xs if x >= 0) / len(xs)  # noqa: E731
    assert frac(en) > frac(other)
    for r in rows:
        assert r["target_like"] == (r["log_ratio"] >= 0)


def test_pq_codes_quantize_consistently(spark):
    from pyspark.sql import functions as F

    rows = QUERIES["embedding_pq_codes"](spark, SF_SMALL).collect()
    assert rows and all(0 <= r[f"c{m}"] < 8 for r in rows for m in range(4))
    # PQ is a deterministic function of the vector: equal vectors must
    # get equal code tuples (run twice, same session)
    again = {r["vec_id"]: tuple(r[f"c{m}"] for m in range(4))
             for r in QUERIES["embedding_pq_codes"](spark, SF_SMALL).collect()}
    for r in rows:
        assert again[r["vec_id"]] == tuple(r[f"c{m}"] for m in range(4))
    # codes actually discriminate: more than one distinct tuple per subspace
    for m in range(4):
        assert len({r[f"c{m}"] for r in rows}) > 1
