"""Dedup family tests with planted duplicates (exact recall assertions the
oracle can't express because hash seeds are engine-internal)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ror_etl_spark.operators.dedup import (
    exact_dedup,
    jaccard_verify,
    keep_best_per_key,
    lsh_candidate_pairs,
    minhash_signatures,
    shingles,
    simhash_candidates,
    simhash_signatures,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm windowsill and the birds sing in the garden outside "
    "the old house near the river bank under the bright morning sun"
)
NEAR = BASE.replace("morning", "evening")  # one token differs
FAR = (
    "completely different text about spark partitions shuffles joins "
    "aggregations catalysts and whole stage code generation with arrow "
    "batches flowing between the jvm and python worker processes"
)


def _docs(spark):
    rows = [
        (1, BASE),
        (2, BASE),  # exact dup of 1
        (3, "  " + BASE.upper() + "  "),  # dup after normalization
        (4, NEAR),  # near dup of 1
        (5, FAR),
        (6, FAR.replace("arrow", "feather")),  # near dup of 5
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup_groups(spark):
    groups = exact_dedup(_docs(spark)).collect()
    by_keep = {r["keep_id"]: r["n_copies"] for r in groups}
    # 1,2,3 collapse (case/whitespace normalize); 4,5,6 unique
    assert by_keep == {1: 3, 4: 1, 5: 1, 6: 1}


def test_minhash_lsh_finds_planted_near_dups(spark):
    docs = _docs(spark)
    sigs = minhash_signatures(docs, num_hashes=32)
    cands = {(r["id_a"], r["id_b"]) for r in lsh_candidate_pairs(sigs).collect()}
    # exact dups always collide; the one-token-off pairs share most shingles
    assert (1, 2) in cands
    assert (1, 4) in cands or (2, 4) in cands
    assert (5, 6) in cands
    verified = jaccard_verify(
        spark.createDataFrame(list(cands), "id_a long, id_b long"), docs, threshold=0.5
    )
    v = {(r["id_a"], r["id_b"]): r["jaccard"] for r in verified.collect()}
    assert v[(1, 2)] == 1.0
    assert 0.5 <= v[(1, 4)] < 1.0


def test_minhash_no_false_candidates_across_far_docs(spark):
    docs = _docs(spark)
    cands = {
        (r["id_a"], r["id_b"])
        for r in lsh_candidate_pairs(minhash_signatures(docs)).collect()
    }
    assert (1, 5) not in cands and (2, 5) not in cands


def test_simhash_near_dups_have_small_hamming(spark):
    docs = _docs(spark)
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash_candidates(docs).collect()
    }
    assert pairs[(1, 2)] == 0  # identical text → identical simhash
    assert pairs[(1, 3)] == 0  # normalization collapses case/whitespace
    if (1, 4) in pairs:  # near dup: small distance when banding catches it
        assert pairs[(1, 4)] <= 16


def test_simhash_signature_deterministic(spark):
    docs = _docs(spark)
    a = {r["id"]: r["sim"] for r in simhash_signatures(docs).collect()}
    b = {r["id"]: r["sim"] for r in simhash_signatures(docs).collect()}
    assert a == b
    assert a[1] == a[2]  # exact dups agree
    assert a[1] != a[5]  # far docs differ


def test_shingles_content(spark):
    df = spark.createDataFrame([("a b c d",)], "text string")
    out = df.select(shingles(F.col("text"), 3).alias("s")).collect()[0]["s"]
    assert out == ["a b c", "b c d"]


def test_keep_best_per_key(spark):
    df = spark.createDataFrame(
        [(1, "x", 10, 1.0), (1, "x", 20, 2.0), (1, "y", 5, 3.0), (2, "x", 7, 4.0)],
        "user long, kind string, ts long, v double",
    )
    kept = keep_best_per_key(df, keys=["user", "kind"], order_by=[F.desc("ts")])
    rows = {(r["user"], r["kind"]): r["ts"] for r in kept.collect()}
    assert rows == {(1, "x"): 20, (1, "y"): 5, (2, "x"): 7}


def test_vectorized_signatures_bit_identical_to_expression_path(spark):
    """The Arrow/numpy lane kernel must produce byte-equal signatures to
    the JVM higher-order-function path — same lane params, same 31-bit
    arithmetic — at a lane count above one numpy chunk (32)."""
    from ror_etl_spark.operators.dedup import minhash_signatures

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    # plant short-doc edge cases: fewer tokens than the shingle width
    # exercises the kernel's null->0 window padding
    from pyspark.sql import functions as F

    d = d.unionByName(
        spark.createDataFrame(
            [(900001, "one"), (900002, "two words"), (900003, ""), (900004, None)],
            "doc_id long, text string",
        ).withColumns({"lang": F.lit("en"), "source": F.lit("x"), "n_chars": F.lit(0)})
    )
    hof = minhash_signatures(d, num_hashes=40, vectorized=False).orderBy("id").collect()
    vec = minhash_signatures(d, num_hashes=40, vectorized=True).orderBy("id").collect()
    assert len(hof) == len(vec) > 0
    for a, b in zip(hof, vec):
        assert a["id"] == b["id"]
        assert list(a["minhash"]) == list(b["minhash"])


def test_tuned_minhash_params_rules():
    """Integer-exact band-width rule and the OR-construction band count:
    the exact values the tuned oracle's SQL CASE inlines."""
    from ror_etl_spark.operators.dedup import tuned_band_rows, tuned_bands_for_rows

    # smallest r >= 4 with 250 * 2^r >= n
    assert tuned_band_rows(500) == 4
    assert tuned_band_rows(4000) == 4
    assert tuned_band_rows(4001) == 5
    assert tuned_band_rows(50_000) == 8
    assert tuned_band_rows(500_000) == 11
    assert tuned_band_rows(10**9) == 16  # clamps at max_rows
    # recall bound at t=0.8: b grows with r, capped at 32
    assert tuned_bands_for_rows(4) == 5
    assert tuned_bands_for_rows(8) == 13
    assert tuned_bands_for_rows(11) == 26
    assert tuned_bands_for_rows(16) == 32
    for bad in (0.0, 1.0, -1.0):
        import pytest

        with pytest.raises(ValueError):
            tuned_bands_for_rows(4, target_recall=bad)


def test_tuned_minhash_finds_planted_duplicates(spark):
    """The tuned funnel (params from corpus size) must keep the planted
    exact-duplicate pairs: Jaccard 1.0 docs agree on every band, so any
    band count finds them regardless of tuning regime."""
    from pyspark.sql import functions as F

    from ror_etl_spark.operators.dedup import (
        jaccard_verify,
        lsh_candidate_pairs,
        minhash_signatures,
        tuned_band_rows,
        tuned_bands_for_rows,
    )

    base = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    # plant duplicates explicitly: copy five docs under fresh ids
    planted = base.filter(F.col("doc_id") < 5).withColumn(
        "doc_id", F.col("doc_id") + 100_000
    )
    d = base.unionByName(planted)
    exact_pairs = {(i, i + 100_000) for i in range(5)}
    n = d.count()
    r = tuned_band_rows(n)
    b = tuned_bands_for_rows(r)
    sigs = minhash_signatures(d, num_hashes=b * r, vectorized=True)
    cands = lsh_candidate_pairs(sigs, bands=b, rows_per_band=r)
    found = {(x["id_a"], x["id_b"]) for x in jaccard_verify(cands, d, threshold=0.8).collect()}
    assert exact_pairs <= found


def test_exact_substring_spans_match_planted_offsets(spark):
    """Span-level exact-substring dedup: a planted shared substring must
    come back as exactly one maximal span with the right 1-based offsets
    and length, and a repeated region must yield one span per alignment
    diagonal. Each reported span is verified against the actual text."""
    from ror_etl_spark.operators.dedup import exact_substring_spans

    S = "0123456789abcdefghijklmnopqrstuvwxyz!@#$"  # 40 chars, no repeats
    S2 = "the quick brown fox jumps over the lazy dog!"  # 44 chars
    docs = {
        1: "x" * 20 + S + "y" * 20,
        2: "q" * 10 + S + "r" * 30,
        3: "totally different no shared grams here",
        6: S2 + "-middle filler between copies-" + S2,
        7: S2,
    }
    df = spark.createDataFrame(
        [(i, t) for i, t in docs.items()], "doc_id long, text string"
    )
    rows = exact_substring_spans(df).collect()
    spans: dict[tuple[int, int], set] = {}
    for r in rows:
        spans.setdefault((r["id_a"], r["id_b"]), set()).add(
            (r["start_a"], r["start_b"], r["length"])
        )
        # the span really is a common substring (1-based offsets)
        a = docs[r["id_a"]][r["start_a"] - 1 : r["start_a"] - 1 + r["length"]]
        b = docs[r["id_b"]][r["start_b"] - 1 : r["start_b"] - 1 + r["length"]]
        assert a == b and len(a) == r["length"]
    assert spans[(1, 2)] == {(21, 11, 40)}
    # repeated region: one span per diagonal, both covering all of S2
    mid_start = len(S2) + len("-middle filler between copies-") + 1
    assert spans[(6, 7)] == {(1, 1, len(S2)), (mid_start, 1, len(S2))}
    assert not any(3 in k for k in spans)


def test_exact_substring_hot_gram_diversion(spark):
    """The document-frequency ceiling: a viral boilerplate string shared
    by more docs than the cap is DIVERTED to the hot-gram report instead
    of exploding the pair join quadratically; rare shared substrings
    still pair."""
    from ror_etl_spark.operators.dedup import (
        exact_substring_pairs,
        exact_substring_spans,
        hot_gram_report,
    )

    viral = "please subscribe to our newsletter today"  # 40 chars -> 9 grams
    rare = "an uncommonly specific shared sentence!!"  # 40 chars
    # the digit right after the boilerplate breaks commonality, so the
    # shared region is exactly viral + " " (41 chars -> 10 grams); the
    # rare docs' preceding char differs ('-' vs ' ') so their shared
    # region is exactly rare (40 chars)
    rows = [(i, viral + f" {i} unique tail padding junk") for i in range(7)]
    rows += [(8, "aaa-" + rare), (9, "bbb " + rare)]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    report = hot_gram_report(df, cap=5).collect()
    assert len(report) == 10  # every gram fully inside viral + " "
    assert all(r["n_docs"] == 7 for r in report)

    pairs = {(r["id_a"], r["id_b"]): r["n_shared"] for r in exact_substring_pairs(df, cap=5).collect()}
    assert pairs == {(8, 9): 9}  # only the rare pair survives; 40-31=9 grams

    spans = [(r["id_a"], r["id_b"], r["start_a"], r["start_b"], r["length"])
             for r in exact_substring_spans(df, cap=5).collect()]
    assert spans == [(8, 9, 5, 5, 40)]

    # without the cap the viral grams pair all 7 docs quadratically
    uncapped = exact_substring_pairs(df, cap=50).count()
    assert uncapped == 21 + 1


def test_exact_substring_cut_keeps_first_occurrence(spark):
    """Applied span dedup: the later document loses the duplicated
    range, the earlier keeps it; overlapping spans from several earlier
    twins merge into one cut; untouched docs pass through whole."""
    import hashlib

    from ror_etl_spark.operators.dedup import exact_substring_cut

    S = "0123456789abcdefghijklmnopqrstuvwxyz!@#$"  # 40 chars
    docs = {
        1: "x" * 20 + S + "y" * 20,
        2: "q" * 10 + S + "r" * 30,   # loses S (duplicate of doc 1)
        3: "untouched document with no duplicates",
    }
    df = spark.createDataFrame(
        [(i, t) for i, t in docs.items()], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in exact_substring_cut(df).collect()}
    # doc 1: first occurrence, nothing cut
    assert out[1]["n_cut_spans"] == 0 and out[1]["n_cut_chars"] == 0
    assert out[1]["cleaned_md5"] == hashlib.md5(docs[1].encode()).hexdigest()
    # doc 2: S removed, prefix+suffix survive
    expect2 = "q" * 10 + "r" * 30
    assert out[2]["n_cut_spans"] == 1 and out[2]["n_cut_chars"] == 40
    assert out[2]["cleaned_len"] == len(expect2)
    assert out[2]["cleaned_md5"] == hashlib.md5(expect2.encode()).hexdigest()
    # doc 3: untouched
    assert out[3]["n_cut_spans"] == 0
    assert out[3]["cleaned_md5"] == hashlib.md5(docs[3].encode()).hexdigest()


def test_dedup_funnel_keep_semantics(spark):
    from ror_etl_spark.registry import QUERIES, load_all

    load_all()
    # sf0.1 is the one driver tier with planted EXACT duplicates, so all
    # three reason branches are exercised
    rows = QUERIES["dedup_funnel_keep"](spark, "/root/testdata/sf0.1").collect()
    by_id = {r["doc_id"]: r for r in rows}
    texts = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet("/root/testdata/sf0.1/documents.parquet").collect()
    }
    import re

    def norm(s):
        return re.sub(r"\s+", " ", s.lower()).strip()

    reasons = {r["reason"] for r in rows}
    assert reasons == {None, "exact", "near"}
    for r in rows:
        assert r["canonical_id"] <= r["doc_id"]
        assert r["keep"] == (r["canonical_id"] == r["doc_id"])
        assert (r["reason"] is None) == r["keep"]
        if r["reason"] == "exact":
            # exact losers have an identical-text doc with a smaller id
            # (their fingerprint keeper); the canonical is the component
            # ROOT, which may be a near-neighbor rather than the twin
            assert any(
                other < r["doc_id"] and norm(t) == norm(texts[r["doc_id"]])
                for other, t in texts.items()
            )
        if not r["keep"]:
            assert by_id[r["canonical_id"]]["keep"]


def test_decontaminate_substring_cut_planted(spark):
    from ror_etl_spark.operators.dedup import decontaminate_substring_cut

    bench_text = "the quick brown fox jumps over the lazy dog near the river bank"
    corpus = spark.createDataFrame(
        [
            # contains a 44-char verbatim benchmark span in the middle
            (100, "intro words here " + bench_text[:44] + " and a unique tail of text"),
            # clean document — must pass through untouched
            (101, "completely unrelated content with no overlap whatsoever at all"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame([(1, bench_text)], "doc_id long, text string")
    got = {r["doc_id"]: r for r in decontaminate_substring_cut(corpus, bench, k=32).collect()}
    import hashlib
    import re

    def norm(s):
        return re.sub(r"\s+", " ", s.lower()).strip()

    dirty = norm("intro words here " + bench_text[:44] + " and a unique tail of text")
    start = dirty.index(norm(bench_text[:44]))
    cleaned = dirty[:start] + dirty[start + 44 :]
    assert got[100]["n_cut_spans"] == 1
    assert got[100]["n_cut_chars"] == 44
    assert got[100]["cleaned_md5"] == hashlib.md5(cleaned.encode()).hexdigest()
    clean = norm("completely unrelated content with no overlap whatsoever at all")
    assert got[101]["n_cut_spans"] == 0
    assert got[101]["cleaned_md5"] == hashlib.md5(clean.encode()).hexdigest()


def test_minhash_calibration_band_property_and_estimator(spark):
    """Every LSH candidate pair must share a FULL band (4 consecutive
    matching lanes at the 8x4 scheme) — re-derived from raw signatures
    independently of the banding code — and the 32-lane estimator must
    sit within a generous statistical envelope of the exact Jaccard."""
    from ror_etl_spark.registry import QUERIES, load_all
    from ror_etl_spark.tables import Tables
    from tests.conftest import SF_SMALL

    load_all()
    rows = QUERIES["dedup_minhash_calibration"](spark, SF_SMALL).collect()
    assert rows, "driver corpus plants near-dups; candidates must exist"
    d = Tables(spark, SF_SMALL).documents
    sigs = {
        r["id"]: r["minhash"]
        for r in minhash_signatures(d, num_hashes=32).collect()
    }
    for r in rows:
        ma, mb = sigs[r["id_a"]], sigs[r["id_b"]]
        matches = sum(1 for x, y in zip(ma, mb) if x == y)
        assert r["lane_matches"] == matches
        assert any(
            all(ma[b * 4 + i] == mb[b * 4 + i] for i in range(4)) for b in range(8)
        ), "candidate pair without a full matching band"
        exact = r["i_intersect"] / max(r["u_union"], 1)
        assert abs(r["est_jaccard"] - exact) <= 4 * (0.25 / 32**0.5) + 1e-9
        assert abs(r["abs_err"] - abs(r["lane_matches"] / 32.0 - exact)) < 5e-4


def test_leakage_safe_split_keeps_pairs_together(spark):
    """The leakage guarantee, re-derived from the raw pair graph: every
    verified near-dup pair's two documents must land in the SAME split
    under the cluster-keyed md5 rule; totals must cover the corpus."""
    import hashlib

    from ror_etl_spark.operators.components import dedup_clusters
    from ror_etl_spark.registry import QUERIES, load_all
    from ror_etl_spark.tables import Tables
    from tests.conftest import SF_SMALL

    load_all()
    d = Tables(spark, SF_SMALL).documents
    cands = lsh_candidate_pairs(minhash_signatures(d, num_hashes=32))
    verified = jaccard_verify(cands, d, threshold=0.5).select("id_a", "id_b")
    pairs = [(r["id_a"], r["id_b"]) for r in verified.collect()]
    assert pairs, "driver corpus plants near-dups"
    cluster_of = {
        r["id"]: r["cluster"] for r in dedup_clusters(d, verified).collect()
    }

    def split(cluster: int) -> str:
        return (
            "test"
            if hashlib.md5(str(cluster).encode()).hexdigest()[:2] < "1a"
            else "train"
        )

    for a, b in pairs:
        assert split(cluster_of[a]) == split(cluster_of[b])

    rows = {r["split"]: r for r in
            QUERIES["train_test_split_leakage_safe"](spark, SF_SMALL).collect()}
    total = sum(r["n_docs"] for r in rows.values())
    assert total == d.count()
    for r in rows.values():
        assert r["n_dup_docs"] <= r["n_docs"]


def test_ngram_novelty_semantics(spark):
    """doc 0's novelty is 1.0 by construction; an exact duplicate of an
    earlier document has novelty 0; and n_novel sums to the global
    distinct-shingle count (each gram is novel exactly once)."""
    from ror_etl_spark.registry import QUERIES, load_all
    from ror_etl_spark.tables import Tables
    from tests.conftest import SF_SMALL

    load_all()
    rows = QUERIES["text_ngram_novelty"](spark, SF_SMALL).collect()
    by_id = {r["doc_id"]: r for r in rows}
    first = by_id[min(by_id)]
    assert first["novelty"] == 1.0 and first["n_novel"] == first["n_shingles"]

    d = Tables(spark, SF_SMALL).documents
    total_distinct = (
        d.select(F.explode(F.array_distinct(shingles(F.col("text"), 3))))
        .distinct()
        .count()
    )
    assert sum(r["n_novel"] for r in rows) == total_distinct
    # every non-keeper EXACT duplicate re-treads all its grams — plant
    # one (this SF has no natural exact dups) and replay the same
    # first-occurrence relation on the planted frame
    planted = d.unionByName(
        d.filter(F.col("doc_id") == 0).withColumn("doc_id", F.lit(10**7))
    )
    ex = planted.select(
        "doc_id",
        F.explode(F.array_distinct(shingles(F.col("text"), 3))).alias("g"),
    )
    fd = ex.groupBy("g").agg(F.min("doc_id").alias("first_doc"))
    novel = (
        ex.join(fd, "g")
        .groupBy("doc_id")
        .agg(F.sum(
            F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
        ).alias("n_novel"))
    )
    got = {r["doc_id"]: r["n_novel"] for r in novel.collect()}
    assert got[10**7] == 0, "an exact copy of doc 0 must have zero novelty"


def test_incremental_near_batch_probes_index_only(spark):
    """Every reported duplicate must point INTO the corpus partition
    (doc_id % 10 < 8) — never at another new-batch doc — with jaccard
    >= 0.5; and every new doc appears exactly once."""
    from ror_etl_spark.registry import QUERIES, load_all
    from ror_etl_spark.tables import Tables
    from tests.conftest import SF_SMALL

    load_all()
    rows = QUERIES["dedup_incremental_near_batch"](spark, SF_SMALL).collect()
    new_ids = {
        r["doc_id"]
        for r in Tables(spark, SF_SMALL).documents
        .filter("doc_id % 10 >= 8").select("doc_id").collect()
    }
    assert {r["doc_id"] for r in rows} == new_ids
    for r in rows:
        if r["is_dup"]:
            assert r["dup_of"] % 10 < 8
            assert r["jaccard"] >= 0.5
        else:
            assert r["dup_of"] is None and r["jaccard"] is None


def test_containment_finds_planted_quote_pair(spark):
    """A short doc fully quoted inside a long one: Jaccard is small
    (symmetric dedup misses it) but containment flags it — provided LSH
    banding surfaces the pair, which identical-prefix shingles do
    here."""
    from ror_etl_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
    )

    quote = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    long_doc = quote + " " + " ".join(f"filler{i} word{i} extra{i}" for i in range(30))
    docs = spark.createDataFrame(
        [(1, quote), (2, long_doc), (3, "unrelated content entirely different")],
        "doc_id long, text string",
    )
    sigs = minhash_signatures(docs, num_hashes=32)
    cands = {(r["id_a"], r["id_b"])
             for r in lsh_candidate_pairs(sigs).collect()}
    if (1, 2) in cands:  # banding caught it: containment must flag it
        sh = docs.select(
            "doc_id", F.array_distinct(shingles(F.col("text"), 3)).alias("s")
        ).collect()
        sets = {r["doc_id"]: set(r["s"]) for r in sh}
        i = len(sets[1] & sets[2])
        assert 10 * i >= 9 * min(len(sets[1]), len(sets[2]))
        jac = i / len(sets[1] | sets[2])
        assert jac < 0.5, "the pair symmetric dedup would have missed"


def test_tuned_lsh_lane_pool_strided_branch_matches_oracle(spark, tmp_path):
    """Driver-gate replica at a corpus size where the LANE_POOL cap BINDS
    (n=64,100 → r=9, b=17, b·r=153 > 128): the registered sf0.01 gate only
    ever exercises ``band_lane_indices``'s consecutive-slice branch, so
    this pins the strided pool-draw branch engine-vs-DuckDB bit-identical
    end to end — signatures, band keys, candidates, verify — with planted
    exact duplicates that MUST survive the funnel."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ror_etl_spark import registry
    from ror_etl_spark.operators.dedup import (
        LANE_POOL,
        tuned_band_rows,
        tuned_bands_for_rows,
    )

    registry.load_all()
    n = 64_100
    r = tuned_band_rows(n)
    b = tuned_bands_for_rows(r, threshold=0.8, target_recall=0.9)
    assert b * r > LANE_POOL, "corpus must force the strided branch"

    vocab = np.array(
        "alpha beta gamma delta epsilon zeta eta theta iota kappa lam mu "
        "nu xi omicron pi rho sigma tau upsilon phi chi psi omega red "
        "green blue gold silver iron copper".split(),
        dtype=object,
    )
    rng = np.random.default_rng(4242)
    lengths = rng.integers(8, 15, size=n)
    flat = vocab[rng.integers(0, len(vocab), size=int(lengths.sum()))]
    texts, pos = [], 0
    for ln in lengths:
        texts.append(" ".join(flat[pos : pos + ln]))
        pos += ln
    n_planted = 40
    n_near = 40
    picks = rng.choice(n, size=2 * (n_planted + n_near), replace=False)
    src = picks[: 2 * n_planted].reshape(-1, 2)
    near_src = picks[2 * n_planted :].reshape(-1, 2)
    for a_i, b_i in src:
        texts[b_i] = texts[a_i]
    near_exp = []  # pairs whose exact shingle Jaccard is >= the 0.8 verify
    for a_i, b_i in near_src:
        words = texts[a_i].split()
        texts[b_i] = " ".join(words[:-1])  # drop last word: J ~ (w-3)/(w-2)
        sh = lambda ws: {tuple(ws[i : i + 3]) for i in range(len(ws) - 2)}
        sa, sb = sh(words), sh(words[:-1])
        j = len(sa & sb) / len(sa | sb)
        if j >= 0.8:
            near_exp.append((min(a_i, b_i), max(a_i, b_i)))
    doc_path = str(tmp_path / "documents.parquet")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(n), type=pa.int64()),
                "text": pa.array(texts, type=pa.string()),
            }
        ),
        doc_path,
    )

    got = (
        registry.QUERIES["dedup_minhash_lsh_tuned"](spark, str(tmp_path))
        .toPandas()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{doc_path}'")
    want = (
        con.execute(registry.ORACLES["dedup_minhash_lsh_tuned"])
        .df()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want)
    assert (got["id_a"].values == want["id_a"].values).all()
    assert (got["id_b"].values == want["id_b"].values).all()
    assert np.allclose(got["jaccard"].values, want["jaccard"].values, atol=0)
    planted = {(min(a, c), max(a, c)) for a, c in src}
    found = set(zip(got["id_a"], got["id_b"]))
    assert planted <= found, "planted exact duplicates must survive the funnel"
    # RECALL under the shared-pool banding: near-dup pairs at J in
    # [0.8, ~0.92] are where band correlation (strided draws share
    # lanes) could depress the OR-construction bound. The independent
    # bound at J=0.83 with (r=9, b=17) is ~0.97; assert a loose floor
    # so statistical variance can't flake the suite while a real
    # correlation collapse (recall ~0.5) would still fail loudly.
    assert len(near_exp) >= 20, "corpus should yield >= 20 J>=0.8 near pairs"
    caught = sum(1 for p in near_exp if p in found)
    assert caught / len(near_exp) >= 0.85, (caught, len(near_exp))
