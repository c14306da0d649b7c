"""Text-analysis function tests on real multilingual sentences (the
testdata lang labels are synthetic, so language ID is validated here)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ror_etl_spark.functions.text import (
    bpe_ish_token_count,
    fingerprint_md5,
    lang_id,
    normalize_text,
    punct_ratio,
    quality_score,
    stopword_ratio,
    token_count,
)

SENTENCES = [
    ("en", "the cat sat on the mat and it was a sunny day in the park"),
    ("de", "der hund und die katze sind nicht mit dem kind zu hause"),
    ("es", "el perro y el gato están en la casa que es de madera"),
    ("fr", "le chien et le chat sont dans la maison pour la nuit"),
    ("zh", "我 的 朋友 是 一个 很 好 的 人 他 有 很多 书"),
]


def test_lang_id_on_real_sentences(spark):
    df = spark.createDataFrame(SENTENCES, "lang string, text string")
    out = {r["lang"]: r["pred"] for r in df.select("lang", lang_id(F.col("text")).alias("pred")).collect()}
    assert out == {code: code for code, _ in SENTENCES}


def test_lang_id_unknown(spark):
    df = spark.createDataFrame([("xx xx xx",)], "text string")
    assert df.select(lang_id(F.col("text")).alias("p")).collect()[0]["p"] == "und"


def test_normalize_and_fingerprint(spark):
    df = spark.createDataFrame(
        [("  Hello   World  ",), ("hello world",)], "text string"
    )
    rows = df.select(
        normalize_text(F.col("text")).alias("n"),
        fingerprint_md5(F.col("text")).alias("f"),
    ).collect()
    assert rows[0]["n"] == rows[1]["n"] == "hello world"
    assert rows[0]["f"] == rows[1]["f"]
    assert len(rows[0]["f"]) == 32


def test_token_counts(spark):
    df = spark.createDataFrame([("one two  three",)], "text string")
    r = df.select(
        token_count(F.col("text")).alias("n"),
        bpe_ish_token_count(F.col("text")).alias("b"),
    ).collect()[0]
    assert r["n"] == 3
    assert r["b"] == 3


def test_bpe_ish_splits_mixed_runs(spark):
    df = spark.createDataFrame([("abc123, def!",)], "text string")
    # abc | 123 | , | def | ! → 5
    assert df.select(bpe_ish_token_count(F.col("text")).alias("b")).collect()[0]["b"] == 5


def test_quality_and_ratios_bounded(spark):
    df = spark.createDataFrame(
        [("a good long document " * 10,), ("!!! ??? ***",), ("",)], "text string"
    )
    rows = df.select(
        quality_score(F.col("text")).alias("q"),
        punct_ratio(F.col("text")).alias("p"),
        stopword_ratio(F.col("text")).alias("s"),
    ).collect()
    for r in rows:
        assert 0.0 <= r["q"] <= 1.0
        assert 0.0 <= r["p"] <= 1.0
        assert 0.0 <= r["s"] <= 1.0
    assert rows[1]["p"] == 1.0  # all punctuation


def test_winnow_shared_substring_guarantee(spark):
    """Winnowing invariant (MOSS): two texts sharing a substring of length
    >= k + w - 1 (= 11) share at least one fingerprint."""
    from ror_etl_spark.functions.text import winnow_hashes, winnow_select

    shared = "the quick brown fox jumps"
    df = spark.createDataFrame(
        [(1, f"AAAA {shared} BBBB"), (2, f"zzzz {shared} qqqq"), (3, "totally different words here")],
        "id long, text string",
    )
    rows = (
        df.select("id", winnow_hashes(F.col("text")).alias("hs"))
        .select("id", winnow_select(F.col("hs")).alias("fps"))
        .collect()
    )
    fps = {r["id"]: set(r["fps"]) for r in rows}
    assert fps[1] & fps[2], "shared substring must yield a common fingerprint"
    # every fingerprint is an element of the k-gram hash multiset
    assert all(len(v) > 0 for v in fps.values())


def test_winnow_short_text_empty(spark):
    from ror_etl_spark.functions.text import winnow_hashes, winnow_select

    df = spark.createDataFrame([("short",), ("",)], "text string")
    rows = (
        df.select(winnow_hashes(F.col("text")).alias("hs"))
        .select(F.size("hs").alias("n"), F.size(winnow_select(F.col("hs"))).alias("nf"))
        .collect()
    )
    # len("short")=5 < k=8 -> no k-grams, no fingerprints (and no crash)
    assert [(r["n"], r["nf"]) for r in rows] == [(0, 0), (0, 0)]


def test_hash_sample_deterministic_under_repartition(spark):
    """The content-hash Bernoulli sample returns identical rows regardless
    of physical partitioning — the property df.sample(seed) lacks."""
    df = spark.range(0, 2000).select(F.col("id").alias("o_orderkey"))
    pred = F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 4) < "1999"
    a = {r[0] for r in df.filter(pred).collect()}
    b = {r[0] for r in df.repartition(13).filter(pred).collect()}
    assert a == b
    assert 100 < len(a) < 300  # ~10% of 2000


def test_winnow_stats_kernel_matches_expression_path(spark):
    """The fused rank-cache kernel must replicate winnow_hashes +
    winnow_select exactly, including short/empty edges (text shorter
    than k -> (0, 0, null); fewer than w grams -> n_fingerprints 0)."""
    from pyspark.sql import functions as F

    from ror_etl_spark.functions.text import (
        normalize_text,
        winnow_hashes,
        winnow_select,
        winnow_stats_udf,
    )

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    edges = spark.createDataFrame(
        [(900001, ""), (900002, "short"), (900003, "exactly8"),
         (900004, "nine char"), (900005, "eleven chars"), (900006, None)],
        "doc_id long, text string",
    )
    d = d.unionByName(edges)
    hs = d.select("doc_id", winnow_hashes(F.col("text")).alias("hs"))
    jvm = {
        r["doc_id"]: (r["n_kgrams"], r["n_fingerprints"], r["min_fp"])
        for r in hs.select(
            "doc_id",
            F.size("hs").alias("n_kgrams"),
            F.size(winnow_select(F.col("hs"))).alias("n_fingerprints"),
            F.array_min("hs").alias("min_fp"),
        ).collect()
    }
    st = winnow_stats_udf()
    ker = {
        r["doc_id"]: (r["n_kgrams"], r["n_fingerprints"], r["min_fp"])
        for r in d.select(
            "doc_id", st(normalize_text(F.col("text"))).alias("s")
        ).select("doc_id", "s.n_kgrams", "s.n_fingerprints", "s.min_fp").collect()
    }
    assert jvm == ker


def test_winnow_fp_set_kernel_matches_expression_path(spark):
    """The rank-cache fingerprint-SET kernel must equal the expression
    path's distinct window minima (sorted), for both the winnowed form
    (w=4) and the w=1 degenerate (full distinct k-gram set), including
    null and shorter-than-k documents (both contribute the empty set)."""
    from pyspark.sql import functions as F

    from ror_etl_spark.functions.text import (
        normalize_text,
        winnow_fp_set_udf,
        winnow_hashes,
        winnow_select,
    )

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    edges = spark.createDataFrame(
        [(900001, ""), (900002, "short"), (900003, None), (900004, "eleven chars")],
        "doc_id long, text string",
    )
    d = d.unionByName(edges)
    for w in (1, 4):
        hs = d.select("doc_id", winnow_hashes(F.col("text")).alias("hs"))
        jvm = {
            r["doc_id"]: sorted(r["fps"])
            for r in hs.select(
                "doc_id",
                F.when(
                    F.size("hs") >= w, winnow_select(F.col("hs"), w=w)
                ).otherwise(F.array().cast("array<string>")).alias("fps"),
            ).collect()
        }
        fp = winnow_fp_set_udf(w=w)
        ker = {
            r["doc_id"]: sorted(r["fps"])
            for r in d.select(
                "doc_id", fp(normalize_text(F.col("text"))).alias("fps")
            ).collect()
        }
        assert jvm == ker, f"w={w}"


def test_explode_over_arrow_kernel_evaluates_once(spark):
    """Catalyst's InferFiltersFromGenerate must not re-evaluate the
    expensive Arrow kernel below the Generate: ExtractPythonUDFs
    materializes the UDF into ONE ArrowEvalPython column first. Pinned
    because an inlined re-evaluation was a measured 50x regression on
    the relational winnow form this kernel replaced."""
    from pyspark.sql import functions as F

    from ror_etl_spark.functions.text import normalize_text, winnow_fp_set_udf

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    fp = winnow_fp_set_udf()
    g = d.select("doc_id", F.explode(fp(normalize_text(F.col("text")))).alias("fp"))
    plan = g._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ArrowEvalPython") == 1


def test_sorted_runs_run_length_encoding(spark):
    """sorted_runs is the map-side replacement for explode → groupBy
    per-row frequency questions (r12): pin its RLE output on the edges —
    single element, all-equal, all-distinct, the [''] empty-split shape,
    and null elements (array_sort groups nulls; eqNullSafe must
    run-group them, not split per element)."""
    from ror_etl_spark.functions.text import run_counts, sorted_runs

    cases = [
        (1, ["b", "a", "b", "a", "b"]),   # mixed → a:2, b:3 after sort
        (2, ["x"]),                        # single element
        (3, ["t", "t", "t"]),              # one run
        (4, ["c", "b", "a"]),              # all distinct
        (5, [""]),                         # split('') shape
        (6, ["a", None, "a", None]),       # nulls group into one run
    ]
    df = spark.createDataFrame(cases, "id int, arr array<string>")
    out = {
        r["id"]: (r["toks"], r["cs"])
        for r in df.select(
            "id",
            F.array_sort("arr").alias("st"),
        )
        .select(
            "id",
            F.transform(
                sorted_runs(F.col("st")), lambda x: F.get(F.col("st"), x["s"])
            ).alias("toks"),
            run_counts(sorted_runs(F.col("st"))).alias("cs"),
        )
        .collect()
    }
    assert out[1] == (["a", "b"], [2, 3])
    assert out[2] == (["x"], [1])
    assert out[3] == (["t"], [3])
    assert out[4] == (["a", "b", "c"], [1, 1, 1])
    assert out[5] == ([""], [1])
    # array_sort puts nulls last; the two nulls form ONE run of 2
    assert out[6] == (["a", None], [2, 2])
