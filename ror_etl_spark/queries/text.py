"""Text-analysis queries over the documents table (LLM-pipeline surface):
token statistics, portable fingerprinting, quality scoring, language ID.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ror_etl_spark.functions.text import (
    bpe_ish_token_count,
    fingerprint_md5,
    lang_id,
    normalize_text,
    punct_ratio,
    token_count,
    tokens,
)
from ror_etl_spark.registry import query
from ror_etl_spark.tables import Tables
from ror_etl_spark.queries.util import ordered, r4


@query(
    "text_token_stats",
    oracle="""
    WITH toks AS (
      SELECT doc_id, n_chars,
             string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS t
      FROM documents)
    SELECT doc_id,
           CAST(array_length(t) AS INT)                 AS n_tokens,
           CAST(array_length(list_distinct(t)) AS INT)  AS n_unique,
           round(CAST(array_length(list_distinct(t)) AS DOUBLE) / array_length(t), 4) AS ttr,
           n_chars
    FROM toks
    ORDER BY doc_id
    """,
    # r5: tokenize pass rebound + fan-out — keep in the driver window
    priority=2,
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token counts and type-token ratio.

    The tokenize pass is bound to a column once (the inline form
    re-evaluated the regex split for every expression that referenced
    it — three times per row) and the single-file scan fans out before
    the per-row work (the round-2 spread lesson; without it 500k rows
    tokenized on one core at the sf10 tier: measured 22.9 s → 3.0 s)."""
    from ror_etl_spark.operators.util import spread

    d = spread(Tables(spark, sf_dir).documents)
    tok = d.select("doc_id", "n_chars", tokens(F.col("text")).alias("t"))
    sized = tok.select(
        "doc_id",
        "n_chars",
        F.size("t").alias("n_tokens"),
        F.size(F.array_distinct("t")).alias("n_unique"),
    )
    return sized.select(
        "doc_id",
        "n_tokens",
        "n_unique",
        r4(F.col("n_unique").cast("double") / F.col("n_tokens")).alias("ttr"),
        "n_chars",
    )


@query(
    "text_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fingerprint
    FROM documents
    ORDER BY doc_id
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Portable md5 fingerprint of normalized text (identical hex in any
    engine — the exact-dedup key)."""
    d = Tables(spark, sf_dir).documents
    return d.select(
        "doc_id", fingerprint_md5(F.col("text")).alias("fingerprint")
    ).transform(ordered, "doc_id")


@query(
    "text_quality",
    oracle="""
    WITH norm AS (
      SELECT doc_id,
             trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS nt,
             length(regexp_replace(text, '\\s', '', 'g'))          AS nonspace,
             length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS punct
      FROM documents),
    feat AS (
      SELECT doc_id,
             CAST(array_length(string_split(nt, ' ')) AS DOUBLE) AS n_tok,
             CAST(length(nt) AS DOUBLE) AS n_chars_norm,
             CAST(punct AS DOUBLE) / greatest(nonspace, 1) AS pr
      FROM norm)
    SELECT doc_id,
           round(( least(n_tok / 50.0, 1.0)
                 + (CASE WHEN n_chars_norm / greatest(n_tok, 1) BETWEEN 3 AND 10
                         THEN 1.0 ELSE 0.5 END)
                 + (1.0 - least(pr * 4, 1.0)) ) / 3, 4) AS quality
    FROM feat
    ORDER BY doc_id
    """,
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite quality heuristic (length / token shape / punctuation)."""
    d = Tables(spark, sf_dir).documents
    n_tok = token_count(F.col("text")).cast("double")
    mean_tok_len = F.length(normalize_text(F.col("text"))) / F.greatest(n_tok, F.lit(1.0))
    len_score = F.least(n_tok / 50.0, F.lit(1.0))
    tok_len_score = F.when((mean_tok_len >= 3) & (mean_tok_len <= 10), 1.0).otherwise(0.5)
    punct_score = F.lit(1.0) - F.least(punct_ratio(F.col("text")) * 4, F.lit(1.0))
    return d.select(
        "doc_id",
        r4((len_score + tok_len_score + punct_score) / 3).alias("quality"),
    ).transform(ordered, "doc_id")


@query(
    "text_bpe_token_count",
    oracle="""
    SELECT doc_id,
           CAST(length(list_filter(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \\t\\n]'), x -> x <> '')) AS INT) AS n_bpe_tokens
    FROM documents
    ORDER BY doc_id
    """,
)
def text_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish token estimate (letter runs / digit runs / punctuation)."""
    d = Tables(spark, sf_dir).documents
    return d.select(
        "doc_id", bpe_ish_token_count(F.col("text")).alias("n_bpe_tokens")
    ).transform(ordered, "doc_id")


def _lang_id_oracle() -> str:
    """DuckDB twin of functions.text.lang_id: per-language distinct-token
    stopword overlap, argmax with ties to the lexicographically largest
    code (matching array_max over (score, lang) structs), 'und' on zero.
    Generated from the same STOPWORDS lists so they cannot drift."""
    from ror_etl_spark.functions.text import STOPWORDS

    langs_desc = sorted(STOPWORDS, reverse=True)
    score_cols = ",\n".join(
        "len(list_filter(t, x -> list_contains(["
        + ", ".join(f"'{w}'" for w in STOPWORDS[code])
        + f"], x))) AS s_{code}"
        for code in langs_desc
    )
    branches = []
    for i, code in enumerate(langs_desc):
        later = langs_desc[i + 1 :]
        conds = [f"s_{code} > 0"] + [f"s_{code} >= s_{o}" for o in later]
        branches.append(f"WHEN {' AND '.join(conds)} THEN '{code}'")
    case = "CASE " + " ".join(branches) + " ELSE 'und' END"
    return f"""
    WITH toks AS (
      SELECT lang,
             list_distinct(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS t
      FROM documents),
    scored AS (SELECT lang, {score_cols} FROM toks)
    SELECT lang, pred, count(*) AS n FROM (SELECT lang, {case} AS pred FROM scored)
    GROUP BY lang, pred
    ORDER BY lang, pred
    """


@query("text_lang_id", oracle=_lang_id_oracle())
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-overlap language ID vs the labeled lang column; unit tests
    assert correct identification on real multilingual sentences."""
    from ror_etl_spark.operators.util import spread

    # the per-doc tokenize + 5-language filter argmax is the hot loop —
    # fan out the single-file scan before computing it
    d = spread(Tables(spark, sf_dir).documents)
    return (
        d.select("lang", lang_id(F.col("text")).alias("pred"))
        .groupBy("lang", "pred")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("lang", "pred")
    )


@query(
    "udtf_word_lengths",
    oracle="""
    SELECT w.word, CAST(length(w.word) AS INT) AS wlen, count(*) AS n
    FROM documents d,
         LATERAL (SELECT unnest(string_split_regex(d.text, '\\s+')) AS word) w
    WHERE d.doc_id < 50 AND w.word <> ''
    GROUP BY w.word ORDER BY n DESC, w.word LIMIT 20
    """,
)
def udtf_word_lengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF in a SQL lateral position (word_explode), aggregated.
    The UDTF is the row-at-a-time API-surface demo; the oracle (and the
    scale path) is the codegen explode/split form — both must agree
    exactly."""
    from ror_etl_spark.functions.udtfs import register_udtfs

    t = Tables(spark, sf_dir)
    t.view("documents")
    register_udtfs(spark)
    return spark.sql("""
        SELECT w.word, w.wlen, count(*) AS n
        FROM documents d, LATERAL word_explode(d.text) w
        WHERE d.doc_id < 50
        GROUP BY w.word, w.wlen ORDER BY n DESC, w.word LIMIT 20
    """)


@query(
    "text_winnow_fingerprints",
    oracle="""
    WITH d AS (
      SELECT doc_id, lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS s
      FROM documents),
    g AS (
      SELECT doc_id,
             list_transform(generate_series(1, greatest(length(s) - 7, 0)),
                            i -> md5(substr(s, CAST(i AS INT), 8))) AS hs
      FROM d)
    SELECT doc_id,
           CAST(len(hs) AS INT) AS n_kgrams,
           CAST(len(list_distinct(
             list_transform(generate_series(1, greatest(len(hs) - 3, 0)),
                            j -> list_min(list_slice(hs, CAST(j AS INT),
                                                     CAST(j + 3 AS INT))))
           )) AS INT) AS n_fingerprints,
           list_min(hs) AS min_fp
    FROM g
    ORDER BY doc_id
    """,
    priority=3,  # r7: implementation changed (kernel/join) - re-prove in driver window
)
def text_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-hash document fingerprinting by winnowing (k=8 char-grams,
    window w=4): per document, the k-gram count, the size of the selected
    fingerprint set, and the global minimum hash.

    The whole pipeline — shingling, hashing, windowed minima, dedup — is
    array expressions inside whole-stage codegen; per-row state is
    O(doc_len), nothing shuffles but the final sort. The hash array is
    projected once and the window pass references the bound column (two
    selects — Catalyst keeps them separate because the alias is used
    repeatedly), so each k-gram is hashed exactly once. md5-hex minima
    are lexicographic, so the DuckDB oracle replays every window exactly."""
    from ror_etl_spark.functions.text import normalize_text, winnow_stats_udf
    from ror_etl_spark.operators.util import spread

    d = spread(Tables(spark, sf_dir).documents)
    st = winnow_stats_udf()
    return (
        d.select("doc_id", st(normalize_text(F.col("text"))).alias("st"))
        .select("doc_id", "st.n_kgrams", "st.n_fingerprints", "st.min_fp")
    )


@query(
    "pack_token_bins",
    oracle="""
    WITH t AS (
      SELECT source, doc_id,
             array_length(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS n_tok
      FROM documents),
    b AS (
      SELECT source, n_tok,
             CAST(floor((sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                                          ROWS UNBOUNDED PRECEDING) - n_tok) / 512) AS BIGINT) AS bin
      FROM t)
    SELECT source, bin,
           CAST(count(*) AS BIGINT)  AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS n_tokens
    FROM b
    GROUP BY source, bin
    ORDER BY source, bin
    """,
)
def pack_token_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy sequence packing for LLM training: documents are packed in
    doc_id order into contiguous ~512-token bins, independently per
    source. The bin id is a closed form over the running token count
    (cumsum exclusive of the current doc, floor-divided by the bin size),
    so packing is a keyed window — parallel across sources, one shuffle,
    no stateful loop — and DuckDB replays it exactly."""
    from pyspark.sql.window import Window

    d = Tables(spark, sf_dir).documents
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    n_tok = token_count(F.col("text"))
    return (
        d.select("source", "doc_id", n_tok.alias("n_tok"))
        .select(
            "source",
            "n_tok",
            F.floor((F.sum("n_tok").over(w) - F.col("n_tok")) / 512).alias("bin"),
        )
        .groupBy("source", "bin")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("n_tokens"),
        )
    )


def _kappa_oracle() -> str:
    """Cohen's kappa from the SAME generated confusion-matrix SQL the
    lang-ID twin uses (wrapped as a subquery so the stopword lists can
    never drift between the two oracles)."""
    cm = _lang_id_oracle()
    return f"""
    WITH cm AS (SELECT * FROM ({cm}) q),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn FROM cm),
    agree AS (
      SELECT CAST(coalesce(sum(n) FILTER (WHERE lang = pred), 0) AS BIGINT)
        AS po_n FROM cm),
    rows_ AS (SELECT lang AS k, sum(n) AS r FROM cm GROUP BY lang),
    cols_ AS (SELECT pred AS k, sum(n) AS c FROM cm GROUP BY pred),
    pe AS (
      SELECT CAST(sum(rows_.r * cols_.c) AS BIGINT) AS pe_nn
      FROM rows_ JOIN cols_ ON rows_.k = cols_.k)
    SELECT tot.nn AS n_docs, agree.po_n AS n_agree,
           round(CAST(agree.po_n AS DOUBLE) / tot.nn + 1e-9, 6) AS po,
           round(CAST(pe.pe_nn AS DOUBLE) / (CAST(tot.nn AS DOUBLE) * tot.nn)
                 + 1e-9, 6) AS pe,
           round((CAST(agree.po_n AS DOUBLE) / tot.nn
                  - CAST(pe.pe_nn AS DOUBLE) / (CAST(tot.nn AS DOUBLE) * tot.nn))
                 / (1.0 - CAST(pe.pe_nn AS DOUBLE)
                          / (CAST(tot.nn AS DOUBLE) * tot.nn)) + 1e-9, 6)
             AS kappa
    FROM tot CROSS JOIN agree CROSS JOIN pe
    """


@query("cohens_kappa_lang_id", oracle=_kappa_oracle(), priority=5)
def cohens_kappa_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between the stopword lang-ID heuristic and the
    labeled lang column — chance-corrected agreement, the standard
    annotation/classifier-audit statistic (raw accuracy flatters any
    classifier on a skewed label marginal; kappa subtracts the margin
    product the same way the chi-square op subtracts independence).

    Reuses the text_lang_id confusion matrix wholesale: one
    category-domain-sized aggregate; margins and the kappa scalar
    reduce from the CELLS. All counts are exact integers; po, pe and
    kappa are three rationals of those integers, rounded with the
    epsilon shift. The oracle wraps the SAME generated stopword SQL
    the lang-ID twin pins, so the two oracles cannot drift."""
    from ror_etl_spark.functions.text import lang_id
    from ror_etl_spark.operators.util import spread

    d = spread(Tables(spark, sf_dir).documents)
    cm = (
        d.select("lang", lang_id(F.col("text")).alias("pred"))
        .groupBy("lang", "pred")
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=False)
    )
    tot = cm.agg(F.sum("n").alias("nn"))
    agree = cm.where(F.col("lang") == F.col("pred")).agg(
        F.coalesce(F.sum("n"), F.lit(0)).alias("po_n")
    )
    rows_ = cm.groupBy(F.col("lang").alias("k")).agg(F.sum("n").alias("r"))
    cols_ = cm.groupBy(F.col("pred").alias("k")).agg(F.sum("n").alias("c"))
    pe = rows_.join(cols_, "k").agg(
        F.sum(F.col("r") * F.col("c")).alias("pe_nn")
    )
    out = tot.crossJoin(agree).crossJoin(pe)
    po = F.col("po_n").cast("double") / F.col("nn")
    pev = F.col("pe_nn").cast("double") / (F.col("nn").cast("double") * F.col("nn"))
    return out.select(
        F.col("nn").alias("n_docs"),
        F.col("po_n").alias("n_agree"),
        F.round(po + 1e-9, 6).alias("po"),
        F.round(pev + 1e-9, 6).alias("pe"),
        F.round((po - pev) / (F.lit(1.0) - pev) + 1e-9, 6).alias("kappa"),
    )
