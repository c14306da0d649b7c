"""Explode-based text analytics: term frequencies, TF-IDF, positional
explode — the flatten-then-aggregate family."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ror_etl_spark.registry import query
from ror_etl_spark.tables import Tables
from ror_etl_spark.queries.util import r6


@query(
    "text_term_frequency",
    oracle="""
    SELECT tok, count(*) AS tf, count(DISTINCT doc_id) AS df
    FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
    GROUP BY tok
    ORDER BY tf DESC, tok
    LIMIT 20
    """,
)
def text_term_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus term/document frequency (the shape every index build starts
    with). Per-doc term counts are computed map-side from the sorted token
    array (``sorted_runs``), so the one token-keyed exchange carries
    (tok, c) pairs — already distinct per doc — and both aggregates get
    map-side partials: tf = sum(c), df = count(rows). The former
    ``count_distinct(doc_id)`` two-phase plan shuffled the full exploded
    (tok, doc_id) stream instead."""
    from ror_etl_spark.functions.text import sorted_runs
    from ror_etl_spark.operators.util import spread

    d = spread(Tables(spark, sf_dir).documents)
    st = d.select(F.array_sort(F.split("text", " ")).alias("st"))
    tc = st.select("st", sorted_runs(F.col("st")).alias("rs"))
    pairs = tc.select(
        F.explode(
            F.transform(
                "rs",
                lambda r: F.struct(
                    F.get(F.col("st"), r["s"]).alias("tok"), r["c"].alias("c")
                ),
            )
        ).alias("p")
    ).select("p.tok", "p.c")
    return (
        pairs.groupBy("tok")
        .agg(F.sum("c").alias("tf"), F.count(F.lit(1)).alias("df"))
        .orderBy(F.desc("tf"), "tok")
        .limit(20)
    )


@query(
    "text_tfidf_top_terms",
    oracle="""
    WITH tokens AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
    tf AS (
      SELECT doc_id, tok, count(*) AS tf FROM tokens GROUP BY doc_id, tok),
    df AS (
      SELECT tok, count(DISTINCT doc_id) AS df FROM tokens GROUP BY tok),
    n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.tok,
             round(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df) + 1e-9, 6) AS tfidf
      FROM tf JOIN df ON tf.tok = df.tok CROSS JOIN n)
    SELECT doc_id, tok, tfidf FROM (
      SELECT doc_id, tok, tfidf,
             row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, tok) AS rn
      FROM scored)
    WHERE rn = 1 AND doc_id <= 100
    ORDER BY doc_id
    """,
)
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top TF-IDF term per document: tf per (doc,term) → df per term
    (broadcast) → score → per-doc argmax window.

    df is counted from per-doc-DISTINCT tokens (``array_distinct`` before
    the explode): each (doc, tok) then appears exactly once, so a plain
    map-side-combined count replaces ``count_distinct`` — whose two-phase
    plan shuffled the full (tok, doc_id) token stream — and only (tok,
    partial-count) rows cross the one remaining exchange. n_docs is a
    lazy broadcast single-row aggregate, not a driver-side ``count()``,
    so construction triggers no Spark job."""
    d = Tables(spark, sf_dir).documents
    tokens = d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    tf = tokens.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    df = (
        d.select(F.explode(F.array_distinct(F.split("text", " "))).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    nd = d.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    scored = (
        tf.join(F.broadcast(df), "tok")
        .crossJoin(F.broadcast(nd))
        .select(
            "doc_id",
            "tok",
            F.round(
                F.col("tf") * F.log(F.col("n_docs") / F.col("df")) + 1e-9, 6
            ).alias("tfidf"),
        )
    )
    w = W.partitionBy("doc_id").orderBy(F.desc("tfidf"), "tok")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("doc_id") <= 100))
        .select("doc_id", "tok", "tfidf")
    )


@query(
    "posexplode_first_tokens",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
               FROM documents WHERE doc_id <= 50)
    SELECT doc_id, CAST(i - 1 AS INT) AS pos, toks[i] AS tok
    FROM t, range(1, 4) r(i)
    WHERE i <= array_length(toks)
    ORDER BY doc_id, pos
    """,
)
def posexplode_first_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional explode (lateral view with ordinality)."""
    d = Tables(spark, sf_dir).documents.filter(F.col("doc_id") <= 50)
    return (
        d.select("doc_id", F.posexplode(F.split("text", " ")).alias("pos", "tok"))
        .filter(F.col("pos") <= 2)
        .select("doc_id", "pos", "tok")
        .orderBy("doc_id", "pos")
    )


@query(
    "text_feature_hash_stats",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             unnest(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS w
      FROM documents),
    b AS (
      SELECT doc_id,
             ('0x' || substr(md5(w), 1, 8))::BIGINT % 256 AS bucket,
             CAST(count(*) AS BIGINT) AS c
      FROM toks GROUP BY doc_id, bucket)
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS nnz,
           CAST(max(c) AS BIGINT) AS max_count,
           CAST(sum(c) AS BIGINT) AS l1,
           round(sqrt(sum(c * c)) + 1e-9, 4) AS l2
    FROM b GROUP BY doc_id ORDER BY doc_id
    """,
    priority=3,
)
def text_feature_hash_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick featurization (Weinberger et al.; sklearn's
    HashingVectorizer shape): every token maps to one of 256 buckets by
    content hash — no vocabulary to build, ship, or keep consistent
    across a 100 TB corpus, which is the entire point of the trick.
    Emitted per document: the sparse-vector statistics a downstream
    trainer's capacity planning needs (nnz, max bucket collision count,
    L1/L2 norms).

    Scale shape: the whole sparse vector lives inside its own row, so no
    token or bucket ever shuffles — the bucket-id array sorts map-side
    and collision counts are its run lengths (``sorted_runs``); the
    former explode → groupBy(doc_id, bucket) → groupBy(doc_id) pair paid
    two data-sized exchanges for per-row statistics. Bucket ids are
    md5-derived so the oracle builds the identical vectors; the single
    float (L2) is an epsilon-rounded sqrt of an exact integer sum."""
    from ror_etl_spark.functions.text import run_counts, sorted_runs, tokens
    from ror_etl_spark.operators.util import spread

    d = spread(Tables(spark, sf_dir).documents)
    bucket_of = lambda w: (  # noqa: E731
        F.conv(F.substring(F.md5(w), 1, 8), 16, 10).cast("long") % 256
    )
    bs = d.select(
        "doc_id",
        F.array_sort(F.transform(tokens(F.col("text")), bucket_of)).alias("bs"),
    )
    cs = bs.select(
        "doc_id",
        F.size("bs").cast("long").alias("l1"),
        run_counts(sorted_runs(F.col("bs"))).alias("cs"),
    )
    sumsq = F.aggregate(
        "cs", F.lit(0).cast("long"), lambda a, c: a + c.cast("long") * c
    )
    return cs.select(
        "doc_id",
        F.size("cs").cast("long").alias("nnz"),
        F.array_max("cs").cast("long").alias("max_count"),
        "l1",
        F.round(F.sqrt(sumsq) + 1e-9, 4).alias("l2"),
    ).orderBy("doc_id")
