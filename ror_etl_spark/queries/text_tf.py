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
    """Corpus term/document frequency via explode → groupBy (the shape
    every index build starts with; one shuffle keyed by token)."""
    d = Tables(spark, sf_dir).documents
    return (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("tf"), F.count_distinct("doc_id").alias("df"))
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
    """Top TF-IDF term per document: explode → tf per (doc,term) → df per
    term (broadcast) → score → per-doc argmax window."""
    d = Tables(spark, sf_dir).documents
    tokens = d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    tf = tokens.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    df = tokens.groupBy("tok").agg(F.count_distinct("doc_id").alias("df"))
    n_docs = d.count()  # scalar; at scale use a broadcast single-row agg
    scored = tf.join(F.broadcast(df), "tok").select(
        "doc_id",
        "tok",
        F.round(F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")) + 1e-9, 6).alias(
            "tfidf"
        ),
    )
    w = W.partitionBy("doc_id").orderBy(F.desc("tfidf"), "tok")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("doc_id") <= 100))
        .select("doc_id", "tok", "tfidf")
        .orderBy("doc_id")
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
