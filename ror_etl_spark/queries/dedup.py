"""Deduplication queries (LLM-pipeline surface): exact, keep-best,
MinHash-LSH, SimHash, n-gram Jaccard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ror_etl_spark.operators.components import dedup_clusters
from ror_etl_spark.operators.dedup import (
    exact_dedup,
    jaccard_verify,
    keep_best_per_key,
    lsh_candidate_pairs,
    minhash_signatures,
    shingles,
    simhash_candidates,
)
from ror_etl_spark.registry import query
from ror_etl_spark.tables import Tables
from ror_etl_spark.queries.util import r4


@query(
    "dedup_exact",
    oracle="""
    SELECT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fingerprint,
           min(doc_id) AS keep_id,
           count(*)    AS n_copies
    FROM documents
    GROUP BY fingerprint
    ORDER BY fingerprint
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup groups: hash-groupBy on normalized-text fingerprint.
    Only the 32-hex key and the id shuffle — never the document payload."""
    d = Tables(spark, sf_dir).documents
    return exact_dedup(d).orderBy("fingerprint")


@query(
    "dedup_keep_latest",
    oracle="""
    SELECT user_id, event_type, event_id, round(value, 4) AS value FROM (
      SELECT user_id, event_type, event_id, value,
             row_number() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events)
    WHERE rn = 1
    ORDER BY user_id, event_type
    """,
)
def dedup_keep_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-best dedup: latest event per (user, type) — the standard
    CDC/snapshot compaction shape."""
    e = Tables(spark, sf_dir).events
    kept = keep_best_per_key(
        e,
        keys=["user_id", "event_type"],
        order_by=[F.desc("ts"), F.desc("event_id")],
    )
    return kept.select(
        "user_id", "event_type", "event_id", r4(F.col("value")).alias("value")
    ).orderBy("user_id", "event_type")


@query(
    "dedup_ngram_jaccard",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS t
      FROM documents),
    sh AS (
      SELECT doc_id,
             list_distinct(list_transform(
               range(1, greatest(array_length(t) - 2, 1) + 1),
               i -> concat(t[i], ' ', t[i+1], ' ', t[i+2]))) AS s
      FROM toks)
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           round(CAST(array_length(list_filter(a.s, x -> list_contains(b.s, x))) AS DOUBLE)
                 / greatest(array_length(list_distinct(list_concat(a.s, b.s))), 1), 4) AS jaccard
    FROM sh a JOIN sh b ON b.doc_id = a.doc_id + 1
    ORDER BY id_a
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard between consecutive doc ids — the verification
    kernel of the near-dedup funnel, oracle-checked end to end."""
    d = Tables(spark, sf_dir).documents
    sh = d.select(
        "doc_id",
        F.array_distinct(shingles(F.col("text"), 3)).alias("s"),
    )
    a = sh.select(F.col("doc_id").alias("id_a"), F.col("s").alias("sa"))
    b = sh.select(F.col("doc_id").alias("id_b"), F.col("s").alias("sb"))
    j = a.join(b, F.col("id_b") == F.col("id_a") + 1)
    inter = F.size(F.array_intersect("sa", "sb")).cast("double")
    union = F.size(F.array_distinct(F.concat("sa", "sb")))
    return (
        j.select("id_a", "id_b", r4(inter / F.greatest(union, F.lit(1))).alias("jaccard"))
        .orderBy("id_a")
    )


@query("dedup_minhash_lsh")  # xxhash-based signatures are engine-internal
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(32) + LSH(8 bands × 4) candidate pairs, Jaccard-verified at
    ≥ 0.5. Unit tests plant near-duplicates and assert recall; the driver
    records a rows-only check (hash seeds are engine-internal)."""
    d = Tables(spark, sf_dir).documents
    sigs = minhash_signatures(d, num_hashes=32)
    cands = lsh_candidate_pairs(sigs, bands=8, rows_per_band=4)
    verified = jaccard_verify(cands, d, threshold=0.5)
    return verified.select("id_a", "id_b", r4(F.col("jaccard")).alias("jaccard")).orderBy(
        "id_a", "id_b"
    )


@query("dedup_simhash")  # engine-internal 64-bit hashes
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash-banded near-dup candidates with Hamming distance ≤ 8."""
    d = Tables(spark, sf_dir).documents
    pairs = simhash_candidates(d)
    return pairs.filter(F.col("hamming") <= 8).orderBy("id_a", "id_b")


@query("dedup_near_clusters")  # engine-internal hashes feed the pair graph
def dedup_near_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full near-dedup funnel: MinHash signatures → LSH candidates →
    exact-Jaccard verification (≥0.5) → connected components → one keeper
    per transitive duplicate cluster. Returns cluster summary rows."""
    d = Tables(spark, sf_dir).documents
    cands = lsh_candidate_pairs(minhash_signatures(d, num_hashes=32))
    verified = jaccard_verify(cands, d, threshold=0.5).select("id_a", "id_b")
    clusters = dedup_clusters(d, verified)
    return (
        clusters.groupBy("cluster")
        .agg(
            F.count(F.lit(1)).alias("size"),
            F.sum(F.col("is_keeper").cast("long")).alias("n_keepers"),
        )
        .filter(F.col("size") > 1)
        .orderBy("cluster")
    )
