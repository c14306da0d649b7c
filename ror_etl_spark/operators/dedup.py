"""Deduplication operator family for LLM-data pipelines.

Four tiers, cheapest first — the standard funnel at 100 TB is
exact → MinHash-LSH candidates → verified near-dup clusters:

- **exact**: hash-groupBy on a normalized fingerprint. One shuffle on the
  16-byte md5 key (never the document payload when ``payload=False``).
- **MinHash + LSH**: shingle → n independent min-hashes → band signatures
  → candidates = docs sharing any band bucket. Only signatures shuffle
  (b × 8 bytes per doc); candidate verification joins payloads for the
  tiny candidate set only.
- **SimHash**: 64-bit locality-sensitive fingerprint; near-dups differ in
  few bits. Bucket by the four 16-bit sub-bands (any exact sub-band match
  is a candidate — Hamming distance ≤ 3 guarantees a hit by pigeonhole).
- **n-gram Jaccard verify**: exact shingle-set similarity for candidate
  pairs (the verification step after either LSH).

All expression-level work is built-in higher-order functions (JVM
codegen); there is no Python UDF anywhere in this module.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from ror_etl_spark.functions.text import normalize_text, fingerprint_md5
from ror_etl_spark.operators.util import spread


def shingles(text_col, k: int = 3):
    """k-token shingles of normalized text as an array<string> Column."""
    toks = F.split(normalize_text(text_col), " ")
    n = F.size(toks)
    idx = F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1)))
    return F.transform(
        idx,
        lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j) for j in range(k)]),
    )


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact duplicate groups by normalized-text fingerprint.

    Returns (fingerprint, keep_id, n_copies); keep_id is the minimum id so
    the survivor choice is deterministic. Join back on fingerprint to drop
    losers."""
    return (
        df.select(
            fingerprint_md5(F.col(text_col)).alias("fingerprint"),
            F.col(id_col).alias("id"),
        )
        .groupBy("fingerprint")
        .agg(F.min("id").alias("keep_id"), F.count(F.lit(1)).alias("n_copies"))
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    shingle_k: int = 3,
) -> DataFrame:
    """(id, minhash: array<bigint>[num_hashes]).

    Each shingle is string-hashed ONCE; the ``num_hashes`` lanes re-mix the
    resulting 8-byte long with ``xxhash64(h, lane)`` — fixed-width input,
    far cheaper than hashing the variable-length string per lane, which
    matters when the corpus is 100 TB of text. (Multiplicative universal
    hashing would be cheaper still but Spark 4's ANSI mode forbids wrapping
    long multiply.) P(minhash_i equal) = Jaccard of the shingle sets."""
    sh = F.array_distinct(shingles(F.col(text_col), shingle_k))
    base = F.transform(sh, lambda s: F.xxhash64(s))
    with_base = spread(df).select(F.col(id_col).alias("id"), base.alias("__hashes"))

    def lane(i: int):
        # factory: a single-arg lambda (default-arg lambdas are mistaken
        # for pyspark's multi-arg higher-order-function form)
        return lambda h: F.xxhash64(h, F.lit(i))

    sig = F.array(
        *[
            F.array_min(F.transform(F.col("__hashes"), lane(i)))
            for i in range(num_hashes)
        ]
    )
    return with_base.select("id", sig.alias("minhash"))


def lsh_candidate_pairs(
    signatures: DataFrame, bands: int = 8, rows_per_band: int = 4
) -> DataFrame:
    """Candidate near-dup pairs (id_a < id_b) from banded minhash signatures.

    Docs agreeing on ALL rows of ANY band share a bucket. The bucket join
    shuffles only (band, 8-byte bucket hash, id); a self-join per bucket
    yields pairs. Bucket skew (a degenerate shingle shared by everything)
    is bounded because the bucket key includes all ``rows_per_band``
    minhashes."""
    assert bands * rows_per_band <= 1 << 10
    banded = signatures.cache().select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            *[
                                F.element_at("minhash", b * rows_per_band + r + 1)
                                for r in range(rows_per_band)
                            ]
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "bb.band", "bb.bucket")
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def jaccard_verify(
    pairs: DataFrame,
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
    threshold: float = 0.7,
) -> DataFrame:
    """Exact n-gram Jaccard for candidate pairs; keeps pairs ≥ threshold.

    Payload join happens only for candidates (tiny vs corpus), and the
    shingle sets are recomputed JVM-side — cheaper than shipping shingle
    arrays through the LSH shuffle."""
    sh = spread(docs).select(
        F.col(id_col).alias("id"),
        F.array_distinct(shingles(F.col(text_col), shingle_k)).alias("sh"),
    )
    j = (
        pairs.join(sh.withColumnsRenamed({"id": "id_a", "sh": "sh_a"}), "id_a")
        .join(sh.withColumnsRenamed({"id": "id_b", "sh": "sh_b"}), "id_b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return (
        j.select(
            "id_a",
            "id_b",
            (inter / F.greatest(union, F.lit(1))).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def _bit_mask(j: int) -> int:
    """Signed-64 mask for bit j (bit 63 is the sign bit)."""
    return (1 << j) if j < 63 else -(1 << 63)


def _sign_bits(s):
    """array<long>[64] of ±1 per bit of xxhash64(s). Masks are Python-int
    literals (shift amounts can't be Columns in shiftright)."""
    h = F.xxhash64(s)
    return F.array(
        *[
            F.when(h.bitwiseAND(F.lit(_bit_mask(j))) != 0, F.lit(1).cast("long"))
            .otherwise(F.lit(-1).cast("long"))
            for j in range(64)
        ]
    )


def simhash64(text_col, shingle_k: int = 2):
    """64-bit SimHash Column over shingles: sum ±1 per bit across shingle
    hashes, take the sign bit pattern. Built from aggregate/zip_with —
    64 lanes per shingle, all in codegen."""
    sh = F.array_distinct(shingles(text_col, shingle_k))
    counts = F.aggregate(
        sh,
        F.array_repeat(F.lit(0).cast("long"), 64),
        lambda acc, s: F.zip_with(acc, _sign_bits(s), lambda a, b: a + b),
    )
    sim = F.lit(0).cast("long")
    for j in range(64):
        sim = sim.bitwiseOR(
            F.when(F.element_at(counts, j + 1) > 0, F.lit(_bit_mask(j)).cast("long"))
            .otherwise(F.lit(0).cast("long"))
        )
    return sim


def simhash_signatures(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", shingle_k: int = 2
) -> DataFrame:
    """(id, sim) SimHash signatures via explode + groupBy.

    The nested-array formulation (``simhash64``) builds a 64-wide
    zip_with per shingle — a huge codegen unit that compiles slowly and
    evaluates worse. This shape instead explodes shingles and takes 64
    flat ``sum(±1)`` aggregates: vectorized HashAggregate with map-side
    partial aggregation, one shuffle keyed on id — the formulation that
    scales to 100 TB corpora."""
    sh = F.array_distinct(shingles(F.col(text_col), shingle_k))
    hashed = (
        spread(df)
        .select(F.col(id_col).alias("id"), F.explode(sh).alias("s"))
        .select("id", F.xxhash64("s").alias("h"))
    )
    sums = hashed.groupBy("id").agg(
        *[
            F.sum(
                F.when(F.col("h").bitwiseAND(F.lit(_bit_mask(j))) != 0, 1).otherwise(-1)
            ).alias(f"b{j}")
            for j in range(64)
        ]
    )
    sim = F.lit(0).cast("long")
    for j in range(64):
        sim = sim.bitwiseOR(
            F.when(F.col(f"b{j}") > 0, F.lit(_bit_mask(j)).cast("long"))
            .otherwise(F.lit(0).cast("long"))
        )
    return sums.select("id", sim.alias("sim"))


def simhash_candidates(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Near-dup candidates by SimHash banding: split the 64-bit hash into
    four 16-bit bands; any exact band match -> candidate (pigeonhole: covers
    all pairs with Hamming distance <= 3).

    Signatures are cached before the self-join so the expensive hash pass
    runs once, not once per join side."""
    sig = simhash_signatures(df, text_col, id_col).cache()
    banded = sig.select(
        "id",
        "sim",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright("sim", b * 16).bitwiseAND(F.lit(0xFFFF)).alias("key"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("bb"),
    ).select("id", "sim", "bb.band", "bb.key")
    a, b = banded.alias("a"), banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.bit_count(F.col("a.sim").bitwiseXOR(F.col("b.sim"))).alias("hamming"),
        )
        .distinct()
    )
    return pairs


def keep_best_per_key(
    df: DataFrame, keys: list[str], order_by: list, keep: int = 1
) -> DataFrame:
    """Generic keep-best dedup: row_number over (keys, order) ≤ keep."""
    w = W.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= keep)
        .drop("__rn")
    )
