"""Deduplication queries (LLM-pipeline surface): exact, keep-best,
MinHash-LSH, SimHash, n-gram Jaccard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ror_etl_spark.operators.components import dedup_clusters
from ror_etl_spark.operators.dedup import (
    exact_dedup,
    jaccard_at_least,
    LANE_POOL,
    jaccard_verify,
    keep_best_per_key,
    lsh_candidate_pairs,
    minhash_signatures,
    shingles,
    simhash_candidates,
    tuned_band_rows,
    tuned_bands_for_rows,
)
from ror_etl_spark.registry import query
from ror_etl_spark.tables import Tables
from ror_etl_spark.queries.util import ordered, r4


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
    return exact_dedup(d)


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
    # r5: union computation rewritten (inclusion-exclusion, two-step
    # projection) — keep it inside the driver's 50-query window so the
    # change re-proves against the driver's own oracle run
    priority=2,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard between consecutive doc ids — the verification
    kernel of the near-dedup funnel, oracle-checked end to end."""
    from ror_etl_spark.operators.util import spread

    # shingle arrays + intersect/union are the hot per-row work; the
    # single-file scan must fan out first (31s -> ~2s at sf0.1)
    d = spread(Tables(spark, sf_dir).documents)
    sh = d.select(
        "doc_id",
        F.array_distinct(shingles(F.col("text"), 3)).alias("s"),
    # both join sides consume this frame: without a checkpoint the
    # normalize/split/shingle pipeline re-executes per side (measured
    # 17 s -> 6.6 s at the sf1 rehearsal tier; same fix as the prefix
    # filter's token expansion)
    ).localCheckpoint(eager=False)
    a = sh.select(F.col("doc_id").alias("id_a"), F.col("s").alias("sa"))
    b = sh.select(F.col("doc_id").alias("id_b"), F.col("s").alias("sb"))
    j = a.join(b, F.col("id_b") == F.col("id_a") + 1)
    # both sides are already distinct, so |A∪B| = |A|+|B|-|A∩B| — one
    # array_intersect per row instead of also materializing the distinct
    # concat (the second-largest per-row cost at the sf1 rehearsal tier).
    # Two-step projection so the intersect is structurally evaluated once:
    # CollapseProject refuses to inline a non-cheap alias referenced twice.
    sized = j.select(
        "id_a",
        "id_b",
        F.size(F.array_intersect("sa", "sb")).alias("i"),
        (F.size("sa") + F.size("sb")).alias("ab"),
    )
    jac = F.col("i").cast("double") / F.greatest(F.col("ab") - F.col("i"), F.lit(1))
    return sized.select("id_a", "id_b", r4(jac).alias("jaccard")).transform(ordered, "id_a")


def _shingle_cte(k: int = 3) -> str:
    """DuckDB CTEs replaying ror_etl_spark.operators.dedup.shingles: (doc_id,
    s = distinct k-token shingles of normalized text)."""
    concat = "concat(" + ", ' ', ".join(f"t[i+{j}]" for j in range(k)) + ")"
    return f"""
    toks AS (
      SELECT doc_id,
             string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS t
      FROM documents),
    sh AS (
      SELECT doc_id,
             list_distinct(list_transform(
               range(1, greatest(array_length(t) - {k - 1}, 1) + 1),
               i -> {concat})) AS s
      FROM toks)"""


_JACCARD = """
    CAST(array_length(list_filter(sa.s, x -> list_contains(sb.s, x))) AS DOUBLE)
    / greatest(array_length(list_distinct(list_concat(sa.s, sb.s))), 1)"""


def _minhash_ctes(num_hashes: int = 32, bands: int = 8, rows: int = 4) -> str:
    """DuckDB replay of minhash_signatures + lsh_candidate_pairs: the md5
    token hashes, the Horner shingle combine, and the (a·h + b) mod 2^31-1
    lane remixes are all portable arithmetic, so the oracle computes
    bit-identical signatures, band keys and candidate pairs
    (operators/dedup.py:md5_hash31 / shingle_hashes document the
    pairing)."""
    from ror_etl_spark.operators.dedup import HORNER_BASE, lane_params

    lanes = ", ".join(
        f"list_min(list_transform(hs, h -> ({a} * h + {b}) % 2147483647))"
        for a, b in lane_params(num_hashes)
    )
    keys = ", ".join(
        "concat_ws(',', "
        + ", ".join(f"m[{b * rows + r + 1}]" for r in range(rows))
        + f") AS k{b}"
        for b in range(bands)
    )
    band_structs = ", ".join(f"{{'band': {b}, 'key': k{b}}}" for b in range(bands))
    B = HORNER_BASE
    horner = (
        f"((coalesce(th[i], 0) * {B} + coalesce(th[i+1], 0)) % 2147483647"
        f" * {B} + coalesce(th[i+2], 0)) % 2147483647"
    )
    return f"""
    {_shingle_cte(3)},
    tokh AS (
      SELECT doc_id,
             list_transform(
               t, x -> ('0x' || substr(md5(x), 1, 8))::BIGINT & 2147483647) AS th
      FROM toks),
    hs AS (
      SELECT doc_id,
             list_distinct(list_transform(
               range(1, greatest(array_length(th) - 2, 1) + 1),
               i -> {horner})) AS hs
      FROM tokh),
    sig AS (SELECT doc_id, [{lanes}] AS m FROM hs),
    keys AS (SELECT doc_id, {keys} FROM sig),
    bandrows AS (
      SELECT doc_id, u.band AS band, u.key AS key
      FROM (SELECT doc_id, unnest([{band_structs}]) AS u FROM keys)),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bandrows a JOIN bandrows b
        ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id)"""


@query(
    "dedup_minhash_lsh",
    oracle=f"""
    WITH {_minhash_ctes()}
    SELECT c.id_a, c.id_b, round({_JACCARD}, 4) AS jaccard
    FROM cand c
    JOIN sh sa ON sa.doc_id = c.id_a
    JOIN sh sb ON sb.doc_id = c.id_b
    WHERE {_JACCARD} >= 0.5
    ORDER BY id_a, id_b
    """,
    priority=2,
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(32) + LSH(8 bands × 4) candidate pairs, Jaccard-verified at
    ≥ 0.5. The md5-based portable signature hash lets the DuckDB oracle
    replay the whole funnel — banding, candidates and verification are
    hash-checked end to end, not just row-counted."""
    d = Tables(spark, sf_dir).documents
    sigs = minhash_signatures(d, num_hashes=32)
    cands = lsh_candidate_pairs(sigs, bands=8, rows_per_band=4)
    verified = jaccard_verify(cands, d, threshold=0.5)
    return verified.select(
        "id_a", "id_b", r4(F.col("jaccard")).alias("jaccard")
    )


def _minhash_tuned_ctes(threshold: float = 0.8, target_recall: float = 0.9) -> str:
    """DuckDB replay of the TUNED MinHash-LSH candidate chain (through
    ``cand``), with the band scheme derived from the corpus row count
    INSIDE the SQL:

    - ``r`` (rows per band) comes from the same integer-exact rule as
      ``tuned_band_rows`` — ``min(r) FROM range(4,17) WHERE
      250·2^r ≥ count(*)`` — pure integer comparisons, no float logs;
    - ``b`` (bands) is a CASE lookup over r whose values the generator
      computes ONCE in Python via ``tuned_bands_for_rows`` (the float log
      never runs in two engines);
    - lane (a,b) constants are inlined for the MAXIMUM supported scheme
      (32 bands × 16 rows = 512 lanes); ``lane_params`` draws lanes
      sequentially from one seeded stream, so any smaller lane count uses
      an exact PREFIX of the literal arrays — bit-identical to the Spark
      operator's ``lane_params(min(b·r, LANE_POOL))``;
    - band → lane-index mapping replays ``band_lane_indices``: the
      consecutive slices while ``b·r ≤ LANE_POOL`` and the odd-step
      strided pool draws beyond it, as a CASE on ``b·r`` — pure
      non-negative integer arithmetic, identical in both engines.

    Everything downstream (signatures, band keys, candidates, Jaccard
    verify) is the fixed oracle's portable arithmetic, just with dynamic
    extents, so the driver hash-checks the tuned funnel end to end at ANY
    scale factor."""
    from ror_etl_spark.operators.dedup import (
        HORNER_BASE,
        LANE_POOL,
        MERSENNE31,
        lane_params,
    )

    pool = LANE_POOL
    params = lane_params(32 * 16)
    al = "[" + ",".join(str(a) for a, _ in params) + "]"
    bl = "[" + ",".join(str(b) for _, b in params) + "]"
    b_case = " ".join(
        f"WHEN {r} THEN {tuned_bands_for_rows(r, threshold, target_recall)}"
        for r in range(4, 17)
    )
    B = HORNER_BASE
    horner = (
        f"((coalesce(th[i], 0) * {B} + coalesce(th[i+1], 0)) % {MERSENNE31}"
        f" * {B} + coalesce(th[i+2], 0)) % {MERSENNE31}"
    )
    return f"""
    {_shingle_cte(3)},
    tokh AS (
      SELECT doc_id,
             list_transform(
               t, x -> ('0x' || substr(md5(x), 1, 8))::BIGINT & 2147483647) AS th
      FROM toks),
    hs AS (
      SELECT doc_id,
             list_distinct(list_transform(
               range(1, greatest(array_length(th) - 2, 1) + 1),
               i -> {horner})) AS hs
      FROM tokh),
    nn AS (SELECT count(*) AS n FROM documents),
    p0 AS (SELECT coalesce(min(range), 16)::INT AS r
           FROM range(4, 17), nn WHERE 250 * (1::BIGINT << range) >= nn.n),
    prm AS (SELECT r, (CASE r {b_case} END)::INT AS b FROM p0),
    lanep AS (
      SELECT l, ({al})[l] AS a, ({bl})[l] AS bb
      FROM (SELECT unnest(range(1, least(b * r, {pool}) + 1)) AS l FROM prm)),
    sigrow AS (
      SELECT h.doc_id, lp.l,
             list_min(list_transform(h.hs, x -> (lp.a * x + lp.bb) % {MERSENNE31})) AS v
      FROM hs h CROSS JOIN lanep lp),
    sig AS (SELECT doc_id, list(v ORDER BY l) AS m FROM sigrow GROUP BY doc_id),
    bidx AS (SELECT unnest(range(0, b)) AS band, r, b FROM prm),
    bandrows AS (
      SELECT s.doc_id, bi.band,
             array_to_string(
               list_transform(range(0, bi.r),
                 j -> s.m[CASE WHEN bi.b * bi.r <= {pool}
                          THEN bi.band * bi.r + j + 1
                          ELSE ((bi.band * 2654435761) % {pool}
                                + j * (2 * ((bi.band * 40503) % {pool // 2}) + 1))
                               % {pool} + 1 END]), ',') AS key
      FROM sig s CROSS JOIN bidx bi),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bandrows a JOIN bandrows b
        ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id)"""


def _minhash_tuned_oracle(threshold: float = 0.8, target_recall: float = 0.9) -> str:
    """Tuned candidate chain + the Jaccard verify select."""
    return f"""
    WITH {_minhash_tuned_ctes(threshold, target_recall)}
    SELECT c.id_a, c.id_b, round({_JACCARD}, 4) AS jaccard
    FROM cand c
    JOIN sh sa ON sa.doc_id = c.id_a
    JOIN sh sb ON sb.doc_id = c.id_b
    WHERE {_JACCARD} >= {threshold}
    ORDER BY id_a, id_b
    """


@query("dedup_minhash_lsh_tuned", oracle=_minhash_tuned_oracle(), priority=3)
def dedup_minhash_lsh_tuned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup pairs with the band scheme DERIVED FROM THE
    CORPUS SIZE — the scale-safe form of ``dedup_minhash_lsh``.

    The fixed 32/8/4 twin measured a x13.6 sf1→sf10 step (SCALING.md):
    at fixed band width, band-key collisions grow with the corpus, so
    in-bucket candidate pairs grow ~quadratically. Here
    ``tuned_band_rows`` lengthens the band key with log2(n) (holding
    expected bucket occupancy ~constant → candidates ~linear) and
    ``tuned_bands_for_rows`` restores recall at the Jaccard threshold
    with the OR-construction bound. The verify threshold is 0.8 — the
    production near-dup regime, where the band counts the bound demands
    stay within the 512-lane budget. One driver-side count() routes the
    params (at 100 TB that n comes from table stats); the whole signature
    pass (md5, Horner combine, lanes) runs in the fused Arrow/numpy
    kernel (``_minhash_sig_udf``) — the interpreted HOF chain's COLD
    cost doesn't survive large corpora (SCALING.md round 6) — output
    bit-identical to the expression path (parity-pinned in test_dedup).
    Physical lanes are capped at ``LANE_POOL`` (128): the scheme needs
    20 at sf0.01 and 104 at sf1 (consecutive slices, the historical
    layout), while sf10's 26×11 = 286 would otherwise grow the
    signature pass ~2.75×/decade on top of the data — above the cap,
    bands draw strided r-subsets from the shared pool
    (``band_lane_indices``), holding signature cost O(pool)/doc at any
    corpus size. The DuckDB oracle derives THE SAME (b, r) from
    count(*) and replays the same index rule inside the SQL, so the
    funnel stays hash-checked end to end at any scale factor."""
    d = Tables(spark, sf_dir).documents
    n = d.count()
    r = tuned_band_rows(n)
    b = tuned_bands_for_rows(r, threshold=0.8, target_recall=0.9)
    sigs = minhash_signatures(d, num_hashes=min(b * r, LANE_POOL))
    cands = lsh_candidate_pairs(sigs, bands=b, rows_per_band=r)
    verified = jaccard_verify(cands, d, threshold=0.8)
    return verified.select(
        "id_a", "id_b", r4(F.col("jaccard")).alias("jaccard")
    ).transform(ordered, "id_a", "id_b")


# Hot-gram document-frequency ceiling for the exact-substring family: a
# gram present in more than this many documents is "viral boilerplate"
# (shared header/footer); its bucket's pair OUTPUT is inherently quadratic
# in that count, so one such key would serialize one reducer at scale.
# Over-limit grams are DIVERTED to dedup_hot_gram_report (the operator
# alerts-rather-than-fails, like the reference's cycle handling:
# SURVEY §2.2 / ror_pipeline alerting), keeping the main output
# exact-minus-disclosed. 50 matches dedup_winnow_pairs' stop-gram cap.
_EXSUB_CAP = 50

_EXSUB_NORM = """
    d AS (
      SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS s
      FROM documents),
    g AS (
      SELECT DISTINCT doc_id, md5(substr(s, CAST(i AS INT), 32)) AS g
      FROM (SELECT doc_id, s,
                   unnest(range(1, greatest(length(s) - 31, 0) + 1)) AS i
            FROM d)),
    hot AS (SELECT g FROM g GROUP BY g HAVING count(*) > {cap})
""".format(cap=_EXSUB_CAP)


@query(
    "dedup_exact_substring_pairs",
    oracle=f"""
    WITH {_EXSUB_NORM},
    k AS (SELECT doc_id, g FROM g ANTI JOIN hot USING (g)),
    p AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared
      FROM k a JOIN k b ON a.g = b.g AND a.doc_id < b.doc_id
      GROUP BY 1, 2)
    SELECT id_a, id_b, n_shared FROM p ORDER BY id_a, id_b
    """,
    priority=3,
)
def dedup_exact_substring_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT substring-duplication pairs: documents sharing any common
    substring of length ≥ 32 characters (normalized text), with the
    count of distinct shared 32-grams — minus pairs whose ONLY shared
    grams exceed the disclosed hot-gram ceiling (``_EXSUB_CAP``; the
    diverted grams are reported by ``dedup_hot_gram_report``).

    This is the exact-guarantee counterpart of ``dedup_winnow_pairs``
    (which samples grams by winnowing) and the Spark-native equivalent
    of suffix-array exact substring dedup from the training-data
    literature: a common substring of length ≥ L necessarily contains an
    aligned L-gram, and a shared L-gram IS a common substring of length
    L — so "pairs sharing ≥ 1 exact L-char gram" is sound AND complete
    for the ≥-L-substring relation, no suffix array needed. Shape: every
    position's gram md5 (portable hex, same machinery as
    ``winnow_hashes`` with k=32), distinct per doc, the hot-gram
    anti-join (the hot list is tiny — AQE broadcasts it), one bucket
    self-join on the 32-hex gram key — only (doc_id, gram-hash) pairs
    shuffle, never text — then a pair-count aggregate. The per-key pair
    fan-out is now bounded by CAP² instead of corpus-quadratic, so no
    single reducer can be serialized by one viral boilerplate string.
    Docs shorter than L have no grams and never pair, on both
    engines."""
    from ror_etl_spark.operators.dedup import exact_substring_pairs

    d = Tables(spark, sf_dir).documents
    return exact_substring_pairs(d, k=32, cap=_EXSUB_CAP).transform(
        ordered, "id_a", "id_b"
    )


@query(
    "dedup_hot_gram_report",
    oracle=f"""
    WITH {_EXSUB_NORM}
    SELECT g.g AS gram_md5, CAST(count(*) AS BIGINT) AS n_docs
    FROM g JOIN hot USING (g)
    GROUP BY g.g
    ORDER BY gram_md5
    """,
    priority=3,
)
def dedup_hot_gram_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The exact-substring family's DISCLOSURE side-channel: every
    32-gram whose document frequency exceeds ``_EXSUB_CAP``, with its
    document count. These grams are excluded from the pair/span joins
    (their buckets would be corpus-quadratic), so the main outputs are
    exact-minus-disclosed — the alert-don't-fail posture the reference
    takes for rollup cycles (SURVEY §2.2), applied to join skew. On the
    driver corpus the report is empty (no boilerplate crosses 50 docs);
    tests plant a viral gram to prove the diversion."""
    from ror_etl_spark.operators.dedup import hot_gram_report

    d = Tables(spark, sf_dir).documents
    return hot_gram_report(d, k=32, cap=_EXSUB_CAP).transform(ordered, "gram_md5")


def _cut_tail(base: str) -> str:
    """Shared oracle tail: interval-merge a ``rng`` CTE of (doc_id, s, e)
    ranges and reconstruct the cleaned text of every ``base`` document —
    one definition for both cut oracles (dedup and decontamination), so
    their merge/reconstruction semantics cannot drift apart."""
    return f"""ord AS (
      SELECT doc_id, s, e,
             max(e) OVER (PARTITION BY doc_id ORDER BY s, e
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS maxe
      FROM rng),
    isl AS (
      SELECT *, sum(CASE WHEN maxe IS NULL OR s > maxe + 1 THEN 1 ELSE 0 END)
                OVER (PARTITION BY doc_id ORDER BY s, e) AS grp
      FROM ord),
    mi AS (SELECT doc_id, grp, min(s) AS s, max(e) AS e FROM isl GROUP BY doc_id, grp),
    seg AS (
      SELECT doc_id, s, e,
             lag(e, 1, 0) OVER (PARTITION BY doc_id ORDER BY s) AS prev_e
      FROM mi),
    agg AS (
      SELECT seg.doc_id,
             CAST(count(*) AS BIGINT) AS n_cut_spans,
             CAST(sum(seg.e - seg.s + 1) AS BIGINT) AS n_cut_chars,
             string_agg(substr(d.s, CAST(seg.prev_e + 1 AS INT),
                               CAST(seg.s - seg.prev_e - 1 AS INT)),
                        '' ORDER BY seg.s) AS gaps,
             max(seg.e) AS last_e
      FROM seg JOIN {base} d ON d.doc_id = seg.doc_id
      GROUP BY seg.doc_id)
    SELECT d.doc_id,
           coalesce(agg.n_cut_spans, 0) AS n_cut_spans,
           coalesce(agg.n_cut_chars, 0) AS n_cut_chars,
           CAST(length(CASE WHEN agg.doc_id IS NULL THEN d.s
                ELSE coalesce(agg.gaps, '') || substr(d.s, CAST(agg.last_e + 1 AS INT))
                END) AS BIGINT) AS cleaned_len,
           md5(CASE WHEN agg.doc_id IS NULL THEN d.s
               ELSE coalesce(agg.gaps, '') || substr(d.s, CAST(agg.last_e + 1 AS INT))
               END) AS cleaned_md5
    FROM {base} d LEFT JOIN agg ON agg.doc_id = d.doc_id
    ORDER BY d.doc_id"""


# Shared CTE fragment: positional grams -> hot-gram anti-join -> aligned
# diagonals -> gaps-and-islands -> maximal spans. Both the spans and cut
# oracles derive from THIS one definition, so their span semantics cannot
# drift apart (the same reason _EXSUB_NORM is shared).
_EXSUB_SPAN_CTES = """
    pg AS (
      SELECT doc_id, CAST(i AS BIGINT) AS pos, md5(substr(s, CAST(i AS INT), 32)) AS g
      FROM (SELECT doc_id, s,
                   unnest(range(1, greatest(length(s) - 31, 0) + 1)) AS i
            FROM d)),
    k AS (SELECT doc_id, pos, g FROM pg ANTI JOIN hot USING (g)),
    m AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             a.pos AS pos_a, a.pos - b.pos AS diag
      FROM k a JOIN k b ON a.g = b.g AND a.doc_id < b.doc_id),
    r AS (
      SELECT *, pos_a - row_number() OVER (
               PARTITION BY id_a, id_b, diag ORDER BY pos_a) AS grp
      FROM m),
    sp AS (
      SELECT id_a, id_b, diag, min(pos_a) AS start_a,
             CAST(count(*) + 31 AS BIGINT) AS length
      FROM r GROUP BY id_a, id_b, diag, grp)
"""


@query(
    "dedup_exact_substring_spans",
    oracle=f"""
    WITH {_EXSUB_NORM},
    {_EXSUB_SPAN_CTES}
    SELECT id_a, id_b, start_a, start_a - diag AS start_b, length
    FROM sp ORDER BY id_a, id_b, start_a, start_b
    """,
    priority=3,
)
def dedup_exact_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPAN-LEVEL exact substring dedup — the actionable deliverable of
    "Deduplicating Training Data Makes Language Models Better" (Lee et
    al.): for every document pair, the maximal duplicated character
    ranges (1-based start in each document's normalized text + length),
    so a training pipeline can CUT the bytes rather than just flag the
    pair.

    Suffix-array semantics without a suffix array: every shared aligned
    32-gram lies on a pair "diagonal" (pos_a - pos_b); consecutive
    shared positions on one diagonal are one duplicated region, and a
    maximal run of m aligned grams is exactly a maximal common substring
    of length m + 31 (maximality: the characters just before/after the
    run differ, else the adjacent gram would also match). Shape: the
    positional gram-hash kernel (rank-cached md5), hot-gram anti-join
    (same disclosed ceiling as the pairs form), the gram-bucket
    self-join emitting only (ids, positions) — never text — then
    gaps-and-islands per (pair, diagonal): ``pos_a - row_number()`` is
    constant exactly on consecutive runs, one window shuffle keyed by
    (id_a, id_b, diag), output-proportional. All post-kernel stages are
    JVM-side Catalyst operators."""
    from ror_etl_spark.operators.dedup import exact_substring_spans

    d = Tables(spark, sf_dir).documents
    return exact_substring_spans(d, k=32, cap=_EXSUB_CAP).transform(
        ordered, "id_a", "id_b", "start_a", "start_b"
    )


def _simhash_oracle() -> str:
    """DuckDB replay of simhash_signatures + simhash_candidates: the bit
    source is the two 32-bit md5 halves (portable), bands are four 16-bit
    keys, Hamming distance sums per-band bit_count(xor)."""
    bit_sums = ", ".join(
        f"sum(CASE WHEN (lo >> {j}) & 1 = 1 THEN 1 ELSE -1 END) AS b{j}"
        if j < 32
        else f"sum(CASE WHEN (hi >> {j - 32}) & 1 = 1 THEN 1 ELSE -1 END) AS b{j}"
        for j in range(64)
    )
    band_keys = ", ".join(
        "("
        + " + ".join(
            f"(CASE WHEN b{b * 16 + t} > 0 THEN {1 << t} ELSE 0 END)" for t in range(16)
        )
        + f")::BIGINT AS k{b}"
        for b in range(4)
    )
    hamming = " + ".join(f"bit_count(xor(a.k{b}, b.k{b}))" for b in range(4))
    return f"""
    WITH {_shingle_cte(2)},
    hh AS (
      SELECT doc_id,
             ('0x' || substr(md5(g), 9, 8))::BIGINT AS lo,
             ('0x' || substr(md5(g), 1, 8))::BIGINT AS hi
      FROM (SELECT doc_id, unnest(s) AS g FROM sh)),
    bits AS (SELECT doc_id, {bit_sums} FROM hh GROUP BY doc_id),
    keys AS (SELECT doc_id, {band_keys} FROM bits),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             CAST({hamming} AS BIGINT) AS hamming
      FROM keys a JOIN keys b
        ON a.doc_id < b.doc_id
       AND (a.k0 = b.k0 OR a.k1 = b.k1 OR a.k2 = b.k2 OR a.k3 = b.k3))
    SELECT id_a, id_b, hamming FROM pairs WHERE hamming <= 8 ORDER BY id_a, id_b
    """


@query("dedup_simhash", oracle=_simhash_oracle(), priority=2)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash-banded near-dup candidates with Hamming distance ≤ 8,
    hash-checked against a DuckDB replay of the full signature/banding
    computation (portable md5 bit source)."""
    d = Tables(spark, sf_dir).documents
    pairs = simhash_candidates(d)
    return pairs.select("id_a", "id_b", "hamming").filter(
        F.col("hamming") <= 8
    ).orderBy("id_a", "id_b")


@query(
    "dedup_near_clusters",
    oracle=f"""
    WITH RECURSIVE {_minhash_ctes()},
    ver AS (
      SELECT c.id_a, c.id_b
      FROM cand c
      JOIN sh sa ON sa.doc_id = c.id_a
      JOIN sh sb ON sb.doc_id = c.id_b
      WHERE {_JACCARD} >= 0.5),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM ver
      UNION ALL
      SELECT id_b AS src, id_a AS dst FROM ver),
    nodes AS (SELECT DISTINCT src AS id FROM edges),
    reach AS (
      SELECT id, id AS r FROM nodes
      UNION
      SELECT re.id, e.dst AS r FROM reach re JOIN edges e ON e.src = re.r),
    comp AS (SELECT id, min(r) AS cluster FROM reach GROUP BY id)
    SELECT cluster,
           CAST(count(*) AS BIGINT) AS size,
           CAST(sum(CASE WHEN id = cluster THEN 1 ELSE 0 END) AS BIGINT) AS n_keepers
    FROM comp
    GROUP BY cluster
    HAVING count(*) > 1
    ORDER BY cluster
    """,
    priority=2,
)
def dedup_near_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full near-dedup funnel: MinHash signatures → LSH candidates →
    exact-Jaccard verification (≥0.5) → connected components → one keeper
    per transitive duplicate cluster. Returns cluster summary rows. The
    oracle replays the portable-hash funnel and closes the pair graph
    with a recursive CTE — two independent transitive-closure algorithms
    must agree."""
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


@query(
    "dedup_winnow_pairs",
    oracle="""
    WITH d AS (
      SELECT doc_id, lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS s
      FROM documents),
    g AS (
      SELECT doc_id,
             list_transform(generate_series(1, greatest(length(s) - 7, 0)),
                            i -> md5(substr(s, CAST(i AS INT), 8))) AS hs
      FROM d),
    f AS (
      SELECT doc_id,
             list_distinct(list_transform(generate_series(1, greatest(len(hs) - 3, 0)),
                            j -> list_min(list_slice(hs, CAST(j AS INT),
                                                     CAST(j + 3 AS INT))))) AS fps
      FROM g),
    x0 AS (SELECT doc_id, unnest(fps) AS fp FROM f),
    capped AS (SELECT doc_id, fp
               FROM (SELECT doc_id, fp, count(*) OVER (PARTITION BY fp) AS df
                     FROM x0)
               WHERE df <= 50),
    x AS (SELECT doc_id, fp, count(*) OVER (PARTITION BY doc_id) AS nf
          FROM capped)
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           round(CAST(count(*) AS DOUBLE)
                 / (any_value(a.nf) + any_value(b.nf) - count(*)), 4) AS jac
    FROM x a JOIN x b ON a.fp = b.fp AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
    HAVING jac >= 0.5
    ORDER BY id_a, id_b
    """,
    priority=2,
)
def dedup_winnow_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate pairs by winnowing-fingerprint Jaccard (MOSS):
    documents sharing selected rolling-hash fingerprints, scored by
    |shared| / |union| over the fingerprint sets, threshold 0.5.

    The scale shape mirrors MinHash-LSH: only (doc_id, fingerprint)
    pairs shuffle — never text — and the quadratic term is confined to
    per-fingerprint buckets. Frequent fingerprints (boilerplate grams
    shared by hundreds of documents) make per-bucket pair counts
    quadratic — the uncapped join OOMs at sf0.1 — so fingerprints seen
    in more than 50 documents are dropped before the self-join (the
    standard stop-gram suppression; near-dup signal lives in RARE
    fingerprints, and the Jaccard denominator counts only kept ones on
    both sides, so the oracle replays the cap exactly).

    Winnowing here is the RELATIONAL form (posexplode + per-doc window
    min) rather than the array expression ``winnow_select``: the pair
    join needs the fingerprints exploded anyway, and consuming the hash
    array through a single-reference projection invites Catalyst's
    CollapseProject to inline the md5 pipeline into every window slice —
    O(n²) re-hashing per document (see winnow_select's docstring). The
    generator + window evaluates each k-gram hash exactly once."""
    from pyspark.sql.window import Window

    from ror_etl_spark.functions.text import normalize_text, winnow_fp_set_udf
    from ror_etl_spark.operators.util import spread

    # single-file parquet reads as ONE partition; the per-row hash work is
    # the expensive part, so fan it out before computing anything
    d = spread(Tables(spark, sf_dir).documents)
    # r6: the winnowed fingerprint SET comes from the rank-cache Arrow
    # kernel (winnow_fp_set_udf) instead of md5-per-position + posexplode
    # + two per-doc windows — same distinct (doc_id, fp) rows (full
    # windows only), ~99.9% fewer md5 calls under gram repetition, and
    # two window shuffles gone. The prior relational form and its
    # pushdown trap are preserved in git history.
    fp_set = winnow_fp_set_udf()
    fps = d.select(
        "doc_id", F.explode(fp_set(normalize_text(F.col("text")))).alias("fp")
    )
    # r12 (guide §2.4): the per-doc kept-fingerprint count used to ride a
    # SECOND full-stream window (shuffle everything by doc_id) before the
    # pair join re-shuffled by fp. Instead: after the df window caps hot
    # fingerprints at 50 docs, collapse each fingerprint to its sorted
    # doc list with a groupBy ON THE SAME fp KEY (no new exchange — the
    # window already established that partitioning) and generate the
    # co-occurrence pairs as an array-combination expression inside the
    # group: the fp self-join and its shuffle disappear entirely, and
    # the checkpoint (the frame has two consumers — pair stream and
    # per-doc counts; un-checkpointed, Catalyst plans each as a fresh
    # scan→UDF→window subtree) stores one slim row per fingerprint
    # instead of the exploded stream. Group size ≤ 50 bounds the
    # quadratic pair expansion per group. Same jac arithmetic.
    groups = (
        fps.withColumn("df", F.count(F.lit(1)).over(Window.partitionBy("fp")))
        .filter(F.col("df") <= 50)
        .groupBy("fp")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ds"))
        .localCheckpoint(eager=False)
    )
    nf = (
        groups.select(F.explode("ds").alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("nf"))
    )
    ds = F.col("ds")
    combos = F.flatten(
        F.transform(
            ds,
            lambda x, i: F.transform(
                F.slice(ds, i + 2, F.size(ds)),
                lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
            ),
        )
    )
    pairs = (
        groups.select(F.explode(combos).alias("p"))
        .groupBy(F.col("p.id_a").alias("id_a"), F.col("p.id_b").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    nfa = nf.select(F.col("doc_id").alias("id_a"), F.col("nf").alias("nfa"))
    nfb = nf.select(F.col("doc_id").alias("id_b"), F.col("nf").alias("nfb"))
    shared = F.col("shared").cast("double")
    jac = F.round(shared / (F.col("nfa") + F.col("nfb") - shared), 4)
    return (
        pairs.join(nfa, "id_a")
        .join(nfb, "id_b")
        .select("id_a", "id_b", jac.alias("jac"))
        .filter(F.col("jac") >= 0.5)
    )


@query(
    "dedup_incremental_new_batch",
    oracle="""
    WITH fp AS (
      SELECT doc_id,
             md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fingerprint
      FROM documents)
    SELECT n.doc_id, n.fingerprint,
           CASE WHEN c.fingerprint IS NOT NULL THEN 1 ELSE 0 END AS dup_of_corpus
    FROM (SELECT * FROM fp WHERE doc_id >= 250) n
    LEFT JOIN (SELECT DISTINCT fingerprint FROM fp WHERE doc_id < 250) c
      ON n.fingerprint = c.fingerprint
    ORDER BY n.doc_id
    """,
    priority=3,  # r7: implementation changed (kernel/join) - re-prove in driver window
)
def dedup_incremental_new_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup: flag documents of an incoming batch (doc_id >=
    250) that already exist in the indexed corpus (doc_id < 250) by exact
    fingerprint — the production shape where the corpus fingerprint index
    is maintained across runs and each new crawl joins against it.

    The corpus side reduces to distinct 16-byte fingerprints before the
    join. NO broadcast hint: a hard ``F.broadcast`` would OOM the moment
    the corpus index outgrows driver/executor memory (a 100 TB corpus's
    distinct-fingerprint index is many GB). AQE measures the index's
    ACTUAL post-distinct size at runtime and converts to broadcast when
    it fits under ``spark.sql.autoBroadcastJoinThreshold`` — the batch
    side then streams through unshuffled — and falls back to a shuffled
    hash join when it doesn't; test_dedup pins the below-threshold
    broadcast conversion."""
    from ror_etl_spark.functions.text import fingerprint_md5

    d = Tables(spark, sf_dir).documents
    fp = d.select("doc_id", fingerprint_md5(F.col("text")).alias("fingerprint"))
    batch = fp.filter(F.col("doc_id") >= 250)
    corpus = (
        fp.filter(F.col("doc_id") < 250)
        .select(F.col("fingerprint").alias("c_fp"))
        .distinct()
    )
    return (
        batch.join(corpus, batch["fingerprint"] == corpus["c_fp"], "left")
        .select(
            "doc_id",
            "fingerprint",
            F.when(F.col("c_fp").isNotNull(), 1).otherwise(0).alias("dup_of_corpus"),
        )
    )


# range partitions for the distributed sorted-neighborhood sort; at 100 TB
# this becomes n_rows / (a few 10⁶) — any value gives identical results
_SN_PARTS = 8


@query(
    "fuzzy_dedup_sorted_neighborhood",
    # implementation changed in r5 (distributed range-partitioned sort);
    # keep it inside the driver's capped window until re-proved there
    priority=3,
    oracle="""
    WITH s AS (
      SELECT p_partkey, p_name,
             lead(p_partkey, 1) OVER (ORDER BY p_name, p_partkey) AS nk1,
             lead(p_name, 1)    OVER (ORDER BY p_name, p_partkey) AS nn1,
             lead(p_partkey, 2) OVER (ORDER BY p_name, p_partkey) AS nk2,
             lead(p_name, 2)    OVER (ORDER BY p_name, p_partkey) AS nn2
      FROM part)
    SELECT id_a, id_b, dist FROM (
      SELECT p_partkey AS id_a, nk1 AS id_b,
             CAST(levenshtein(p_name, nn1) AS INT) AS dist
      FROM s WHERE nn1 IS NOT NULL
      UNION ALL
      SELECT p_partkey, nk2, CAST(levenshtein(p_name, nn2) AS INT)
      FROM s WHERE nn2 IS NOT NULL)
    WHERE dist BETWEEN 1 AND 5
    ORDER BY id_a, id_b
    """,
)
def fuzzy_dedup_sorted_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy entity-resolution pairs by sorted-neighborhood blocking:
    sort on the name, compare each row to its next 2 neighbors with
    Levenshtein, keep near-misses (1 ≤ dist ≤ 5; 0 is plain exact dedup).

    Sorted-neighborhood turns the quadratic fuzzy-join into sort +
    windowed comparisons — O(n·w) distance evaluations — and this form
    keeps the sort DISTRIBUTED (the r4 registered form ran one global
    Window.orderBy, i.e. every row through a single task — the last
    scale-killer plan):

      1. repartitionByRange on the sort key spreads the total order over
         _SN_PARTS range partitions;
      2. within each partition the w=2 leads come from the SAME window
         that sorts it — map-side after the one shuffle;
      3. the pairs that straddle a partition boundary come from a tiny
         overlap frame: the first 2 and last 2 rows of every partition
         (≤ 4·_SN_PARTS rows total) joined head-to-tail, so cross-
         boundary neighbors cost a broadcast of ~nothing.

    Invariant: every range partition must hold ≥ w rows — guaranteed by
    sizing _SN_PARTS ≪ n/w (the range partitioner balances counts);
    degenerate sub-w partitions would drop their boundary pairs.

    Shuffle profile: one range shuffle of the slim (key, name)
    projection + one pid-hash exchange for the rank window; everything
    else is map-side or driver-scale."""
    from pyspark.sql.window import Window

    keys = ["p_name", "p_partkey"]
    # (the range partitioner's sampling pass re-reads this 2-column scan;
    # measured: the double scan is cheaper than a checkpoint job here)
    p = Tables(spark, sf_dir).part.select("p_partkey", "p_name")
    w = Window.partitionBy("pid").orderBy(*keys)
    local = (
        p.repartitionByRange(_SN_PARTS, *keys)
        .withColumn("pid", F.spark_partition_id())
        .withColumn("lrn", F.row_number().over(w))
        .withColumn("nk1", F.lead("p_partkey", 1).over(w))
        .withColumn("nn1", F.lead("p_name", 1).over(w))
        .withColumn("nk2", F.lead("p_partkey", 2).over(w))
        .withColumn("nn2", F.lead("p_name", 2).over(w))
        .withColumn("cnt", F.count(F.lit(1)).over(Window.partitionBy("pid")))
    )
    # consumed by three branches (in-partition pairs, heads, tails) —
    # materialize once instead of re-running range shuffle + window per
    # branch (lazy: computed inside the query's own first job). Conf gate
    # exists so plan tests can inspect the pre-checkpoint physical plan.
    if spark.conf.get("spark.ror.sn.checkpoint", "true") == "true":
        local = local.localCheckpoint(eager=False)
    inpart = local.filter(F.col("nn1").isNotNull()).select(
        F.col("p_partkey").alias("id_a"),
        F.col("nk1").alias("id_b"),
        F.levenshtein("p_name", "nn1").alias("dist"),
    ).unionAll(
        local.filter(F.col("nn2").isNotNull()).select(
            F.col("p_partkey").alias("id_a"),
            F.col("nk2").alias("id_b"),
            F.levenshtein("p_name", "nn2").alias("dist"),
        )
    )
    heads = local.filter(F.col("lrn") <= 2).select(
        F.col("pid").alias("jp"),
        F.col("lrn").alias("m"),
        F.col("p_partkey").alias("id_b"),
        F.col("p_name").alias("hname"),
    )
    tails = local.filter(F.col("lrn") >= F.col("cnt") - 1).select(
        (F.col("pid") + 1).alias("jp"),
        (F.col("cnt") - F.col("lrn")).alias("r"),
        F.col("p_partkey").alias("id_a"),
        F.col("p_name").alias("tname"),
    )
    boundary = (
        tails.join(F.broadcast(heads), "jp")
        .filter(F.col("r") + F.col("m") <= 2)
        .select("id_a", "id_b", F.levenshtein("tname", "hname").alias("dist"))
    )
    return (
        inpart.unionAll(boundary)
        .filter(F.col("dist").between(1, 5))
    )


_PF_T = 0.6  # Jaccard threshold for the prefix-filtered similarity join


@query(
    "dedup_prefix_filter_jaccard",
    oracle=f"""
    WITH {{shingle_cte}},
    pairs AS (
      SELECT a.doc_id AS da, b.doc_id AS db,
             CAST(array_length(list_filter(a.s, x -> list_contains(b.s, x)))
                  AS DOUBLE) AS i,
             array_length(a.s) AS na, array_length(b.s) AS nb
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
    SELECT da AS id_a, db AS id_b, round(i / (na + nb - i), 4) AS jac
    FROM pairs
    WHERE i / (na + nb - i) >= {_PF_T}
    ORDER BY id_a, id_b
    """.format(shingle_cte=_shingle_cte(3)),
    priority=2,
)
def dedup_prefix_filter_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT all-pairs set-similarity join (3-gram-shingle Jaccard ≥ 0.6)
    via prefix filtering (Bayardo et al., WWW'07 / PPJoin family) — the
    exact counterpart of the MinHash-LSH funnel: order shingles globally
    by (document frequency asc, shingle), keep each document's first
    ⌊(1-t)·|d|⌋+1 as its PREFIX, and generate candidates only from pairs
    sharing a prefix shingle. The prefix lemma guarantees every pair at
    or above the threshold shares one, so — unlike LSH — recall is
    provably 1.0. The ORACLE computes the brute-force quadratic join, so
    the hash check proves the pruning loses nothing, not merely that both
    engines replay the same heuristic.

    Shuffle profile: only (shingle, doc_id) pairs from PREFIXES enter the
    candidate join (rarest-first ordering keeps buckets small), and exact
    Jaccard runs on candidates only — at 100 TB this is the published
    scale recipe for exact near-dup sweeps."""
    from pyspark.sql.window import Window

    from ror_etl_spark.operators.util import spread

    d = spread(Tables(spark, sf_dir).documents)
    # checkpoint the per-doc DISTINCT SHINGLE ARRAY, not the exploded
    # (doc_id, shingle) stream (r12: the exploded form stored one fat row
    # per shingle and then re-aggregated BY DOC three times to rebuild
    # what this frame already holds — a groupBy count for |d| and a
    # collect_list forward index for each verify side. Deriving |d| as
    # size(ss) and reading the forward index straight off the checkpoint
    # removes the nt aggregate, its doc-keyed join, and both collect_list
    # shuffles; guide §2.4). The array frame feeds the df counts and the
    # ranking through a cheap explode of checkpointed arrays.
    docarr = d.select(
        "doc_id", F.array_distinct(shingles(F.col("text"), 3)).alias("ss")
    ).localCheckpoint(eager=False)
    toks = docarr.select(
        "doc_id", F.size("ss").alias("nt"), F.explode("ss").alias("sh")
    )
    # r12 (guide §2.4): document frequency as ONE window count over the
    # sh partitioning — toks are doc-distinct, so count-per-sh IS df. The
    # former groupBy(sh) + join-back-by-sh shape shuffled the token
    # stream twice for the same key (the partial-agg subtree is not
    # canonically equal to the probe side, so AQE cannot reuse the
    # exchange between them).
    ranked = toks.withColumn(
        "df", F.count(F.lit(1)).over(Window.partitionBy("sh"))
    ).withColumn(
        "rk",
        F.row_number().over(
            Window.partitionBy("doc_id").orderBy(F.asc("df"), F.asc("sh"))
        ),
    )
    prefix = ranked.filter(
        F.col("rk") <= F.floor((1 - _PF_T) * F.col("nt")) + 1
    ).select("doc_id", "sh", "rk", "nt")
    # PPJoin refinements (both exact — the brute-force oracle checks it):
    # length filter: jac >= t forces min(|a|,|b|) >= t * max(|a|,|b|);
    # positional filter: a prefix match at ranks (i, j) caps the overlap
    # at 1 + min(|a|-i, |b|-j), which must reach ceil(t/(1+t)*(|a|+|b|)).
    pa, pb = prefix.alias("pa"), prefix.alias("pb")
    na, nb = F.col("pa.nt"), F.col("pb.nt")
    alpha = F.ceil(F.lit(_PF_T / (1 + _PF_T)) * (na + nb))
    ubound = F.least(na - F.col("pa.rk"), nb - F.col("pb.rk")) + 1
    cand = (
        pa.join(pb, F.col("pa.sh") == F.col("pb.sh"))
        .filter(F.col("pa.doc_id") < F.col("pb.doc_id"))
        .filter(F.least(na, nb) >= _PF_T * F.greatest(na, nb))
        .filter(ubound >= alpha)
        .select(
            F.col("pa.doc_id").alias("id_a"), F.col("pb.doc_id").alias("id_b")
        )
        .distinct()
    )
    # Verify on a FORWARD INDEX (one row per doc: its full shingle set as
    # an array) instead of re-joining the token expansion: the token form
    # explodes |cand| × avg_shingles narrow rows (≈1G at 10M candidates)
    # through two shuffles and a huge hash aggregate — measured 97.5 s at
    # the sf1 rehearsal — while the index form shuffles only the slim
    # candidate pairs plus 2 bounded array attachments and computes the
    # intersection size per row in one pass (set-semantics arrays, so
    # array_intersect size IS the overlap). Neither index side is
    # broadcast: at 100 TB the forward index is corpus-sized, so both
    # attachments stay shuffle joins on the candidate's doc keys.
    # both candidate sides read the checkpointed array frame directly —
    # no re-aggregation at all (the former collect_list per side rebuilt
    # the arrays the checkpoint already stores; array_intersect/size are
    # order-insensitive, so the set-semantics arrays are interchangeable)
    sa = docarr.select(F.col("doc_id").alias("id_a"), F.col("ss").alias("ssa"))
    sb = docarr.select(F.col("doc_id").alias("id_b"), F.col("ss").alias("ssb"))
    inter = (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.size(F.array_intersect("ssa", "ssb")).alias("i"),
            F.size("ssa").alias("na"),
            F.size("ssb").alias("nb"),
        )
    )
    # integer-exact threshold predicate referencing the intersect size once
    # (jaccard_at_least docstring): the division form would re-inline
    # array_intersect twice when Catalyst pushes it into the verify join
    kept = inter.filter(
        jaccard_at_least(F.col("i"), F.col("na") + F.col("nb"), _PF_T)
    )
    jac = F.col("i").cast("double") / (F.col("na") + F.col("nb") - F.col("i"))
    return (
        kept.select("id_a", "id_b", r4(jac).alias("jac"))
    )


@query(
    "dedup_exact_substring_cut",
    oracle=f"""
    WITH {_EXSUB_NORM},
    {_EXSUB_SPAN_CTES},
    rng AS (
      SELECT id_b AS doc_id, start_a - diag AS s, start_a - diag + length - 1 AS e
      FROM sp),
    {_cut_tail("d")}
    """,
    # priority 4: oracle refactored onto the shared _cut_tail in r7
    # session 2 — re-prove in the driver window
    priority=4,
)
def dedup_exact_substring_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    """APPLIED span dedup — the full train-data action: every document
    keeps its first-occurrence content and CUTS the character ranges
    duplicated from earlier documents (interval-merged spans from
    ``dedup_exact_substring_spans``), reporting per doc the number of
    merged cut ranges, characters removed, and the md5 of the cleaned
    normalized text — which the DuckDB oracle reconstructs
    byte-identically, so the hash gate proves the actual cut text, not
    just the bookkeeping. See ``operators/dedup.py:exact_substring_cut``
    for the plan shape (only interval endpoints shuffle; one text
    join-back)."""
    from ror_etl_spark.operators.dedup import exact_substring_cut

    d = Tables(spark, sf_dir).documents
    return exact_substring_cut(d, k=32, cap=_EXSUB_CAP).transform(ordered, "doc_id")


def _decon_cut_oracle(eval_max_id: int = 25) -> str:
    """Two-table replay of decontaminate_substring_cut: positional grams
    on both slices of `documents` (doc_id < eval_max_id plays the
    benchmark, as in decontaminate_ngram_overlap), aligned diagonals,
    gaps-and-islands spans on the corpus side, then the shared
    interval-merge + reconstruction tail over the corpus slice."""
    pg = """
      SELECT doc_id, CAST(i AS BIGINT) AS pos, md5(substr(s, CAST(i AS INT), 32)) AS g
      FROM (SELECT doc_id, s,
                   unnest(range(1, greatest(length(s) - 31, 0) + 1)) AS i
            FROM {src})"""
    return f"""
    WITH dall AS (
      SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS s
      FROM documents),
    cd AS (SELECT * FROM dall WHERE doc_id >= {eval_max_id}),
    bpg AS (SELECT doc_id AS bench_id, pos AS pos_a, g FROM ({pg.format(src=f"(SELECT * FROM dall WHERE doc_id < {eval_max_id})")})),
    cpg AS ({pg.format(src="cd")}),
    m AS (
      SELECT c.doc_id, b.bench_id, c.pos AS pos_b, b.pos_a - c.pos AS diag
      FROM cpg c JOIN bpg b USING (g)),
    r AS (
      SELECT *, pos_b - row_number() OVER (
               PARTITION BY doc_id, bench_id, diag ORDER BY pos_b) AS grp
      FROM m),
    rng AS (
      SELECT doc_id, min(pos_b) AS s, min(pos_b) + count(*) + 30 AS e
      FROM r GROUP BY doc_id, bench_id, diag, grp),
    {_cut_tail("cd")}
    """


@query("decontaminate_substring_cut", oracle=_decon_cut_oracle(), priority=3)
def decontaminate_substring_cut_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPAN-LEVEL benchmark decontamination — the surgical upgrade of
    decontaminate_ngram_overlap: instead of flagging whole documents
    that share 5-grams with the held-out set, CUT exactly the character
    ranges that appear verbatim (≥ 32 normalized chars) in any
    benchmark document (doc_id < 25 plays the benchmark, same
    convention as the flag-level query), keeping the rest of the
    document trainable. Output is the cut-report shape with the md5 of
    the cleaned text, so the oracle hash-proves the reconstruction
    byte-for-byte.

    Scale shape: the benchmark side's positional grams BROADCAST (a
    benchmark is driver-scale by definition); the corpus side's grams
    never shuffle for the match — and unlike the dedup spans there is
    deliberately NO hot-gram ceiling, because a benchmark string viral
    in the corpus is exactly what must be removed and the fan-out is
    bounded by benchmark size × output spans, not corpus². See
    operators/dedup.py:decontaminate_substring_cut."""
    from ror_etl_spark.operators.dedup import decontaminate_substring_cut
    from ror_etl_spark.queries.llmprep import _EVAL_MAX_ID

    d = Tables(spark, sf_dir).documents
    corpus = d.filter(F.col("doc_id") >= _EVAL_MAX_ID)
    bench = d.filter(F.col("doc_id") < _EVAL_MAX_ID)
    return decontaminate_substring_cut(corpus, bench, k=32).transform(
        ordered, "doc_id"
    )


def _funnel_tail(threshold: float) -> str:
    """Shared oracle tail for the funnel queries: exact-fingerprint
    groups, Jaccard-verified candidate edges at ``threshold``, the
    recursive transitive closure, and the per-document
    keep/reason/canonical select. Expects ``cand`` and ``sh`` CTEs
    upstream (fixed or tuned chain) — one definition so the two twins'
    keep semantics cannot drift."""
    return f"""fp AS (
      SELECT doc_id, md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS f
      FROM documents),
    ek AS (SELECT f, min(doc_id) AS ek FROM fp GROUP BY f),
    ex AS (SELECT fp.doc_id, ek.ek FROM fp JOIN ek USING (f)),
    ver AS (
      SELECT c.id_a, c.id_b
      FROM cand c
      JOIN sh sa ON sa.doc_id = c.id_a
      JOIN sh sb ON sb.doc_id = c.id_b
      WHERE {_JACCARD} >= {threshold}),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM ver
      UNION ALL
      SELECT id_b AS src, id_a AS dst FROM ver),
    nodes AS (SELECT DISTINCT src AS id FROM edges),
    reach AS (
      SELECT id, id AS r FROM nodes
      UNION
      SELECT re.id, e.dst AS r FROM reach re JOIN edges e ON e.src = re.r),
    comp AS (SELECT id, min(r) AS cluster FROM reach GROUP BY id)
    SELECT ex.doc_id,
           coalesce(comp.cluster, ex.doc_id) = ex.doc_id AS keep,
           CASE WHEN coalesce(comp.cluster, ex.doc_id) = ex.doc_id THEN NULL
                WHEN ex.doc_id <> ex.ek THEN 'exact' ELSE 'near' END AS reason,
           coalesce(comp.cluster, ex.doc_id) AS canonical_id
    FROM ex LEFT JOIN comp ON comp.id = ex.doc_id
    ORDER BY ex.doc_id"""


@query(
    "dedup_funnel_keep",
    oracle=f"""
    WITH RECURSIVE {_minhash_ctes()},
    {_funnel_tail(0.5)}
    """,
    priority=3,
)
def dedup_funnel_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup funnel as an ACTION per document — the shape a training
    pipeline actually consumes (cf. llm_corpus_pipeline for the filter
    funnel): every document gets (keep, reason, canonical_id) where
    canonical_id is the minimum id reachable through the verified
    near-dup graph (exact duplicates ride the same graph — identical
    texts have identical MinHash signatures, so every band collides and
    Jaccard verifies at 1.0) and reason distinguishes exact copies from
    near-duplicate paraphrases.

    One logical plan end to end: fingerprint groupBy (16-byte keys
    shuffle, never text) ∥ MinHash signatures → banded LSH candidates
    (signatures shuffle, b×8 bytes/doc) → exact-Jaccard verify on the
    candidate set only → Hash-Min label propagation (per round: the
    edge list keyed by node, payload one long — the 100 TB components
    formulation) → two id-keyed joins back. The oracle replays the
    whole funnel (portable-hash signatures, recursive-CTE closure), so
    keep/reason/canonical are hash-checked per document — two
    independent transitive-closure algorithms must produce the same
    canonical assignment."""
    from ror_etl_spark.functions.text import fingerprint_md5
    from ror_etl_spark.operators.components import connected_components
    from ror_etl_spark.operators.util import spread

    d = spread(Tables(spark, sf_dir).documents).localCheckpoint(eager=False)
    fp = d.select("doc_id", fingerprint_md5(F.col("text")).alias("f"))
    ek = fp.groupBy("f").agg(F.min("doc_id").alias("ek"))
    ex = fp.join(ek, "f").select("doc_id", "ek")
    cands = lsh_candidate_pairs(minhash_signatures(d, num_hashes=32))
    verified = jaccard_verify(cands, d, threshold=0.5).select("id_a", "id_b")
    comp = connected_components(verified).labels
    canonical = F.coalesce(F.col("component"), F.col("doc_id"))
    keep = canonical == F.col("doc_id")
    return (
        ex.join(comp, ex["doc_id"] == comp["id"], "left")
        .select(
            "doc_id",
            keep.alias("keep"),
            F.when(keep, F.lit(None).cast("string"))
            .when(F.col("doc_id") != F.col("ek"), F.lit("exact"))
            .otherwise(F.lit("near"))
            .alias("reason"),
            canonical.alias("canonical_id"),
        )
        .transform(ordered, "doc_id")
    )


@query(
    "corpus_duplication_report",
    oracle=f"""
    WITH {_EXSUB_NORM},
    {_EXSUB_SPAN_CTES},
    rng AS (
      SELECT id_b AS doc_id, start_a - diag AS s, start_a - diag + length - 1 AS e
      FROM sp),
    ord AS (
      SELECT doc_id, s, e,
             max(e) OVER (PARTITION BY doc_id ORDER BY s, e
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS maxe
      FROM rng),
    isl AS (
      SELECT *, sum(CASE WHEN maxe IS NULL OR s > maxe + 1 THEN 1 ELSE 0 END)
                OVER (PARTITION BY doc_id ORDER BY s, e) AS grp
      FROM ord),
    mi AS (SELECT doc_id, grp, min(s) AS s, max(e) AS e FROM isl GROUP BY doc_id, grp),
    per AS (
      SELECT doc_id, CAST(sum(e - s + 1) AS BIGINT) AS cut FROM mi GROUP BY doc_id),
    tot AS (SELECT CAST(sum(length(s)) AS BIGINT) AS chars, count(*) AS docs FROM d)
    SELECT tot.docs AS n_docs,
           CAST(count(per.doc_id) AS BIGINT) AS n_docs_with_dups,
           tot.chars AS total_chars,
           CAST(coalesce(sum(per.cut), 0) AS BIGINT) AS dup_chars,
           round(coalesce(sum(per.cut), 0) / tot.chars + 1e-9, 6) AS dup_rate
    FROM tot LEFT JOIN per ON true
    GROUP BY tot.docs, tot.chars
    """,
    priority=3,
)
def corpus_duplication_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus-health number a dedup pass is judged by (Lee et al.
    report it as "fraction of tokens removed"): interval-merged
    duplicated-character totals over the whole corpus — how many
    documents contain ≥32-char duplicated-from-earlier spans, and what
    fraction of all normalized characters they cover. One row.

    Same span derivation and interval merge as dedup_exact_substring_cut
    (shared CTE fragments on the oracle side, shared operators on the
    Spark side), collapsed to corpus totals: the per-doc cut sums are a
    map-side-combinable aggregate and the final join is one scalar row
    against another — nothing document-sized survives past the span
    stage."""
    from ror_etl_spark.functions.text import normalize_text
    from ror_etl_spark.operators.dedup import exact_substring_cut
    from ror_etl_spark.operators.util import spread

    d = Tables(spark, sf_dir).documents
    cut = exact_substring_cut(d, k=32, cap=_EXSUB_CAP)
    per = cut.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum((F.col("n_cut_spans") > 0).cast("long")).alias("n_docs_with_dups"),
        F.sum(F.col("n_cut_chars") + F.col("cleaned_len")).alias("total_chars"),
        F.sum("n_cut_chars").alias("dup_chars"),
    )
    return per.select(
        "n_docs",
        "n_docs_with_dups",
        "total_chars",
        "dup_chars",
        F.round(F.col("dup_chars") / F.col("total_chars") + 1e-9, 6).alias("dup_rate"),
    )


@query(
    "dedup_funnel_keep_tuned",
    oracle=f"""
    WITH RECURSIVE {_minhash_tuned_ctes(threshold=0.8)},
    {_funnel_tail(0.8)}
    """,
    priority=3,
)
def dedup_funnel_keep_tuned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup funnel action with the CORPUS-TUNED band scheme — the
    100 TB form of ``dedup_funnel_keep``. The fixed twin pins 32/8/4,
    which is the measured quadratic-candidate regime on a saturated
    corpus (x13.6 sf1→sf10, SCALING.md); here the band key lengthens
    with log2(n) (``tuned_band_rows``) and the band count restores
    recall at the verify threshold (``tuned_bands_for_rows``), so
    candidate volume — and with it the component edge list — stays
    ~linear in the corpus. Verify threshold 0.8, the production
    near-dup regime the tuned scheme is budgeted for (at 0.5 the
    OR-construction bound exceeds the 512-lane budget). Exact
    duplicates still ride the graph at any threshold (Jaccard 1.0
    collides on every band). The oracle derives the same (b, r) from
    count(*) inside the SQL and shares the keep/reason/canonical tail
    with the fixed twin, so the two funnels' semantics differ in
    EXACTLY one number — the verify threshold — and both are
    hash-checked end to end."""
    from ror_etl_spark.functions.text import fingerprint_md5
    from ror_etl_spark.operators.components import connected_components
    from ror_etl_spark.operators.util import spread

    d = spread(Tables(spark, sf_dir).documents).localCheckpoint(eager=False)
    fp = d.select("doc_id", fingerprint_md5(F.col("text")).alias("f"))
    ek = fp.groupBy("f").agg(F.min("doc_id").alias("ek"))
    ex = fp.join(ek, "f").select("doc_id", "ek")
    n = d.count()
    r = tuned_band_rows(n)
    b = tuned_bands_for_rows(r, threshold=0.8, target_recall=0.9)
    sigs = minhash_signatures(d, num_hashes=min(b * r, LANE_POOL))
    cands = lsh_candidate_pairs(sigs, bands=b, rows_per_band=r)
    verified = jaccard_verify(cands, d, threshold=0.8).select("id_a", "id_b")
    comp = connected_components(verified).labels
    canonical = F.coalesce(F.col("component"), F.col("doc_id"))
    keep = canonical == F.col("doc_id")
    return (
        ex.join(comp, ex["doc_id"] == comp["id"], "left")
        .select(
            "doc_id",
            keep.alias("keep"),
            F.when(keep, F.lit(None).cast("string"))
            .when(F.col("doc_id") != F.col("ek"), F.lit("exact"))
            .otherwise(F.lit("near"))
            .alias("reason"),
            canonical.alias("canonical_id"),
        )
        .transform(ordered, "doc_id")
    )


@query(
    "dedup_minhash_calibration",
    oracle=f"""
    WITH {_minhash_ctes()}
    SELECT c.id_a, c.id_b,
           CAST(array_length(list_filter(range(1, 33),
                i -> ma.m[i] = mb.m[i])) AS BIGINT) AS lane_matches,
           round(array_length(list_filter(range(1, 33),
                i -> ma.m[i] = mb.m[i])) / 32.0, 6) AS est_jaccard,
           CAST(array_length(list_filter(sa.s, x -> list_contains(sb.s, x)))
             AS BIGINT) AS i_intersect,
           CAST(array_length(list_distinct(list_concat(sa.s, sb.s)))
             AS BIGINT) AS u_union,
           round(abs(array_length(list_filter(range(1, 33),
                i -> ma.m[i] = mb.m[i])) / 32.0 - {_JACCARD}) + 1e-9, 4)
             AS abs_err
    FROM cand c
    JOIN sig ma ON ma.doc_id = c.id_a
    JOIN sig mb ON mb.doc_id = c.id_b
    JOIN sh sa ON sa.doc_id = c.id_a
    JOIN sh sb ON sb.doc_id = c.id_b
    ORDER BY id_a, id_b
    """,
    priority=3,
)
def dedup_minhash_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash estimator calibration report: for every LSH candidate
    pair, the SKETCH's Jaccard estimate (matching lanes / 32 — the
    unbiased MinHash estimator, an exact rational on both engines)
    side by side with the EXACT shingle-set Jaccard and the absolute
    error. This is the measurement a pipeline owner runs before
    trusting a signature width: E[lane_matches/32] = J, stddev
    ≈ sqrt(J(1-J)/32), and a systematic gap flags a broken hash
    family. Estimator and truth both replay in DuckDB, so the driver
    hash-checks the CALIBRATION itself, not just the dedup output.

    Scale shape: the candidate set (LSH-bounded, output-sized) joins
    the signature table twice (32 longs per doc — the sketch, never
    the text) and the shingle sets once per side for ground truth;
    at 100 TB the truth join is the expensive half and is exactly the
    verify step the production funnel already pays — calibration
    reuses it, adding only the lane-compare on the sketch. k/32 is
    exact in binary and ≤5 decimal digits, so round(·, 6) is the
    identity on both engines; only the error column (difference of
    exact-but-unaligned rationals) needs the epsilon shift; the exact
    Jaccard itself crosses the boundary as the INTEGER (intersection,
    union) pair, which no rounding can flap."""
    from ror_etl_spark.operators.util import spread

    d = Tables(spark, sf_dir).documents
    sigs = minhash_signatures(d, num_hashes=32)
    cands = lsh_candidate_pairs(sigs, bands=8, rows_per_band=4)
    lane_eq = F.zip_with("ma", "mb", lambda x, y: (x == y).cast("long"))
    matches = F.aggregate(
        lane_eq, F.lit(0).cast("long"), lambda acc, v: acc + v
    )
    est = (
        cands.join(
            sigs.select(F.col("id").alias("id_a"), F.col("minhash").alias("ma")),
            "id_a",
        )
        .join(
            sigs.select(F.col("id").alias("id_b"), F.col("minhash").alias("mb")),
            "id_b",
        )
        .select("id_a", "id_b", matches.alias("lane_matches"))
    )
    sh = spread(d).select(
        F.col("doc_id").alias("id"),
        F.array_distinct(shingles(F.col("text"), 3)).alias("sh"),
    )
    truth = (
        cands.join(sh.withColumnsRenamed({"id": "id_a", "sh": "sh_a"}), "id_a")
        .join(sh.withColumnsRenamed({"id": "id_b", "sh": "sh_b"}), "id_b")
        .select(
            "id_a",
            "id_b",
            F.size(F.array_intersect("sh_a", "sh_b")).cast("long").alias("i_intersect"),
            (
                F.size("sh_a")
                + F.size("sh_b")
                - F.size(F.array_intersect("sh_a", "sh_b"))
            ).cast("long").alias("u_union"),
        )
    )
    return (
        est.join(truth, ["id_a", "id_b"])
        .select(
            "id_a",
            "id_b",
            "lane_matches",
            F.round(F.col("lane_matches") / 32.0, 6).alias("est_jaccard"),
            "i_intersect",
            "u_union",
            F.round(
                F.abs(
                    F.col("lane_matches") / 32.0
                    - F.col("i_intersect")
                    / F.greatest(F.col("u_union"), F.lit(1))
                )
                + 1e-9,
                4,
            ).alias("abs_err"),
        )
        .transform(ordered, "id_a", "id_b")
    )


@query(
    "train_test_split_leakage_safe",
    oracle=f"""
    WITH RECURSIVE {_minhash_ctes()},
    ver AS (
      SELECT c.id_a, c.id_b
      FROM cand c
      JOIN sh sa ON sa.doc_id = c.id_a
      JOIN sh sb ON sb.doc_id = c.id_b
      WHERE {_JACCARD} >= 0.5),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM ver
      UNION ALL
      SELECT id_b AS src, id_a AS dst FROM ver),
    nodes AS (SELECT DISTINCT src AS id FROM edges),
    reach AS (
      SELECT id, id AS r FROM nodes
      UNION
      SELECT re.id, e.dst AS r FROM reach re JOIN edges e ON e.src = re.r),
    comp AS (SELECT id, min(r) AS cluster FROM reach GROUP BY id),
    labeled AS (
      SELECT d.doc_id, coalesce(comp.cluster, d.doc_id) AS cluster
      FROM documents d LEFT JOIN comp ON comp.id = d.doc_id),
    per_cluster AS (
      SELECT cluster, CAST(count(*) AS BIGINT) AS size,
             CASE WHEN substr(md5(CAST(cluster AS VARCHAR)), 1, 2) < '1a'
                  THEN 'test' ELSE 'train' END AS split
      FROM labeled GROUP BY cluster)
    SELECT split,
           CAST(sum(size) AS BIGINT) AS n_docs,
           CAST(count(*) AS BIGINT) AS n_clusters,
           CAST(sum(CASE WHEN size > 1 THEN size ELSE 0 END) AS BIGINT)
             AS n_dup_docs
    FROM per_cluster GROUP BY split ORDER BY split
    """,
    priority=3,
)
def train_test_split_leakage_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe holdout split: the ~10% test cut is keyed on the
    NEAR-DUP CLUSTER id, not the document id, so a document and all its
    near-duplicates always land in the same split — the contamination
    ``train_test_split_assign``'s per-document rule cannot prevent (a
    near-copy of a test document in train is silent eval leakage; the
    reason production corpora dedup/cluster BEFORE splitting). Clusters
    come from the full funnel (MinHash → LSH → Jaccard ≥ 0.5 →
    connected components; singletons are their own cluster), the split
    from the same md5-prefix rule as the per-document splitter, applied
    to the cluster id.

    Scale shape: the funnel is the production dedup pass (bucketed,
    output-sized pairs, log-diameter Hash-Min rounds); the split adds
    ONE cluster-keyed aggregate (cluster ids + sizes — nothing
    document-sized) and a codegen md5 gate. Integers only; the oracle
    closes the same graph with a recursive CTE and must agree on every
    per-split count."""
    d = Tables(spark, sf_dir).documents
    cands = lsh_candidate_pairs(minhash_signatures(d, num_hashes=32))
    verified = jaccard_verify(cands, d, threshold=0.5).select("id_a", "id_b")
    clusters = dedup_clusters(d, verified)
    per_cluster = clusters.groupBy("cluster").agg(
        F.count(F.lit(1)).alias("size")
    )
    split = F.when(
        F.substring(F.md5(F.col("cluster").cast("string")), 1, 2) < "1a", "test"
    ).otherwise("train")
    return (
        per_cluster.select(split.alias("split"), "size")
        .groupBy("split")
        .agg(
            F.sum("size").alias("n_docs"),
            F.count(F.lit(1)).alias("n_clusters"),
            F.sum(F.when(F.col("size") > 1, F.col("size")).otherwise(0)).alias(
                "n_dup_docs"
            ),
        )
        .orderBy("split")
    )


@query(
    "text_ngram_novelty",
    oracle=f"""
    WITH {_shingle_cte(3)},
    ex AS (SELECT doc_id, unnest(s) AS g FROM sh),
    fd AS (SELECT g, min(doc_id) AS first_doc FROM ex GROUP BY g)
    SELECT ex.doc_id,
           CAST(count(*) AS BIGINT) AS n_shingles,
           CAST(sum(CASE WHEN fd.first_doc = ex.doc_id THEN 1 ELSE 0 END)
             AS BIGINT) AS n_novel,
           round(sum(CASE WHEN fd.first_doc = ex.doc_id THEN 1 ELSE 0 END)
                 / count(*) + 1e-9, 4) AS novelty
    FROM ex JOIN fd USING (g)
    GROUP BY ex.doc_id ORDER BY doc_id
    """,
    priority=3,
)
def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram novelty profile: per document (in ingest order), the
    fraction of its distinct token 3-grams never seen in any EARLIER
    document — the corpus-saturation diagnostic data-curation work
    tracks while scaling a crawl (novelty trending to zero means new
    data is re-treading old ground; a jump flags a fresh domain). The
    same first-occurrence relation is what incremental dedup consumes,
    here surfaced as the per-document measurement.

    Scale shape: exactly the surprisal-join economics — one distinct-
    shingle explode (lazily checkpointed: the first-seen aggregate and
    the score join both consume it), ONE gram-keyed map-side-combined
    min aggregate (the "who saw it first" table), a gram-keyed join
    back, and a per-document count. Only (doc_id, gram) pairs move;
    min(doc_id) is order-free so no window, no sort, no global state.
    Counts are exact integers; the ratio is epsilon-rounded."""
    from ror_etl_spark.operators.util import spread

    d = spread(Tables(spark, sf_dir).documents)
    ex = (
        d.select(
            "doc_id",
            F.explode(
                F.array_distinct(shingles(F.col("text"), 3))
            ).alias("g"),
        )
        .localCheckpoint(eager=False)
    )
    fd = ex.groupBy("g").agg(F.min("doc_id").alias("first_doc"))
    novel = F.sum(
        F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
    )
    return (
        ex.join(fd, "g")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            novel.alias("n_novel"),
            F.round(
                novel / F.count(F.lit(1)) + 1e-9, 4
            ).alias("novelty"),
        )
        .orderBy("doc_id")
    )


@query(
    "dedup_incremental_near_batch",
    oracle=f"""
    WITH {_minhash_ctes()},
    cand2 AS (
      SELECT b.doc_id AS new_id, a.doc_id AS corp_id
      FROM bandrows a JOIN bandrows b
        ON a.band = b.band AND a.key = b.key
      WHERE a.doc_id % 10 < 8 AND b.doc_id % 10 >= 8
      GROUP BY b.doc_id, a.doc_id),
    ver AS (
      SELECT c.new_id,
             arg_min(c.corp_id, c.corp_id) AS dup_of,
             round(arg_min({_JACCARD}, c.corp_id), 4) AS jaccard
      FROM cand2 c
      JOIN sh sa ON sa.doc_id = c.corp_id
      JOIN sh sb ON sb.doc_id = c.new_id
      WHERE {_JACCARD} >= 0.5
      GROUP BY c.new_id)
    SELECT d.doc_id,
           ver.dup_of IS NOT NULL AS is_dup,
           ver.dup_of, ver.jaccard
    FROM documents d LEFT JOIN ver ON ver.new_id = d.doc_id
    WHERE d.doc_id % 10 >= 8
    ORDER BY d.doc_id
    """,
    priority=3,
)
def dedup_incremental_near_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental NEAR-dedup of a new batch against a stored LSH index
    (the MinHash analogue of ``dedup_incremental_new_batch``'s exact
    fingerprints): the corpus's band keys are the persisted index
    (``lsh_band_keys`` — the layout a production dedup service keeps);
    the new batch (simulated as doc_id % 10 ≥ 8) is signed and banded,
    probed against the index, and Jaccard-verified at ≥ 0.5. Each new
    document reports its min-id duplicate (id-dominance discipline)
    with that pair's Jaccard — never new×new pairs, never a corpus
    self-join.

    Scale shape: at steady state the corpus index is READ, not rebuilt
    (here both sides derive from one signature pass since the fixture
    is a single table); the probe shuffles only (band, key) rows of
    the NEW batch against the bucketed index, candidates are
    output-sized, and verification joins shingles for candidates only.
    The oracle replays index build + probe + verify end to end."""
    from ror_etl_spark.operators.dedup import lsh_band_keys

    d = Tables(spark, sf_dir).documents
    sigs = minhash_signatures(d, num_hashes=32)
    bands = lsh_band_keys(sigs.cache(), bands=8, rows_per_band=4)
    corpus_idx = bands.filter(F.col("id") % 10 < 8).withColumnsRenamed(
        {"id": "corp_id"}
    )
    new_bands = bands.filter(F.col("id") % 10 >= 8).withColumnsRenamed(
        {"id": "new_id"}
    )
    cand = (
        new_bands.join(corpus_idx, ["band", "bucket"])
        .select("new_id", "corp_id")
        .distinct()
    )
    from ror_etl_spark.operators.util import spread

    sh = spread(d).select(
        F.col("doc_id"),
        F.array_distinct(shingles(F.col("text"), 3)).alias("sh"),
    )
    ver = (
        cand.join(
            sh.select(F.col("doc_id").alias("corp_id"), F.col("sh").alias("sh_a")),
            "corp_id",
        )
        .join(
            sh.select(F.col("doc_id").alias("new_id"), F.col("sh").alias("sh_b")),
            "new_id",
        )
        .select(
            "new_id",
            "corp_id",
            (
                F.size(F.array_intersect("sh_a", "sh_b"))
                / F.greatest(
                    F.size("sh_a")
                    + F.size("sh_b")
                    - F.size(F.array_intersect("sh_a", "sh_b")),
                    F.lit(1),
                )
            ).alias("jac"),
        )
        .filter(F.col("jac") >= 0.5)
        .groupBy("new_id")
        .agg(F.min(F.struct("corp_id", "jac")).alias("best"))
        .select(
            "new_id",
            F.col("best.corp_id").alias("dup_of"),
            F.round(F.col("best.jac"), 4).alias("jaccard"),
        )
    )
    new_docs = d.filter(F.col("doc_id") % 10 >= 8).select("doc_id")
    return (
        new_docs.join(ver, new_docs.doc_id == ver.new_id, "left")
        .select(
            "doc_id",
            F.col("dup_of").isNotNull().alias("is_dup"),
            "dup_of",
            "jaccard",
        )
        .orderBy("doc_id")
    )


@query(
    "dedup_containment_pairs",
    oracle=f"""
    WITH {_minhash_ctes()}
    SELECT c.id_a, c.id_b,
           CAST(array_length(list_filter(sa.s, x -> list_contains(sb.s, x)))
             AS BIGINT) AS i_intersect,
           CAST(array_length(sa.s) AS BIGINT) AS size_a,
           CAST(array_length(sb.s) AS BIGINT) AS size_b,
           round({_JACCARD} + 1e-9, 4) AS jaccard,
           10 * array_length(list_filter(sa.s, x -> list_contains(sb.s, x)))
             >= 9 * least(array_length(sa.s), array_length(sb.s))
             AS near_subset
    FROM cand c
    JOIN sh sa ON sa.doc_id = c.id_a
    JOIN sh sb ON sb.doc_id = c.id_b
    WHERE 10 * array_length(list_filter(sa.s, x -> list_contains(sb.s, x)))
            >= 9 * least(array_length(sa.s), array_length(sb.s))
    ORDER BY id_a, id_b
    """,
    priority=3,
)
def dedup_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ASYMMETRIC near-duplicate detection by set CONTAINMENT: LSH
    candidate pairs where the smaller document's shingles are ≥ 90%
    contained in the other — the quote/excerpt/superset relation that
    symmetric Jaccard dedup structurally misses (a paragraph quoted
    inside a long article has Jaccard ≈ |para|/|article| ≈ 0 but
    containment ≈ 1). The containment threshold is the integer-exact
    cross-multiplied form ``10·i ≥ 9·min(|A|,|B|)`` — no float decides
    membership; the reported Jaccard is context.

    Scale shape: identical economics to the verified-Jaccard funnel —
    LSH-bounded candidates, one shingle intersect per pair, integer
    predicate. (Recall caveat, as in the literature: MinHash banding
    targets Jaccard, so a tiny-quote-in-huge-doc pair may not become a
    candidate; within the candidate set, containment is exact. The
    dedicated high-recall path for asymmetric containment is the
    prefix-filter join one query over.)"""
    d = Tables(spark, sf_dir).documents
    sigs = minhash_signatures(d, num_hashes=32)
    cands = lsh_candidate_pairs(sigs, bands=8, rows_per_band=4)
    from ror_etl_spark.operators.util import spread

    sh = spread(d).select(
        F.col("doc_id"),
        F.array_distinct(shingles(F.col("text"), 3)).alias("sh"),
    )
    j = (
        cands.join(
            sh.select(F.col("doc_id").alias("id_a"), F.col("sh").alias("sh_a")),
            "id_a",
        )
        .join(
            sh.select(F.col("doc_id").alias("id_b"), F.col("sh").alias("sh_b")),
            "id_b",
        )
        .select(
            "id_a",
            "id_b",
            F.size(F.array_intersect("sh_a", "sh_b")).cast("long").alias(
                "i_intersect"
            ),
            F.size("sh_a").cast("long").alias("size_a"),
            F.size("sh_b").cast("long").alias("size_b"),
        )
    )
    near = 10 * F.col("i_intersect") >= 9 * F.least(
        F.col("size_a"), F.col("size_b")
    )
    jac = F.col("i_intersect") / F.greatest(
        F.col("size_a") + F.col("size_b") - F.col("i_intersect"), F.lit(1)
    )
    return (
        j.filter(near)
        .select(
            "id_a",
            "id_b",
            "i_intersect",
            "size_a",
            "size_b",
            F.round(jac + 1e-9, 4).alias("jaccard"),
            near.alias("near_subset"),
        )
        .transform(ordered, "id_a", "id_b")
    )


@query(
    "golden_record_survivorship",
    oracle=f"""
    WITH RECURSIVE {_minhash_ctes()},
    ver AS (
      SELECT c.id_a, c.id_b
      FROM cand c
      JOIN sh sa ON sa.doc_id = c.id_a
      JOIN sh sb ON sb.doc_id = c.id_b
      WHERE {_JACCARD} >= 0.5),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM ver
      UNION ALL
      SELECT id_b AS src, id_a AS dst FROM ver),
    nodes AS (SELECT DISTINCT src AS id FROM edges),
    reach AS (
      SELECT id, id AS r FROM nodes
      UNION
      SELECT re.id, e.dst AS r FROM reach re JOIN edges e ON e.src = re.r),
    comp AS (SELECT id, min(r) AS cluster FROM reach GROUP BY id),
    mem AS (
      SELECT comp.cluster, d.doc_id, d.n_chars, d.lang, d.source,
             row_number() OVER (PARTITION BY comp.cluster
                                ORDER BY d.n_chars DESC, d.doc_id) AS rn
      FROM comp JOIN documents d ON d.doc_id = comp.id)
    SELECT cluster,
           CAST(count(*) AS BIGINT) AS size,
           CAST(max(CASE WHEN rn = 1 THEN doc_id END) AS BIGINT)
             AS survivor_doc,
           CAST(max(n_chars) AS BIGINT) AS n_chars_max,
           string_agg(DISTINCT lang, ',' ORDER BY lang) AS langs,
           CAST(count(DISTINCT source) AS BIGINT) AS n_sources
    FROM mem GROUP BY cluster HAVING count(*) > 1 ORDER BY cluster
    """,
    priority=5,
)
def golden_record_survivorship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Golden-record construction (MDM survivorship): after the
    near-dup funnel clusters records, the MERGE step builds one best
    record per cluster by field-level rules — here, longest-text-wins
    for the survivor (ties to the smallest id), max length, the union
    of observed languages, and the count of contributing sources. This
    is the deliverable the keep-one dedup ops stop short of: the kept
    row plus the evidence folded in from the rows it absorbed.

    Plan: the funnel (signatures → LSH → Jaccard verify → components)
    reuses the exact operators the cluster queries pin; survivorship is
    one row_number window + one aggregate, both keyed on the cluster —
    one extra shuffle over the cluster assignment. The oracle replays
    the entire funnel AND the survivorship rules (same wrap-the-
    generated-SQL discipline as the kappa/lang-ID pair)."""
    from pyspark.sql import Window as W

    d = Tables(spark, sf_dir).documents
    cands = lsh_candidate_pairs(minhash_signatures(d, num_hashes=32))
    verified = jaccard_verify(cands, d, threshold=0.5).select("id_a", "id_b")
    clusters = dedup_clusters(d, verified).select(
        F.col("id").alias("doc_id"), "cluster"
    )
    mem = clusters.join(d, "doc_id").withColumn(
        "rn",
        F.row_number().over(
            W.partitionBy("cluster").orderBy(F.desc("n_chars"), F.asc("doc_id"))
        ),
    )
    return (
        mem.groupBy("cluster")
        .agg(
            F.count(F.lit(1)).alias("size"),
            F.max(F.when(F.col("rn") == 1, F.col("doc_id"))).alias(
                "survivor_doc"
            ),
            F.max("n_chars").alias("n_chars_max"),
            F.array_join(F.array_sort(F.collect_set("lang")), ",").alias(
                "langs"
            ),
            F.countDistinct("source").alias("n_sources"),
        )
        .filter(F.col("size") > 1)
        .orderBy("cluster")
    )
