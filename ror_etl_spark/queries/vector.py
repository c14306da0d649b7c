"""Similarity-search queries over the embeddings table."""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ror_etl_spark.functions.vectors import as_double, cosine
from ror_etl_spark.operators.similarity import ivf_topk, lsh_near_dup_pairs, lsh_topk
from ror_etl_spark.operators.util import spread
from ror_etl_spark.registry import query
from ror_etl_spark.tables import Tables
from ror_etl_spark.queries.util import r6

_COS_SQL = """
    list_dot_product({a}, {b})
    / (sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b})))
"""


@query(
    "embedding_cosine_topk",
    oracle=f"""
    WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0),
         e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings WHERE vec_id <> 0)
    SELECT e.vec_id, round({_COS_SQL.format(a='e.v', b='q.qv')}, 6) AS cos
    FROM e, q
    ORDER BY cos DESC, e.vec_id
    LIMIT 10
    """,
)
def embedding_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-10 cosine neighbors of vec_id=0 (brute force baseline).

    The 1-row query side is broadcast; the corpus never shuffles — the
    plan ends in TakeOrderedAndProject. Dot products are sequential
    left-folds in float64 on both engines, so rounding at 6 dp is exact."""
    emb = Tables(spark, sf_dir).embeddings
    q = emb.filter(F.col("vec_id") == 0).select(as_double(F.col("embedding")).alias("qv"))
    corpus = emb.filter(F.col("vec_id") != 0).select(
        "vec_id", as_double(F.col("embedding")).alias("v")
    )
    return (
        corpus.crossJoin(F.broadcast(q))
        .select("vec_id", r6(cosine(F.col("v"), F.col("qv"))).alias("cos"))
        .orderBy(F.desc("cos"), F.asc("vec_id"))
        .limit(10)
    )


def _near_dup_oracle(n_tables: int = 8, n_planes: int = 6, base_seed: int = 101) -> str:
    """DuckDB replay of lsh_near_dup_pairs: per-table sign buckets from the
    same seeded hyperplanes (inlined as literals), candidates = pairs
    sharing any table's bucket, exact cosine ≥ threshold on candidates."""
    from ror_etl_spark.operators.similarity import random_hyperplanes

    def bucket_expr(v: str, planes) -> str:
        bits = [
            f"(CASE WHEN list_dot_product({v}, ["
            + ", ".join(repr(x) for x in plane)
            + f"]) >= 0 THEN {1 << i} ELSE 0 END)"
            for i, plane in enumerate(planes)
        ]
        return " + ".join(bits)

    tables = [
        random_hyperplanes(64, n_planes, base_seed + t) for t in range(n_tables)
    ]
    bucket_cols = ", ".join(
        f"({bucket_expr('v', planes)}) AS t{t}" for t, planes in enumerate(tables)
    )
    any_shared = " OR ".join(f"a.t{t} = b.t{t}" for t in range(n_tables))
    cos = _COS_SQL.format(a="a.v", b="b.v")
    return f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    bk AS (SELECT vec_id, v, {bucket_cols} FROM e)
    SELECT a.vec_id AS id_a, b.vec_id AS id_b, round({cos}, 6) AS cos
    FROM bk a JOIN bk b ON a.vec_id < b.vec_id AND ({any_shared})
    WHERE round({cos}, 6) >= 0.4
    ORDER BY id_a, id_b
    """


@query("embedding_near_dup_pairs", oracle=_near_dup_oracle(), priority=5)
def embedding_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (cos ≥ 0.4) on the LSH-bucketed
    scale path: 8 hyperplane tables × 6 planes generate candidates (pairs
    sharing any table's sign bucket — shuffles (table, bucket, id) triples,
    never vectors), then exact cosine verifies candidates only. No
    cartesian/BroadcastNestedLoopJoin anywhere in the plan (pinned by
    tests/test_plan_invariants.py); the brute-force all_pairs_above stays
    as the tests' recall baseline. The oracle replays the seeded buckets in
    SQL, so the result is hash-checked end to end."""
    emb = Tables(spark, sf_dir).embeddings
    # no trailing sort: gate hashes order-insensitively (cf. ultimate_parent_rollup_wide)
    return lsh_near_dup_pairs(emb, threshold=0.4, dim=64, n_planes=6)


def _near_dup_tuned_oracle(
    threshold: float = 0.4,
    target_recall: float = 0.9,
    base_seed: int = 101,
    max_tables: int = 32,
    max_planes: int = 16,
    max_bucket: int = 1024,
) -> str:
    """DuckDB replay of the TUNED hyperplane-LSH near-dup funnel, with
    (n_tables, n_planes) derived from the corpus row count INSIDE the
    SQL:

    - ``p`` comes from the same integer-exact occupancy rule as
      ``tuned_planes`` (``min(p) FROM range(4,17) WHERE 64·2^p ≥
      count(*)``) — no float logs in either engine;
    - ``t`` is a CASE lookup over p whose values the generator computes
      once in Python via ``tuned_tables_for_planes``;
    - hyperplanes are inlined for the MAXIMUM scheme (max_tables ×
      max_planes); ``random_hyperplanes`` draws planes sequentially per
      table from seed ``base_seed + t``, so any smaller p uses an exact
      PREFIX of table t's literal planes — identical to the Spark
      operator's generation.

    Bucket = the sign pattern of the first p planes of each of the first
    t tables; buckets holding more than ``max_bucket`` ids are dropped
    (the operator's occupancy cap — see ``lsh_near_dup_pairs``);
    candidates share any surviving bucket; exact cosine ≥ threshold
    verifies candidates only — the whole funnel hash-checked at ANY
    scale factor."""
    from ror_etl_spark.operators.similarity import (
        random_hyperplanes,
        tuned_tables_for_planes,
    )

    t_case = " ".join(
        f"WHEN {p} THEN {tuned_tables_for_planes(p, threshold, target_recall, max_tables)}"
        for p in range(4, max_planes + 1)
    )
    planes_flat = [
        plane
        for t in range(max_tables)
        for plane in random_hyperplanes(64, max_planes, base_seed + t)
    ]
    pl = (
        "["
        + ", ".join(
            "[" + ", ".join(repr(x) for x in plane) + "]" for plane in planes_flat
        )
        + "]"
    )
    cos = _COS_SQL.format(a="a.v", b="b.v")
    return f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    nn AS (SELECT count(*) AS n FROM embeddings),
    p0 AS (SELECT coalesce(min(range), {max_planes})::INT AS p
           FROM range(4, {max_planes + 1}), nn
           WHERE 64 * (1::BIGINT << range) >= nn.n),
    prm AS (SELECT p, (CASE p {t_case} END)::INT AS t FROM p0),
    tb AS (SELECT unnest(range(0, t)) AS tbl, p FROM prm),
    pls AS (
      SELECT unnest(range(1, {max_tables * max_planes + 1})) AS k,
             unnest({pl}) AS plane),
    ap AS (
      SELECT tb.tbl, pls.k - tb.tbl * {max_planes} AS i, pls.plane
      FROM tb JOIN pls
        ON pls.k > tb.tbl * {max_planes}
       AND pls.k <= tb.tbl * {max_planes} + tb.p),
    bk AS (
      SELECT e.vec_id, ap.tbl,
             sum(CASE WHEN list_dot_product(e.v, ap.plane) >= 0
                      THEN (1::BIGINT << (ap.i - 1)) ELSE 0 END) AS bucket
      FROM e CROSS JOIN ap
      GROUP BY e.vec_id, ap.tbl),
    bok AS (SELECT tbl, bucket FROM bk GROUP BY tbl, bucket HAVING count(*) <= {max_bucket}),
    bk2 AS (SELECT bk.* FROM bk JOIN bok USING (tbl, bucket)),
    cand AS (
      SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
      FROM bk2 a JOIN bk2 b
        ON a.tbl = b.tbl AND a.bucket = b.bucket AND a.vec_id < b.vec_id)
    SELECT c.id_a, c.id_b, round({cos}, 6) AS cos
    FROM cand c JOIN e a ON a.vec_id = c.id_a JOIN e b ON b.vec_id = c.id_b
    WHERE round({cos}, 6) >= {threshold}
    ORDER BY id_a, id_b
    """


@query("embedding_near_dup_pairs_tuned", oracle=_near_dup_tuned_oracle(), priority=5)
def embedding_near_dup_pairs_tuned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-duplicate pairs with LSH parameters DERIVED FROM
    THE CORPUS SIZE — the scale-safe form of ``embedding_near_dup_pairs``.

    The fixed 8×6 twin measured a x8.3 sf0.1→1 step (SCALING.md): at
    fixed sign-prefix length, bucket occupancy grows linearly with the
    corpus and in-bucket candidate pairs ~quadratically. Here
    ``tuned_planes`` lengthens the prefix with log2(n) (expected
    occupancy ~constant → per-table candidates ~linear) and
    ``tuned_tables_for_planes`` restores recall at the cosine threshold
    via the OR-construction bound. Threshold 0.4 matches the
    fixed twin's deliberately-hard regime (the driver corpus's densest
    pairs sit at cos 0.4-0.5, so the query returns real rows); at that
    threshold the table bound hits the 32-table cap for p >= 6 — the
    documented recall decay of low-threshold sign-LSH — while the
    planted cos≈0.999 twins of the rehearsal corpora survive any p with
    a single table. What the tuning buys is the CANDIDATE side:
    occupancy stays ~constant, so verify work grows ~linearly with the
    corpus where the fixed scheme measured x8.3 in one decade. One
    driver-side count() routes the params — deterministic, so the DuckDB
    oracle re-derives THE SAME (t, p) from count(*) inside the SQL and
    replays the seeded-prefix hyperplane buckets bit-exactly."""
    from ror_etl_spark.operators.similarity import (
        tuned_planes,
        tuned_tables_for_planes,
    )

    emb = Tables(spark, sf_dir).embeddings
    n = emb.count()
    p = tuned_planes(n)
    t = tuned_tables_for_planes(p, threshold=0.4, target_recall=0.9, max_tables=32)
    return lsh_near_dup_pairs(
        emb, threshold=0.4, dim=64, n_tables=t, n_planes=p, max_bucket=1024
    ).orderBy("id_a", "id_b")


@query(
    "embedding_centroid_norm",
    oracle="""
    SELECT label,
           count(*) AS n_vectors,
           round(avg(list_dot_product(CAST(embedding AS DOUBLE[]),
                                      CAST(embedding AS DOUBLE[]))), 4) AS avg_sq_norm
    FROM embeddings
    GROUP BY label
    ORDER BY label
    """,
)
def embedding_centroid_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label vector statistics (squared-norm average) — array math
    inside an aggregation."""
    emb = Tables(spark, sf_dir).embeddings
    v = as_double(F.col("embedding"))
    sq = F.aggregate(F.zip_with(v, v, lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x)
    return (
        emb.select("label", sq.alias("sq"))
        .groupBy("label")
        .agg(F.count(F.lit(1)).alias("n_vectors"), F.round(F.avg("sq"), 4).alias("avg_sq_norm"))
        .orderBy("label")
    )


def _lsh_oracle() -> str:
    """DuckDB twin of the hyperplane-LSH bucket restriction: the planes are
    deterministic (seeded SplitMix64), so their float components inline as
    SQL literals, and bucket membership reduces to matching the query's
    sign on every plane. The query row itself supplies the cosine target.

    NOTE: assumes a 64-dim embedding column (the testdata's layout) purely
    for literal generation; the Spark operator is dimension-agnostic."""
    from ror_etl_spark.operators.similarity import random_hyperplanes

    planes = random_hyperplanes(64, 4, seed=42)
    plane_sql = [
        "[" + ", ".join(repr(x) for x in plane) + "]" for plane in planes
    ]
    sign_conds = " AND ".join(
        f"((list_dot_product(e.v, {p}) >= 0) = (list_dot_product(q.qv, {p}) >= 0))"
        for p in plane_sql
    )
    cos = (
        "list_dot_product(e.v, q.qv) / "
        "(sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(q.qv, q.qv)))"
    )
    return f"""
    WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0),
         e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings WHERE vec_id <> 0)
    SELECT e.vec_id, round({cos}, 6) AS cos
    FROM e, q
    WHERE {sign_conds}
    ORDER BY cos DESC, e.vec_id
    LIMIT 10
    """


@query("embedding_knn_lsh", oracle=_lsh_oracle())
def embedding_knn_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale path: random-hyperplane LSH bucket restriction, then exact
    cosine inside the bucket — oracle-checked because the seeded planes
    are deterministic and expressible as SQL literals."""
    emb = Tables(spark, sf_dir).embeddings
    qrow = emb.filter(F.col("vec_id") == 0).select("embedding").first()
    qv = [float(x) for x in qrow["embedding"]]
    return lsh_topk(emb.filter(F.col("vec_id") != 0), qv, k=10, n_planes=4)


_IVF_ORACLE = """
    WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0),
    e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings WHERE vec_id <> 0),
    cents AS (
      SELECT row_number() OVER (ORDER BY vec_id) - 1 AS idx, v AS c
      FROM e ORDER BY vec_id LIMIT 16),
    assign AS (
      SELECT vec_id, v, cell FROM (
        SELECT e.vec_id, e.v, c.idx AS cell,
               row_number() OVER (PARTITION BY e.vec_id
                                  ORDER BY list_distance(e.v, c.c), c.idx) AS rn
        FROM e, cents c)
      WHERE rn = 1),
    probe AS (
      SELECT c.idx FROM cents c, q ORDER BY list_distance(q.qv, c.c), c.idx LIMIT 4)
    SELECT a.vec_id,
           round(list_dot_product(a.v, q.qv)
                 / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(q.qv, q.qv))), 6) AS cos
    FROM assign a, q
    WHERE a.cell IN (SELECT idx FROM probe)
    ORDER BY cos DESC, a.vec_id
    LIMIT 10
"""


# priority 4: r7-session-2 code change (GEMM centroid assignment) —
# keep inside the driver window so the change re-proves
@query("embedding_knn_ivf", oracle=_IVF_ORACLE, priority=5)
def embedding_knn_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF scale path: coarse-quantize to centroid cells, probe the 4
    nearest cells, exact cosine inside — oracle-checked because centroid
    choice (16 smallest ids) and probe ordering are deterministic rules
    the oracle replays in SQL. Unit tests assert true-top-1 recall."""
    emb = Tables(spark, sf_dir).embeddings
    qrow = emb.filter(F.col("vec_id") == 0).select("embedding").first()
    qv = [float(x) for x in qrow["embedding"]]
    return ivf_topk(
        emb.filter(F.col("vec_id") != 0), qv, k=10, n_centroids=16, nprobe=4
    )


def _multiprobe_oracle(n_planes: int = 4, nprobe: int = 3) -> str:
    """DuckDB twin of multi-probe LSH: replay the probe ranking in SQL.

    The probe sequence is deterministic given the (seeded) planes and the
    query vector: candidate bucket = query_bucket XOR mask, masks ranked
    by the sum of |query margin| over flipped bits, ties by mask value.
    The oracle enumerates all 2^p masks with their flip costs, takes the
    top ``nprobe``, and keeps corpus vectors whose sign-bucket lands in
    that probe set — bit-for-bit the operator's driver-side logic."""
    from ror_etl_spark.operators.similarity import random_hyperplanes

    planes = random_hyperplanes(64, n_planes, seed=42)
    plane_sql = ["[" + ", ".join(repr(x) for x in plane) + "]" for plane in planes]

    def bucket_expr(v: str) -> str:
        bits = [
            f"(CASE WHEN list_dot_product({v}, {p}) >= 0 THEN {1 << i} ELSE 0 END)"
            for i, p in enumerate(plane_sql)
        ]
        return " + ".join(bits)

    cost_terms = " + ".join(
        f"(CASE WHEN (m & {1 << i}) <> 0 THEN abs(list_dot_product(q.qv, {p})) ELSE 0 END)"
        for i, p in enumerate(plane_sql)
    )
    cos = (
        "list_dot_product(e.v, q.qv) / "
        "(sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(q.qv, q.qv)))"
    )
    return f"""
    WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0),
         e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings WHERE vec_id <> 0),
         masks AS (SELECT CAST(range AS INT) AS m FROM range({1 << n_planes})),
         probes AS (
           SELECT xor(m, (SELECT {bucket_expr('q.qv')} FROM q q)) AS b
           FROM masks, q
           ORDER BY {cost_terms}, m
           LIMIT {nprobe})
    SELECT e.vec_id, round({cos}, 6) AS cos
    FROM e, q
    WHERE ({bucket_expr('e.v')}) IN (SELECT b FROM probes)
    ORDER BY cos DESC, e.vec_id
    LIMIT 10
    """


@query("embedding_knn_lsh_multiprobe", oracle=_multiprobe_oracle())
def embedding_knn_lsh_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe LSH top-k: besides the query's own bucket, probe the
    buckets behind the 2 cheapest sign flips (smallest |margin|) —
    recovers neighbors that fell just across a hyperplane, trading
    3/2^4 of the corpus scanned for near-brute-force recall. The probe
    ranking is deterministic, so the oracle replays it in SQL."""
    emb = Tables(spark, sf_dir).embeddings
    qrow = emb.filter(F.col("vec_id") == 0).select("embedding").first()
    qv = [float(x) for x in qrow["embedding"]]
    return lsh_topk(emb.filter(F.col("vec_id") != 0), qv, k=10, n_planes=4, nprobe=3)


def _kmeans_ctes(
    source_sql: str,
    n_centroids: int | str,
    iters: int,
    dim: int,
    round_means: int,
    prefix: str = "",
) -> list[str]:
    """CTE chain replaying ``kmeans_centroids`` + final assignment in
    DuckDB: Lloyd's algorithm here is a pure function of the data (init =
    n_centroids smallest ids, argmin ties to the lower cell, empty cells
    keep their centroid, means quantized to ``round_means`` decimals each
    iteration so fp summation order can't drift the trajectory) — so
    ``iters`` assignment+update rounds unroll into chained CTEs and land
    on bit-identical centroids. ``source_sql`` must yield (vec_id, v);
    the returned chain ends in ``{prefix}af`` = (vec_id, v, cell).
    ``prefix`` namespaces every CTE so independent chains (one per PQ
    subspace) can coexist in a single WITH. ``n_centroids`` may be a SQL
    scalar-subquery string (the tuned twin derives it from count(*)
    inside the oracle, the tuned-LSH discipline) — it only ever appears
    in the init CTE's LIMIT, so every other stage is size-agnostic."""
    x = prefix

    def assign(a: str, cents: str) -> str:
        return f"""
    {a} AS (
      SELECT vec_id, v, cell FROM (
        SELECT e.vec_id, e.v, c.cell,
               row_number() OVER (PARTITION BY e.vec_id
                                  ORDER BY list_distance(e.v, c.c), c.cell) AS rn
        FROM {x}e e, {cents} c)
      WHERE rn = 1)"""

    ctes = [
        f"""{x}e AS ({source_sql})""",
        f"""{x}p AS (SELECT CAST(range AS INT) AS pos FROM range(1, {dim + 1}))""",
        f"""{x}c0 AS (
      SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell, v AS c
      FROM (SELECT vec_id, v FROM {x}e ORDER BY vec_id LIMIT {n_centroids}))""",
    ]
    for i in range(iters):
        ctes.append(assign(f"{x}a{i}", f"{x}c{i}"))
        ctes.append(
            f"""{x}m{i} AS (
      SELECT cell, pos, round(avg(x), {round_means}) AS m
      FROM (SELECT a.cell, p.pos, a.v[p.pos] AS x FROM {x}a{i} a CROSS JOIN {x}p p)
      GROUP BY cell, pos)"""
        )
        ctes.append(
            f"""{x}c{i + 1} AS (
      SELECT c.cell, list(coalesce(m.m, c.c[p.pos]) ORDER BY p.pos) AS c
      FROM {x}c{i} c CROSS JOIN {x}p p
      LEFT JOIN {x}m{i} m ON m.cell = c.cell AND m.pos = p.pos
      GROUP BY c.cell)"""
        )
    ctes.append(assign(f"{x}af", f"{x}c{iters}"))
    return ctes


def _ivf_trained_oracle(
    n_centroids: int = 16,
    iters: int = 3,
    nprobe: int = 2,
    k: int = 10,
    dim: int = 64,
    round_means: int = 6,
) -> str:
    """DuckDB replay of IVF with the FULL k-means training loop (CTE
    chain from ``_kmeans_ctes``); the final SELECT replays probe ranking
    and in-cell exact cosine."""
    ctes = [
        """q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0)""",
        *_kmeans_ctes(
            """SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
          FROM embeddings WHERE vec_id <> 0""",
            n_centroids,
            iters,
            dim,
            round_means,
        ),
    ]
    ctes.append(
        f"""probe AS (
      SELECT c.cell FROM c{iters} c, q
      ORDER BY list_distance(q.qv, c.c), c.cell LIMIT {nprobe})"""
    )
    cos = _COS_SQL.format(a="af.v", b="q.qv")
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"""
    SELECT af.vec_id, round({cos}, 6) AS cos
    FROM af, q
    WHERE af.cell IN (SELECT cell FROM probe)
    ORDER BY cos DESC, af.vec_id
    LIMIT {k}
    """
    )


@query("embedding_knn_ivf_trained", oracle=_ivf_trained_oracle(), priority=5)
def embedding_knn_ivf_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF with k-means-trained centroids (3 Lloyd iterations) instead of
    the deterministic id-sample: cells shrink toward the data's modes, so
    the same nprobe=2 probes a better-targeted slice of the corpus. The
    pytest suite asserts the quantization error never increases with
    training and that probing all cells reproduces brute force exactly.
    Training is fully deterministic (id-ordered init, ties to lower cell,
    means rounded to 6 dp each iteration), so the DuckDB oracle unrolls
    the whole training loop in SQL and hash-checks the result end to end."""
    emb = Tables(spark, sf_dir).embeddings
    qrow = emb.filter(F.col("vec_id") == 0).select("embedding").first()
    qv = [float(x) for x in qrow["embedding"]]
    return ivf_topk(
        emb.filter(F.col("vec_id") != 0), qv, k=10, n_centroids=16, nprobe=2,
        train_iters=3, round_means=6,
    )


def _semdedup_oracle(
    threshold: float = 0.4,
    n_centroids: int | str = 16,
    iters: int = 3,
    dim: int = 64,
    round_means: int = 6,
    head_ctes: list[str] | None = None,
) -> str:
    """DuckDB replay of semdedup_prune: the full k-means trajectory
    (``_kmeans_ctes`` over ALL vectors), then the id-dominance prune as
    one per-cell self-join — b is a witness for a iff same cell, lower
    id, and rounded cosine ≥ threshold. The tuned twin passes
    ``head_ctes`` (count → k rule) and a scalar-subquery
    ``n_centroids``."""
    ctes = (head_ctes or []) + _kmeans_ctes(
        "SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings",
        n_centroids,
        iters,
        dim,
        round_means,
    )
    cos = _COS_SQL.format(a="a.v", b="b.v")
    ctes.append(
        f"""pr AS (
      SELECT a.vec_id AS d, min(b.vec_id) AS w
      FROM af a JOIN af b ON a.cell = b.cell AND b.vec_id < a.vec_id
      WHERE round({cos}, 6) >= {threshold}
      GROUP BY a.vec_id)"""
    )
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + """
    SELECT af.vec_id, CAST(af.cell AS INT) AS cell,
           pr.w IS NOT NULL AS pruned, pr.w AS dup_of
    FROM af LEFT JOIN pr ON pr.d = af.vec_id
    ORDER BY af.vec_id
    """
    )


@query("embedding_semdedup_prune", oracle=_semdedup_oracle(), priority=3)
def embedding_semdedup_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup semantic deduplication (Abbas et al. 2023's shape):
    k-means-cluster every embedding (3 deterministic Lloyd iterations,
    the same replayable trajectory as embedding_knn_ivf_trained), then
    within each cluster prune vectors whose cosine to an earlier (lower
    id) cluster member is ≥ 0.4 — the semantic analogue of the
    MinHash/SimHash family one directory over, catching paraphrases
    and re-encodings that share no n-grams.

    The cluster pass is what makes this the SCALE path: the quadratic
    verify runs inside cells (blocked GEMM, same kernel economics as
    lsh_near_dup_pairs), and at 100 TB n_centroids grows with the
    corpus so cell occupancy — the unit of quadratic work — stays
    bounded. The oracle unrolls the entire training loop plus the
    prune self-join in SQL, so WHO gets pruned, in WHICH cell, and by
    WHOM is hash-checked end to end at every SF."""
    from ror_etl_spark.operators.similarity import semdedup_prune

    emb = Tables(spark, sf_dir).embeddings
    return semdedup_prune(
        emb, threshold=0.4, n_centroids=16, train_iters=3, round_means=6
    ).orderBy("vec_id")


_PQ_M = 8       # subspaces
_PQ_DSUB = 8    # dims per subspace (8 × 8 = the 64-dim embedding)
_PQ_K = 16      # centroids per subspace codebook
_PQ_ITERS = 2


def _pq_oracle() -> str:
    """Four independent prefixed k-means chains (one per subspace slice
    of the embedding), joined on vec_id into the code tuple."""
    ctes: list[str] = []
    for m in range(_PQ_M):
        lo, hi = m * _PQ_DSUB + 1, (m + 1) * _PQ_DSUB
        ctes += _kmeans_ctes(
            f"SELECT vec_id, (CAST(embedding AS DOUBLE[]))[{lo}:{hi}] AS v"
            " FROM embeddings",
            _PQ_K,
            _PQ_ITERS,
            _PQ_DSUB,
            6,
            prefix=f"s{m}_",
        )
    codes = ", ".join(
        f"CAST(s{m}_af.cell AS INT) AS c{m}" for m in range(_PQ_M)
    )
    joins = " ".join(
        f"JOIN s{m}_af ON s{m}_af.vec_id = s0_af.vec_id" for m in range(1, _PQ_M)
    )
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"""
    SELECT s0_af.vec_id, {codes}
    FROM s0_af {joins}
    ORDER BY s0_af.vec_id
    """
    )


def _pq_cells_udf(books: list[list[list[float]]]):
    """Arrow-batched PQ encoder: one GEMM argmin per subspace per batch,
    all subspaces in a single UDF call — returns the array of cell ids.
    Identical math (and tie-break: numpy argmin takes the first minimum,
    the lower cell) to assigning each subspace with _nearest_cell_udf."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    Cs = [np.array(b, dtype=np.float64) for b in books]
    c2s = [(C * C).sum(axis=1) for C in Cs]

    @pandas_udf("array<int>")
    def cells(vecs: pd.Series) -> pd.Series:
        V = np.array(vecs.tolist(), dtype=np.float64)
        cols = []
        for m in range(_PQ_M):
            S = V[:, m * _PQ_DSUB : (m + 1) * _PQ_DSUB]
            d = c2s[m][None, :] - 2.0 * (S @ Cs[m].T)
            cols.append(np.argmin(d, axis=1).astype(np.int32))
        A = np.stack(cols, axis=1)
        return pd.Series(list(A))

    # asNondeterministic: same duplicate-eval guard as _nearest_cell_udf
    # (operators/similarity.py) — pushed filters must not re-run the
    # 8-subspace GEMM encode.
    return cells.asNondeterministic()


def _pq_encode(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, list[list[list[float]]]]:
    """Train the subspace codebooks and encode every vector: returns
    ((vec_id, c0..c{M-1}) DataFrame, per-subspace centroid lists).

    All _PQ_M trainings run FUSED — one init collect, then ONE job per
    Lloyd iteration computing every subspace's per-(cell, dim) means
    (cells from the fused encoder UDF, dims from a single posexplode
    keyed by ``pos div dsub``) — instead of M independent kmeans loops,
    whose ~5 tiny jobs each made PQ the slowest pair of queries in the
    full-registry bench (8 subspaces × (init + 2×(assign, means)) ≈ 40
    job round-trips of fixed overhead). The per-subspace trajectory is
    IDENTICAL to kmeans_centroids (same init rows, same argmin
    tie-break, same avg, same round_means quantization; a subspace that
    has converged is a fixpoint of further iterations), so the oracle's
    per-subspace CTE chains replay unchanged."""
    from ror_etl_spark.operators.util import spread

    emb = Tables(spark, sf_dir).embeddings
    base = spread(emb).select(
        "vec_id", as_double(F.col("embedding")).alias("v")
    ).localCheckpoint(eager=False)
    rows = base.orderBy("vec_id").limit(_PQ_K).select("v").collect()
    books = [
        [
            [float(x) for x in r["v"][m * _PQ_DSUB : (m + 1) * _PQ_DSUB]]
            for r in rows
        ]
        for m in range(_PQ_M)
    ]
    for _ in range(_PQ_ITERS):
        assign = _pq_cells_udf(books)
        ex = (
            base.select(assign(F.col("v")).alias("cs"), F.posexplode("v"))
            .select(
                (F.col("pos") / _PQ_DSUB).cast("int").alias("sub"),
                (F.col("pos") % _PQ_DSUB).alias("spos"),
                F.col("cs"),
                F.col("col").alias("x"),
            )
            .select("sub", F.col("cs")[F.col("sub")].alias("cell"), "spos", "x")
        )
        means = ex.groupBy("sub", "cell", "spos").agg(F.avg("x").alias("m")).collect()
        new = [[list(c) for c in b] for b in books]
        for r in means:
            new[r["sub"]][r["cell"]][r["spos"]] = round(r["m"], 6)
        if new == books:
            break
        books = new
    codes = base.select(
        "vec_id", _pq_cells_udf(books)(F.col("v")).alias("cs")
    ).select(
        "vec_id", *[F.col("cs")[m].alias(f"c{m}") for m in range(_PQ_M)]
    )
    return codes, books


@query("embedding_pq_codes", oracle=_pq_oracle(), priority=5)
def embedding_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product quantization (Jégou et al., the standard ANN compression):
    split each 64-dim embedding into 4 subspaces of 16 dims, train an
    independent 8-centroid codebook per subspace (2 deterministic Lloyd
    iterations each — same replayable trajectory as the IVF/SemDeDup
    training), and emit each vector's 4-byte code tuple. At 100 TB this
    is how the vector corpus gets 128× smaller before it ever shuffles:
    codebooks are driver-sized (M × k × dsub floats), training reads a
    sample, and encoding is one map pass — 4 GEMM argmins per batch, no
    shuffle at all. Codes are INTEGERS, so the oracle (four prefixed
    CTE training chains joined on vec_id) hash-checks the entire
    train+encode pipeline with no float crossing the engine boundary."""
    codes, _ = _pq_encode(spark, sf_dir)
    return codes.orderBy("vec_id")


def _pq_adc_oracle(k: int = 10) -> str:
    """ADC replay: the same four training chains, a per-subspace distance
    table dt{m} = squared L2 from the query's slice to every trained
    centroid (qq − 2·qc + cc, three sequential dot folds), then each
    vector's ADC distance = the sum of its four looked-up table entries.
    Everything data-dependent lives in SQL — no literals cross over."""
    ctes: list[str] = [
        "q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0)"
    ]
    for m in range(_PQ_M):
        lo, hi = m * _PQ_DSUB + 1, (m + 1) * _PQ_DSUB
        ctes += _kmeans_ctes(
            f"SELECT vec_id, (CAST(embedding AS DOUBLE[]))[{lo}:{hi}] AS v"
            " FROM embeddings",
            _PQ_K,
            _PQ_ITERS,
            _PQ_DSUB,
            6,
            prefix=f"s{m}_",
        )
        ctes.append(
            f"""dt{m} AS (
      SELECT c.cell,
             list_dot_product(q.qv[{lo}:{hi}], q.qv[{lo}:{hi}])
             - 2 * list_dot_product(q.qv[{lo}:{hi}], c.c)
             + list_dot_product(c.c, c.c) AS d
      FROM s{m}_c{_PQ_ITERS} c, q)"""
        )
    joins = " ".join(
        f"JOIN s{m}_af ON s{m}_af.vec_id = s0_af.vec_id" for m in range(1, _PQ_M)
    ) + " " + " ".join(
        f"JOIN dt{m} ON dt{m}.cell = s{m}_af.cell" for m in range(_PQ_M)
    )
    adc = " + ".join(f"dt{m}.d" for m in range(_PQ_M))
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"""
    SELECT s0_af.vec_id, round({adc} + 1e-9, 6) AS adc
    FROM s0_af {joins}
    WHERE s0_af.vec_id <> 0
    ORDER BY adc ASC, s0_af.vec_id
    LIMIT {k}
    """
    )


@query("embedding_pq_adc_topk", oracle=_pq_adc_oracle(), priority=5)
def embedding_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ asymmetric-distance top-k (the search half of product
    quantization): the query vector stays full-precision, every corpus
    vector is its 4-code tuple, and the distance is the sum of 4 table
    lookups — ``Σ_m d²(q_m, codebook_m[code_m])``. At 100 TB this is the
    memory-bound ANN fast path: the scan touches 4 small ints per vector
    (the 128×-compressed corpus), the 4×8 distance table is computed
    once driver-side and folded in as literal arrays, and the plan ends
    in TakeOrderedAndProject — no shuffle, no vector ever re-read.

    Cross-engine float discipline: the distance tables are data-derived
    (trained codebooks × the query), so the oracle computes its OWN
    tables from its training CTEs with the same qq − 2·qc + cc fold
    shape; sequential-fold dot products can differ in the last ulp
    between engines (measured: DuckDB's list_dot_product is not a plain
    left fold), so the summed ADC is epsilon-rounded at 6 dp — the same
    absorption every cosine query uses."""
    codes, books = _pq_encode(spark, sf_dir)
    emb = Tables(spark, sf_dir).embeddings
    qrow = emb.filter(F.col("vec_id") == 0).select("embedding").first()
    qv = [float(x) for x in qrow["embedding"]]

    def fold_dot(a: list[float], b: list[float]) -> float:
        acc = 0.0
        for x, y in zip(a, b):
            acc += x * y
        return acc

    adc = None
    for m in range(_PQ_M):
        qm = qv[m * _PQ_DSUB : (m + 1) * _PQ_DSUB]
        qq = fold_dot(qm, qm)
        dts = [
            qq - 2 * fold_dot(qm, c) + fold_dot(c, c) for c in books[m]
        ]
        term = F.element_at(
            F.array(*[F.lit(d) for d in dts]), F.col(f"c{m}") + 1
        )
        adc = term if adc is None else adc + term
    return (
        codes.filter(F.col("vec_id") != 0)
        .select("vec_id", F.round(adc + 1e-9, 6).alias("adc"))
        .orderBy(F.asc("adc"), F.asc("vec_id"))
        .limit(10)
    )


def _semdedup_tuned_oracle(
    threshold: float = 0.4,
    target_occ: int = 50,
    min_exp: int = 3,
    max_exp: int = 12,
) -> str:
    """Tuned-twin oracle: the cluster count is derived from count(*)
    INSIDE the SQL with the same integer range-scan as
    ``tuned_semdedup_k`` (the tuned-LSH discipline — one rule, two
    engines, no floats), then the standard semdedup replay runs with
    that k as a scalar subquery."""
    head = [
        "nn AS (SELECT count(*) AS n FROM embeddings)",
        f"""kk AS (
      SELECT coalesce(CAST(min(1::BIGINT << range) AS INT), {1 << max_exp}) AS k
      FROM range({min_exp}, {max_exp + 1}), nn
      WHERE (1::BIGINT << range) * {target_occ} >= nn.n)""",
    ]
    return _semdedup_oracle(
        threshold=threshold,
        n_centroids="(SELECT k FROM kk)",
        head_ctes=head,
    )


@query("embedding_semdedup_prune_tuned", oracle=_semdedup_tuned_oracle(), priority=3)
def embedding_semdedup_prune_tuned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup with the cluster count SCALED to the corpus — the
    registered form of the knob the rehearsal measures (SCALING.md:
    fixed k=16 makes cell occupancy, and so the quadratic verify work,
    grow linearly with the corpus; k from ``tuned_semdedup_k`` holds
    expected occupancy ≤ 50 so the decade step stays bounded, x3.2
    measured at 200k vectors). The oracle re-derives k from count(*)
    inside the SQL — integer range-scan, no float crosses the boundary —
    and then replays the whole training + prune at THAT size, so the
    tuning rule itself is hash-checked at every SF (three SFs = three
    tuning regimes: 500→16, 2000→64)."""
    from ror_etl_spark.operators.similarity import semdedup_prune, tuned_semdedup_k

    emb = Tables(spark, sf_dir).embeddings
    k = tuned_semdedup_k(emb.count())
    return semdedup_prune(
        emb, threshold=0.4, n_centroids=k, train_iters=3, round_means=6
    ).orderBy("vec_id")


def _ivfpq_oracle(
    k: int = 10,
    coarse_k: int = 16,
    coarse_iters: int = 3,
    nprobe: int = 2,
) -> str:
    """IVF-PQ replay: the coarse k-means chain (prefix g_) picks nprobe
    cells for the query; the 8 subspace chains + distance tables rank
    the probed cells' vectors by ADC. Every trained artifact is derived
    inside the SQL."""
    ctes: list[str] = [
        "q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0)"
    ]
    ctes += _kmeans_ctes(
        "SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings",
        coarse_k,
        coarse_iters,
        64,
        6,
        prefix="g_",
    )
    for m in range(_PQ_M):
        lo, hi = m * _PQ_DSUB + 1, (m + 1) * _PQ_DSUB
        ctes += _kmeans_ctes(
            f"SELECT vec_id, (CAST(embedding AS DOUBLE[]))[{lo}:{hi}] AS v"
            " FROM embeddings",
            _PQ_K,
            _PQ_ITERS,
            _PQ_DSUB,
            6,
            prefix=f"s{m}_",
        )
        ctes.append(
            f"""dt{m} AS (
      SELECT c.cell,
             list_dot_product(q.qv[{lo}:{hi}], q.qv[{lo}:{hi}])
             - 2 * list_dot_product(q.qv[{lo}:{hi}], c.c)
             + list_dot_product(c.c, c.c) AS d
      FROM s{m}_c{_PQ_ITERS} c, q)"""
        )
    ctes.append(
        f"""probe AS (
      SELECT c.cell FROM g_c{coarse_iters} c, q
      ORDER BY list_distance(q.qv, c.c), c.cell LIMIT {nprobe})"""
    )
    joins = " ".join(
        f"JOIN s{m}_af ON s{m}_af.vec_id = g_af.vec_id" for m in range(_PQ_M)
    ) + " " + " ".join(
        f"JOIN dt{m} ON dt{m}.cell = s{m}_af.cell" for m in range(_PQ_M)
    )
    adc = " + ".join(f"dt{m}.d" for m in range(_PQ_M))
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"""
    SELECT g_af.vec_id, round({adc} + 1e-9, 6) AS adc
    FROM g_af {joins}
    WHERE g_af.cell IN (SELECT cell FROM probe) AND g_af.vec_id <> 0
    ORDER BY adc ASC, g_af.vec_id
    LIMIT {k}
    """
    )


@query("embedding_ivfpq_topk", oracle=_ivfpq_oracle(), priority=5)
def embedding_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ — the production ANN configuration (FAISS's default at
    corpus scale): a coarse quantizer routes the query to nprobe=2 of 16
    trained cells, and within the probed cells vectors are ranked by
    PQ asymmetric distance — so the scan touches ~nprobe/n_cells of the
    corpus AND reads only the 8-byte code tuple per vector. At 100 TB
    the corpus is written partitioned by coarse cell with codes as
    columns: a query reads 2 partitions of integers; neither the
    vectors nor anything corpus-sized ever shuffles. Both trainings
    (coarse + 8 subspace codebooks) are the replayable deterministic
    trajectories used by embedding_knn_ivf_trained / embedding_pq_codes,
    so the oracle re-derives every trained artifact inside one SQL
    statement and hash-checks the whole stack end to end."""
    import math

    from ror_etl_spark.operators.similarity import (
        _nearest_cell_udf,
        kmeans_centroids,
    )
    from ror_etl_spark.operators.util import spread

    emb = Tables(spark, sf_dir).embeddings
    cents = kmeans_centroids(emb, n_centroids=16, n_iters=3, round_means=6)
    codes, books = _pq_encode(spark, sf_dir)
    qrow = emb.filter(F.col("vec_id") == 0).select("embedding").first()
    qv = [float(x) for x in qrow["embedding"]]

    def qdist(c: list[float]) -> float:
        return math.fsum((x - y) ** 2 for x, y in zip(qv, c))

    probe = sorted(range(len(cents)), key=lambda i: (qdist(cents[i]), i))[:2]

    def fold_dot(a: list[float], b: list[float]) -> float:
        acc = 0.0
        for x, y in zip(a, b):
            acc += x * y
        return acc

    base = (
        spread(emb)
        .select("vec_id", as_double(F.col("embedding")).alias("v"))
        .withColumn("cell", _nearest_cell_udf(cents)(F.col("v")))
        .filter(F.col("cell").isin(probe) & (F.col("vec_id") != 0))
        .withColumn("cs", _pq_cells_udf(books)(F.col("v")))
    )
    adc = None
    for m in range(_PQ_M):
        qm = qv[m * _PQ_DSUB : (m + 1) * _PQ_DSUB]
        qq = fold_dot(qm, qm)
        dts = [qq - 2 * fold_dot(qm, c) + fold_dot(c, c) for c in books[m]]
        term = F.element_at(F.array(*[F.lit(d) for d in dts]), F.col("cs")[m] + 1)
        adc = term if adc is None else adc + term
    return (
        base.select("vec_id", F.round(adc + 1e-9, 6).alias("adc"))
        .orderBy(F.asc("adc"), F.asc("vec_id"))
        .limit(10)
    )


def _ann_recall_oracle(
    n_queries: int = 10,
    n_centroids: int = 16,
    iters: int = 3,
    nprobe: int = 2,
    k: int = 10,
    dim: int = 64,
    round_means: int = 6,
) -> str:
    """DuckDB replay of the IVF recall evaluation: the trained-IVF oracle
    chain (``_kmeans_ctes``) generalized to a query SET, plus the exact
    brute-force top-k per query and the overlap count."""
    ctes = [
        f"""qs AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
      FROM embeddings WHERE vec_id < {n_queries})""",
        *_kmeans_ctes(
            f"""SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
          FROM embeddings WHERE vec_id >= {n_queries}""",
            n_centroids,
            iters,
            dim,
            round_means,
        ),
        f"""probe AS (
      SELECT qid, cell FROM (
        SELECT q.qid, c.cell,
               row_number() OVER (PARTITION BY q.qid
                                  ORDER BY list_distance(q.qv, c.c), c.cell) AS rn
        FROM c{iters} c CROSS JOIN qs q) WHERE rn <= {nprobe})""",
        f"""ivf AS (
      SELECT qid, vec_id FROM (
        SELECT p.qid, af.vec_id,
               row_number() OVER (PARTITION BY p.qid
                 ORDER BY {_COS_SQL.format(a='af.v', b='q.qv')} DESC, af.vec_id) AS rn
        FROM af JOIN probe p ON af.cell = p.cell
        JOIN qs q ON q.qid = p.qid) WHERE rn <= {k})""",
        f"""brute AS (
      SELECT qid, vec_id FROM (
        SELECT q.qid, e.vec_id,
               row_number() OVER (PARTITION BY q.qid
                 ORDER BY {_COS_SQL.format(a='e.v', b='q.qv')} DESC, e.vec_id) AS rn
        FROM e CROSS JOIN qs q) WHERE rn <= {k})""",
    ]
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"""
    SELECT b.qid, CAST(count(i.vec_id) AS BIGINT) AS n_hits,
           round(count(i.vec_id) / {k}.0, 6) AS recall
    FROM brute b LEFT JOIN ivf i ON i.qid = b.qid AND i.vec_id = b.vec_id
    GROUP BY b.qid ORDER BY b.qid
    """
    )


@query("embedding_ann_recall", oracle=_ann_recall_oracle(), priority=3)
def embedding_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 evaluation of the trained IVF index against exact brute
    force, over a 10-query evaluation set — the measurement that decides
    whether an ANN configuration (n_centroids, nprobe) is shippable, as
    a first-class hash-checked query: per query, how many of the true
    top-10 cosine neighbors the nprobe=2 probe actually returned. The
    MinHash calibration report's analogue for the embedding family.

    Scale shape: k-means training + ONE GEMM cell-assignment pass are
    shared across all queries (``assign_cells``); the query set, probe
    list (queries × nprobe rows) and query vectors are driver-sized
    broadcasts. The IVF side touches only probed cells; the brute side
    is the ground-truth pass a recall eval inherently pays — on a real
    corpus it runs on a SAMPLED query set exactly like this one, and
    both top-k windows compile to WindowGroupLimit (rank ≤ k pushes a
    per-partition top-k below the qid exchange, so no reducer ever
    sorts a full corpus replica). recall = n_hits/10 is an exact
    1-decimal rational — no float crosses the engine boundary; the
    cosine ranking itself is the same raw-double ordering every green
    knn query in this module uses."""
    import math

    from ror_etl_spark.operators.similarity import assign_cells, kmeans_centroids
    from pyspark.sql import Window

    n_queries, n_centroids, iters, nprobe, k = 10, 16, 3, 2, 10
    emb = Tables(spark, sf_dir).embeddings
    corpus = emb.filter(F.col("vec_id") >= n_queries)
    centroids = kmeans_centroids(
        corpus, n_centroids, iters, round_means=6
    )
    qrows = (
        emb.filter(F.col("vec_id") < n_queries)
        .select("vec_id", "embedding")
        .collect()
    )
    queries = [(int(r["vec_id"]), [float(x) for x in r["embedding"]]) for r in qrows]

    def qdist(qv: list[float], c: list[float]) -> float:
        return math.fsum((x - y) ** 2 for x, y in zip(qv, c))

    probe_rows = [
        (qid, cell)
        for qid, qv in queries
        for cell in sorted(
            range(len(centroids)), key=lambda i: (qdist(qv, centroids[i]), i)
        )[:nprobe]
    ]
    qdf = F.broadcast(
        spark.createDataFrame(queries, "qid long, qv array<double>")
    )
    pdf = F.broadcast(spark.createDataFrame(probe_rows, "qid long, cell int"))

    cells = assign_cells(corpus, centroids)
    w = Window.partitionBy("qid").orderBy(
        F.desc("cos"), F.asc("vec_id")
    )
    ivf_top = (
        cells.join(pdf, "cell")
        .join(qdf, "qid")
        .select(
            "qid",
            F.col("id").alias("vec_id"),
            cosine(F.col("v"), F.col("qv")).alias("cos"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("qid", "vec_id", F.lit(1).alias("hit"))
    )
    brute_top = (
        corpus.select("vec_id", as_double(F.col("embedding")).alias("v"))
        .crossJoin(qdf)
        .select("qid", "vec_id", cosine(F.col("v"), F.col("qv")).alias("cos"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("qid", "vec_id")
    )
    return (
        brute_top.join(ivf_top, ["qid", "vec_id"], "left")
        .groupBy("qid")
        .agg(F.sum(F.coalesce(F.col("hit"), F.lit(0))).alias("n_hits"))
        .select(
            "qid",
            "n_hits",
            F.round(F.col("n_hits") / float(k), 6).alias("recall"),
        )
        .orderBy("qid")
    )


def _pq_recall_oracle(n_queries: int = 10, k: int = 10) -> str:
    """DuckDB replay of the PQ recall evaluation: the eight training
    chains, per-(query, subspace) distance tables, ADC top-k per query,
    exact squared-L2 top-k per query, and the overlap count."""
    ctes: list[str] = [
        f"""qs AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
      FROM embeddings WHERE vec_id < {n_queries})""",
        f"""ce AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
      FROM embeddings WHERE vec_id >= {n_queries})""",
    ]
    for m in range(_PQ_M):
        lo, hi = m * _PQ_DSUB + 1, (m + 1) * _PQ_DSUB
        ctes += _kmeans_ctes(
            f"SELECT vec_id, (CAST(embedding AS DOUBLE[]))[{lo}:{hi}] AS v"
            " FROM embeddings",
            _PQ_K,
            _PQ_ITERS,
            _PQ_DSUB,
            6,
            prefix=f"s{m}_",
        )
        ctes.append(
            f"""dt{m} AS (
      SELECT q.qid, c.cell,
             list_dot_product(q.qv[{lo}:{hi}], q.qv[{lo}:{hi}])
             - 2 * list_dot_product(q.qv[{lo}:{hi}], c.c)
             + list_dot_product(c.c, c.c) AS d
      FROM s{m}_c{_PQ_ITERS} c, qs q)"""
        )
    code_joins = " ".join(
        f"JOIN s{m}_af ON s{m}_af.vec_id = s0_af.vec_id" for m in range(1, _PQ_M)
    )
    dt_joins = "JOIN dt0 ON dt0.cell = s0_af.cell " + " ".join(
        f"JOIN dt{m} ON dt{m}.cell = s{m}_af.cell AND dt{m}.qid = dt0.qid"
        for m in range(1, _PQ_M)
    )
    adc = " + ".join(f"dt{m}.d" for m in range(_PQ_M))
    ctes.append(
        f"""pq AS (
      SELECT qid, vec_id FROM (
        SELECT dt0.qid, s0_af.vec_id,
               row_number() OVER (PARTITION BY dt0.qid
                 ORDER BY round({adc} + 1e-9, 6) ASC, s0_af.vec_id) AS rn
        FROM s0_af {code_joins} {dt_joins}
        WHERE s0_af.vec_id >= {n_queries}) WHERE rn <= {k})"""
    )
    ctes.append(
        f"""brute AS (
      SELECT qid, vec_id FROM (
        SELECT q.qid, ce.vec_id,
               row_number() OVER (PARTITION BY q.qid
                 ORDER BY list_dot_product(ce.v, ce.v)
                          - 2 * list_dot_product(ce.v, q.qv)
                          + list_dot_product(q.qv, q.qv) ASC, ce.vec_id) AS rn
        FROM ce CROSS JOIN qs q) WHERE rn <= {k})"""
    )
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"""
    SELECT b.qid, CAST(count(p.vec_id) AS BIGINT) AS n_hits,
           round(count(p.vec_id) / {k}.0, 6) AS recall
    FROM brute b LEFT JOIN pq p ON p.qid = b.qid AND p.vec_id = b.vec_id
    GROUP BY b.qid ORDER BY b.qid
    """
    )


@query("embedding_pq_recall", oracle=_pq_recall_oracle(), priority=3)
def embedding_pq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 of the PQ-ADC index against exact squared-L2 ground
    truth over a 10-query evaluation set — the companion measurement to
    ``embedding_ann_recall`` for the compressed-corpus family, and the
    number that decides (M, dsub, k) before a PQ index ships. Ground
    truth uses the SAME metric ADC approximates (squared L2), so the
    report isolates quantization loss rather than conflating it with a
    metric mismatch. On this driver corpus recall is data-limited
    (noise-dominated vectors: nn distance ≈ quantization distortion —
    see the ADC reference test's analysis), which is exactly what the
    report exists to reveal.

    Scale shape: training + the one encode pass are shared across all
    queries (codes are 8 small ints per vector — the 128×-compressed
    scan ADC exists for); the 10×8×16 distance-table frame and query
    vectors are driver-sized broadcasts; both per-query top-k windows
    compile to WindowGroupLimit. recall = n_hits/10 exactly — the only
    floats (ADC sums) are epsilon-rounded at 6 dp on both engines
    before ranking, vec_id breaking ties."""
    from pyspark.sql import Window

    n_queries, k = 10, 10
    codes, books = _pq_encode(spark, sf_dir)
    emb = Tables(spark, sf_dir).embeddings
    qrows = (
        emb.filter(F.col("vec_id") < n_queries)
        .select("vec_id", "embedding")
        .collect()
    )
    queries = [(int(r["vec_id"]), [float(x) for x in r["embedding"]]) for r in qrows]

    def fold_dot(a: list[float], b: list[float]) -> float:
        acc = 0.0
        for x, y in zip(a, b):
            acc += x * y
        return acc

    dt_rows = []
    for qid, qv in queries:
        for m in range(_PQ_M):
            qm = qv[m * _PQ_DSUB : (m + 1) * _PQ_DSUB]
            qq = fold_dot(qm, qm)
            for cell, c in enumerate(books[m]):
                dt_rows.append((qid, m, cell, qq - 2 * fold_dot(qm, c) + fold_dot(c, c)))
    spark_dt = spark.createDataFrame(dt_rows, "qid long, m int, cell int, d double")

    scored = codes.filter(F.col("vec_id") >= n_queries)
    for m in range(_PQ_M):
        dt_m = F.broadcast(
            spark_dt.filter(F.col("m") == m).select(
                "qid", F.col("cell").alias(f"c{m}"), F.col("d").alias(f"d{m}")
            )
        )
        on = [f"c{m}"] if m == 0 else ["qid", f"c{m}"]
        scored = scored.join(dt_m, on)
    adc = F.round(
        sum(F.col(f"d{m}") for m in range(_PQ_M)) + 1e-9, 6
    )
    w = Window.partitionBy("qid").orderBy(F.asc("rankkey"), F.asc("vec_id"))
    pq_top = (
        scored.select("qid", "vec_id", adc.alias("rankkey"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("qid", "vec_id", F.lit(1).alias("hit"))
    )
    qdf = F.broadcast(
        spark.createDataFrame(queries, "qid long, qv array<double>")
    )
    dot = lambda a, b: F.aggregate(  # noqa: E731 — fold shape shared with cosine()
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    corpus = emb.filter(F.col("vec_id") >= n_queries).select(
        "vec_id", as_double(F.col("embedding")).alias("v")
    )
    brute_top = (
        corpus.crossJoin(qdf)
        .select(
            "qid",
            "vec_id",
            (
                dot(F.col("v"), F.col("v"))
                - 2 * dot(F.col("v"), F.col("qv"))
                + dot(F.col("qv"), F.col("qv"))
            ).alias("rankkey"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("qid", "vec_id")
    )
    return (
        brute_top.join(pq_top, ["qid", "vec_id"], "left")
        .groupBy("qid")
        .agg(F.sum(F.coalesce(F.col("hit"), F.lit(0))).alias("n_hits"))
        .select(
            "qid",
            "n_hits",
            F.round(F.col("n_hits") / float(k), 6).alias("recall"),
        )
        .orderBy("qid")
    )


_SWEEP_NPROBES = (1, 2, 4, 8)


def _nprobe_sweep_oracle(
    n_queries: int = 10,
    n_centroids: int = 16,
    iters: int = 3,
    k: int = 10,
    dim: int = 64,
    round_means: int = 6,
) -> str:
    """DuckDB replay of the nprobe sweep: one training chain, probe
    ranks per query, and for each nprobe value the IVF top-k restricted
    to cells ranked <= nprobe, scored against the brute top-k."""
    probes = ", ".join(str(p) for p in _SWEEP_NPROBES)
    max_p = max(_SWEEP_NPROBES)
    ctes = [
        f"""qs AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
      FROM embeddings WHERE vec_id < {n_queries})""",
        *_kmeans_ctes(
            f"""SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
          FROM embeddings WHERE vec_id >= {n_queries}""",
            n_centroids,
            iters,
            dim,
            round_means,
        ),
        f"""ranks AS (
      SELECT qid, cell, rn FROM (
        SELECT q.qid, c.cell,
               row_number() OVER (PARTITION BY q.qid
                                  ORDER BY list_distance(q.qv, c.c), c.cell) AS rn
        FROM c{iters} c CROSS JOIN qs q) WHERE rn <= {max_p})""",
        f"""np AS (SELECT unnest([{probes}]) AS nprobe)""",
        f"""ivf AS (
      SELECT nprobe, qid, vec_id FROM (
        SELECT np.nprobe, r.qid, af.vec_id,
               row_number() OVER (PARTITION BY np.nprobe, r.qid
                 ORDER BY {_COS_SQL.format(a='af.v', b='q.qv')} DESC, af.vec_id) AS rn
        FROM np JOIN ranks r ON r.rn <= np.nprobe
        JOIN af ON af.cell = r.cell
        JOIN qs q ON q.qid = r.qid) WHERE rn <= {k})""",
        f"""brute AS (
      SELECT qid, vec_id FROM (
        SELECT q.qid, e.vec_id,
               row_number() OVER (PARTITION BY q.qid
                 ORDER BY {_COS_SQL.format(a='e.v', b='q.qv')} DESC, e.vec_id) AS rn
        FROM e CROSS JOIN qs q) WHERE rn <= {k})""",
    ]
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"""
    SELECT np.nprobe,
           CAST(count(i.vec_id) AS BIGINT) AS n_hits,
           round(count(i.vec_id) / ({n_queries} * {k}.0), 6) AS mean_recall
    FROM np CROSS JOIN brute b
    LEFT JOIN ivf i ON i.nprobe = np.nprobe AND i.qid = b.qid
                    AND i.vec_id = b.vec_id
    GROUP BY np.nprobe ORDER BY np.nprobe
    """
    )


@query("embedding_ivf_nprobe_sweep", oracle=_nprobe_sweep_oracle(), priority=3)
def embedding_ivf_nprobe_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The IVF TUNING CURVE: mean recall@10 over the 10-query evaluation
    set at nprobe ∈ {1, 2, 4, 8} — the number an index owner actually
    reads when choosing the probe budget (recall rises monotonically
    toward 1.0 as nprobe → n_centroids; the knee is the operating
    point). One k-means training, ONE cell-assignment pass and ONE
    brute ground-truth pass are shared across ALL sweep points — the
    sweep adds only candidate re-ranking per nprobe, which is how a
    production sweep must be built (re-training per point would measure
    noise).

    Scale shape: identical to embedding_ann_recall with an extra
    nprobe dimension riding the broadcast probe frame (queries ×
    max_nprobe rows); top-k windows compile to WindowGroupLimit; the
    recall fractions are exact rationals n/(10·10)."""
    import math

    from ror_etl_spark.operators.similarity import assign_cells, kmeans_centroids
    from pyspark.sql import Window

    n_queries, n_centroids, iters, k = 10, 16, 3, 10
    max_p = max(_SWEEP_NPROBES)
    emb = Tables(spark, sf_dir).embeddings
    corpus = emb.filter(F.col("vec_id") >= n_queries)
    centroids = kmeans_centroids(corpus, n_centroids, iters, round_means=6)
    qrows = (
        emb.filter(F.col("vec_id") < n_queries)
        .select("vec_id", "embedding")
        .collect()
    )
    queries = [(int(r["vec_id"]), [float(x) for x in r["embedding"]]) for r in qrows]

    def qdist(qv: list[float], c: list[float]) -> float:
        return math.fsum((x - y) ** 2 for x, y in zip(qv, c))

    rank_rows = [
        (qid, cell, rank + 1)
        for qid, qv in queries
        for rank, cell in enumerate(
            sorted(range(len(centroids)), key=lambda i: (qdist(qv, centroids[i]), i))[
                :max_p
            ]
        )
    ]
    ranks = F.broadcast(
        spark.createDataFrame(rank_rows, "qid long, cell int, rank int")
    )
    nps = F.broadcast(
        spark.createDataFrame([(p,) for p in _SWEEP_NPROBES], "nprobe int")
    )
    qdf = F.broadcast(
        spark.createDataFrame(queries, "qid long, qv array<double>")
    )

    cells = assign_cells(corpus, centroids)
    cand = (
        cells.join(ranks, "cell")
        .join(qdf, "qid")
        .select(
            "qid",
            "rank",
            F.col("id").alias("vec_id"),
            cosine(F.col("v"), F.col("qv")).alias("cos"),
        )
    )
    w_np = Window.partitionBy("nprobe", "qid").orderBy(
        F.desc("cos"), F.asc("vec_id")
    )
    ivf_top = (
        cand.join(nps, F.col("rank") <= F.col("nprobe"))
        .withColumn("rn", F.row_number().over(w_np))
        .filter(F.col("rn") <= k)
        .select("nprobe", "qid", "vec_id", F.lit(1).alias("hit"))
    )
    w_q = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("vec_id"))
    brute_top = (
        corpus.select("vec_id", as_double(F.col("embedding")).alias("v"))
        .crossJoin(qdf)
        .select("qid", "vec_id", cosine(F.col("v"), F.col("qv")).alias("cos"))
        .withColumn("rn", F.row_number().over(w_q))
        .filter(F.col("rn") <= k)
        .select("qid", "vec_id")
    )
    return (
        nps.crossJoin(brute_top)
        .join(ivf_top, ["nprobe", "qid", "vec_id"], "left")
        .groupBy("nprobe")
        .agg(F.sum(F.coalesce(F.col("hit"), F.lit(0))).alias("n_hits"))
        .select(
            "nprobe",
            "n_hits",
            F.round(F.col("n_hits") / float(n_queries * k), 6).alias("mean_recall"),
        )
        .orderBy("nprobe")
    )


_SEMDEDUP_EPS = (0.3, 0.4, 0.5, 0.6)


def _semdedup_sweep_oracle(
    n_centroids: int = 16, iters: int = 3, dim: int = 64, round_means: int = 6
) -> str:
    """DuckDB replay of the threshold sweep: one training chain, the
    per-vector MAX rounded in-cell cosine to any lower id, then one
    count per threshold."""
    eps = ", ".join(str(e) for e in _SEMDEDUP_EPS)
    ctes = _kmeans_ctes(
        "SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings",
        n_centroids,
        iters,
        dim,
        round_means,
    )
    cos = _COS_SQL.format(a="a.v", b="b.v")
    ctes.append(
        f"""mc AS (
      SELECT a.vec_id AS d, max(round({cos}, 6)) AS mc
      FROM af a JOIN af b ON a.cell = b.cell AND b.vec_id < a.vec_id
      GROUP BY a.vec_id)"""
    )
    ctes.append("tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM af)")
    ctes.append(f"eps AS (SELECT unnest([{eps}]) AS threshold)")
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + """
    SELECT eps.threshold,
           CAST(count(CASE WHEN mc.mc >= eps.threshold THEN 1 END) AS BIGINT)
             AS n_pruned,
           tot.n AS n_total,
           round(count(CASE WHEN mc.mc >= eps.threshold THEN 1 END)
                 / CAST(tot.n AS DOUBLE) + 1e-9, 6) AS prune_rate
    FROM eps CROSS JOIN tot LEFT JOIN mc ON true
    GROUP BY eps.threshold, tot.n ORDER BY eps.threshold
    """
    )


@query("embedding_semdedup_sweep", oracle=_semdedup_sweep_oracle(), priority=3)
def embedding_semdedup_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SemDeDup TUNING CURVE: prune count/rate at cosine thresholds
    0.3–0.6 from ONE clustering + ONE in-cell pair pass — the companion
    to the nprobe sweep for the dedup side, and the number that decides
    the pruning budget before a semantic dedup ships (SemDeDup's paper
    tunes exactly this knob against downstream perplexity). The
    per-vector statistic is the MAX rounded in-cell cosine to any
    lower-id member; pruned-at-t is then a threshold compare, so all
    four sweep points share every expensive stage.

    Scale shape: training + assignment as in embedding_semdedup_prune;
    the pair stage is in-cell only (occupancy-bounded quadratic — the
    SemDeDup economics), aggregated immediately to one max per vector;
    the sweep itself is a 4-row broadcast against a vector-count-sized
    frame. Rounding before the max keeps the compare bit-identical on
    both engines."""
    from ror_etl_spark.operators.similarity import (
        assign_cells,
        kmeans_centroids,
        max_incell_cosine,
    )

    emb = Tables(spark, sf_dir).embeddings
    centroids = kmeans_centroids(emb, 16, 3, round_means=6)
    cells = (
        assign_cells(emb, centroids)
        .select(F.col("id").alias("vec_id"), "v", "cell")
        .localCheckpoint(eager=False)
    )
    mc = max_incell_cosine(cells).select(
        F.col("vec_id").alias("ida"), F.round(F.col("mc"), 6).alias("mc")
    )
    tot = cells.agg(F.count(F.lit(1)).alias("n"))
    eps = spark.createDataFrame(
        [(e,) for e in _SEMDEDUP_EPS], "threshold double"
    )
    return (
        eps.crossJoin(F.broadcast(tot))
        .join(mc, F.col("mc") >= F.col("threshold"), "left")
        .groupBy("threshold", "n")
        .agg(F.count("ida").alias("n_pruned"))
        .select(
            "threshold",
            "n_pruned",
            F.col("n").alias("n_total"),
            F.round(
                F.col("n_pruned") / F.col("n").cast("double") + 1e-9, 6
            ).alias("prune_rate"),
        )
        .orderBy("threshold")
    )


_TRUNC_DIMS = (8, 16, 32, 64)


def _dim_trunc_oracle(n_queries: int = 10, k: int = 10) -> str:
    """DuckDB replay of the truncation sweep: per dim, top-k by
    truncated-prefix cosine vs the full-dim ground truth."""
    ctes = [
        f"""qs AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
      FROM embeddings WHERE vec_id < {n_queries})""",
        f"""ce AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
      FROM embeddings WHERE vec_id >= {n_queries})""",
    ]
    branches = []
    for d in _TRUNC_DIMS:
        cos = _COS_SQL.format(a=f"(ce.v[1:{d}])", b=f"(q.qv[1:{d}])")
        branches.append(
            f"""SELECT {d} AS dim, qid, vec_id FROM (
        SELECT q.qid, ce.vec_id,
               row_number() OVER (PARTITION BY q.qid
                 ORDER BY {cos} DESC, ce.vec_id) AS rn
        FROM ce CROSS JOIN qs q) WHERE rn <= {k}"""
        )
    ctes.append("tr AS (" + " UNION ALL ".join(branches) + ")")
    full = _COS_SQL.format(a="ce.v", b="q.qv")
    ctes.append(
        f"""brute AS (
      SELECT qid, vec_id FROM (
        SELECT q.qid, ce.vec_id,
               row_number() OVER (PARTITION BY q.qid
                 ORDER BY {full} DESC, ce.vec_id) AS rn
        FROM ce CROSS JOIN qs q) WHERE rn <= {k})""",
    )
    dims = ", ".join(str(d) for d in _TRUNC_DIMS)
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"""
    SELECT dm.dim, CAST(count(t.vec_id) AS BIGINT) AS n_hits,
           round(count(t.vec_id) / ({n_queries} * {k}.0), 6) AS mean_recall
    FROM (SELECT unnest([{dims}]) AS dim) dm
    CROSS JOIN brute b
    LEFT JOIN tr t ON t.dim = dm.dim AND t.qid = b.qid AND t.vec_id = b.vec_id
    GROUP BY dm.dim ORDER BY dm.dim
    """
    )


@query("embedding_dim_truncation_sweep", oracle=_dim_trunc_oracle(), priority=3)
def embedding_dim_truncation_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-style DIMENSION-truncation curve: mean recall@10 of
    prefix-truncated cosine search (first 8/16/32/64 dims) against the
    full-dim ground truth — the measurement behind MRL-style serving
    decisions (how many dims the ANN tier can drop before recall
    collapses; at 64/64 recall is 1.0 by construction, which doubles as
    a self-check the driver hashes). On non-MRL-trained vectors (this
    corpus) the curve shows the raw information loss — exactly what the
    report is for.

    Scale shape: ONE corpus × query-panel pass computes all four prefix
    cosines per pair (slices of the same row — no re-scan per sweep
    point), four WindowGroupLimit top-k ranks, and integer overlap
    counts. The dims axis rides a 4-row broadcast; recall = n/(10·10)
    exact."""
    from pyspark.sql import Window

    n_queries, k = 10, 10
    emb = Tables(spark, sf_dir).embeddings
    corpus = emb.filter(F.col("vec_id") >= n_queries).select(
        "vec_id", as_double(F.col("embedding")).alias("v")
    )
    qrows = (
        emb.filter(F.col("vec_id") < n_queries)
        .select("vec_id", "embedding")
        .collect()
    )
    queries = [(int(r["vec_id"]), [float(x) for x in r["embedding"]]) for r in qrows]
    import numpy as np

    import pandas as pd_

    qids = np.array([q[0] for q in queries], dtype=np.int64)
    Q = np.array([q[1] for q in queries], dtype=np.float64)

    def score_batches(batches):
        # one GEMM per prefix per Arrow batch — the HOF fold alternative
        # (zip_with/aggregate per pair per dim) is interpreted per
        # element and measured 103 s at the 200k-vector tier vs ~10 s
        # kernelized
        for pdf in batches:
            ids = pdf["vec_id"].to_numpy()
            V = np.array(pdf["v"].tolist(), dtype=np.float64)
            nq, nv = len(qids), len(ids)
            out = {
                "qid": np.tile(qids, nv),
                "vec_id": np.repeat(ids, nq),
            }
            for d in _TRUNC_DIMS:
                Vd = V[:, :d]
                Qd = Q[:, :d]
                Vn = Vd / np.linalg.norm(Vd, axis=1, keepdims=True)
                Qn = Qd / np.linalg.norm(Qd, axis=1, keepdims=True)
                out[f"cos{d}"] = (Vn @ Qn.T).reshape(-1)
            yield pd_.DataFrame(out)

    schema = "qid long, vec_id long, " + ", ".join(
        f"cos{d} double" for d in _TRUNC_DIMS
    )
    pairs = (
        spread(corpus)
        .mapInPandas(score_batches, schema=schema)
        .localCheckpoint(eager=False)
    )
    tops = []
    for d in _TRUNC_DIMS:
        w = Window.partitionBy("qid").orderBy(F.desc(f"cos{d}"), F.asc("vec_id"))
        tops.append(
            pairs.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k)
            .select(F.lit(d).alias("dim"), "qid", "vec_id", F.lit(1).alias("hit"))
        )
    tr = tops[0]
    for t in tops[1:]:
        tr = tr.unionByName(t)
    wfull = Window.partitionBy("qid").orderBy(
        F.desc(f"cos{max(_TRUNC_DIMS)}"), F.asc("vec_id")
    )
    brute = (
        pairs.withColumn("rn", F.row_number().over(wfull))
        .filter(F.col("rn") <= k)
        .select("qid", "vec_id")
    )
    dims = spark.createDataFrame([(d,) for d in _TRUNC_DIMS], "dim int")
    return (
        F.broadcast(dims)
        .crossJoin(brute)
        .join(tr, ["dim", "qid", "vec_id"], "left")
        .groupBy("dim")
        .agg(F.sum(F.coalesce(F.col("hit"), F.lit(0))).alias("n_hits"))
        .select(
            "dim",
            "n_hits",
            F.round(F.col("n_hits") / float(n_queries * k), 6).alias("mean_recall"),
        )
        .orderBy("dim")
    )


@query(
    "embedding_int8_quant_report",
    oracle="""
    WITH x AS (
      SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS dim,
             CAST(unnest(embedding) AS DOUBLE) AS v
      FROM embeddings),
    mm AS (
      SELECT dim, min(v) AS mn, max(v) AS mx,
             (max(v) - min(v)) / 255.0 AS s
      FROM x GROUP BY dim),
    q AS (
      SELECT x.vec_id, x.dim, x.v,
             CASE WHEN mm.s = 0 THEN mm.mn
                  ELSE mm.mn + round((x.v - mm.mn) / mm.s) * mm.s END AS vq
      FROM x JOIN mm ON x.dim = mm.dim),
    e AS (
      SELECT count(*) AS n_terms,
             count(DISTINCT vec_id) AS n_vecs,
             sum((v - vq) * (v - vq)) AS sse,
             sum(v * v) AS ss,
             max(abs(v - vq)) AS mae
      FROM q)
    SELECT CAST(n_vecs AS BIGINT) AS n_vecs,
           CAST(n_terms / n_vecs AS BIGINT) AS n_dims,
           round(sqrt(sse / ss) + 1e-9, 6) AS rel_l2_err,
           round(mae + 1e-9, 6) AS max_abs_err
    FROM e
    """,
    priority=5,
)
def embedding_int8_quant_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Affine int8 (256-level) per-dimension quantization error report —
    the vector-store compression decision every embedding pipeline makes
    before choosing int8 vs float16 vs PQ: quantize each dimension to
    round((v - min_d) / scale_d) with scale_d = (max_d - min_d)/255,
    dequantize, and report the global relative L2 error and the worst
    absolute error. (PQ — queries above — compresses harder via learned
    codebooks; affine int8 is the no-training baseline it must beat.)

    Plan: one posexplode → per-dim min/max aggregate (dim-domain-sized,
    map-side combinable) → broadcast back onto the exploded scan →
    global error aggregate. Nothing vector-sized ever sits in one task.
    Float discipline: quantization arithmetic is identical IEEE ops on
    identical doubles in both engines (round() on non-negative inputs
    is half-away == HALF_UP); constant dimensions take the s = 0 guard;
    the error metrics aggregate over all (vec, dim) terms — order-free
    up to last-ulp — and ride the epsilon-shifted round. max_abs_err
    is an exact max, no summation at all."""
    emb = Tables(spark, sf_dir).embeddings
    x = emb.select(
        "vec_id", F.posexplode(as_double(F.col("embedding"))).alias("dim", "v")
    )
    mm = x.groupBy("dim").agg(
        F.min("v").alias("mn"),
        F.max("v").alias("mx"),
        ((F.max("v") - F.min("v")) / 255.0).alias("s"),
    )
    q = x.join(F.broadcast(mm), "dim").select(
        "vec_id",
        "v",
        F.when(F.col("s") == 0, F.col("mn"))
        .otherwise(F.col("mn") + F.round((F.col("v") - F.col("mn")) / F.col("s")) * F.col("s"))
        .alias("vq"),
    )
    e = q.agg(
        F.count(F.lit(1)).alias("n_terms"),
        F.countDistinct("vec_id").alias("n_vecs"),
        F.sum((F.col("v") - F.col("vq")) * (F.col("v") - F.col("vq"))).alias("sse"),
        F.sum(F.col("v") * F.col("v")).alias("ss"),
        F.max(F.abs(F.col("v") - F.col("vq"))).alias("mae"),
    )
    return e.select(
        F.col("n_vecs"),
        (F.col("n_terms") / F.col("n_vecs")).cast("long").alias("n_dims"),
        F.round(F.sqrt(F.col("sse") / F.col("ss")) + 1e-9, 6).alias("rel_l2_err"),
        F.round(F.col("mae") + 1e-9, 6).alias("max_abs_err"),
    )


_PROD_TWIN_MOD = 20
_PROD_THRESHOLD = 0.9


def _near_dup_prod_oracle(
    threshold: float = _PROD_THRESHOLD,
    base_seed: int = 101,
    max_tables: int = 32,
    max_planes: int = 16,
    max_bucket: int = 1024,
) -> str:
    """DuckDB replay of the PRODUCTION-threshold near-dup funnel with a
    planted-recall contract. The corpus is the embeddings table plus a
    deterministic ~5% planted-twin set (vec_id % 20 == 0, id offset
    max(vec_id)+1 — collision-free at any corpus size, v' = v + 0.1·rot(v) element-wise in binary64 — cos(v, v') ∈
    [0.995, 1] for ANY v, so every planted pair is a true ≥0.9
    near-dup by construction). The funnel is the corpus-tuned
    hyperplane-LSH of ``_near_dup_tuned_oracle`` — (p, t) re-derived
    from count(*) over the PLANTED corpus inside the SQL, seeded-prefix
    hyperplanes inlined for the maximum scheme — and the result is the
    recall summary: planted pairs recovered, non-planted (natural)
    pairs emitted, recall. Hash-checked end to end at any SF."""
    from ror_etl_spark.operators.similarity import (
        random_hyperplanes,
        tuned_tables_for_planes,
    )

    t_case = " ".join(
        f"WHEN {p} THEN {tuned_tables_for_planes(p, threshold, 0.9, max_tables)}"
        for p in range(4, max_planes + 1)
    )
    planes_flat = [
        plane
        for t in range(max_tables)
        for plane in random_hyperplanes(64, max_planes, base_seed + t)
    ]
    pl = (
        "["
        + ", ".join(
            "[" + ", ".join(repr(x) for x in plane) + "]" for plane in planes_flat
        )
        + "]"
    )
    cos = _COS_SQL.format(a="a.v", b="b.v")
    return f"""
    WITH base AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    mo AS (SELECT max(vec_id) + 1 AS o FROM base),
    tw AS (
      SELECT vec_id + mo.o AS vec_id,
             list_transform(v, (x, i) ->
               x + CAST(0.1 AS DOUBLE) * v[(i % 64) + 1]) AS v
      FROM base, mo WHERE vec_id % {_PROD_TWIN_MOD} = 0),
    e AS (SELECT vec_id, v FROM base UNION ALL SELECT vec_id, v FROM tw),
    nn AS (SELECT count(*) AS n FROM e),
    p0 AS (SELECT coalesce(min(range), {max_planes})::INT AS p
           FROM range(4, {max_planes + 1}), nn
           WHERE 64 * (1::BIGINT << range) >= nn.n),
    prm AS (SELECT p, (CASE p {t_case} END)::INT AS t FROM p0),
    tb AS (SELECT unnest(range(0, t)) AS tbl, p FROM prm),
    pls AS (
      SELECT unnest(range(1, {max_tables * max_planes + 1})) AS k,
             unnest({pl}) AS plane),
    ap AS (
      SELECT tb.tbl, pls.k - tb.tbl * {max_planes} AS i, pls.plane
      FROM tb JOIN pls
        ON pls.k > tb.tbl * {max_planes}
       AND pls.k <= tb.tbl * {max_planes} + tb.p),
    bk AS (
      SELECT e.vec_id, ap.tbl,
             sum(CASE WHEN list_dot_product(e.v, ap.plane) >= 0
                      THEN (1::BIGINT << (ap.i - 1)) ELSE 0 END) AS bucket
      FROM e CROSS JOIN ap
      GROUP BY e.vec_id, ap.tbl),
    bok AS (SELECT tbl, bucket FROM bk GROUP BY tbl, bucket
            HAVING count(*) <= {max_bucket}),
    bk2 AS (SELECT bk.* FROM bk JOIN bok USING (tbl, bucket)),
    cand AS (
      SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
      FROM bk2 a JOIN bk2 b
        ON a.tbl = b.tbl AND a.bucket = b.bucket AND a.vec_id < b.vec_id),
    pairs AS (
      SELECT c.id_a, c.id_b
      FROM cand c JOIN e a ON a.vec_id = c.id_a JOIN e b ON b.vec_id = c.id_b
      WHERE round({cos}, 6) >= {threshold}),
    planted AS (
      SELECT vec_id AS id_a, vec_id + mo.o AS id_b
      FROM base, mo WHERE vec_id % {_PROD_TWIN_MOD} = 0),
    agg AS (
      SELECT CAST(count(*) FILTER (WHERE p.id_a IS NOT NULL) AS BIGINT)
               AS n_found,
             CAST(count(*) FILTER (WHERE p.id_a IS NULL) AS BIGINT)
               AS n_extra
      FROM pairs pr
      LEFT JOIN planted p ON pr.id_a = p.id_a AND pr.id_b = p.id_b)
    SELECT CAST(nn.n AS BIGINT) AS n_corpus,
           np.n_planted,
           agg.n_found,
           agg.n_extra,
           round(CAST(agg.n_found AS DOUBLE) / np.n_planted + 1e-9, 4)
             AS recall
    FROM agg, nn,
         (SELECT CAST(count(*) AS BIGINT) AS n_planted FROM planted) np
    """


@query("embedding_near_dup_pairs_prod", oracle=_near_dup_prod_oracle())
def embedding_near_dup_pairs_prod(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup detection in the PRODUCTION regime — cosine
    threshold 0.9, the setting a 100 TB dedup run would use (SCALING.md:
    at 0.4 the clustered corpus makes the OUTPUT itself quadratic — ~10^8
    true pairs at sf10 — while at 0.9 output is sparse and the funnel
    stays candidate-bound) — with recall made MEASURABLE by a
    deterministic planted-twin contract:

    - every vec_id % 20 == 0 gets a twin at id + max(vec_id)+1 with
      v' = v + 0.1·rot(v) (element-wise, binary64). cos(v, v') =
      (1 + 0.1c)/sqrt(1.01 + 0.2c) for c = v·rot(v)/|v|² ∈ [-1, 1],
      which is ≥ 0.995 for all c — every planted pair is a genuine
      ≥0.9 near-dup regardless of the corpus distribution;
    - the corpus-tuned LSH funnel (``tuned_planes`` /
      ``tuned_tables_for_planes`` at threshold 0.9, max_bucket 1024)
      runs over base ∪ twins, and the query reports n_found / n_planted
      recall plus the natural (non-planted) ≥0.9 pair count.

    Unlike the 0.4-threshold twins, whose pair LISTS are the checked
    output, the contract here is the funnel's measured recall in the
    sparse-output regime — the number a production deployment actually
    tunes against (r8 rehearsal: the tuned operator recovered the ~100
    planted twins at sf1 in 2.2 s). The DuckDB oracle replants the twins
    and re-derives (p, t) from the planted corpus count inside the SQL,
    so tuning rule, buckets, and recall are hash-checked at every SF.

    Scale shape: planting is a narrow projected union (no shuffle);
    everything after is the `lsh_near_dup_pairs` plan — vectors ship
    through the bucket shuffle once per table replica, quadratic work is
    bounded per-bucket GEMM, only output-sized pairs materialize; the
    recall join is against the broadcast planted-pair list."""
    from ror_etl_spark.operators.similarity import (
        lsh_near_dup_pairs,
        tuned_planes,
        tuned_tables_for_planes,
    )

    emb = Tables(spark, sf_dir).embeddings
    base = emb.select("vec_id", as_double(F.col("embedding")).alias("v"))
    row = base.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(
            F.sum((F.col("vec_id") % _PROD_TWIN_MOD == 0).cast("long")),
            F.lit(0),
        ).alias("np"),
        F.max("vec_id").alias("mx"),
    ).first()
    if not row["n"]:
        raise ValueError(
            "embedding_near_dup_pairs_prod requires a non-empty embeddings "
            "table (the planted-recall denominator needs >= 1 twin)"
        )
    total = int(row["n"]) + int(row["np"])
    # twin ids sit just past the real id range, so they can never collide
    # with a base vec_id at ANY corpus size; the oracle derives the same
    # offset as max(vec_id) + 1 inside the SQL
    offset = int(row["mx"]) + 1
    p = tuned_planes(total)
    t = tuned_tables_for_planes(
        p, threshold=_PROD_THRESHOLD, target_recall=0.9, max_tables=32
    )
    twins = base.filter(F.col("vec_id") % _PROD_TWIN_MOD == 0).select(
        (F.col("vec_id") + offset).alias("vec_id"),
        F.expr(
            "transform(v, (x, i) -> "
            "x + CAST(0.1 AS DOUBLE) * element_at(v, ((i + 1) % 64) + 1))"
        ).alias("v"),
    )
    corpus = base.unionByName(twins)
    pairs = lsh_near_dup_pairs(
        corpus,
        threshold=_PROD_THRESHOLD,
        dim=64,
        vec_col="v",
        n_tables=t,
        n_planes=p,
        max_bucket=1024,
    )
    planted = base.filter(F.col("vec_id") % _PROD_TWIN_MOD == 0).select(
        F.col("vec_id").alias("id_a"),
        (F.col("vec_id") + offset).alias("id_b"),
        F.lit(1).alias("is_pl"),
    )
    marked = pairs.join(F.broadcast(planted), ["id_a", "id_b"], "left")
    agg = marked.agg(
        F.coalesce(F.sum("is_pl"), F.lit(0)).cast("long").alias("n_found"),
        F.coalesce(
            F.sum(F.when(F.col("is_pl").isNull(), 1).otherwise(0)), F.lit(0)
        )
        .cast("long")
        .alias("n_extra"),
    )
    np_df = planted.agg(F.count(F.lit(1)).alias("n_planted"))
    return agg.crossJoin(F.broadcast(np_df)).select(
        F.lit(total).cast("long").alias("n_corpus"),
        "n_planted",
        "n_found",
        "n_extra",
        F.round(
            F.col("n_found").cast("double") / F.col("n_planted") + 1e-9, 4
        ).alias("recall"),
    )
