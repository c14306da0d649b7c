"""Deterministic sampling queries (training-data pipeline surface).

Engine-grade sampling must be reproducible across runs, engines, and
partitionings — Spark's TABLESAMPLE / df.sample are seeded per-partition
(repartition the input and the sample changes), so the portable form is
content-hash Bernoulli: keep a row iff a hash of its key falls under the
rate threshold. md5-hex prefixes compare identically in Spark and DuckDB,
which makes the whole family oracle-checkable, and the filter is a pure
codegen expression that pushes down like any other predicate."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ror_etl_spark.queries.util import ordered
from ror_etl_spark.registry import query
from ror_etl_spark.tables import Tables

# first 4 md5-hex chars are uniform over [0x0000, 0xffff]; '1999' ≈ 10.0%
_BERNOULLI_CUT = "1999"


def _hash4(col: F.Column) -> F.Column:
    return F.substring(F.md5(F.col(col).cast("string")), 1, 4)


@query(
    "sample_hash_bernoulli",
    oracle=f"""
    SELECT o_orderkey, o_orderstatus, o_totalprice
    FROM orders
    WHERE substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 4) < '{_BERNOULLI_CUT}'
    ORDER BY o_orderkey
    """,
)
def sample_hash_bernoulli(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~10% deterministic Bernoulli sample of orders keyed on the order id.

    Same rows come back no matter how the table is partitioned or which
    engine runs it — the property df.sample(seed=) does NOT have."""
    o = Tables(spark, sf_dir).orders
    return (
        o.filter(_hash4("o_orderkey") < _BERNOULLI_CUT)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .orderBy("o_orderkey")
    )


# per-stratum rates: heavily downsample the dominant strata, keep rare ones
_STRATUM_CUTS = {"O": "0ccc", "F": "3333", "P": "ffff"}  # ≈5%, 20%, 100%


@query(
    "sample_stratified_hash",
    oracle=f"""
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS n_sampled,
           round(sum(o_totalprice), 2) AS sampled_total
    FROM orders
    WHERE substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 4) <
          CASE o_orderstatus
            WHEN 'O' THEN '{_STRATUM_CUTS["O"]}'
            WHEN 'F' THEN '{_STRATUM_CUTS["F"]}'
            ELSE '{_STRATUM_CUTS["P"]}' END
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
)
def sample_stratified_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified deterministic sampling: per-status rates (O≈5%, F≈20%,
    P=100%) — the rebalancing step every training-data pipeline runs to
    downsample dominant sources. Same hash trick as the Bernoulli form, so
    it composes with pushdown and stays exactly reproducible; df.sampleBy
    is the nondeterministic built-in analogue."""
    o = Tables(spark, sf_dir).orders
    cut = F.when(F.col("o_orderstatus") == "O", _STRATUM_CUTS["O"]).when(
        F.col("o_orderstatus") == "F", _STRATUM_CUTS["F"]
    ).otherwise(_STRATUM_CUTS["P"])
    return (
        o.filter(_hash4("o_orderkey") < cut)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.round(F.sum("o_totalprice"), 2).alias("sampled_total"),
        )
    )


@query(
    "sample_fixed_size_hash",
    oracle="""
    SELECT doc_id, substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS h
    FROM documents
    ORDER BY h, doc_id
    LIMIT 100
    """,
    priority=3,
)
def sample_fixed_size_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACTLY-n deterministic sample: the 100 documents with the
    smallest content-hash — the fixed-size companion to the Bernoulli
    forms (which only hit a rate in expectation). Same row set on any
    engine, any partitioning, any run; and STABLE under corpus growth
    in the bottom-k sense (a new document only enters by evicting the
    current max — the KMV property, so repeated evaluations sample
    mostly the same docs and remain comparable over time). The standard
    trick for eval panels and human-review batches drawn from a moving
    corpus.

    Scale shape: TakeOrderedAndProject on the hash — per-partition
    top-100 map-side, one 100-row reduce; never a global sort, never a
    shuffle of the corpus."""
    d = Tables(spark, sf_dir).documents
    h = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8)
    return (
        d.select("doc_id", h.alias("h"))
        .orderBy(F.asc("h"), F.asc("doc_id"))
        .limit(100)
    )


@query(
    "sample_topn_per_group_hash",
    oracle="""
    SELECT o_orderstatus, o_orderkey, h FROM (
      SELECT o_orderstatus, o_orderkey,
             substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8) AS h,
             row_number() OVER (PARTITION BY o_orderstatus
                                ORDER BY substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8),
                                         o_orderkey) AS rn
      FROM orders)
    WHERE rn <= 5
    ORDER BY o_orderstatus, h, o_orderkey
    """,
    priority=3,
)
def sample_topn_per_group_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACTLY-n-per-stratum deterministic sample: the 5 lowest-hash
    orders per status — the "N examples per class" sampler (eval
    panels, labeling batches, per-domain spot checks), with the same
    engine/partitioning/run stability and KMV growth-stability as the
    global bottom-k form. Rates-based stratified sampling
    (sample_stratified_hash) hits counts only in expectation; this
    form guarantees them.

    Scale shape: the rank ≤ n predicate compiles to WindowGroupLimit —
    a per-partition top-n runs map-side below the group exchange, so
    each reducer sees at most n·partitions candidate rows, never the
    stratum. All-integer/string output."""
    from pyspark.sql import Window

    o = Tables(spark, sf_dir).orders
    h = F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 8)
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.asc("h"), F.asc("o_orderkey")
    )
    return (
        o.select("o_orderstatus", "o_orderkey", h.alias("h"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("o_orderstatus", "o_orderkey", "h")
        .orderBy("o_orderstatus", "h", "o_orderkey")
    )


@query(
    "sample_weighted_pps",
    oracle="""
    WITH k AS (
      SELECT doc_id, n_chars,
             -ln((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT
                  + 1) / 65536.0) / n_chars AS key
      FROM documents WHERE n_chars > 0)
    SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
           CAST(row_number() OVER (ORDER BY key, doc_id) AS BIGINT) AS rank
    FROM k
    ORDER BY key, doc_id LIMIT 20
    """,
    priority=3,
)
def sample_weighted_pps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic WEIGHTED sampling without replacement (Efraimidis–
    Spirakis A-ES): each item draws u from its content hash and ranks by
    ``−ln(u)/w`` (the exponential-jitter form of ``u^{1/w}``, monotone-
    equivalent and numerically tame); the bottom-k ranks are a PPS
    sample — selection probability ∝ weight (here document length, the
    standard token-budget-proportional draw). Engine/partitioning/run
    stable like every hash sampler in this module, which
    rand()-weighted alternatives are not.

    Scale shape: pure per-row arithmetic + TakeOrderedAndProject(20) —
    scan economics, no shuffle. The ranking key is a float, but both
    engines compute −ln/÷ on identical exact inputs (a 17-bit integer
    u and an integer weight); a rank flip needs two keys within one
    ulp — measure-zero on continuous keys, the same basis every cosine
    top-k here rests on, with doc_id as the total-order tiebreak."""
    d = Tables(spark, sf_dir).documents.filter(F.col("n_chars") > 0)
    u = (
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10
        ).cast("long")
        + 1
    ) / 65536.0
    key = -F.log(u) / F.col("n_chars")
    from pyspark.sql import Window

    w = Window.orderBy(key.asc(), F.col("doc_id").asc())
    return (
        d.select("doc_id", F.col("n_chars").cast("long").alias("n_chars"),
                 key.alias("key"))
        .orderBy(F.asc("key"), F.asc("doc_id"))
        .limit(20)
        .select(
            "doc_id",
            "n_chars",
            F.row_number().over(
                Window.orderBy(F.asc("key"), F.asc("doc_id"))
            ).cast("long").alias("rank"),
        )
    )


@query(
    "sample_systematic_every_k",
    oracle="""
    WITH ranked AS (
      SELECT c_custkey,
             row_number() OVER (
               ORDER BY md5(CAST(c_custkey AS VARCHAR)), c_custkey) - 1 AS pos
      FROM customer)
    SELECT c_custkey, pos FROM ranked WHERE pos % 50 = 0 ORDER BY pos
    """,
    priority=3,
)
def sample_systematic_every_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Systematic 1-in-50 sampling on a hashed ring: rank rows by a
    portable hash (deterministic random permutation), keep every 50th.

    Unlike Bernoulli hash sampling (sample_hash_bernoulli), systematic
    sampling guarantees an EXACT ceil(n/50) sample size and even spacing
    over the permutation — the property survey-sampling pipelines want.
    The rank comes from operators/util.py:global_rank (range partition +
    local row_number + broadcast offsets), never a single-task window;
    the oracle states the same permutation with DuckDB's own global
    window — two different ranking algorithms must agree row-for-row."""
    from ror_etl_spark.operators.util import global_rank

    c = Tables(spark, sf_dir).customer
    ranked = global_rank(
        c.select(
            "c_custkey", F.md5(F.col("c_custkey").cast("string")).alias("__h")
        ),
        "__h",
        "c_custkey",
        out="pos",
    )
    return (
        ranked.where(F.col("pos") % 50 == 0)
        .select("c_custkey", "pos")
        .orderBy("pos")
    )


@query(
    "quantile_normalize_acctbal",
    oracle="""
    WITH ranked AS (
      SELECT c_custkey, c_acctbal,
             row_number() OVER (ORDER BY c_acctbal, c_custkey) - 1 AS pos,
             count(*) OVER () AS n
      FROM customer)
    SELECT c_custkey, round(c_acctbal, 2) AS acctbal,
           round(CAST(pos AS DOUBLE) / (n - 1) + 1e-9, 6) AS q
    FROM ranked ORDER BY c_custkey
    """,
    priority=3,
)
def quantile_normalize_acctbal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile (rank) normalization of a numeric feature to uniform
    [0, 1] — the ML-preprocessing transform that makes a feature
    distribution-free: value -> rank / (n-1).

    The rank is the distributed global_rank over the (value, key) total
    order; n is a LAZY broadcast single-row aggregate of the base table
    (rank preserves row count), crossJoined into the projection — the
    former eager ``ranked.count()`` executed the whole range shuffle a
    second time at DataFrame-construction time just to read one scalar.
    The single division is identically shaped on both engines and rounded
    with the epsilon shift. At 100 TB this is one range shuffle — the
    same cost as sorting the feature column once."""
    from ror_etl_spark.operators.util import global_rank

    c = Tables(spark, sf_dir).customer
    ranked = global_rank(
        c.select("c_custkey", "c_acctbal"), "c_acctbal", "c_custkey", out="pos"
    )
    nd = c.agg(F.count(F.lit(1)).alias("__n"))
    out = ranked.crossJoin(F.broadcast(nd)).select(
        "c_custkey",
        F.round("c_acctbal", 2).alias("acctbal"),
        F.round(
            F.col("pos").cast("double") / (F.col("__n") - 1) + 1e-9, 6
        ).alias("q"),
    )
    return ordered(out, "c_custkey")


@query(
    "cv_fold_assignment_stratified",
    oracle="""
    WITH r AS (
      SELECT c_mktsegment AS segment,
             row_number() OVER (
               PARTITION BY c_mktsegment
               ORDER BY md5(CAST(c_custkey AS VARCHAR)), c_custkey) AS rn
      FROM customer),
    f AS (SELECT segment, (rn - 1) % 5 AS fold FROM r)
    SELECT segment, CAST(fold AS BIGINT) AS fold,
           CAST(count(*) AS BIGINT) AS n
    FROM f GROUP BY segment, fold ORDER BY segment, fold
    """,
    priority=5,
)
def cv_fold_assignment_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified k-fold cross-validation assignment (k=5): within each
    stratum (market segment), rank rows by a content hash and deal them
    round-robin into folds — EXACTLY balanced per stratum (fold sizes
    differ by at most one), unlike plain hash-mod assignment whose
    per-stratum fold sizes are only balanced in expectation. The hash
    order makes the deal deterministic and reshuffle-proof (same
    property as the registry's other hash-derived samplers), and the
    window is PARTITIONED by the stratum — per-stratum frames, no
    global sort. Output is the segment x fold contingency, which is
    simultaneously the balance audit."""
    from pyspark.sql import Window as W

    c = Tables(spark, sf_dir).customer
    r = c.select(
        F.col("c_mktsegment").alias("segment"),
        F.row_number()
        .over(
            W.partitionBy("c_mktsegment").orderBy(
                F.md5(F.col("c_custkey").cast("string")), F.col("c_custkey")
            )
        )
        .alias("rn"),
    )
    return (
        r.select("segment", ((F.col("rn") - 1) % 5).cast("long").alias("fold"))
        .groupBy("segment", "fold")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("segment", "fold")
    )
