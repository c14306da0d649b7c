"""Theta and KLL sketch queries (Apache DataSketches built into Spark 4).

Theta sketches support set ALGEBRA (union / intersection / difference),
which HLL cannot — and they are EXACT while the number of retained
entries stays under the sketch's nominal k (default lgK=12 → 4096).
The driver testdata has ≤1500 distinct users at every SF, so the theta
queries here are exact and therefore fully DuckDB-oracle-checked —
unlike the HLL rollup (sketch_distinct_users_rollup, rows-only). At
true 100 TB cardinalities the same plans keep working with bounded
error; only the oracle comparison would need a tolerance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ror_etl_spark.registry import query
from ror_etl_spark.tables import Tables


@query(
    "theta_user_setops",
    oracle="""
    WITH a AS (SELECT DISTINCT user_id FROM events
               WHERE event_type = 'click' AND value > 195),
         b AS (SELECT DISTINCT user_id FROM events
               WHERE event_type = 'purchase' AND value > 195)
    SELECT (SELECT count(*) FROM (SELECT * FROM a UNION SELECT * FROM b))
             AS n_union,
           (SELECT count(*) FROM (SELECT * FROM a INTERSECT SELECT * FROM b))
             AS n_inter,
           (SELECT count(*) FROM (SELECT * FROM a EXCEPT SELECT * FROM b))
             AS n_click_only
    """,
)
def theta_user_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience overlap via theta-sketch set algebra: high-value clickers
    vs high-value purchasers. Each cohort collapses to ONE sketch in a
    partial+final agg (no shuffle of user ids, just sketch merge), then
    union/intersection/difference run on two tiny blobs driver-side.
    At 100 TB this is the pattern for cross-segment overlap questions:
    sketch once per segment, answer any boolean combination later."""
    e = Tables(spark, sf_dir).events
    a = e.filter((F.col("event_type") == "click") & (F.col("value") > 195)).agg(
        F.expr("theta_sketch_agg(user_id)").alias("ska"))
    b = e.filter((F.col("event_type") == "purchase") & (F.col("value") > 195)).agg(
        F.expr("theta_sketch_agg(user_id)").alias("skb"))
    return a.crossJoin(b).select(
        F.expr("theta_sketch_estimate(theta_union(ska, skb))").alias("n_union"),
        F.expr("theta_sketch_estimate(theta_intersection(ska, skb))").alias("n_inter"),
        F.expr("theta_sketch_estimate(theta_difference(ska, skb))").alias("n_click_only"),
    )


@query(
    "theta_rollup_distinct_users",
    oracle="""
    SELECT event_type, count(DISTINCT user_id) AS distinct_users
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def theta_rollup_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable distinct-count rollup, theta edition: one sketch per
    (event_type, day), then the per-type period answer is a sketch UNION
    of the daily sketches — never re-scanning raw events. Because the
    per-type cardinality is below the sketch's exact threshold here, the
    estimate equals count(distinct) and the oracle checks it exactly
    (the HLL twin of this query can only be rows-only checked)."""
    e = Tables(spark, sf_dir).events
    daily = (
        e.groupBy("event_type", F.window("ts", "1 day").alias("w"))
        .agg(F.expr("theta_sketch_agg(user_id)").alias("sk"))
    )
    return (
        daily.groupBy("event_type")
        .agg(F.expr("theta_sketch_estimate(theta_union_agg(sk))").alias("distinct_users"))
        .orderBy("event_type")
    )


def kll_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable quantile sketch (KLL) over event values, one sketch per
    event_type merged into a global one. Rank error is ~1.7% at the
    default k — the pytest suite bounds p50/p90/p99 against exact
    percentiles. The mergeability is the point at scale: per-partition
    or per-day sketches combine without re-scanning raw data, unlike
    exact percentile_approx re-runs.

    NOT driver-registered: KLL compaction state is engine-internal, so no
    DuckDB oracle can replay it and the driver records `err: no_oracle`
    for oracle-less entries (observed r1/r3). The operator stays covered
    two ways instead: this function's pytest rank-error bound, and two
    registered green twins — ``kll_exact_capacity_quantiles`` (same
    shard→merge→query path, capacity-exact) and
    ``quantile_sketch_bottomk`` (deterministic mergeable sample sketch,
    hash-checked end to end)."""
    e = Tables(spark, sf_dir).events
    per_type = e.groupBy("event_type").agg(
        F.expr("kll_sketch_agg_double(value)").alias("sk"))
    return per_type.agg(
        F.expr("kll_sketch_get_n_double(kll_merge_agg_double(sk))").alias("n"),
        F.round(F.expr(
            "kll_sketch_get_quantile_double(kll_merge_agg_double(sk), 0.5)"), 4).alias("p50"),
        F.round(F.expr(
            "kll_sketch_get_quantile_double(kll_merge_agg_double(sk), 0.9)"), 4).alias("p90"),
        F.round(F.expr(
            "kll_sketch_get_quantile_double(kll_merge_agg_double(sk), 0.99)"), 4).alias("p99"),
    )


_BK = 4096  # bottom-k sample size for the deterministic quantile sketch

_H52 = "('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 13))::BIGINT"


@query(
    "quantile_sketch_bottomk",
    oracle=f"""
    WITH bk AS (
      SELECT value FROM events
      ORDER BY {_H52}, event_id
      LIMIT {_BK})
    SELECT (SELECT count(*) FROM events) AS n,
           round(quantile_cont(value, 0.5), 4)  AS p50,
           round(quantile_cont(value, 0.9), 4)  AS p90,
           round(quantile_cont(value, 0.99), 4) AS p99
    FROM bk
    """,
    priority=3,
)
def quantile_sketch_bottomk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic mergeable quantile sketch: a bottom-k sample keyed by
    a portable md5-derived 52-bit hash of the row id. Bottom-k under a
    fixed total order is distributive — per-partition (or per-day) top-k
    heaps merge into the global bottom-k without re-scanning raw data,
    which is exactly the mergeability KLL provides, traded for a slightly
    worse rank-error constant (~1/sqrt(k)). Because the sample is a pure
    function of the data, the DuckDB oracle replays it bit-for-bit —
    unlike KLL's engine-internal compaction (see ``kll_value_quantiles``).

    Plan shape: the orderBy+limit compiles to TakeOrderedAndProject
    (per-partition top-k, no full sort/shuffle), then exact percentiles
    run over the k-row sample. At 100 TB k stays 4096; only the sample's
    representativeness, not the plan, changes."""
    e = Tables(spark, sf_dir).events
    h = F.conv(F.substring(F.md5(F.col("event_id").cast("string")), 1, 13), 16, 10).cast(
        "long"
    )
    bk = e.select("event_id", "value", h.alias("h")).orderBy("h", "event_id").limit(_BK)
    n_total = e.agg(F.count(F.lit(1)).alias("n"))
    return bk.agg(
        F.round(F.expr("percentile(value, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(value, 0.9)"), 4).alias("p90"),
        F.round(F.expr("percentile(value, 0.99)"), 4).alias("p99"),
    ).crossJoin(n_total).select("n", "p50", "p90", "p99")


@query(
    "kll_exact_capacity_quantiles",
    oracle="""
    SELECT event_type,
           count(value) AS n,
           round(quantile_disc(value, 0.5), 4)  AS p50,
           round(quantile_disc(value, 0.9), 4)  AS p90,
           round(quantile_disc(value, 0.99), 4) AS p99
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def kll_exact_capacity_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KLL quantile sketches built per (event_type, day) shard and MERGED
    per type — with k sized above the shard cardinality, so every sketch
    retains all values and the merged quantiles are exact (the same
    capacity trick the theta-sketch queries use). That makes the full
    shard→merge→query path hash-checkable against exact percentiles,
    unlike the default-k `kll_value_quantiles` (kept as the honest
    approximate demo). At real scale k drops back to ~200 and the same
    plan yields ~1.7%-rank-error answers from the same daily sketches."""
    e = Tables(spark, sf_dir).events
    shards = e.groupBy("event_type", F.date_trunc("day", "ts").alias("d")).agg(
        F.expr("kll_sketch_agg_double(value, 65535)").alias("sk")
    )
    merged = shards.groupBy("event_type").agg(
        F.expr("kll_merge_agg_double(sk, 65535)").alias("m")
    )
    return merged.select(
        "event_type",
        F.expr("kll_sketch_get_n_double(m)").alias("n"),
        F.round(F.expr("kll_sketch_get_quantile_double(m, 0.5)"), 4).alias("p50"),
        F.round(F.expr("kll_sketch_get_quantile_double(m, 0.9)"), 4).alias("p90"),
        F.round(F.expr("kll_sketch_get_quantile_double(m, 0.99)"), 4).alias("p99"),
    ).orderBy("event_type")


_CMS_W = 1024
_CMS_D = 4


@query(
    "sketch_count_min_heavy_hitters",
    oracle=f"""
    WITH per AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS n FROM events GROUP BY user_id),
    hashes AS (
      SELECT user_id, n, d.d,
             ('0x' || substr(md5(CAST(d.d AS VARCHAR) || ':' ||
                CAST(user_id AS VARCHAR)), 1, 8))::BIGINT % {_CMS_W} AS bucket
      FROM per CROSS JOIN (SELECT unnest(range(0, {_CMS_D})) AS d) d),
    counters AS (
      SELECT d, bucket, CAST(sum(n) AS BIGINT) AS c
      FROM hashes GROUP BY d, bucket),
    est AS (
      SELECT h.user_id, min(c.c) AS est_n
      FROM hashes h JOIN counters c ON c.d = h.d AND c.bucket = h.bucket
      GROUP BY h.user_id)
    SELECT per.user_id, per.n AS true_n, CAST(est.est_n AS BIGINT) AS est_n,
           CAST(est.est_n - per.n AS BIGINT) AS overestimate
    FROM per JOIN est USING (user_id)
    ORDER BY per.n DESC, per.user_id LIMIT 20
    """,
    priority=3,
)
def sketch_count_min_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch heavy-hitter CALIBRATION: build a deterministic
    4×1024 CMS over event counts (md5-derived row hashes — portable, so
    the ORACLE builds the bit-identical sketch) and report, for the 20
    truly heaviest users, the sketch's estimate beside the truth. CMS
    never underestimates (est ≥ true, pinned by the ``overestimate``
    column being ≥ 0) and overestimates by collisions — the measurement
    that sizes (width, depth) before a streaming counter ships.

    Scale shape: one map-side-combined per-key aggregate, then
    everything operates on the KEY-CARDINALITY-sized frame: the sketch
    build is a (4·width)-row aggregate, estimates are 4 lookups per
    key against a broadcastable counter table, and the report is
    TakeOrderedAndProject(20). On a true stream the counters are the
    only state — fixed 4×1024 longs regardless of cardinality. All
    integer arithmetic; the driver hash-checks sketch AND calibration."""
    e = Tables(spark, sf_dir).events
    per = e.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    d_df = F.broadcast(
        per.sparkSession.createDataFrame([(d,) for d in range(_CMS_D)], "d int")
    )
    bucket = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("d").cast("string"),
                        F.lit(":"),
                        F.col("user_id").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % _CMS_W
    )
    hashes = per.crossJoin(d_df).select(
        "user_id", "n", "d", bucket.alias("bucket")
    ).localCheckpoint(eager=False)
    counters = hashes.groupBy("d", "bucket").agg(F.sum("n").alias("c"))
    est = (
        hashes.join(F.broadcast(counters), ["d", "bucket"])
        .groupBy("user_id")
        .agg(F.min("c").alias("est_n"))
    )
    return (
        per.join(est, "user_id")
        .select(
            "user_id",
            F.col("n").alias("true_n"),
            "est_n",
            (F.col("est_n") - F.col("n")).alias("overestimate"),
        )
        .orderBy(F.desc("true_n"), F.asc("user_id"))
        .limit(20)
    )
