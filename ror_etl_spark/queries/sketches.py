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


# ---------------------------------------------------------------------------
# Portable HyperLogLog — oracle-replayable registers, exact-integer merge.
#
# Spark's built-in hll_sketch_agg is a black box to the oracle gate (its
# binary differs from DuckDB's HLL), so sketch_distinct_users_rollup used
# to be the registry's one rows-only entry. This twin rebuilds HLL from
# first principles with portable arithmetic so BOTH engines derive
# bit-identical registers:
#   - 52-bit md5-derived row hash (same recipe as the KMV/CMS sketches);
#   - register index = top 8 bits (m = 256), remainder w = low 44 bits;
#   - rho = leading zeros of w in 44 bits + 1 = 45 - length(bin(w)),
#     computed via the bin() string in both engines — no float log2,
#     whose floor() can be off by one at exact powers of two;
#   - the indicator sum  Z^-1 = sum_j 2^-M_j  is kept EXACT by scaling:
#     sum_j 2^(45-M_j) is an integer <= 256 * 2^45 = 2^53, inside both
#     engines' BIGINT and double-exact ranges.
# The raw estimate then uses only IEEE-754 +-*/ (correctly rounded by
# spec, so bit-identical across JVM and DuckDB); the small-range linear
# counting branch is the one transcendental (ln), disarmed by the repo's
# +1e-9 rounding shift. Branch selection compares bit-identical raw
# estimates, so both engines always take the same branch.
_HLL_M = 256
_HLL_SCALE = 1 << 45  # 2^(44 + 1): rho ranges over [1, 45]


@query(
    "sketch_hll_portable_rollup",
    oracle=f"""
    WITH ev AS (
      SELECT event_type AS segment, user_id FROM events
      UNION ALL
      SELECT 'ALL' AS segment, user_id FROM events),
    h AS (
      SELECT segment, user_id,
             ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 13))::BIGINT AS h
      FROM ev),
    r AS (
      SELECT segment, h >> 44 AS idx,
             CASE WHEN (h & {(1 << 44) - 1}) = 0 THEN 45
                  ELSE 45 - length(bin(h & {(1 << 44) - 1})) END AS rho
      FROM h),
    regs AS (
      SELECT segment, idx, max(rho) AS m FROM r GROUP BY segment, idx),
    agg AS (
      SELECT segment,
             CAST(sum(1::BIGINT << (45 - m)) AS BIGINT)
               + ({_HLL_M} - count(*)) * {_HLL_SCALE}::BIGINT AS sum_scaled,
             {_HLL_M} - count(*) AS v_empty
      FROM regs GROUP BY segment),
    exact AS (
      SELECT segment, count(DISTINCT user_id) AS n_exact FROM ev
      GROUP BY segment),
    est AS (
      SELECT a.segment, e.n_exact, a.v_empty,
             (0.7213 / (1.0 + 1.079 / {_HLL_M}.0)) * {_HLL_M}.0 * {_HLL_M}.0
               * {_HLL_SCALE}.0 / CAST(a.sum_scaled AS DOUBLE) AS raw
      FROM agg a JOIN exact e ON a.segment = e.segment),
    fin AS (
      SELECT segment, n_exact, v_empty, raw,
             CASE WHEN raw <= 2.5 * {_HLL_M}.0 AND v_empty > 0
                  THEN {_HLL_M}.0 * ln({_HLL_M}.0 / CAST(v_empty AS DOUBLE))
                  ELSE raw END AS corrected
      FROM est)
    SELECT segment, n_exact, v_empty,
           round(raw + 1e-9, 4) AS est_raw,
           round(corrected + 1e-9, 4) AS est_hll,
           round((corrected - n_exact) / n_exact + 1e-9, 4) AS rel_err
    FROM fin ORDER BY segment
    """,
    priority=5,
)
def sketch_hll_portable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable distinct-count sketch: per-segment HLL registers plus a
    global row computed by MERGING the segment registers (max per index),
    never by rescanning the input — the property that lets a 100 TB
    pipeline sketch each shard/day once and answer any segment union
    later. The register build is a map-side-combinable groupBy (at most
    segments x 256 rows ever shuffle); the exact counts alongside make
    this a calibration report in the style of bloom_fpr_calibration.

    Correctness architecture (vs the rows-only built-in HLL twin): every
    register is integer-exact and cross-engine identical; see the module
    comment above _HLL_M for the scaled-indicator-sum trick that keeps
    the harmonic mean exact until the final one-division estimate."""
    e = Tables(spark, sf_dir).events
    ev = e.select(F.col("event_type").alias("segment"), "user_id").unionByName(
        e.select(F.lit("ALL").alias("segment"), "user_id")
    )
    w_mask = (1 << 44) - 1
    hashed = ev.withColumn(
        "h",
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 13), 16, 10)
        .cast("long"),
    )
    rho = (
        hashed.select(
            "segment",
            F.shiftright("h", 44).alias("idx"),
            F.col("h").bitwiseAND(F.lit(w_mask)).alias("w"),
        )
        .withColumn(
            "rho",
            F.when(F.col("w") == 0, F.lit(45)).otherwise(
                F.lit(45) - F.length(F.expr("bin(w)"))
            ),
        )
    )
    # Segment registers once; the 'ALL' row arrives pre-merged through the
    # unioned input (identical to max-merging the per-segment registers,
    # since max is associative — pinned by test_sketches parity).
    regs = rho.groupBy("segment", "idx").agg(F.max("rho").alias("m"))
    agg = regs.groupBy("segment").agg(
        (
            F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 45 - m)"))
            + (F.lit(_HLL_M) - F.count(F.lit(1))) * F.lit(_HLL_SCALE)
        ).alias("sum_scaled"),
        (F.lit(_HLL_M) - F.count(F.lit(1))).alias("v_empty"),
    )
    exact = ev.groupBy("segment").agg(
        F.countDistinct("user_id").alias("n_exact")
    )
    raw = (
        F.lit(0.7213 / (1.0 + 1.079 / float(_HLL_M)))
        * float(_HLL_M)
        * float(_HLL_M)
        * float(_HLL_SCALE)
        / F.col("sum_scaled").cast("double")
    )
    est = agg.join(exact, "segment").withColumn("raw", raw)
    corrected = F.when(
        (F.col("raw") <= 2.5 * _HLL_M) & (F.col("v_empty") > 0),
        float(_HLL_M) * F.log(float(_HLL_M) / F.col("v_empty").cast("double")),
    ).otherwise(F.col("raw"))
    out = est.withColumn("corrected", corrected).select(
        "segment",
        "n_exact",
        "v_empty",
        F.round(F.col("raw") + 1e-9, 4).alias("est_raw"),
        F.round(F.col("corrected") + 1e-9, 4).alias("est_hll"),
        F.round(
            (F.col("corrected") - F.col("n_exact")) / F.col("n_exact") + 1e-9, 4
        ).alias("rel_err"),
    )
    return out.orderBy("segment")


@query(
    "rolling_hll_users_7d",
    oracle=f"""
    WITH h AS (
      SELECT date_trunc('day', ts) AS d, user_id,
             ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 13))::BIGINT AS h
      FROM events),
    r AS (
      SELECT d, h >> 44 AS idx,
             CASE WHEN (h & {(1 << 44) - 1}) = 0 THEN 45
                  ELSE 45 - length(bin(h & {(1 << 44) - 1})) END AS rho
      FROM h),
    dayregs AS (
      SELECT d, idx, max(rho) AS m FROM r GROUP BY d, idx),
    days AS (SELECT DISTINCT d FROM dayregs),
    fan AS (
      SELECT days.d AS wd, dr.idx, max(dr.m) AS m
      FROM days JOIN dayregs dr
        ON dr.d <= days.d AND dr.d >= days.d - INTERVAL 6 DAY
      GROUP BY days.d, dr.idx),
    agg AS (
      SELECT wd,
             CAST(sum(1::BIGINT << (45 - m)) AS BIGINT)
               + ({_HLL_M} - count(*)) * {_HLL_SCALE}::BIGINT AS sum_scaled,
             {_HLL_M} - count(*) AS v_empty
      FROM fan GROUP BY wd),
    ex AS (
      SELECT days.d AS wd, count(DISTINCT h.user_id) AS n_exact
      FROM days JOIN h ON h.d <= days.d AND h.d >= days.d - INTERVAL 6 DAY
      GROUP BY days.d),
    est AS (
      SELECT a.wd, e.n_exact, a.v_empty,
             (0.7213 / (1.0 + 1.079 / {_HLL_M}.0)) * {_HLL_M}.0 * {_HLL_M}.0
               * {_HLL_SCALE}.0 / CAST(a.sum_scaled AS DOUBLE) AS raw
      FROM agg a JOIN ex e ON a.wd = e.wd)
    SELECT strftime(wd, '%Y-%m-%d') AS day, n_exact,
           round(CASE WHEN raw <= 2.5 * {_HLL_M}.0 AND v_empty > 0
                      THEN {_HLL_M}.0 * ln({_HLL_M}.0 / CAST(v_empty AS DOUBLE))
                      ELSE raw END + 1e-9, 4) AS est_hll
    FROM est ORDER BY day
    """,
    priority=5,
)
def rolling_hll_users_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day distinct users APPROXIMATELY — the sketch-merge
    answer to the same question rolling_distinct_users_7d answers
    exactly, and the payoff of mergeable registers: sketch each DAY
    once (day x 256 registers), then answer every sliding window by
    max-merging seven days' registers — no re-touching events, which
    is how a 100 TB pipeline serves arbitrary window-distinct questions
    from day-granular state. The exact twin shuffles 7x the per-day
    distinct (user, day) pairs; this shuffles 7 x days x 256 longs,
    independent of cardinality.

    Register build and estimate arithmetic are identical to
    sketch_hll_portable_rollup (integer-exact registers, scaled
    indicator sum, IEEE-only raw estimate, epsilon-rounded linear
    counting); the fan-out is the bounded x7 explode of the exact twin.
    Exact counts ride along so the output is its own calibration
    report."""
    e = Tables(spark, sf_dir).events
    w_mask = (1 << 44) - 1
    h = e.select(
        F.date_trunc("day", "ts").alias("d"),
        "user_id",
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 13), 16, 10)
        .cast("long")
        .alias("h"),
    )
    dayregs = (
        h.select(
            "d",
            F.shiftright("h", 44).alias("idx"),
            F.col("h").bitwiseAND(F.lit(w_mask)).alias("w"),
        )
        .withColumn(
            "rho",
            F.when(F.col("w") == 0, F.lit(45)).otherwise(
                F.lit(45) - F.length(F.expr("bin(w)"))
            ),
        )
        .groupBy("d", "idx")
        .agg(F.max("rho").alias("m"))
    )
    days = dayregs.select("d").distinct()
    fan = (
        dayregs.select(
            F.explode(
                F.expr(
                    "transform(sequence(0, 6), k -> date_add(CAST(d AS DATE), k))"
                )
            ).alias("wd"),
            "idx",
            "m",
        )
        .join(F.broadcast(days.select(F.col("d").cast("date").alias("wd"))), "wd")
        .groupBy("wd", "idx")
        .agg(F.max("m").alias("m"))
    )
    agg = fan.groupBy("wd").agg(
        (
            F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 45 - m)"))
            + (F.lit(_HLL_M) - F.count(F.lit(1))) * F.lit(_HLL_SCALE)
        ).alias("sum_scaled"),
        (F.lit(_HLL_M) - F.count(F.lit(1))).alias("v_empty"),
    )
    du = h.select("d", "user_id").distinct()
    ex = (
        du.select(
            F.explode(
                F.expr(
                    "transform(sequence(0, 6), k -> date_add(CAST(d AS DATE), k))"
                )
            ).alias("wd"),
            "user_id",
        )
        .join(F.broadcast(days.select(F.col("d").cast("date").alias("wd"))), "wd")
        .groupBy("wd")
        .agg(F.countDistinct("user_id").alias("n_exact"))
    )
    raw = (
        F.lit(0.7213 / (1.0 + 1.079 / float(_HLL_M)))
        * float(_HLL_M)
        * float(_HLL_M)
        * float(_HLL_SCALE)
        / F.col("sum_scaled").cast("double")
    )
    est = agg.join(ex, "wd").withColumn("raw", raw)
    corrected = F.when(
        (F.col("raw") <= 2.5 * _HLL_M) & (F.col("v_empty") > 0),
        float(_HLL_M) * F.log(float(_HLL_M) / F.col("v_empty").cast("double")),
    ).otherwise(F.col("raw"))
    return (
        est.select(
            F.date_format("wd", "yyyy-MM-dd").alias("day"),
            "n_exact",
            F.round(corrected + 1e-9, 4).alias("est_hll"),
        )
        .orderBy("day")
    )
