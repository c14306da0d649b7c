"""Distribution-aware statistics operators: Poisson-bootstrap
confidence intervals and trimmed/winsorized robust means.

The bootstrap is the one everybody actually runs at warehouse scale:
classic resampling needs n draws per replicate (undistributable), while
the POISSON bootstrap gives every row an independent Poisson(1) weight
per replicate — so B replicates are B weighted sums inside ONE
aggregation pass, map-side combinable, no data movement beyond a single
reduce. Determinism comes from the repo's portable 52-bit md5 hash:
u = h(key, b) / 2^52 inverted through literal Poisson CDF thresholds,
identical on both engines, so the oracle replays every replicate
exactly.

Robust means complete the outlier-resistant family (IQR fences, MAD):
trim = drop the tails, winsorize = clamp them; both use exact
percentile_disc cut points (actual data values — no interpolation
ulps) broadcast back over one scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ror_etl_spark.registry import query
from ror_etl_spark.tables import Tables

_B = 32  # bootstrap replicates
_SCALE = float(1 << 52)

# Poisson(1) inverse-CDF thresholds (cumulative e^-1 * sum 1/k!), capped
# at 5 — P(w > 5) < 1e-4. Stated as literals so both engines compare u
# against bit-identical doubles.
_P_THRESH = [
    ("0.36787944117144233", 0),
    ("0.7357588823428847", 1),
    ("0.9196986029286058", 2),
    ("0.9810118431238462", 3),
    ("0.9963401531726563", 4),
]


def _poisson_case_sql(u: str) -> str:
    branches = " ".join(
        f"WHEN {u} < {t} THEN {w}" for t, w in _P_THRESH
    )
    return f"CASE {branches} ELSE 5 END"


@query(
    "bootstrap_mean_ci_revenue",
    oracle=f"""
    WITH fan AS (
      SELECT b.b AS b, o.o_totalprice AS x,
             ('0x' || substr(md5(CAST(o.o_orderkey AS VARCHAR) || ':' ||
                                 CAST(b.b AS VARCHAR)), 1, 13))::BIGINT
               / {_SCALE} AS u
      FROM orders o CROSS JOIN (SELECT unnest(range(0, {_B})) AS b) b),
    w AS (SELECT b, x, {_poisson_case_sql('u')} AS w FROM fan),
    reps AS (
      SELECT b, sum(w * x) / sum(w) AS m
      FROM w GROUP BY b),
    ci AS (
      SELECT quantile_disc(m, 0.025) AS lo, quantile_disc(m, 0.975) AS hi
      FROM reps),
    base AS (SELECT avg(o_totalprice) AS mean FROM orders)
    SELECT round(base.mean + 1e-9, 4) AS mean,
           round(ci.lo + 1e-9, 4) AS ci_lo,
           round(ci.hi + 1e-9, 4) AS ci_hi,
           CAST({_B} AS BIGINT) AS n_replicates
    FROM base CROSS JOIN ci
    """,
    priority=3,
)
def bootstrap_mean_ci_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """95% Poisson-bootstrap confidence interval for mean order revenue,
    B=32 deterministic replicates.

    Each row gets a Poisson(1) weight per replicate from the portable
    hash (row key, replicate id) pushed through literal inverse-CDF
    thresholds; replicate means are B weighted sums computed in one
    fan-out + one aggregate with map-side partials (the fan-out never
    shuffles raw rows — partial aggregation collapses each partition to
    B running sums before the exchange). The CI bounds are
    percentile_disc over the B replicate means — actual values, no
    interpolation. This is the bootstrap that works at 100 TB: one scan,
    B×n_partitions partial states, no resampling join."""
    o = Tables(spark, sf_dir).orders
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        ":",
                        F.col("o_orderkey").cast("string"),
                        F.col("b").cast("string"),
                    )
                ),
                1,
                13,
            ),
            16,
            10,
        ).cast("long")
        / F.lit(_SCALE)
    )
    fan = o.select(
        F.col("o_totalprice").alias("x"),
        F.col("o_orderkey"),
        F.explode(F.sequence(F.lit(0), F.lit(_B - 1))).alias("b"),
    ).select("b", "x", u.alias("u"))
    w = fan.select("b", "x", F.expr(_poisson_case_sql("u")).alias("w"))
    reps = w.groupBy("b").agg(
        (F.sum(F.col("w") * F.col("x")) / F.sum("w")).alias("m")
    )
    ci = reps.agg(
        F.expr("percentile_disc(0.025) WITHIN GROUP (ORDER BY m)").alias("lo"),
        F.expr("percentile_disc(0.975) WITHIN GROUP (ORDER BY m)").alias("hi"),
    )
    base = o.agg(F.avg("o_totalprice").alias("mean"))
    return base.crossJoin(F.broadcast(ci)).select(
        F.round(F.col("mean") + 1e-9, 4).alias("mean"),
        F.round(F.col("lo") + 1e-9, 4).alias("ci_lo"),
        F.round(F.col("hi") + 1e-9, 4).alias("ci_hi"),
        F.lit(_B).cast("long").alias("n_replicates"),
    )


@query(
    "robust_mean_revenue",
    oracle="""
    WITH cuts AS (
      SELECT quantile_disc(o_totalprice, 0.05) AS lo,
             quantile_disc(o_totalprice, 0.95) AS hi
      FROM orders),
    s AS (
      SELECT
        avg(o.o_totalprice) AS mean_raw,
        avg(CASE WHEN o.o_totalprice > c.lo AND o.o_totalprice < c.hi
                 THEN o.o_totalprice END) AS mean_trimmed,
        avg(CASE WHEN o.o_totalprice <= c.lo THEN c.lo
                 WHEN o.o_totalprice >= c.hi THEN c.hi
                 ELSE o.o_totalprice END) AS mean_winsorized,
        CAST(sum(CASE WHEN o.o_totalprice <= c.lo
                       OR o.o_totalprice >= c.hi THEN 1 ELSE 0 END) AS BIGINT)
          AS n_tail
      FROM orders o CROSS JOIN cuts c)
    SELECT round(mean_raw + 1e-9, 4) AS mean_raw,
           round(mean_trimmed + 1e-9, 4) AS mean_trimmed,
           round(mean_winsorized + 1e-9, 4) AS mean_winsorized,
           n_tail
    FROM s
    """,
    priority=3,
)
def robust_mean_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trimmed (5%/95% tails dropped) and winsorized (tails clamped)
    means of order revenue in one pass after a broadcast of the exact
    percentile_disc cut points.

    Completes the robust-statistics family (IQR fences, MAD): two scans
    total — one for the cuts, one for all three means + the tail count
    as conditional aggregates over the broadcast bounds. The cut points
    are actual data values (percentile_disc), so the tail-membership
    predicate is an exact comparison on both engines — no interpolation
    boundary to flap the hash."""
    o = Tables(spark, sf_dir).orders
    cuts = o.agg(
        F.expr(
            "percentile_disc(0.05) WITHIN GROUP (ORDER BY o_totalprice)"
        ).alias("lo"),
        F.expr(
            "percentile_disc(0.95) WITHIN GROUP (ORDER BY o_totalprice)"
        ).alias("hi"),
    )
    j = o.crossJoin(F.broadcast(cuts))
    s = j.agg(
        F.avg("o_totalprice").alias("mean_raw"),
        F.avg(
            F.when(
                (F.col("o_totalprice") > F.col("lo"))
                & (F.col("o_totalprice") < F.col("hi")),
                F.col("o_totalprice"),
            )
        ).alias("mean_trimmed"),
        F.avg(
            F.when(F.col("o_totalprice") <= F.col("lo"), F.col("lo"))
            .when(F.col("o_totalprice") >= F.col("hi"), F.col("hi"))
            .otherwise(F.col("o_totalprice"))
        ).alias("mean_winsorized"),
        F.sum(
            F.when(
                (F.col("o_totalprice") <= F.col("lo"))
                | (F.col("o_totalprice") >= F.col("hi")),
                1,
            ).otherwise(0)
        ).alias("n_tail"),
    )
    return s.select(
        F.round(F.col("mean_raw") + 1e-9, 4).alias("mean_raw"),
        F.round(F.col("mean_trimmed") + 1e-9, 4).alias("mean_trimmed"),
        F.round(F.col("mean_winsorized") + 1e-9, 4).alias("mean_winsorized"),
        "n_tail",
    )
