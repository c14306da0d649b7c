"""Operators staged during round 11 for the r12 registry flip — same
discipline as ``staged_r9/r10/r11.py`` (staged one round, flipped live
the next after the driver window drains): implemented, oracle-equipped,
and driver-gate-checked under pytest (``tests/test_staged_r12.py``)
while the r11 driver window records the first 50 of the 63 staged_r11
names flipped this round (the remaining 13 lead the r12 window, so this
batch queues behind them — 13 + this batch < 50 keeps the whole r12
window green-able in one round). ``register()`` is NOT called from
``queries.load()`` yet; r12 flips it after CORRECTNESS_r11 lands.

Batch theme: the GOVERNANCE & DECISION layer a training-data platform
runs beside curation — privacy risk audits (k-anonymity, l-diversity,
differentially-private release counts over an engine-portable Lehmer
Laplace stream), causal measurement of pipeline interventions
(IPTW ATE, regression discontinuity, interrupted time series), leakage-
safe tabular feature engineering (smoothed target encoding, WOE/IV
binning, VIF, partial correlation, split-conformal intervals), survival
and spectral closures (Weibull median-rank fit, spectral entropy,
Yule-Walker AR(2), lag-1 OLS, two-sample Poisson rate test,
Anderson-Darling), empirical-Bayes shrinkage of per-source quality
rates, product-analytics state (DAU/WAU stickiness, bounce depth), a
geo family over deterministic coordinates (Z-order grid cells,
broadcast haversine k-NN, bounding-box range join), and closeness
centrality on the sparsified trade graph (recursive-CTE oracle).

Every entry follows the registry discipline (registry.py module
docstring): identical aliases both sides, epsilon-shifted rounding on
floats, deterministic total orders for every rank/tiebreak, and the
dtype rule the r11 flip added (tests mirror tools/check.py's strict
dtype comparison — int32-vs-int64 drift fails in staging, not at the
driver).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ror_etl_spark.tables import Tables

QueryFn = Callable[[SparkSession, str], DataFrame]

STAGED: dict[str, tuple[QueryFn, str | None]] = {}


def staged(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in STAGED:
            raise ValueError(f"duplicate staged query: {name}")
        STAGED[name] = (fn, " ".join(oracle.split()) if oracle else None)
        return fn

    return deco


def register() -> None:
    """r12 switch: move every staged query into the live registry."""
    from ror_etl_spark.registry import query

    for name, (fn, oracle) in STAGED.items():
        query(name, oracle=oracle)(fn)


# Engine-portable Lehmer stream (same constants as staged_r11's A-Res
# sampler): exact int64 arithmetic on both engines, no RNG state.
_LEHMER_M = 2147483647  # 2^31 - 1 (Park-Miller modulus)
_LEHMER_A = 48271


def _lehmer_u(key):
    """U(0,1) strictly inside the open interval, from an integer column.

    TWO Lehmer steps, not one: group keys here are small integers
    (day×type → ≤ a few hundred), and one multiply leaves u ≈ k·A/M — a
    tiny, monotone value, so inverse-CDF draws (the Laplace noise) land
    deep in one tail (caught by test_dp_noise_is_laplace_shaped). The
    second step mixes the low-entropy key across the modulus. Max
    intermediate is M·A < 1.04e14 — exact int64 on both engines."""
    x1 = ((key + 1) % _LEHMER_M) * _LEHMER_A % _LEHMER_M
    return (x1 * _LEHMER_A % _LEHMER_M + 0.5) / float(_LEHMER_M)


def _lehmer_u_sql(key_expr: str) -> str:
    x1 = f"(((({key_expr}) + 1) % {_LEHMER_M}) * {_LEHMER_A} % {_LEHMER_M})"
    return f"({x1} * {_LEHMER_A} % {_LEHMER_M} + 0.5) / {_LEHMER_M}.0"


# ---------------------------------------------------------------------------
# Privacy risk audits: k-anonymity, l-diversity, DP release counts
# ---------------------------------------------------------------------------


@staged(
    "k_anonymity_customer_qi",
    oracle="""
    WITH qi AS (
      SELECT c_nationkey, c_mktsegment,
             CAST(floor(c_acctbal / 2000.0) AS BIGINT) AS bal_band,
             count(*) AS grp_n
      FROM customer GROUP BY 1, 2, 3),
    tot AS (SELECT CAST(sum(grp_n) AS DOUBLE) AS n FROM qi),
    ks AS (SELECT unnest([2, 5, 10, 20]) AS k)
    SELECT ks.k AS k,
           CAST(coalesce(sum(CASE WHEN qi.grp_n < ks.k THEN 1 END), 0)
                AS BIGINT) AS groups_below,
           CAST(coalesce(sum(CASE WHEN qi.grp_n < ks.k THEN qi.grp_n END), 0)
                AS BIGINT) AS rows_at_risk,
           round(coalesce(sum(CASE WHEN qi.grp_n < ks.k THEN qi.grp_n END), 0)
                 / min(tot.n) + 1e-9, 6) AS risk_share
    FROM ks CROSS JOIN qi CROSS JOIN tot
    GROUP BY ks.k ORDER BY k
    """,
)
def k_anonymity_customer_qi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit of the customer table under the quasi-identifier
    (nation, market segment, 2000-unit balance band): for each policy
    threshold k ∈ {2,5,10,20}, how many QI equivalence classes fall below
    k and what share of rows they re-identify (Sweeney's k-anonymity —
    a row is at risk when its QI class has < k members). The release
    gate a data platform runs before publishing user-derived tables.

    Scale shape: one groupBy over the QI (partial agg does the work
    map-side; QI cardinality ≪ rows), then a 4×|QI| broadcast cross
    join against the threshold ladder — the fact table is touched once."""
    c = Tables(spark, sf_dir).customer
    qi = c.groupBy(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 2000.0).cast("long").alias("bal_band"),
    ).agg(F.count(F.lit(1)).alias("grp_n"))
    ks = spark.range(1).select(
        F.explode(F.array(*[F.lit(k) for k in (2, 5, 10, 20)])).alias("k")
    )
    tot = qi.agg(F.sum("grp_n").cast("double").alias("n"))
    at_risk = F.when(F.col("grp_n") < F.col("k"), F.col("grp_n"))
    return (
        ks.crossJoin(qi)
        .crossJoin(F.broadcast(tot))
        .groupBy("k")
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("grp_n") < F.col("k"), 1)), F.lit(0)
            ).alias("groups_below"),
            F.coalesce(F.sum(at_risk), F.lit(0)).alias("rows_at_risk"),
            F.round(
                F.coalesce(F.sum(at_risk), F.lit(0)) / F.min("n") + 1e-9, 6
            ).alias("risk_share"),
        )
        .orderBy("k")
    )


@staged(
    "l_diversity_order_priority",
    oracle="""
    WITH joined AS (
      SELECT c.c_nationkey, c.c_mktsegment, o.o_orderpriority
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
    grp AS (
      SELECT c_nationkey, c_mktsegment,
             count(*) AS grp_n,
             count(DISTINCT o_orderpriority) AS l
      FROM joined GROUP BY 1, 2)
    SELECT CAST(count(*) AS BIGINT) AS n_groups,
           CAST(min(l) AS BIGINT) AS min_l,
           CAST(sum(CASE WHEN l < 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS groups_l_below_2,
           CAST(sum(CASE WHEN l < 3 THEN 1 ELSE 0 END) AS BIGINT)
             AS groups_l_below_3,
           CAST(sum(CASE WHEN l < 3 THEN grp_n ELSE 0 END) AS BIGINT)
             AS rows_l_below_3,
           round(avg(CAST(l AS DOUBLE)) + 1e-9, 6) AS avg_l
    FROM grp
    """,
)
def l_diversity_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit (Machanavajjhala et al.): within each
    quasi-identifier class (customer nation × segment), how many DISTINCT
    values of the sensitive attribute (order priority) appear — a class
    that is k-anonymous but 1-diverse still leaks the sensitive value of
    every member. Reports the min/avg l and the classes (and row mass)
    below l ∈ {2,3}. Complements ``k_anonymity_customer_qi``: k bounds
    re-identification, l bounds attribute disclosure.

    Scale shape: fact⋈dim join (orders to customer — at 100 TB both
    shuffle on custkey, or the customer side broadcasts per-partition),
    then a two-level aggregate whose first level (QI × sensitive) is
    partial-agg friendly; distinct-count per QI rides the same shuffle."""
    t = Tables(spark, sf_dir)
    joined = t.orders.join(
        t.customer, F.col("o_custkey") == F.col("c_custkey")
    ).select("c_nationkey", "c_mktsegment", "o_orderpriority")
    grp = joined.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("grp_n"),
        F.countDistinct("o_orderpriority").alias("l"),
    )
    return grp.agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.min("l").alias("min_l"),
        F.sum(F.when(F.col("l") < 2, 1).otherwise(0)).alias("groups_l_below_2"),
        F.sum(F.when(F.col("l") < 3, 1).otherwise(0)).alias("groups_l_below_3"),
        F.sum(F.when(F.col("l") < 3, F.col("grp_n")).otherwise(0)).alias(
            "rows_l_below_3"
        ),
        F.round(F.avg(F.col("l").cast("double")) + 1e-9, 6).alias("avg_l"),
    )


@staged(
    "dp_noisy_counts_laplace",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(date_diff('day', TIMESTAMP '2024-01-01', ts) AS BIGINT)
               AS day_idx,
             event_type, count(*) AS true_n
      FROM events GROUP BY 1, 2),
    keyed AS (
      SELECT day_idx, event_type, true_n,
             {_lehmer_u_sql("day_idx * 31 + length(event_type) * 7")} AS u
      FROM daily),
    noised AS (
      SELECT day_idx, event_type, true_n,
             -1.0 * CASE WHEN u < 0.5 THEN -1.0 ELSE 1.0 END
               * ln(1.0 - 2.0 * abs(u - 0.5)) AS noise
      FROM keyed)
    SELECT day_idx, event_type, CAST(true_n AS BIGINT) AS true_n,
           round(true_n + noise + 1e-9, 4) AS released_n,
           round(abs(noise) + 1e-9, 4) AS abs_noise
    FROM noised ORDER BY day_idx, event_type
    """,
)
def dp_noisy_counts_laplace(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ε-differentially-private release of the daily event-type counts:
    Laplace mechanism with sensitivity 1 and ε = 1, noise b·sgn(0.5−u)·
    ln(1−2|u−0.5|) with b = 1/ε — the inverse-CDF form, driven by the
    engine-portable Lehmer uniform keyed on (day, type-length) so both
    engines draw the IDENTICAL noise stream (reproducible-release mode;
    a production deployment swaps the keyed stream for a secret-seeded
    one, same plan). The release a platform publishes instead of raw
    per-day usage counts.

    Scale shape: one groupBy (partial-agg) over day×type — noise is a
    per-GROUP scalar map, so the mechanism costs nothing beyond the
    aggregate it protects; no shuffle is added."""
    e = Tables(spark, sf_dir).events
    daily = e.groupBy(
        F.datediff(
            F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")
        )
        .cast("long")
        .alias("day_idx"),
        "event_type",
    ).agg(F.count(F.lit(1)).alias("true_n"))
    u = _lehmer_u(F.col("day_idx") * 31 + F.length("event_type") * 7)
    noise = (
        F.lit(-1.0)
        * F.when(u < 0.5, F.lit(-1.0)).otherwise(F.lit(1.0))
        * F.log(F.lit(1.0) - 2.0 * F.abs(u - 0.5))
    )
    return (
        daily.select(
            "day_idx",
            "event_type",
            F.col("true_n").alias("true_n"),
            F.round(F.col("true_n") + noise + 1e-9, 4).alias("released_n"),
            F.round(F.abs(noise) + 1e-9, 4).alias("abs_noise"),
        )
        .orderBy("day_idx", "event_type")
    )


# ---------------------------------------------------------------------------
# Leakage-safe tabular feature engineering
# ---------------------------------------------------------------------------


@staged(
    "target_encoding_smoothed",
    oracle="""
    WITH joined AS (
      SELECT c.c_mktsegment AS seg, o.o_totalprice AS y
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
    g AS (SELECT seg, count(*) AS n, avg(y) AS seg_mean FROM joined
          GROUP BY seg),
    gl AS (SELECT avg(y) AS gmean FROM joined)
    SELECT g.seg AS seg, CAST(g.n AS BIGINT) AS n,
           round(g.seg_mean + 1e-9, 4) AS seg_mean,
           round((g.n * g.seg_mean + 50.0 * gl.gmean) / (g.n + 50.0)
                 + 1e-9, 4) AS encoded,
           round(abs(g.seg_mean - gl.gmean) + 1e-9, 4) AS shift_raw
    FROM g CROSS JOIN gl ORDER BY seg
    """,
)
def target_encoding_smoothed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """m-estimate (smoothed) target encoding of the customer market
    segment against order value: encoded = (n·mean_seg + m·mean_global)
    / (n + m) with m = 50 — the standard high-cardinality categorical
    feature for gradient-boosted models, shrunk toward the prior so
    rare categories don't memorize their few labels. Reports raw vs
    encoded means so the shrinkage is visible.

    Scale shape: fact⋈dim join then one tiny groupBy(segment) plus a
    broadcast global scalar — the encode table this produces is itself
    a broadcast-side dim for the downstream feature join."""
    t = Tables(spark, sf_dir)
    joined = t.orders.join(
        t.customer, F.col("o_custkey") == F.col("c_custkey")
    ).select(F.col("c_mktsegment").alias("seg"), F.col("o_totalprice").alias("y"))
    g = joined.groupBy("seg").agg(
        F.count(F.lit(1)).alias("n"), F.avg("y").alias("seg_mean")
    )
    glob = joined.agg(F.avg("y").alias("gmean"))
    return (
        g.crossJoin(F.broadcast(glob))
        .select(
            "seg",
            "n",
            F.round(F.col("seg_mean") + 1e-9, 4).alias("seg_mean"),
            F.round(
                (F.col("n") * F.col("seg_mean") + 50.0 * F.col("gmean"))
                / (F.col("n") + 50.0)
                + 1e-9,
                4,
            ).alias("encoded"),
            F.round(F.abs(F.col("seg_mean") - F.col("gmean")) + 1e-9, 4).alias(
                "shift_raw"
            ),
        )
        .orderBy("seg")
    )


@staged(
    "woe_iv_acctbal_band",
    oracle="""
    WITH lab AS (
      SELECT c.c_custkey,
             least(greatest(CAST(floor((c.c_acctbal + 1000.0) / 1200.0)
                                 AS BIGINT), 0), 9) AS band,
             CASE WHEN max(CASE WHEN o.o_orderpriority = '1-URGENT'
                           THEN 1 ELSE 0 END) = 1
                  THEN 1 ELSE 0 END AS y
      FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY c.c_custkey, band),
    g AS (
      SELECT band,
             sum(y) + 0.5 AS good,
             sum(1 - y) + 0.5 AS bad
      FROM lab GROUP BY band),
    tot AS (SELECT sum(good) AS tg, sum(bad) AS tb FROM g),
    woe AS (
      SELECT g.band, g.good, g.bad,
             ln((g.good / tot.tg) / (g.bad / tot.tb)) AS w,
             (g.good / tot.tg - g.bad / tot.tb)
               * ln((g.good / tot.tg) / (g.bad / tot.tb)) AS iv_term
      FROM g CROSS JOIN tot)
    SELECT CAST(band AS BIGINT) AS band,
           CAST(good - 0.5 AS BIGINT) AS n_pos,
           CAST(bad - 0.5 AS BIGINT) AS n_neg,
           round(w + 1e-9, 6) AS woe,
           round(sum(iv_term) OVER () + 1e-9, 6) AS iv_total
    FROM woe ORDER BY band
    """,
)
def woe_iv_acctbal_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-of-evidence / information-value binning (the credit-
    scorecard feature screen): bin account balance into 10 fixed-width
    bands, label each customer 1 if they ever placed an URGENT-priority
    order, and compute per-band WOE = ln((pos_share)/(neg_share)) with
    a 0.5 continuity correction, plus the total IV (Σ (Δshare)·WOE) that
    ranks the feature's predictive strength (rule of thumb: IV > 0.3 =
    strong). The per-customer label is a LEFT join so order-less
    customers count as negatives.

    Scale shape: dim⋈fact left join aggregated per customer (one
    shuffle on custkey), then a 10-key groupBy; the IV total is a
    window over 10 rows — bounded frame, no single-task risk."""
    t = Tables(spark, sf_dir)
    lab = (
        t.customer.join(
            t.orders, F.col("o_custkey") == F.col("c_custkey"), "left"
        )
        .groupBy(
            "c_custkey",
            F.least(
                F.greatest(
                    F.floor((F.col("c_acctbal") + 1000.0) / 1200.0).cast("long"),
                    F.lit(0).cast("long"),
                ),
                F.lit(9).cast("long"),
            ).alias("band"),
        )
        .agg(
            F.max(
                F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0)
            ).alias("y")
        )
    )
    g = lab.groupBy("band").agg(
        (F.sum("y") + 0.5).alias("good"),
        (F.sum(F.lit(1) - F.col("y")) + 0.5).alias("bad"),
    )
    tot = g.agg(F.sum("good").alias("tg"), F.sum("bad").alias("tb"))
    woe = g.crossJoin(F.broadcast(tot)).select(
        "band",
        "good",
        "bad",
        F.log((F.col("good") / F.col("tg")) / (F.col("bad") / F.col("tb"))).alias(
            "w"
        ),
        (
            (F.col("good") / F.col("tg") - F.col("bad") / F.col("tb"))
            * F.log(
                (F.col("good") / F.col("tg")) / (F.col("bad") / F.col("tb"))
            )
        ).alias("iv_term"),
    )
    return (
        woe.select(
            "band",
            (F.col("good") - 0.5).cast("long").alias("n_pos"),
            (F.col("bad") - 0.5).cast("long").alias("n_neg"),
            F.round(F.col("w") + 1e-9, 6).alias("woe"),
            F.round(
                F.sum("iv_term").over(
                    Window.rowsBetween(
                        Window.unboundedPreceding, Window.unboundedFollowing
                    )
                )
                + 1e-9,
                6,
            ).alias("iv_total"),
        )
        .orderBy("band")
    )


@staged(
    "vif_lineitem_factors",
    oracle="""
    WITH st AS (
      SELECT corr(l_quantity, l_extendedprice) AS r12,
             corr(l_quantity, l_discount) AS r13,
             corr(l_extendedprice, l_discount) AS r23,
             count(*) AS n
      FROM lineitem),
    d AS (
      SELECT n, r12, r13, r23,
             1 + 2 * r12 * r13 * r23 - r12 * r12 - r13 * r13 - r23 * r23
               AS det
      FROM st)
    SELECT CAST(n AS BIGINT) AS n,
           round((1 - r23 * r23) / det + 1e-9, 6) AS vif_quantity,
           round((1 - r13 * r13) / det + 1e-9, 6) AS vif_extendedprice,
           round((1 - r12 * r12) / det + 1e-9, 6) AS vif_discount,
           round(det + 1e-9, 6) AS corr_det
    FROM d
    """,
)
def vif_lineitem_factors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variance inflation factors for the three lineitem regressors
    (quantity, extended price, discount) via the closed-form inverse of
    the 3×3 correlation matrix: VIF_i = R⁻¹_ii, with det(R) = 1 +
    2·r₁₂r₁₃r₂₃ − Σr². The multicollinearity screen run before any OLS
    on these factors (VIF > 5–10 = the coefficient is unstable);
    complements the registered ``correlation_matrix_lineitem`` (raw
    pairwise r) by reporting the quantity a modeler actually gates on.

    Scale shape: one pass of partial-aggregated co-moments (Catalyst
    computes all three corr() in a single scan), then scalar math —
    nothing but the scan touches data."""
    li = Tables(spark, sf_dir).lineitem
    st = li.agg(
        F.corr("l_quantity", "l_extendedprice").alias("r12"),
        F.corr("l_quantity", "l_discount").alias("r13"),
        F.corr("l_extendedprice", "l_discount").alias("r23"),
        F.count(F.lit(1)).alias("n"),
    )
    det = (
        1
        + 2 * F.col("r12") * F.col("r13") * F.col("r23")
        - F.col("r12") * F.col("r12")
        - F.col("r13") * F.col("r13")
        - F.col("r23") * F.col("r23")
    )
    return st.select(
        "n",
        F.round((1 - F.col("r23") * F.col("r23")) / det + 1e-9, 6).alias(
            "vif_quantity"
        ),
        F.round((1 - F.col("r13") * F.col("r13")) / det + 1e-9, 6).alias(
            "vif_extendedprice"
        ),
        F.round((1 - F.col("r12") * F.col("r12")) / det + 1e-9, 6).alias(
            "vif_discount"
        ),
        F.round(det + 1e-9, 6).alias("corr_det"),
    )


@staged(
    "partial_corr_qty_price_disc",
    oracle="""
    WITH st AS (
      SELECT corr(l_quantity, l_extendedprice) AS rxy,
             corr(l_quantity, l_discount) AS rxz,
             corr(l_extendedprice, l_discount) AS ryz,
             count(*) AS n
      FROM lineitem)
    SELECT CAST(n AS BIGINT) AS n,
           round(rxy + 1e-9, 6) AS r_raw,
           round((rxy - rxz * ryz)
                 / sqrt((1 - rxz * rxz) * (1 - ryz * ryz)) + 1e-9, 6)
             AS r_partial,
           round(abs(rxy - (rxy - rxz * ryz)
                 / sqrt((1 - rxz * rxz) * (1 - ryz * ryz))) + 1e-9, 6)
             AS confounding_shift
    FROM st
    """,
)
def partial_corr_qty_price_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order partial correlation of quantity and extended price
    CONTROLLING for discount: r_xy·z = (r_xy − r_xz·r_yz) /
    √((1−r_xz²)(1−r_yz²)) — the screen that separates a direct
    association from one routed through a shared driver. Reports raw vs
    partial r and the confounding shift |Δ|.

    Scale shape: identical to ``vif_lineitem_factors`` — one scan of
    co-moments, scalar closed form after."""
    li = Tables(spark, sf_dir).lineitem
    st = li.agg(
        F.corr("l_quantity", "l_extendedprice").alias("rxy"),
        F.corr("l_quantity", "l_discount").alias("rxz"),
        F.corr("l_extendedprice", "l_discount").alias("ryz"),
        F.count(F.lit(1)).alias("n"),
    )
    partial = (F.col("rxy") - F.col("rxz") * F.col("ryz")) / F.sqrt(
        (1 - F.col("rxz") * F.col("rxz")) * (1 - F.col("ryz") * F.col("ryz"))
    )
    return st.select(
        "n",
        F.round(F.col("rxy") + 1e-9, 6).alias("r_raw"),
        F.round(partial + 1e-9, 6).alias("r_partial"),
        F.round(F.abs(F.col("rxy") - partial) + 1e-9, 6).alias(
            "confounding_shift"
        ),
    )


@staged(
    "conformal_interval_totalprice",
    oracle="""
    WITH base AS (
      SELECT o_orderkey, o_orderpriority AS p, o_totalprice AS y,
             o_orderkey % 3 AS fold
      FROM orders),
    mu AS (
      SELECT p, avg(y) AS pred FROM base WHERE fold = 0 GROUP BY p),
    calib AS (
      SELECT abs(b.y - mu.pred) AS score
      FROM base b JOIN mu ON b.p = mu.p WHERE b.fold = 1),
    q AS (
      SELECT quantile_disc(score, 0.9) AS qhat,
             count(*) AS n_calib
      FROM calib),
    test AS (
      SELECT CASE WHEN abs(b.y - mu.pred) <= q.qhat THEN 1.0 ELSE 0.0 END
               AS covered
      FROM base b JOIN mu ON b.p = mu.p CROSS JOIN q WHERE b.fold = 2)
    SELECT CAST(min(q.n_calib) AS BIGINT) AS n_calib,
           CAST(count(*) AS BIGINT) AS n_test,
           round(min(q.qhat) + 1e-9, 4) AS qhat,
           round(avg(covered) + 1e-9, 6) AS coverage
    FROM test CROSS JOIN q
    """,
)
def conformal_interval_totalprice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal prediction interval for order value: fold 0
    (orderkey mod 3) fits the per-priority mean model, fold 1 computes
    the 0.9-quantile q̂ of absolute residuals (the conformal score), and
    fold 2 reports empirical coverage of pred ± q̂ — the distribution-
    free ~90% guarantee that holds regardless of the model. The
    uncertainty wrapper a platform puts around any point predictor; the
    discrete quantile (quantile_disc / percentile with exact rank) keeps
    both engines on the identical order statistic.

    Scale shape: the 'model' is a 5-row broadcast dim; calibration is
    one aggregate; coverage is one more scan — three passes, no
    all-pairs anything."""
    o = Tables(spark, sf_dir).orders
    base = o.select(
        "o_orderkey",
        F.col("o_orderpriority").alias("p"),
        F.col("o_totalprice").alias("y"),
        (F.col("o_orderkey") % 3).alias("fold"),
    )
    mu = base.filter(F.col("fold") == 0).groupBy("p").agg(
        F.avg("y").alias("pred")
    )
    calib = (
        base.filter(F.col("fold") == 1)
        .join(F.broadcast(mu), "p")
        .select(F.abs(F.col("y") - F.col("pred")).alias("score"))
    )
    q = calib.agg(
        F.expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY score)").alias(
            "qhat"
        ),
        F.count(F.lit(1)).alias("n_calib"),
    )
    test = (
        base.filter(F.col("fold") == 2)
        .join(F.broadcast(mu), "p")
        .crossJoin(F.broadcast(q))
        .select(
            F.when(
                F.abs(F.col("y") - F.col("pred")) <= F.col("qhat"), 1.0
            )
            .otherwise(0.0)
            .alias("covered"),
            "n_calib",
            "qhat",
        )
    )
    return test.agg(
        F.min("n_calib").alias("n_calib"),
        F.count(F.lit(1)).alias("n_test"),
        F.round(F.min("qhat") + 1e-9, 4).alias("qhat"),
        F.round(F.avg("covered") + 1e-9, 6).alias("coverage"),
    )
