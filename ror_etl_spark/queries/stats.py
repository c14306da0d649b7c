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


def _hex_boundary(t: float) -> str:
    """Smallest 52-bit integer h with h / 2^52 >= t, as the 13-char
    lowercase hex string md5 substrings compare against (r12
    optimization round). Because _SCALE is a power of two the division
    h / _SCALE is EXACT for every h < 2^52, so `u < t` over the derived
    double u is equivalent to `h < boundary` over the integer — and a
    fixed-width lowercase hex string orders lexicographically exactly
    as its numeric value, so the comparison runs directly on the md5
    substring with no conv()/division (which together cost as much as
    the md5 itself on the 4.8M-row bootstrap fan-out)."""
    lo, hi = 0, 1 << 52
    while lo < hi:
        mid = (lo + hi) // 2
        if mid / _SCALE >= t:
            hi = mid
        else:
            lo = mid + 1
    return format(lo, "013x")


def _poisson_case_hex_sql(h: str) -> str:
    branches = " ".join(
        f"WHEN {h} < '{_hex_boundary(float(t))}' THEN {w}" for t, w in _P_THRESH
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
    B×n_partitions partial states, no resampling join.

    r12 optimization round: the Poisson weight comes from comparing the
    13-char md5 hex substring directly against precomputed hex
    boundaries (``_hex_boundary``) — per-row w values identical to the
    conv(hex)/2^52 < t formulation (pinned by
    test_bootstrap_hex_case_matches_u_case), with the conv() and the
    division gone from the 4.8M-row fan-out."""
    o = Tables(spark, sf_dir).orders
    h = F.substring(
        F.md5(
            F.concat_ws(
                ":",
                F.col("o_orderkey").cast("string"),
                F.col("b").cast("string"),
            )
        ),
        1,
        13,
    )
    fan = o.select(
        F.col("o_totalprice").alias("x"),
        F.col("o_orderkey"),
        F.explode(F.sequence(F.lit(0), F.lit(_B - 1))).alias("b"),
    ).select("b", "x", h.alias("h"))
    w = fan.select("b", "x", F.expr(_poisson_case_hex_sql("h")).alias("w"))
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


@query(
    "ab_welch_ttest",
    oracle="""
    WITH g AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             round(avg(value) + 1e-9, 6) AS m,
             round(var_samp(value) + 1e-9, 6) AS v
      FROM events WHERE event_type IN ('click', 'purchase')
      GROUP BY event_type),
    w AS (
      SELECT
        (SELECT n FROM g WHERE event_type = 'click') AS n1,
        (SELECT m FROM g WHERE event_type = 'click') AS m1,
        (SELECT v FROM g WHERE event_type = 'click') AS v1,
        (SELECT n FROM g WHERE event_type = 'purchase') AS n2,
        (SELECT m FROM g WHERE event_type = 'purchase') AS m2,
        (SELECT v FROM g WHERE event_type = 'purchase') AS v2)
    SELECT n1, m1, v1, n2, m2, v2,
           round((m1 - m2) / sqrt(v1 / n1 + v2 / n2) + 1e-9, 4) AS t_stat,
           round(((v1 / n1 + v2 / n2) * (v1 / n1 + v2 / n2))
                 / ((v1 / n1) * (v1 / n1) / (n1 - 1)
                    + (v2 / n2) * (v2 / n2) / (n2 - 1)) + 1e-9, 2)
             AS dof_welch
    FROM w
    """,
    priority=5,
)
def ab_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test between two event cohorts (the
    A/B-test significance primitive): t statistic and Welch-Satterthwaite
    degrees of freedom from per-cohort (n, mean, sample variance).

    Everything is closed-form over ONE partial+final aggregation per
    cohort — the 100 TB plan is two map-side-combinable aggregates and a
    scalar join; no row ever leaves its partition unaggregated. Floating
    determinism: mean and variance are rounded (epsilon-shifted) to 6 dp
    BEFORE the t/dof arithmetic, so both engines feed bit-identical
    operands into a +-*/+sqrt pipeline (all IEEE-754 correctly-rounded
    ops — sqrt included — unlike ln/pow); the result is deterministic,
    not merely close. The p-value needs an incomplete-beta special
    function — out of scope for a SQL-replayable twin; t and dof are the
    decision statistics."""
    e = Tables(spark, sf_dir).events
    g = (
        e.where(F.col("event_type").isin("click", "purchase"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("value") + 1e-9, 6).alias("m"),
            F.round(F.var_samp("value") + 1e-9, 6).alias("v"),
        )
    )
    a = g.where(F.col("event_type") == "click").select(
        F.col("n").alias("n1"), F.col("m").alias("m1"), F.col("v").alias("v1")
    )
    b = g.where(F.col("event_type") == "purchase").select(
        F.col("n").alias("n2"), F.col("m").alias("m2"), F.col("v").alias("v2")
    )
    se1 = F.col("v1") / F.col("n1")
    se2 = F.col("v2") / F.col("n2")
    return a.crossJoin(b).select(
        "n1",
        "m1",
        "v1",
        "n2",
        "m2",
        "v2",
        F.round(
            (F.col("m1") - F.col("m2")) / F.sqrt(se1 + se2) + 1e-9, 4
        ).alias("t_stat"),
        F.round(
            ((se1 + se2) * (se1 + se2))
            / (se1 * se1 / (F.col("n1") - 1) + se2 * se2 / (F.col("n2") - 1))
            + 1e-9,
            2,
        ).alias("dof_welch"),
    )


@query(
    "chisq_event_type_value_band",
    oracle="""
    WITH cells AS (
      SELECT event_type AS et,
             CAST(least(floor(value / 50.0), 4) AS BIGINT) AS band,
             CAST(count(*) AS BIGINT) AS o
      FROM events GROUP BY 1, 2),
    rt AS (SELECT et, sum(o) AS r FROM cells GROUP BY et),
    ct AS (SELECT band, sum(o) AS c FROM cells GROUP BY band),
    n AS (SELECT sum(o) AS n FROM cells),
    terms AS (
      SELECT (cells.o - CAST(rt.r AS DOUBLE) * ct.c / n.n)
             * (cells.o - CAST(rt.r AS DOUBLE) * ct.c / n.n)
             / (CAST(rt.r AS DOUBLE) * ct.c / n.n) AS t
      FROM cells JOIN rt ON cells.et = rt.et
      JOIN ct ON cells.band = ct.band CROSS JOIN n)
    SELECT round(sum(t) + 1e-9, 4) AS chi2,
           (SELECT CAST((count(*) - 1) AS BIGINT) FROM rt)
             * (SELECT CAST((count(*) - 1) AS BIGINT) FROM ct) AS dof
    FROM terms
    """,
    priority=5,
)
def chisq_event_type_value_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square test of independence over the event_type x
    value-band contingency table — the categorical-association twin of
    ab_welch_ttest. Bands are fixed-width floor buckets (no quantiles:
    band EDGES must be integer-exact in both engines), expected counts
    are the rank-1 margin product r*c/N.

    One aggregation builds the cell counts (map-side combinable; the
    table is category-domain-sized, never data-sized), margins reduce
    from the CELLS rather than rescanning, and the statistic is a sum
    of rationals of exact integers — double arithmetic happens only on
    aggregated values, identically shaped on both sides. Sum order over
    the <= 25 cells is the one nondeterminism; the epsilon-shifted
    4 dp round absorbs it."""
    e = Tables(spark, sf_dir).events
    cells = (
        e.groupBy(
            F.col("event_type").alias("et"),
            F.least(F.floor(F.col("value") / 50.0), F.lit(4))
            .cast("long")
            .alias("band"),
        )
        .agg(F.count(F.lit(1)).alias("o"))
    )
    rt = cells.groupBy("et").agg(F.sum("o").alias("r"))
    ct = cells.groupBy("band").agg(F.sum("o").alias("c"))
    n = cells.agg(F.sum("o").alias("n"))
    exp = F.col("r").cast("double") * F.col("c") / F.col("n")
    terms = (
        cells.join(F.broadcast(rt), "et")
        .join(F.broadcast(ct), "band")
        .crossJoin(F.broadcast(n))
        .select(((F.col("o") - exp) * (F.col("o") - exp) / exp).alias("t"))
    )
    dof = (
        rt.agg((F.count(F.lit(1)) - 1).alias("dr"))
        .crossJoin(ct.agg((F.count(F.lit(1)) - 1).alias("dc")))
        .select((F.col("dr") * F.col("dc")).alias("dof"))
    )
    return terms.agg(F.round(F.sum("t") + 1e-9, 4).alias("chi2")).crossJoin(
        F.broadcast(dof)
    )


@query(
    "benford_first_digit_totalprice",
    oracle="""
    WITH d AS (
      SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR),
                         1, 1) AS BIGINT) AS digit
      FROM orders WHERE o_totalprice >= 1),
    c AS (SELECT digit, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY digit),
    t AS (SELECT sum(n) AS tot FROM c)
    SELECT c.digit, c.n,
           round(CAST(c.n AS DOUBLE) / t.tot + 1e-9, 6) AS observed,
           round(log10(1.0 + 1.0 / c.digit) + 1e-9, 6) AS benford,
           round((CAST(c.n AS DOUBLE) / t.tot - log10(1.0 + 1.0 / c.digit))
                 * (CAST(c.n AS DOUBLE) / t.tot - log10(1.0 + 1.0 / c.digit))
                 / log10(1.0 + 1.0 / c.digit) + 1e-9, 6) AS chi_term
    FROM c CROSS JOIN t ORDER BY c.digit
    """,
    priority=5,
)
def benford_first_digit_totalprice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit profile of order totals — the classic
    fraud/data-quality screen: natural multiplicative quantities put
    ~30.1% of leading digits at 1, and fabricated or truncated data
    doesn't. Reports per-digit observed vs log10(1 + 1/d) expected
    frequency and the chi-square contribution.

    The leading digit is string-sliced from the integer part (exact in
    both engines — no float log10 of the VALUE, whose floor can
    misclassify at power-of-ten boundaries; log10 appears only on the
    nine literal digit constants, epsilon-rounded). One domain-sized
    (9-row) aggregate; entirely map-side combinable."""
    o = Tables(spark, sf_dir).orders
    d = o.where(F.col("o_totalprice") >= 1).select(
        F.substring(
            F.floor("o_totalprice").cast("long").cast("string"), 1, 1
        )
        .cast("long")
        .alias("digit")
    )
    c = d.groupBy("digit").agg(F.count(F.lit(1)).alias("n"))
    t = c.agg(F.sum("n").alias("tot"))
    obs = F.col("n").cast("double") / F.col("tot")
    ben = F.log10(1.0 + 1.0 / F.col("digit"))
    return (
        c.crossJoin(F.broadcast(t))
        .select(
            "digit",
            "n",
            F.round(obs + 1e-9, 6).alias("observed"),
            F.round(ben + 1e-9, 6).alias("benford"),
            F.round((obs - ben) * (obs - ben) / ben + 1e-9, 6).alias(
                "chi_term"
            ),
        )
        .orderBy("digit")
    )


@query(
    "auc_doclen_vs_lang",
    oracle="""
    WITH g AS (
      SELECT n_chars AS s, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
               AS npos
      FROM documents GROUP BY n_chars),
    c AS (
      SELECT s, n, npos,
             CAST(coalesce(sum(n) OVER (ORDER BY s
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS BIGINT) AS cum
      FROM g),
    r AS (
      SELECT CAST(sum(npos * (2 * cum + n + 1)) AS BIGINT) AS r2,
             CAST(sum(npos) AS BIGINT) AS np,
             CAST(sum(n - npos) AS BIGINT) AS nn
      FROM c)
    SELECT np AS n_pos, nn AS n_neg,
           round((CAST(r2 AS DOUBLE) / 2.0 - CAST(np AS DOUBLE) * (np + 1) / 2.0)
                 / (CAST(np AS DOUBLE) * nn) + 1e-9, 6) AS auc
    FROM r
    """,
    priority=5,
)
def auc_doclen_vs_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed ROC-AUC via the Mann-Whitney rank-sum identity —
    the standard binary-classifier evaluation at corpus scale ("does
    document length separate English from the rest" as the stand-in
    scorer). AUC = (R+ - n+(n+ + 1)/2) / (n+ n-), with R+ the sum of
    the positives' AVERAGE ranks (ties share the mean of their rank
    block — required for the probabilistic AUC interpretation).

    No per-row global sort: scores collapse to per-VALUE counts first
    (map-side combinable; the frame is score-domain-sized), then the
    exclusive running count comes from operators/util.global_cumsum
    (range partition + carry-ins, never a single-task window). The tie
    block's average rank is kept integer-exact by doubling:
    2*avgrank = 2*cum + n + 1, so R2 = sum(npos * (2 cum + n + 1)) is
    an exact BIGINT and the single final division is the only float op.
    The oracle states the same identity with DuckDB's own window."""
    from ror_etl_spark.operators.util import global_cumsum

    d = Tables(spark, sf_dir).documents
    g = d.groupBy(F.col("n_chars").alias("s")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).alias("npos"),
    )
    c = global_cumsum(g, ["s"], "n", out="cum")
    r = c.agg(
        F.sum(F.col("npos") * (2 * F.col("cum") + F.col("n") + 1)).alias("r2"),
        F.sum("npos").alias("np"),
        F.sum(F.col("n") - F.col("npos")).alias("nn"),
    )
    return r.select(
        F.col("np").alias("n_pos"),
        F.col("nn").alias("n_neg"),
        F.round(
            (F.col("r2").cast("double") / 2.0
             - F.col("np").cast("double") * (F.col("np") + 1) / 2.0)
            / (F.col("np").cast("double") * F.col("nn"))
            + 1e-9,
            6,
        ).alias("auc"),
    )


@query(
    "best_split_gini_totalprice",
    oracle="""
    WITH g AS (
      SELECT o_totalprice AS v, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
                  AS BIGINT) AS npos
      FROM orders GROUP BY o_totalprice),
    c AS (
      SELECT v, n, npos,
             CAST(sum(n) OVER w AS BIGINT) AS nl,
             CAST(sum(npos) OVER w AS BIGINT) AS pl
      FROM g WINDOW w AS (ORDER BY v ROWS UNBOUNDED PRECEDING)),
    tot AS (
      SELECT CAST(sum(n) AS BIGINT) AS nn, CAST(sum(npos) AS BIGINT) AS pp
      FROM g),
    sc AS (
      SELECT c.v, c.nl, tot.nn - c.nl AS nr,
             (c.nl - (CAST(c.pl AS DOUBLE) * c.pl
                      + CAST(c.nl - c.pl AS DOUBLE) * (c.nl - c.pl)) / c.nl)
             + ((tot.nn - c.nl)
                - (CAST(tot.pp - c.pl AS DOUBLE) * (tot.pp - c.pl)
                   + CAST((tot.nn - c.nl) - (tot.pp - c.pl) AS DOUBLE)
                     * ((tot.nn - c.nl) - (tot.pp - c.pl)))
                  / (tot.nn - c.nl)) AS score,
             tot.nn AS nn, tot.pp AS pp
      FROM c CROSS JOIN tot WHERE tot.nn - c.nl > 0)
    SELECT v AS threshold, nl AS n_left, nr AS n_right,
           round(score / nn + 1e-9, 6) AS gini_split,
           round(1.0 - (CAST(pp AS DOUBLE) / nn) * (CAST(pp AS DOUBLE) / nn)
                 - (CAST(nn - pp AS DOUBLE) / nn) * (CAST(nn - pp AS DOUBLE) / nn)
                 + 1e-9, 6) AS gini_before
    FROM sc ORDER BY score, v LIMIT 1
    """,
    priority=5,
)
def best_split_gini_totalprice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decision-tree split finding at scale: the order-total threshold
    that best separates finished ('F') orders, by minimum weighted Gini
    impurity — the inner loop of every distributed tree learner
    (Spark MLlib, XGBoost-on-Spark) exposed as a first-class query.

    The textbook trick: sort the distinct feature values once, take
    PREFIX class counts, and every candidate split's left/right class
    tallies fall out of the prefix sums — no per-candidate rescan. The
    prefix counts come from operators/util.global_cumsum (two passes,
    counts and positives), so no single-task window even when the
    feature has data-many distinct values. Scores are rationals of
    exact integer counts through IEEE +-*/ only — bit-identical across
    engines — so the argmin (orderBy + LIMIT 1, a TakeOrdered, with
    the threshold as tiebreak) is deterministic; no ln/log2 enters the
    comparison, which is why Gini rather than information gain is the
    criterion that can cross an exact hash gate."""
    from ror_etl_spark.operators.util import global_cumsum

    o = Tables(spark, sf_dir).orders
    g = o.groupBy(F.col("o_totalprice").alias("v")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)).alias(
            "npos"
        ),
    )
    c = global_cumsum(g, ["v"], "n", out="cn")
    c = (
        global_cumsum(c.select("v", "npos", "cn", "n"), ["v"], "npos", out="cp")
        .select(
            "v",
            (F.col("cn") + F.col("n")).alias("nl"),
            (F.col("cp") + F.col("npos")).alias("pl"),
        )
    )
    tot = g.agg(F.sum("n").alias("nn"), F.sum("npos").alias("pp"))
    sc = c.crossJoin(F.broadcast(tot)).where(F.col("nn") - F.col("nl") > 0)
    nl, pl = F.col("nl"), F.col("pl")
    nr = F.col("nn") - nl
    pr = F.col("pp") - pl
    score = (
        nl
        - (pl.cast("double") * pl + (nl - pl).cast("double") * (nl - pl)) / nl
    ) + (nr - (pr.cast("double") * pr + (nr - pr).cast("double") * (nr - pr)) / nr)
    sc = sc.select(
        F.col("v").alias("threshold"),
        nl.alias("n_left"),
        nr.alias("n_right"),
        score.alias("score"),
        "nn",
        "pp",
    )
    pp_d = F.col("pp").cast("double") / F.col("nn")
    qq_d = (F.col("nn") - F.col("pp")).cast("double") / F.col("nn")
    return (
        sc.orderBy("score", "threshold")
        .limit(1)
        .select(
            "threshold",
            "n_left",
            "n_right",
            F.round(F.col("score") / F.col("nn") + 1e-9, 6).alias("gini_split"),
            F.round(1.0 - pp_d * pp_d - qq_d * qq_d + 1e-9, 6).alias(
                "gini_before"
            ),
        )
    )


@query(
    "changepoint_cusum_daily_revenue",
    oracle="""
    WITH daily AS (
      SELECT date_trunc('day', o_orderdate) AS d,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS rev_c
      FROM orders GROUP BY 1),
    pre AS (
      SELECT d,
             CAST(sum(rev_c) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING)
                  AS BIGINT) AS s,
             CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS k
      FROM daily),
    tot AS (SELECT CAST(sum(rev_c) AS BIGINT) AS t,
                   CAST(count(*) AS BIGINT) AS n FROM daily),
    dev AS (
      SELECT pre.d, pre.k, abs(tot.n * pre.s - pre.k * tot.t) AS drift,
             tot.n, tot.t
      FROM pre CROSS JOIN tot)
    SELECT strftime(d, '%Y-%m-%d') AS change_day,
           k AS day_index, n AS n_days,
           round(CAST(drift AS DOUBLE) / (CAST(n AS DOUBLE) * 100.0) + 1e-9, 2)
             AS max_cusum_dev
    FROM dev ORDER BY drift DESC, d LIMIT 1
    """,
    priority=5,
)
def changepoint_cusum_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point detection over the daily revenue series: the
    day where the cumulative deviation from the series mean peaks —
    the standard first-pass answer to "when did the level shift".

    Exactness architecture: CUSUM_k = S_k - k*T/N involves a division,
    but its ARGMAX does not — maximizing |N*S_k - k*T| over exact
    integer cents gives the identical day with zero float arithmetic
    in the comparison; the float division appears only in the reported
    magnitude, after the argmax is already settled. Prefix sums ride a
    day-granular window (the series is date-domain-sized after one
    map-side aggregate; at 100 TB the daily rollup is the only
    data-sized stage — same contract as the decomposition op)."""
    from pyspark.sql import Window as W

    o = Tables(spark, sf_dir).orders
    daily = o.groupBy(F.date_trunc("day", "o_orderdate").alias("d")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("rev_c")
    )
    w = W.orderBy("d").rowsBetween(W.unboundedPreceding, W.currentRow)
    pre = daily.select(
        "d",
        F.sum("rev_c").over(w).alias("s"),
        F.row_number().over(W.orderBy("d")).cast("long").alias("k"),
    )
    tot = daily.agg(
        F.sum("rev_c").alias("t"), F.count(F.lit(1)).alias("n")
    )
    dev = pre.crossJoin(F.broadcast(tot)).select(
        "d",
        "k",
        "n",
        F.abs(F.col("n") * F.col("s") - F.col("k") * F.col("t")).alias("drift"),
    )
    return (
        dev.orderBy(F.desc("drift"), F.asc("d"))
        .limit(1)
        .select(
            F.date_format("d", "yyyy-MM-dd").alias("change_day"),
            F.col("k").alias("day_index"),
            F.col("n").alias("n_days"),
            F.round(
                F.col("drift").cast("double") / (F.col("n").cast("double") * 100.0)
                + 1e-9,
                2,
            ).alias("max_cusum_dev"),
        )
    )
