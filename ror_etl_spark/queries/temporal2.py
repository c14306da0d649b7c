"""Event-analytics operators over the events table: time-spine gap
filling, funnel conversion, cohort retention — the hypertable-adjacent
query shapes a telemetry/product-analytics workload runs at scale."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ror_etl_spark.queries.util import ravg4
from ror_etl_spark.registry import query
from ror_etl_spark.tables import Tables


@query(
    "gapfill_hourly_purchases",
    oracle="""
    WITH spine AS (
      SELECT unnest(generate_series(TIMESTAMP '2024-01-03 00:00:00',
                                    TIMESTAMP '2024-01-04 23:00:00',
                                    INTERVAL 1 HOUR)) AS h),
    agg AS (
      SELECT date_trunc('hour', ts) AS h, count(*) AS n,
             round(sum(value), 4) AS total
      FROM events WHERE event_type = 'purchase' GROUP BY 1)
    SELECT strftime(s.h, '%Y-%m-%d %H:00') AS hour,
           COALESCE(a.n, 0) AS n, COALESCE(a.total, 0.0) AS total
    FROM spine s LEFT JOIN agg a ON s.h = a.h ORDER BY hour
    """,
)
def gapfill_hourly_purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bucket gap filling (timescale-style): a generated hourly
    spine LEFT JOINs the aggregated buckets so silent hours appear as
    zero rows. The spine is a literal sequence → explode (no data scan),
    and broadcasts onto the aggregate; at 100 TB the aggregation is the
    only shuffling stage, exactly as without gap filling."""
    e = Tables(spark, sf_dir).events
    spine = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("2024-01-03 00:00:00").cast("timestamp"),
                F.lit("2024-01-04 23:00:00").cast("timestamp"),
                F.expr("INTERVAL 1 HOUR"),
            )
        ).alias("h")
    )
    agg = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy(F.date_trunc("hour", "ts").alias("ah"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("total"))
    )
    return (
        spine.join(agg, spine["h"] == agg["ah"], "left")
        .select(
            F.date_format("h", "yyyy-MM-dd HH:00").alias("hour"),
            F.coalesce(F.col("n"), F.lit(0)).alias("n"),
            F.coalesce(F.col("total"), F.lit(0.0)).alias("total"),
        )
        .orderBy("hour")
    )


@query(
    "funnel_signup_click_purchase",
    oracle="""
    WITH s AS (SELECT user_id, min(ts) FILTER (WHERE event_type='signup') AS t1
               FROM events GROUP BY user_id),
    cl AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e JOIN s ON e.user_id = s.user_id
           WHERE e.event_type='click' AND e.ts > s.t1 AND e.ts <= s.t1 + INTERVAL 7 DAY
           GROUP BY e.user_id),
    p AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e JOIN cl ON e.user_id = cl.user_id
          WHERE e.event_type='purchase' AND e.ts > cl.t2 AND e.ts <= cl.t2 + INTERVAL 7 DAY
          GROUP BY e.user_id)
    SELECT (SELECT count(t1) FROM s) AS n_signup,
           (SELECT count(*) FROM cl) AS n_click_7d,
           (SELECT count(*) FROM p) AS n_purchase_7d
    """,
)
def funnel_signup_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel with per-stage 7-day windows: signup → first
    subsequent click (≤7d) → first subsequent purchase (≤7d). Each stage
    is one keyed aggregation joined to the previous stage's anchor
    timestamp — all equi-joins on user_id, so every stage co-partitions
    on the same key and the funnel is one partitioning reused end to
    end."""
    e = Tables(spark, sf_dir).events
    seven = F.expr("INTERVAL 7 DAYS")
    s = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias("t1")
    )
    cl = (
        e.filter(F.col("event_type") == "click")
        .join(s.select(F.col("user_id").alias("su"), "t1"),
              (F.col("user_id") == F.col("su"))
              & (F.col("ts") > F.col("t1"))
              & (F.col("ts") <= F.col("t1") + seven))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(cl.select(F.col("user_id").alias("cu"), "t2"),
              (F.col("user_id") == F.col("cu"))
              & (F.col("ts") > F.col("t2"))
              & (F.col("ts") <= F.col("t2") + seven))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    n_signup = s.agg(F.count("t1").alias("n_signup"))
    n_click = cl.agg(F.count(F.lit(1)).alias("n_click_7d"))
    n_purchase = p.agg(F.count(F.lit(1)).alias("n_purchase_7d"))
    return n_signup.crossJoin(n_click).crossJoin(n_purchase)


@query(
    "cohort_retention",
    oracle="""
    WITH fp AS (SELECT user_id, date_trunc('week', min(ts)) AS cw
                FROM events WHERE event_type = 'purchase' AND value > 200
                GROUP BY user_id)
    SELECT strftime(f.cw, '%Y-%m-%d') AS cohort_week,
           CAST(date_diff('week', f.cw, date_trunc('week', e.ts)) AS BIGINT)
             AS week_offset,
           count(DISTINCT e.user_id) AS active_users
    FROM events e JOIN fp f ON e.user_id = f.user_id
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users cohorted by the week of their
    first high-value purchase; each cell counts distinct cohort members
    active in week cohort+offset. The cohort map is two narrow columns
    (user, week) — broadcast onto the event scan; the only shuffle is
    the final (cohort, offset) distinct-count."""
    e = Tables(spark, sf_dir).events
    fp = (
        e.filter((F.col("event_type") == "purchase") & (F.col("value") > 200))
        .groupBy("user_id")
        .agg(F.date_trunc("week", F.min("ts")).alias("cw"))
        .select(F.col("user_id").alias("fu"), "cw")
    )
    return (
        e.join(F.broadcast(fp), F.col("user_id") == F.col("fu"))
        .groupBy(
            F.date_format("cw", "yyyy-MM-dd").alias("cohort_week"),
            (F.datediff(F.date_trunc("week", F.col("ts")), F.col("cw")) / 7)
            .cast("long")
            .alias("week_offset"),
        )
        .agg(F.count_distinct("user_id").alias("active_users"))
        .orderBy("cohort_week", "week_offset")
    )


@query(
    "outlier_iqr_events",
    oracle="""
    WITH b AS (
      SELECT event_type,
             round(quantile_cont(value, 0.25), 6) AS q1,
             round(quantile_cont(value, 0.75), 6) AS q3
      FROM events GROUP BY event_type)
    SELECT e.event_type,
           count(*) AS n,
           CAST(sum(CASE WHEN e.value < b.q1 - 1.5 * (b.q3 - b.q1)
                           OR e.value > b.q3 + 1.5 * (b.q3 - b.q1)
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
           round(b.q1, 4) AS q1, round(b.q3, 4) AS q3
    FROM events e JOIN b ON e.event_type = b.event_type
    GROUP BY e.event_type, b.q1, b.q3
    ORDER BY e.event_type
    """,
)
def outlier_iqr_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey-fence outlier detection per group: exact quartiles feed
    1.5·IQR fences, events are flagged against their group's fences in a
    second pass over the same scan. The quartile frame is group-count
    sized and broadcasts; the big side shuffles once for its own
    aggregation — the standard shape for statistical data-cleaning at
    scale (bad-sensor removal, spam-score clipping). Quartiles are
    quantized to 6 dp on BOTH engines before the fence math so a value
    sitting exactly on a fence cannot flip on a last-ulp interpolation
    difference between Spark percentile and DuckDB quantile_cont."""
    e = Tables(spark, sf_dir).events
    # single two-percentage percentile call: halves the per-group
    # aggregation buffer vs two independent exact-percentile expressions
    b = e.groupBy(F.col("event_type").alias("bt")).agg(
        F.expr("percentile(value, array(0.25, 0.75))").alias("qs")
    ).select(
        "bt",
        F.round(F.col("qs")[0], 6).alias("q1"),
        F.round(F.col("qs")[1], 6).alias("q3"),
    )
    iqr = F.col("q3") - F.col("q1")
    is_out = (F.col("value") < F.col("q1") - 1.5 * iqr) | (
        F.col("value") > F.col("q3") + 1.5 * iqr
    )
    return (
        e.join(F.broadcast(b), F.col("event_type") == F.col("bt"))
        .groupBy("event_type", "q1", "q3")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(is_out.cast("long")).alias("n_outliers"),
        )
        .select(
            "event_type",
            "n",
            "n_outliers",
            F.round("q1", 4).alias("q1"),
            F.round("q3", 4).alias("q3"),
        )
        .orderBy("event_type")
    )


@query(
    "interpolate_hourly_gaps",
    oracle="""
    WITH spine AS (
      SELECT unnest(generate_series(TIMESTAMP '2024-01-03 00:00:00',
                                    TIMESTAMP '2024-01-04 23:00:00',
                                    INTERVAL 1 HOUR)) AS h),
    agg AS (
      SELECT date_trunc('hour', ts) AS h, round(avg(value) + 1e-9, 4) AS v
      FROM events WHERE event_type = 'purchase' GROUP BY 1),
    j AS (
      SELECT s.h, a.v,
             epoch(s.h) / 3600.0 AS hh
      FROM spine s LEFT JOIN agg a ON s.h = a.h),
    anchored AS (
      SELECT h, v, hh,
             last_value(v IGNORE NULLS) OVER wp AS pv,
             last_value(CASE WHEN v IS NOT NULL THEN hh END IGNORE NULLS) OVER wp AS ph,
             first_value(v IGNORE NULLS) OVER wn AS nv,
             first_value(CASE WHEN v IS NOT NULL THEN hh END IGNORE NULLS) OVER wn AS nh
      FROM j
      WINDOW wp AS (ORDER BY h ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             wn AS (ORDER BY h ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
    SELECT strftime(h, '%Y-%m-%d %H:00') AS hour,
           (v IS NULL) AS was_gap,
           round(CASE WHEN v IS NOT NULL THEN v
                      WHEN pv IS NULL THEN nv
                      WHEN nv IS NULL THEN pv
                      ELSE pv + (nv - pv) * (hh - ph) / (nh - ph) END, 4)
             AS filled
    FROM anchored
    ORDER BY hour
    """,
)
def interpolate_hourly_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap filling with LINEAR interpolation (the timeseries-database
    `interpolate()` beside `gapfill`'s zero-fill): silent hours get the
    straight line between the surrounding observed hourly averages, edges
    fall back to nearest-value. Anchors come from last/first IGNORE NULLS
    windows over the 48-row spine — the window is spine-sized (one row
    per bucket), never event-sized, so the unpartitioned ordering is a
    driver-scale detail, not a scale hazard."""
    from pyspark.sql import Window as W

    e = Tables(spark, sf_dir).events
    spine = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("2024-01-03 00:00:00").cast("timestamp"),
                F.lit("2024-01-04 23:00:00").cast("timestamp"),
                F.expr("INTERVAL 1 HOUR"),
            )
        ).alias("h")
    )
    agg = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy(F.date_trunc("hour", "ts").alias("ah"))
        .agg(ravg4(F.avg("value")).alias("v"))
    )
    hh = F.col("h").cast("double") / 3600.0
    j = spine.join(agg, spine["h"] == agg["ah"], "left").select("h", "v", hh.alias("hh"))
    wp = W.orderBy("h").rowsBetween(W.unboundedPreceding, W.currentRow)
    wn = W.orderBy("h").rowsBetween(W.currentRow, W.unboundedFollowing)
    anchor_h = F.when(F.col("v").isNotNull(), F.col("hh"))
    anchored = j.select(
        "h",
        "v",
        "hh",
        F.last("v", ignorenulls=True).over(wp).alias("pv"),
        F.last(anchor_h, ignorenulls=True).over(wp).alias("ph"),
        F.first("v", ignorenulls=True).over(wn).alias("nv"),
        F.first(anchor_h, ignorenulls=True).over(wn).alias("nh"),
    )
    filled = (
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(F.col("pv").isNull(), F.col("nv"))
        .when(F.col("nv").isNull(), F.col("pv"))
        .otherwise(
            F.col("pv")
            + (F.col("nv") - F.col("pv"))
            * (F.col("hh") - F.col("ph"))
            / (F.col("nh") - F.col("ph"))
        )
    )
    return anchored.select(
        F.date_format("h", "yyyy-MM-dd HH:00").alias("hour"),
        F.col("v").isNull().alias("was_gap"),
        F.round(filled, 4).alias("filled"),
    ).orderBy("hour")


@query(
    "timeseries_decompose_weekday",
    oracle="""
    WITH daily AS (
      SELECT o_orderdate AS dt, sum(o_totalprice) AS rev
      FROM orders GROUP BY o_orderdate),
    tr AS (
      SELECT dt, rev,
             avg(rev) OVER (ORDER BY dt ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
               AS trend,
             count(*) OVER (ORDER BY dt ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
               AS wn
      FROM daily)
    SELECT CAST(date_diff('day', DATE '1970-01-01', dt) % 7 AS BIGINT) AS weekday,
           CAST(count(*) AS BIGINT) AS n_days,
           round(avg(rev - trend) + 1e-9, 4) AS seasonal,
           round(avg(trend) + 1e-9, 2) AS mean_trend
    FROM tr WHERE wn = 7
    GROUP BY weekday ORDER BY weekday
    """,
    priority=3,
)
def timeseries_decompose_weekday(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive time-series decomposition (the moving-average
    half of STL): daily revenue → centered 7-day moving-average TREND →
    detrended residuals → per-weekday SEASONAL index (mean residual) —
    the forecast-prep / anomaly-baseline primitive. Weekday is computed
    as days-since-epoch mod 7 (integer-exact on both engines — Spark's
    dayofweek and DuckDB's have different origins, so neither crosses
    the boundary). Edge days without a full 7-day window are excluded
    (wn = 7), the standard centered-MA convention.

    Scale shape: the corpus-sized work is ONE date-keyed aggregate; the
    moving-average window runs over the DAILY frame, whose length is
    bounded by the calendar (~2.4k rows for 7 years), not the data —
    the same bounded-input rationale as the distribution functions.
    Everything after is a 7-row aggregate. Epsilon-rounded floats."""
    from pyspark.sql import Window

    o = Tables(spark, sf_dir).orders
    daily = o.groupBy(F.col("o_orderdate").alias("dt")).agg(
        F.sum("o_totalprice").alias("rev")
    )
    w = Window.orderBy("dt").rowsBetween(-3, 3)
    tr = daily.select(
        "dt",
        "rev",
        F.avg("rev").over(w).alias("trend"),
        F.count(F.lit(1)).over(w).alias("wn"),
    ).filter(F.col("wn") == 7)
    weekday = F.datediff(F.col("dt"), F.lit("1970-01-01").cast("date")) % 7
    return (
        tr.groupBy(weekday.cast("long").alias("weekday"))
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.round(F.avg(F.col("rev") - F.col("trend")) + 1e-9, 4).alias(
                "seasonal"
            ),
            F.round(F.avg("trend") + 1e-9, 2).alias("mean_trend"),
        )
        .orderBy("weekday")
    )


@query(
    "outlier_mad_events",
    oracle="""
    WITH med AS (
      SELECT event_type, round(quantile_cont(value, 0.5), 6) AS med
      FROM events GROUP BY event_type),
    mad AS (
      SELECT e.event_type, med.med,
             round(quantile_cont(abs(e.value - med.med), 0.5), 6) AS mad
      FROM events e JOIN med USING (event_type)
      GROUP BY e.event_type, med.med)
    SELECT e.event_type,
           CAST(count(*) AS BIGINT) AS n,
           mad.med, mad.mad,
           CAST(sum(CASE WHEN abs(e.value - mad.med) > 3 * 1.4826 * mad.mad
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM events e JOIN mad USING (event_type)
    GROUP BY e.event_type, mad.med, mad.mad
    ORDER BY e.event_type
    """,
    priority=3,
)
def outlier_mad_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection via Median Absolute Deviation — the
    heavy-tail-safe companion to ``outlier_iqr_events``: per event
    type, the median, the MAD, and the count of values beyond the
    standard 3σ-equivalent fence (3 · 1.4826 · MAD; 1.4826 scales MAD
    to σ under normality). Mean/stddev fences move with the outliers
    they're hunting; the median pair doesn't — the reason data-quality
    monitors default to MAD.

    Scale shape: two exact-percentile aggregates (the second over
    |x − med|, med broadcast back) + one counting aggregate — three
    passes over a column, all map-side combined, per-group state is
    the percentile buffer. Medians are rounded at 6 dp on both engines
    before re-entering arithmetic (the equidepth discipline)."""
    e = Tables(spark, sf_dir).events
    med = e.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("med")
    )
    mad = (
        e.join(F.broadcast(med), "event_type")
        .groupBy("event_type", "med")
        .agg(
            F.round(
                F.expr("percentile(abs(value - med), 0.5)"), 6
            ).alias("mad")
        )
    )
    fence = 3 * 1.4826 * F.col("mad")
    return (
        e.join(F.broadcast(mad), "event_type")
        .groupBy("event_type", "med", "mad")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(F.abs(F.col("value") - F.col("med")) > fence, 1).otherwise(0)
            ).alias("n_outliers"),
        )
        .select("event_type", "n", "med", "mad", "n_outliers")
        .orderBy("event_type")
    )


_SESSION_TIMEOUTS_S = (600, 1800, 3600)


@query(
    "sessionize_timeout_sweep",
    oracle=f"""
    WITH g AS (
      SELECT user_id,
             epoch_us(ts) - lag(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
      FROM events),
    n_users AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS u FROM events),
    n_events AS (SELECT CAST(count(*) AS BIGINT) AS e FROM events)
    SELECT t.timeout_s,
           CAST(n_users.u + sum(CASE WHEN g.gap_us > CAST(t.timeout_s AS BIGINT) * 1000000
                                     THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
           round(CAST(n_events.e AS DOUBLE)
                 / (n_users.u + sum(CASE WHEN g.gap_us > CAST(t.timeout_s AS BIGINT) * 1000000
                                         THEN 1 ELSE 0 END)) + 1e-9, 4)
             AS events_per_session
    FROM (SELECT unnest([{", ".join(str(t) for t in _SESSION_TIMEOUTS_S)}])
            AS timeout_s) t
    CROSS JOIN n_users CROSS JOIN n_events
    CROSS JOIN g
    GROUP BY t.timeout_s, n_users.u, n_events.e
    ORDER BY t.timeout_s
    """,
    priority=3,
)
def sessionize_timeout_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-timeout TUNING CURVE: session counts and events-per-
    session at inactivity thresholds of 10/30/60 minutes — the
    measurement that picks a sessionization timeout (too short splits
    real sessions, too long merges visits; the knee is the operating
    point). A session starts at each event whose gap to the user's
    previous event exceeds the timeout, so n_sessions = n_users +
    #(gaps > T) — counting, not segmentation, which is why ALL sweep
    points share ONE lag-window pass.

    Scale shape: one user-keyed window computes every inter-event gap
    (integer microseconds); each sweep point is a conditional count
    over the same gap column against a 3-row broadcast. No
    re-sessionization per threshold, no floats except the final
    epsilon-rounded ratio."""
    from pyspark.sql import Window

    from ror_etl_spark.queries.util import epoch_us

    e = Tables(spark, sf_dir).events
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    g = e.select(
        "user_id",
        (epoch_us("ts") - F.lag(epoch_us("ts")).over(w)).alias("gap_us"),
    )
    n_users = e.agg(F.countDistinct("user_id").alias("u"))
    n_events = e.agg(F.count(F.lit(1)).alias("e"))
    t = spark.createDataFrame(
        [(s,) for s in _SESSION_TIMEOUTS_S], "timeout_s int"
    )
    return (
        F.broadcast(t)
        .crossJoin(F.broadcast(n_users))
        .crossJoin(F.broadcast(n_events))
        .crossJoin(g)
        .groupBy("timeout_s", "u", "e")
        .agg(
            F.sum(
                F.when(
                    F.col("gap_us") > F.col("timeout_s").cast("long") * 1000000, 1
                ).otherwise(0)
            ).alias("n_splits")
        )
        .select(
            "timeout_s",
            (F.col("u") + F.col("n_splits")).alias("n_sessions"),
            F.round(
                F.col("e").cast("double") / (F.col("u") + F.col("n_splits")) + 1e-9,
                4,
            ).alias("events_per_session"),
        )
        .orderBy("timeout_s")
    )


@query(
    "funnel_conversion_latency",
    oracle="""
    WITH su AS (
      SELECT user_id, min(ts) AS s FROM events
      WHERE event_type = 'signup' GROUP BY user_id),
    pu AS (
      SELECT su.user_id, min(epoch_us(e.ts)) AS p
      FROM su JOIN events e
        ON e.user_id = su.user_id AND e.event_type = 'purchase'
       AND e.ts >= su.s
      GROUP BY su.user_id),
    lat AS (
      SELECT su.user_id, pu.p - epoch_us(su.s) AS d_us
      FROM su JOIN pu USING (user_id))
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM su) AS n_signup,
           CAST(count(*) AS BIGINT) AS n_converted,
           round(count(*) / (SELECT CAST(count(*) AS DOUBLE) FROM su) + 1e-9, 6)
             AS conversion_rate,
           round(quantile_cont(d_us, 0.5) / 1000000 + 1e-9, 4) AS p50_latency_s,
           round(quantile_cont(d_us, 0.9) / 1000000 + 1e-9, 4) AS p90_latency_s
    FROM lat
    """,
    priority=3,
)
def funnel_conversion_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel TIMING: of the users who signed up, how many went on to
    purchase (first purchase at-or-after their first signup), and how
    long it took — conversion rate plus p50/p90 latency. The companion
    to the step-count funnel (``funnel_signup_click_purchase``): rates
    say WHETHER the funnel converts, latency percentiles say how fast —
    the number behind activation SLAs and drip-campaign timing.

    Scale shape: two user-keyed aggregates (first signup; first
    qualifying purchase via a user-keyed join bounded by the signup
    set) and one exact-percentile aggregate over integer microsecond
    latencies — Spark's percentile and DuckDB's quantile_cont agree on
    exact integer inputs (the established equidepth parity), and every
    emitted float is epsilon-rounded."""
    from ror_etl_spark.queries.util import epoch_us

    e = Tables(spark, sf_dir).events
    su = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("s"))
    )
    pu = (
        su.join(
            e.filter(F.col("event_type") == "purchase").select(
                "user_id", F.col("ts").alias("pts")
            ),
            "user_id",
        )
        .filter(F.col("pts") >= F.col("s"))
        .groupBy("user_id")
        .agg(F.min(epoch_us("pts")).alias("p"))
    )
    lat = su.join(pu, "user_id").select(
        (F.col("p") - epoch_us("s")).alias("d_us")
    )
    n_signup = su.agg(F.count(F.lit(1)).alias("ns"))
    return (
        lat.crossJoin(F.broadcast(n_signup))
        .groupBy("ns")
        .agg(
            F.count(F.lit(1)).alias("n_converted"),
            F.round(
                F.expr("percentile(d_us, 0.5)") / 1000000 + 1e-9, 4
            ).alias("p50_latency_s"),
            F.round(
                F.expr("percentile(d_us, 0.9)") / 1000000 + 1e-9, 4
            ).alias("p90_latency_s"),
        )
        .select(
            F.col("ns").alias("n_signup"),
            "n_converted",
            F.round(
                F.col("n_converted") / F.col("ns").cast("double") + 1e-9, 6
            ).alias("conversion_rate"),
            "p50_latency_s",
            "p90_latency_s",
        )
    )


@query(
    "dedup_events_debounce",
    oracle="""
    WITH RECURSIVE base AS (
      SELECT user_id, event_type, event_id, epoch_us(ts) AS tus,
             row_number() OVER (PARTITION BY user_id, event_type
                                ORDER BY epoch_us(ts), event_id) AS rn
      FROM events),
    kept AS (
      SELECT user_id, event_type, event_id, tus FROM base WHERE rn = 1
      UNION ALL
      SELECT nxt.user_id, nxt.event_type, nxt.event_id, nxt.tus
      FROM kept k, LATERAL (
        SELECT b.user_id, b.event_type, b.event_id, b.tus
        FROM base b
        WHERE b.user_id = k.user_id AND b.event_type = k.event_type
          AND b.tus >= k.tus + 600000000
        ORDER BY b.tus, b.event_id LIMIT 1) nxt),
    tot AS (SELECT event_type, count(*) AS n_total FROM base
            GROUP BY event_type)
    SELECT k.event_type, any_value(t.n_total) AS n_total,
           CAST(count(*) AS BIGINT) AS n_kept,
           CAST(sum(k.event_id) AS BIGINT) AS kept_id_sum
    FROM kept k JOIN tot t ON k.event_type = t.event_type
    GROUP BY k.event_type ORDER BY k.event_type
    """,
    priority=5,
)
def dedup_events_debounce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful keep-first debounce: within each (user, event_type)
    stream, keep an event only if it is >= 600 s after the PREVIOUSLY
    KEPT event (refractory-period dedup — duplicate-click / retry-storm
    suppression). This is NOT window-expressible: "previous kept" is a
    sequential dependence (a lag() against the previous RAW event admits
    chains of sub-threshold events that each debounce the next), so it
    is the batch twin of streaming's dropDuplicatesWithinWatermark /
    applyInPandasWithState shape — O(1) state per key behind one shuffle
    on the key.

    Implementation: hash-repartition on the key, sortWithinPartitions
    on (key, ts, event_id) — ONE shuffle, local sort — then mapInPandas
    with a cross-batch carry of (current key, last kept ts). The first
    cut used applyInPandas per (user, type); at the dedicated 100M-event
    tier that is 7.1M groups of ~14 rows and the per-group pandas
    materialization (~70 us) dominated: 542 s cold, x24 over the 10M
    tier. mapInPandas amortizes group handling across whole Arrow
    batches (groups are contiguous after the partition-local sort; the
    generator's carry survives batch boundaries), restoring ~linear
    decade steps — the same data, same shuffle, no per-group overhead.
    At 100 TB the key space is the parallelism; state stays O(1).

    The oracle replays the greedy chain as a recursive CTE (each kept
    row LATERAL-joins its next kept successor) — NOT a list_reduce
    fold: DuckDB v1.0.0's lambda corrupts fold accumulators at real
    group sizes (measured: 2003 kept vs the true 2001 on sf0.01 clicks;
    a pure-Python walk arbitrates, pinned in tests). Output is a
    per-type exact integer checksum (kept-id sum), the strongest
    order-insensitive witness of the kept SET."""

    def debounce_partition(batches):
        import pandas as pd

        cur_key = None
        last_kept = 0
        armed = False  # True once cur_key has a kept event
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            us = pdf["user_id"].to_numpy().tolist()
            et = pdf["event_type"].to_numpy().tolist()
            eid = pdf["event_id"].to_numpy().tolist()
            tus = pdf["tus"].to_numpy().tolist()
            keep = [False] * n
            for i in range(n):
                k = (us[i], et[i])
                if k != cur_key:
                    cur_key = k
                    armed = False
                if not armed or tus[i] >= last_kept + 600_000_000:
                    keep[i] = True
                    last_kept = tus[i]
                    armed = True
            yield pd.DataFrame(
                {
                    "event_type": [e for e, f in zip(et, keep) if f],
                    "event_id": [e for e, f in zip(eid, keep) if f],
                }
            )

    from ror_etl_spark.queries.util import epoch_us

    e = Tables(spark, sf_dir).events.select(
        "user_id", "event_type", "event_id", epoch_us("ts").alias("tus")
    )
    parts = max(e.sparkSession.sparkContext.defaultParallelism, 8)
    kept = (
        e.repartition(parts, "user_id", "event_type")
        .sortWithinPartitions("user_id", "event_type", "tus", "event_id")
        .mapInPandas(debounce_partition, "event_type string, event_id long")
    )
    totals = e.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_total"))
    per_type = kept.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("event_id").alias("kept_id_sum"),
    )
    return (
        totals.join(per_type, "event_type")
        .select("event_type", "n_total", "n_kept", "kept_id_sum")
        .orderBy("event_type")
    )


@query(
    "running_balance_floor0",
    oracle="""
    WITH tx AS (
      SELECT user_id, epoch_us(ts) AS tus, event_id,
             CASE WHEN event_type = 'purchase'
                  THEN CAST(round(value * 100) AS BIGINT)
                  ELSE -CAST(round(value * 100) AS BIGINT) END AS delta_c
      FROM events WHERE event_type IN ('purchase', 'click')),
    s0 AS (
      SELECT user_id, tus, event_id,
             sum(delta_c) OVER (PARTITION BY user_id
                                ORDER BY tus, event_id) AS rs
      FROM tx),
    s AS (
      SELECT user_id, tus, event_id, rs,
             min(rs) OVER (PARTITION BY user_id
                           ORDER BY tus, event_id) AS rm
      FROM s0),
    b AS (
      SELECT user_id, tus, event_id,
             CAST(rs - least(CAST(0 AS BIGINT), rm) AS BIGINT) AS bal
      FROM s)
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_tx,
           last(bal ORDER BY tus, event_id) AS final_cents,
           max(bal) AS peak_cents,
           CAST(sum(CASE WHEN bal = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_floored
    FROM b GROUP BY user_id ORDER BY user_id
    """,
    priority=5,
)
def running_balance_floor0(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Floor-at-zero running balance per account (inventory / wallet /
    rate-limiter semantics: debits cannot take the balance negative).
    The naive definition is sequential — b_i = max(0, b_{i-1} + d_i) —
    which looks like another stateful-kernel op (cf. the debounce).
    It is NOT: the Skorokhod reflection identity
        b_i = S_i - min(0, min_{j<=i} S_j)
    (S = plain running sum) turns the fold into two ordered per-key
    window aggregates, keeping the whole operator inside Catalyst
    codegen — no Python, no state carry, one shuffle on the key. The
    identity holds only for a floor (or only a cap), not both; a
    two-sided clamp genuinely needs the sequential kernel. Amounts are
    integer CENTS end to end, so running sums are exact and the hash
    gate needs no rounding discipline.

    Purchases credit, clicks debit; per user the report is transaction
    count, final and peak balance, and how often the floor engaged. At
    100 TB: one hash shuffle on user_id; both windows and the final
    aggregate reuse that single partitioning."""
    from pyspark.sql import Window as W

    from ror_etl_spark.queries.util import epoch_us

    e = Tables(spark, sf_dir).events
    tx = e.where(F.col("event_type").isin("purchase", "click")).select(
        "user_id",
        epoch_us("ts").alias("tus"),
        "event_id",
        F.when(
            F.col("event_type") == "purchase",
            F.round(F.col("value") * 100).cast("long"),
        )
        .otherwise(-F.round(F.col("value") * 100).cast("long"))
        .alias("delta_c"),
    )
    w = W.partitionBy("user_id").orderBy("tus", "event_id")
    run = tx.withColumn("rs", F.sum("delta_c").over(w)).withColumn(
        "rm", F.min("rs").over(w)
    )
    b = run.select(
        "user_id",
        "tus",
        "event_id",
        (F.col("rs") - F.least(F.lit(0).cast("long"), F.col("rm"))).alias("bal"),
    )
    wl = W.partitionBy("user_id").orderBy(F.desc("tus"), F.desc("event_id"))
    b = b.withColumn("rl", F.row_number().over(wl))
    return (
        b.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_tx"),
            F.max(F.when(F.col("rl") == 1, F.col("bal"))).alias("final_cents"),
            F.max("bal").alias("peak_cents"),
            F.sum(F.when(F.col("bal") == 0, 1).otherwise(0)).alias("n_floored"),
        )
        .orderBy("user_id")
    )


@query(
    "event_transition_matrix",
    oracle="""
    WITH s AS (
      SELECT user_id, event_type,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY epoch_us(ts), event_id) AS nxt
      FROM events),
    c AS (
      SELECT event_type AS src, nxt AS dst, CAST(count(*) AS BIGINT) AS n
      FROM s WHERE nxt IS NOT NULL GROUP BY 1, 2),
    r AS (SELECT src, sum(n) AS rt FROM c GROUP BY src)
    SELECT c.src, c.dst, c.n,
           round(CAST(c.n AS DOUBLE) / r.rt + 1e-9, 6) AS p
    FROM c JOIN r ON c.src = r.src
    ORDER BY c.src, c.dst
    """,
    priority=5,
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event streams
    — the clickstream-analysis primitive (what follows what, and with
    what probability) behind next-action prediction and anomalous-flow
    detection.

    One lead() window per user (single hash shuffle on user_id, the
    same partitioning the count aggregate reuses) emits (src, dst)
    adjacencies; the matrix is category-domain-sized (|types|^2 <= 25
    cells), so the row-normalizing join is a broadcast of almost
    nothing. Counts are exact integers; each probability is one
    rational, epsilon-rounded. At 100 TB this is a single pass — the
    same shape as sessionization, reusing its shuffle."""
    from pyspark.sql import Window as W

    from ror_etl_spark.queries.util import epoch_us

    e = Tables(spark, sf_dir).events.select(
        "user_id", "event_type", epoch_us("ts").alias("tus"), "event_id"
    )
    w = W.partitionBy("user_id").orderBy("tus", "event_id")
    s = e.withColumn("nxt", F.lead("event_type").over(w))
    c = (
        s.where(F.col("nxt").isNotNull())
        .groupBy(F.col("event_type").alias("src"), F.col("nxt").alias("dst"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    r = c.groupBy("src").agg(F.sum("n").alias("rt"))
    return (
        c.join(F.broadcast(r), "src")
        .select(
            "src",
            "dst",
            "n",
            F.round(F.col("n").cast("double") / F.col("rt") + 1e-9, 6).alias("p"),
        )
        .orderBy("src", "dst")
    )


@query(
    "max_concurrent_sessions",
    oracle="""
    WITH e AS (
      SELECT user_id, epoch_us(ts) AS tus, event_id FROM events),
    flg AS (
      SELECT user_id, tus,
             CASE WHEN tus - lag(tus) OVER (PARTITION BY user_id
                                            ORDER BY tus, event_id)
                       > 1800000000 THEN 1
                  WHEN lag(tus) OVER (PARTITION BY user_id
                                      ORDER BY tus, event_id) IS NULL THEN 1
                  ELSE 0 END AS new_s
      FROM e),
    sn AS (
      SELECT user_id, tus,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY tus
                              ROWS UNBOUNDED PRECEDING) AS snum
      FROM flg),
    sess AS (
      SELECT user_id, snum, min(tus) AS st, max(tus) + 1800000000 AS en
      FROM sn GROUP BY user_id, snum),
    bd AS (
      SELECT st AS t, 1 AS delta, user_id, snum FROM sess
      UNION ALL
      SELECT en AS t, -1 AS delta, user_id, snum FROM sess),
    run AS (
      SELECT t, CAST(sum(delta) OVER (ORDER BY t, delta, user_id, snum
                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cur
      FROM bd),
    mx AS (SELECT max(cur) AS m FROM run)
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM sess) AS n_sessions,
           mx.m AS max_concurrent,
           (SELECT min(t) FROM run WHERE cur = mx.m) AS at_us
    FROM mx
    """,
    priority=5,
)
def max_concurrent_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrency (the capacity-planning question: how many user
    sessions were ever active at once) via the classic sweep line:
    every session contributes a +1 at its start and a -1 at its end
    (half-open — ends sort BEFORE starts at the same instant, so
    back-to-back sessions never double-count), and the answer is the
    max of the running sum over the globally ordered boundary stream.

    The global running sum is the anti-pattern-shaped step — a naive
    Window.orderBy would single-task the entire boundary stream — so it
    rides operators/util.global_cumsum (range partition + pid-local
    windows + broadcast carry-ins; boundaries are 2x the SESSION count,
    already two aggregation levels smaller than the event data).
    Sessionization itself is the registry's standard lag-gap shape on
    one user_id shuffle. Everything is integer micros end to end."""
    from pyspark.sql import Window as W

    from ror_etl_spark.operators.util import global_cumsum
    from ror_etl_spark.queries.util import epoch_us

    e = Tables(spark, sf_dir).events.select(
        "user_id", epoch_us("ts").alias("tus"), "event_id"
    )
    wu = W.partitionBy("user_id").orderBy("tus", "event_id")
    flg = e.withColumn(
        "new_s",
        F.when(F.lag("tus").over(wu).isNull(), 1)
        .when(F.col("tus") - F.lag("tus").over(wu) > 1_800_000_000, 1)
        .otherwise(0),
    )
    sn = flg.withColumn(
        "snum",
        F.sum("new_s").over(wu.rowsBetween(W.unboundedPreceding, W.currentRow)),
    )
    sess = sn.groupBy("user_id", "snum").agg(
        F.min("tus").alias("st"),
        (F.max("tus") + 1_800_000_000).alias("en"),
    )
    bd = sess.select(
        F.col("st").alias("t"), F.lit(1).alias("delta"), "user_id", "snum"
    ).unionByName(
        sess.select(
            F.col("en").alias("t"), F.lit(-1).alias("delta"), "user_id", "snum"
        )
    )
    run = global_cumsum(bd, ["t", "delta", "user_id", "snum"], "delta", out="prior")
    run = run.select("t", (F.col("prior") + F.col("delta")).alias("cur"))
    mx = run.agg(F.max("cur").alias("m"))
    at_ = (
        run.join(F.broadcast(mx), run["cur"] == mx["m"])
        .agg(F.min("t").alias("at_us"))
    )
    n = sess.agg(F.count(F.lit(1)).alias("n_sessions"))
    return n.crossJoin(mx.select(F.col("m").alias("max_concurrent"))).crossJoin(
        at_
    )


@query(
    "match_recognize_funnel",
    oracle="""
    WITH seq AS (
      SELECT user_id,
             string_agg(CASE event_type WHEN 'signup' THEN 's'
                                        WHEN 'click' THEN 'c'
                                        WHEN 'purchase' THEN 'p'
                                        WHEN 'view' THEN 'v'
                                        ELSE 'e' END, ''
                        ORDER BY epoch_us(ts), event_id) AS trace
      FROM events GROUP BY user_id),
    m AS (
      SELECT user_id, trace,
             length(regexp_replace(trace, 's[^sp]*c[^sp]*p', '#', 'g'))
               - length(regexp_replace(trace, 's[^sp]*c[^sp]*p', '', 'g'))
               AS n_matches
      FROM seq)
    SELECT CAST(count(*) AS BIGINT) AS n_users,
           CAST(sum(CASE WHEN n_matches > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_users_matched,
           CAST(sum(n_matches) AS BIGINT) AS n_matches,
           CAST(sum(length(trace)) AS BIGINT) AS n_events
    FROM m
    """,
    priority=5,
)
def match_recognize_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE emulation — row-pattern matching over ordered
    per-key event sequences, the SQL:2016 feature Flink and Trino ship
    natively and Spark has no operator for (§2.3 "custom operator as
    composition"). Pattern here: signup, then a click with no
    intervening signup/purchase, then a purchase (regex
    s[^sp]*c[^sp]*p with non-greedy non-overlap semantics, counting
    each completed funnel once — MATCH_RECOGNIZE's AFTER MATCH SKIP
    PAST LAST ROW).

    Compilation strategy: each user's event stream collapses to a
    TRACE STRING (one char per event, in exact (ts, event_id) order via
    sorting an array of packed structs — never collect_list's
    partition-dependent order), and the row pattern becomes an ordinary
    regex evaluated in codegen. One shuffle on the key; per-key state
    is the trace (bounded by events-per-user). Match counting is
    engine-portable replace-length arithmetic (regexp_count does not
    exist in DuckDB v1.0). At 100 TB this is the standard funnel/CEP
    analysis shape: key-partitioned, codegen regex, no Python."""
    from ror_etl_spark.queries.util import epoch_us

    e = Tables(spark, sf_dir).events.select(
        "user_id",
        epoch_us("ts").alias("tus"),
        "event_id",
        F.when(F.col("event_type") == "signup", "s")
        .when(F.col("event_type") == "click", "c")
        .when(F.col("event_type") == "purchase", "p")
        .when(F.col("event_type") == "view", "v")
        .otherwise("e")
        .alias("ch"),
    )
    seq = e.groupBy("user_id").agg(
        F.concat_ws(
            "",
            F.expr(
                "transform(array_sort(collect_list(struct(tus, event_id, ch)))"
                ", x -> x.ch)"
            ),
        ).alias("trace")
    )
    pat = r"s[^sp]*c[^sp]*p"
    m = seq.select(
        "user_id",
        "trace",
        (
            F.length(F.regexp_replace("trace", pat, "#"))
            - F.length(F.regexp_replace("trace", pat, ""))
        ).alias("n_matches"),
    )
    return m.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum(F.when(F.col("n_matches") > 0, 1).otherwise(0)).alias(
            "n_users_matched"
        ),
        F.sum("n_matches").alias("n_matches"),
        F.sum(F.length("trace")).alias("n_events"),
    )


@query(
    "top_session_paths",
    oracle="""
    WITH e AS (
      SELECT user_id, epoch_us(ts) AS tus, event_id, event_type FROM events),
    flg AS (
      SELECT user_id, tus, event_id, event_type,
             CASE WHEN lag(tus) OVER w IS NULL THEN 1
                  WHEN tus - lag(tus) OVER w > 1800000000 THEN 1
                  ELSE 0 END AS new_s
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id)),
    sn AS (
      SELECT user_id, tus, event_id, event_type,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY tus, event_id
                              ROWS UNBOUNDED PRECEDING) AS snum
      FROM flg),
    tri AS (
      SELECT user_id, snum, event_type AS e1,
             lead(event_type, 1) OVER w2 AS e2,
             lead(event_type, 2) OVER w2 AS e3
      FROM sn WINDOW w2 AS (PARTITION BY user_id, snum
                            ORDER BY tus, event_id))
    SELECT e1 || '>' || e2 || '>' || e3 AS path,
           CAST(count(*) AS BIGINT) AS n
    FROM tri WHERE e3 IS NOT NULL
    GROUP BY 1 ORDER BY n DESC, path LIMIT 10
    """,
    priority=5,
)
def top_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top navigation paths: the most frequent 3-step event sequences
    WITHIN a session (30-min inactivity boundary) — the path-analysis
    query product teams run on clickstreams, and the n-gram
    generalization of event_transition_matrix (bigrams, no session
    fence). Session boundaries matter: a trigram spanning two visits
    is noise, so the lead() window partitions on (user, session), and
    sessionization is the registry's standard lag-gap pass — all three
    windows ride ONE shuffle on user_id. Path space is |types|^3
    bounded, counts are exact integers, top-10 is a TakeOrdered with
    the path string as tiebreak."""
    from pyspark.sql import Window as W

    from ror_etl_spark.queries.util import epoch_us

    e = Tables(spark, sf_dir).events.select(
        "user_id", epoch_us("ts").alias("tus"), "event_id", "event_type"
    )
    wu = W.partitionBy("user_id").orderBy("tus", "event_id")
    flg = e.withColumn(
        "new_s",
        F.when(F.lag("tus").over(wu).isNull(), 1)
        .when(F.col("tus") - F.lag("tus").over(wu) > 1_800_000_000, 1)
        .otherwise(0),
    )
    sn = flg.withColumn(
        "snum",
        F.sum("new_s").over(wu.rowsBetween(W.unboundedPreceding, W.currentRow)),
    )
    w2 = W.partitionBy("user_id", "snum").orderBy("tus", "event_id")
    tri = sn.select(
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(w2).alias("e2"),
        F.lead("event_type", 2).over(w2).alias("e3"),
    ).where(F.col("e3").isNotNull())
    return (
        tri.groupBy(
            F.concat_ws(">", "e1", "e2", "e3").alias("path")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("path"))
        .limit(10)
    )
