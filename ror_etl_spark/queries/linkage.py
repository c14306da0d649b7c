"""Record-linkage and slowly-changing-dimension operators: SymSpell
deletion-neighborhood fuzzy matching, SCD Type-2 history build, and
truncated-EWMA smoothing.

Three query shapes a warehouse/linkage workload runs constantly that the
registry did not yet cover end to end:

- **SymSpell fuzzy token join** — edit-distance joins are the classic
  "accidentally quadratic" linkage op. The deletion-neighborhood trick
  (SymSpell; Garbe 2012, public algorithm) makes them an EQUI-join:
  ``lev(a, b) <= d`` implies a and b share a string obtainable by
  deleting <= d characters from each, so generating the deletion
  neighborhood and hash-joining on it yields a candidate superset, and
  an exact ``levenshtein`` verify removes the false positives (e.g.
  transposition-shaped candidates like "ab"/"ba" at d=1). The oracle is
  the BRUTE-FORCE quadratic join — the hash gate proves the candidate
  generation is lossless.
- **SCD2 history build** — drives ``operators/upsert.py:scd2_apply``
  (until now pytest-only) through the driver's oracle gate: an initial
  open row per customer plus the per-(customer, day) order change log
  become a versioned dimension with half-open validity intervals.
- **Truncated EWMA** — exponentially-weighted smoothing expressed as a
  bounded-lag equi-join fan-out (explode over the 30 lag offsets, then
  hash-aggregate), not a recursive scan; the oracle states the same
  closed form as a band self-join.

Reference parity: the reference pipeline (georgetown-cset/ror-etl) has
no linkage surface; these rows belong to SURVEY.md §2.3's fuzzy entity
resolution / temporal analytics families.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ror_etl_spark.queries.util import ordered, r2
from ror_etl_spark.registry import query
from ror_etl_spark.tables import Tables

# Shared DuckDB tokenization twin (same as corpusops/text oracles).
_TOKS_SQL = (
    "string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')"
)

# Single-character-deletion neighborhood as a Spark SQL lambda: for a
# string t, all strings obtained by removing exactly one character.
_DELS = (
    "transform(sequence(1, greatest(length({t}), 1)), "
    "i -> concat(substring({t}, 1, i - 1), substring({t}, i + 1, length({t}))))"
)


@query(
    "fuzzy_token_symspell",
    oracle=f"""
    WITH toks AS (
      SELECT DISTINCT unnest({_TOKS_SQL}) AS tok FROM documents),
    pairs AS (
      SELECT a.tok AS tok_a, b.tok AS tok_b,
             levenshtein(a.tok, b.tok) AS dist
      FROM toks a JOIN toks b ON a.tok < b.tok
      WHERE levenshtein(a.tok, b.tok) <= 2)
    SELECT tok_a, tok_b, dist FROM pairs ORDER BY tok_a, tok_b
    """,
    priority=3,
)
def fuzzy_token_symspell(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SymSpell deletion-neighborhood fuzzy join over the corpus
    vocabulary: all distinct token pairs within edit distance 2.

    Plan: distinct tokens (vocab-sized — Heaps-law sublinear in corpus
    size) -> explode each token's <=2-deletion neighborhood -> equi-join
    on the deletion string -> exact ``levenshtein`` verify -> distinct
    pairs. The oracle is the brute-force vocab^2 join, so a green hash
    proves the neighborhood join is a lossless candidate generator.

    Scale: the corpus-sized stage is ONE distinct (token) aggregate;
    everything after runs on the vocabulary. Neighborhood fan-out is
    ~(1 + L + L^2/2) variants per token (L = token length, bounded by a
    length cap upstream in real corpora); join keys are deletion strings
    whose bucket sizes are vocab-bounded, never corpus-bounded. The
    brute-force alternative is vocab^2 levenshtein calls — at a 10M-term
    web vocabulary that is 10^14 comparisons, while this plan does a
    ~40x fan-out equi-join. No corpus self-join anywhere."""
    from ror_etl_spark.operators.util import spread

    docs = Tables(spark, sf_dir).documents
    # spread() after the distinct: AQE coalesces the small vocab shuffle
    # to one partition, and without the re-spread the ~40x variant
    # fan-out, the candidate join (the variants side is small enough to
    # broadcast, so the join runs in the probe side's partitions), and
    # the levenshtein verify all execute in a SINGLE task — measured
    # minutes-vs-seconds at the 123k-term open-vocab tier.
    toks = spread(
        docs.select(
            F.explode(
                F.split(
                    F.trim(F.regexp_replace(F.lower("text"), r"\s+", " ")), " "
                )
            ).alias("tok")
        )
        .where(F.col("tok") != "")
        .distinct()
    )
    d1 = _DELS.format(t="tok")
    # {tok} ∪ D1(tok) ∪ D2(tok), deduplicated. The inner transform runs
    # on each 1-deletion string s.
    d2 = _DELS.format(t="s")
    variants = toks.select(
        "tok",
        F.explode(
            F.array_distinct(
                F.expr(
                    f"concat(array(tok), {d1}, flatten(transform({d1}, s -> {d2})))"
                )
            )
        ).alias("variant"),
    )
    a = variants.alias("a")
    b = variants.alias("b")
    # Verify BEFORE the distinct: a candidate pair appears once per
    # shared variant (dozens of duplicates) and almost all candidates
    # fail the exact check (shared 2-deletion subsequence but lev > 2),
    # so the map-side levenshtein filter right after the join kills ~99%
    # of rows before anything shuffles; the distinct then dedups only
    # output-sized survivors.
    verified = (
        a.join(b, F.col("a.variant") == F.col("b.variant"))
        .where(F.col("a.tok") < F.col("b.tok"))
        .select(F.col("a.tok").alias("tok_a"), F.col("b.tok").alias("tok_b"))
        .withColumn("dist", F.levenshtein("tok_a", "tok_b").cast("long"))
        .where(F.col("dist") <= 2)
        .distinct()
    )
    return ordered(verified, "tok_a", "tok_b")


@query(
    "scd2_order_status_history",
    oracle="""
    WITH upd AS (
      SELECT o_custkey AS c_custkey,
             arg_max(o_orderstatus, o_orderkey) AS status,
             round(arg_max(o_totalprice, o_orderkey), 2) AS price,
             o_orderdate AS vf
      FROM orders GROUP BY o_custkey, o_orderdate),
    chained AS (
      SELECT c_custkey, status, price, vf,
             lead(vf) OVER (PARTITION BY c_custkey ORDER BY vf) AS vt
      FROM upd),
    first_upd AS (SELECT c_custkey, min(vf) AS f FROM upd GROUP BY c_custkey),
    initial AS (
      SELECT c.c_custkey, 'NEW' AS status, 0.0 AS price,
             TIMESTAMP '1992-01-01' AS vf, f.f AS vt
      FROM customer c LEFT JOIN first_upd f ON c.c_custkey = f.c_custkey),
    hist AS (SELECT * FROM initial UNION ALL SELECT * FROM chained)
    SELECT c_custkey, status, price,
           strftime(vf, '%Y-%m-%d') AS valid_from,
           strftime(vt, '%Y-%m-%d') AS valid_to,
           vt IS NULL AS is_current
    FROM hist ORDER BY c_custkey, valid_from
    """,
    priority=3,
)
def scd2_order_status_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 dimension build on the driver gate, through the SAME
    ``scd2_apply`` operator the MERGE-emulation tests use.

    History starts as one open 'NEW' row per customer; the update batch
    is the order log collapsed last-writer-wins per (customer, order
    date) (``max_by`` on the unique order key — ``scd2_apply`` requires
    per-key-unique timestamps and raw orders violate that). The operator
    chains each key's updates with a lead() window (one shuffle on the
    key), closes the initial row at the key's first update, and leaves
    the final update open — standard half-open validity intervals.

    Scale: one window + one aggregate, both keyed on c_custkey, so the
    whole build reuses a single hash partitioning; the initial-snapshot
    close is a broadcast of per-key min timestamps (node... key-sized,
    not log-sized). This is exactly what a lakehouse MERGE executes
    internally; see operators/upsert.py."""
    from ror_etl_spark.operators.upsert import scd2_apply

    t = Tables(spark, sf_dir)
    upd = (
        t.orders.groupBy(
            F.col("o_custkey").alias("c_custkey"),
            F.col("o_orderdate").alias("ts"),
        )
        .agg(
            F.max_by("o_orderstatus", "o_orderkey").alias("status"),
            F.round(F.max_by("o_totalprice", "o_orderkey"), 2).alias("price"),
        )
    )
    initial = t.customer.select(
        "c_custkey",
        F.lit("NEW").alias("status"),
        F.lit(0.0).alias("price"),
        F.lit("1992-01-01 00:00:00").cast("timestamp").alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
    )
    hist = scd2_apply(initial, upd, key="c_custkey", ts_col="ts")
    out = hist.select(
        "c_custkey",
        "status",
        "price",
        F.date_format("valid_from", "yyyy-MM-dd").alias("valid_from"),
        F.date_format("valid_to", "yyyy-MM-dd").alias("valid_to"),
        F.col("valid_to").isNull().alias("is_current"),
    )
    return ordered(out, "c_custkey", "valid_from")


@query(
    "ewma_daily_revenue",
    oracle="""
    WITH daily AS (
      SELECT date_trunc('day', o_orderdate) AS d, sum(o_totalprice) AS rev
      FROM orders GROUP BY 1),
    sm AS (
      SELECT a.d, a.rev,
             sum(b.rev * pow(0.7, date_diff('day', b.d, a.d))) AS wsum,
             sum(pow(0.7, date_diff('day', b.d, a.d))) AS wnorm
      FROM daily a JOIN daily b
        ON b.d <= a.d AND b.d >= a.d - INTERVAL 29 DAY
      GROUP BY a.d, a.rev)
    SELECT strftime(d, '%Y-%m-%d') AS day,
           round(rev, 2) AS revenue,
           round(wsum / wnorm + 1e-9, 2) AS ewma30
    FROM sm ORDER BY day
    """,
    priority=3,
)
def ewma_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Truncated EWMA (alpha-decay 0.7/day, 30-day support) over daily
    revenue, as a bounded equi-join fan-out instead of a recursive scan.

    The textbook EWMA recurrence is order-dependent (each value needs
    the previous smoothed value), which distributes badly. The truncated
    form is a closed-form weighted average over a bounded lag window, so
    it becomes: daily aggregate (the only corpus-sized stage) -> explode
    30 lag offsets -> hash-aggregate on the shifted day -> join back to
    observed days. All equi-joins; the fan-out input is day-sized
    (bounded by the calendar, not the data), so at 100 TB the plan cost
    is still dominated by the one groupBy(day) over raw orders. The
    oracle states the identical closed form as a band self-join —
    b.d ∈ [a.d-29, a.d] ⟺ a.d = b.d + j, j ∈ [0, 29]."""
    t = Tables(spark, sf_dir)
    daily = t.orders.groupBy(
        F.date_trunc("day", "o_orderdate").alias("d")
    ).agg(F.sum("o_totalprice").alias("rev"))
    fan = daily.select(
        F.col("rev").alias("brev"),
        F.explode(F.sequence(F.lit(0), F.lit(29))).alias("j"),
        F.col("d").alias("bd"),
    ).select(
        "brev",
        "j",
        F.timestamp_add("DAY", F.col("j"), F.col("bd")).alias("ad"),
    )
    sm = fan.groupBy("ad").agg(
        F.sum(F.col("brev") * F.pow(F.lit(0.7), F.col("j"))).alias("wsum"),
        F.sum(F.pow(F.lit(0.7), F.col("j"))).alias("wnorm"),
    )
    out = daily.join(sm, daily["d"] == sm["ad"]).select(
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        r2("rev").alias("revenue"),
        F.round(F.col("wsum") / F.col("wnorm") + 1e-9, 2).alias("ewma30"),
    )
    return ordered(out, "day")


@query(
    "scd2_point_in_time_join",
    oracle="""
    WITH upd AS (
      SELECT o_custkey AS c_custkey,
             arg_max(o_orderstatus, o_orderkey) AS status,
             o_orderdate AS vf
      FROM orders GROUP BY o_custkey, o_orderdate),
    chained AS (
      SELECT c_custkey, status, vf,
             lead(vf) OVER (PARTITION BY c_custkey ORDER BY vf) AS vt
      FROM upd),
    first_upd AS (SELECT c_custkey, min(vf) AS f FROM upd GROUP BY c_custkey),
    initial AS (
      SELECT c.c_custkey, 'NEW' AS status,
             TIMESTAMP '1992-01-01' AS vf, f.f AS vt
      FROM customer c LEFT JOIN first_upd f ON c.c_custkey = f.c_custkey),
    hist AS (SELECT * FROM initial UNION ALL SELECT * FROM chained),
    facts AS (
      SELECT o.o_custkey AS c_custkey,
             CAST(l.l_shipdate AS TIMESTAMP) AS ship_ts,
             l.l_extendedprice * (1 - l.l_discount) AS rev
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey)
    SELECT h.status,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(count(DISTINCT f.c_custkey) AS BIGINT) AS n_customers,
           round(sum(f.rev), 2) AS revenue
    FROM facts f JOIN hist h
      ON f.c_custkey = h.c_custkey
     AND h.vf <= f.ship_ts AND (h.vt IS NULL OR f.ship_ts < h.vt)
    GROUP BY h.status ORDER BY h.status
    """,
    priority=5,
)
def scd2_point_in_time_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (temporal/PIT) join: every shipment line joins the
    SCD2 customer-status VERSION that was valid on its ship date — the
    canonical "no time travel leakage" feature join for both reporting
    and ML training sets.

    The naive plan is an interval join (vf <= ts < vt) — a range join
    that Spark executes as BNLJ or an exploding range-bucket join. But
    SCD2 validity intervals are half-open and contiguous per key, so
    PIT-join == AS-OF join on valid_from (latest version starting at or
    before the fact timestamp): we reuse operators/asof.asof_join —
    union both sides, ONE shuffle on the customer key, per-key window,
    state bounded by the frame. valid_to only breaks the one legitimate
    same-timestamp collision (a customer whose first order lands on the
    epoch gets an empty initial interval; ordering right rows by
    coalesce(valid_to, MAX) puts the non-empty version last, and
    last-wins matches the interval semantics the oracle's BETWEEN join
    replays). At 100 TB: facts shuffle once, dimension versions are
    key-sized, no range explosion."""
    from ror_etl_spark.operators.asof import asof_join
    from ror_etl_spark.operators.upsert import scd2_apply

    t = Tables(spark, sf_dir)
    upd = t.orders.groupBy(
        F.col("o_custkey").alias("c_custkey"),
        F.col("o_orderdate").alias("ts"),
    ).agg(F.max_by("o_orderstatus", "o_orderkey").alias("status"))
    initial = t.customer.select(
        "c_custkey",
        F.lit("NEW").alias("status"),
        F.lit("1992-01-01 00:00:00").cast("timestamp").alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
    )
    hist = scd2_apply(initial, upd, key="c_custkey", ts_col="ts").withColumn(
        "vt_key",
        F.coalesce(
            F.col("valid_to"), F.lit("9999-12-31 00:00:00").cast("timestamp")
        ),
    )
    facts = (
        t.lineitem.join(
            t.orders.select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select(
            F.col("o_custkey").alias("c_custkey"),
            F.col("l_shipdate").cast("timestamp").alias("ship_ts"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
        )
    )
    joined = asof_join(
        facts,
        hist.select("c_custkey", "valid_from", "status", "vt_key"),
        on="c_custkey",
        left_time="ship_ts",
        right_time="valid_from",
        right_values=["status"],
        right_order=["vt_key"],
    )
    return (
        joined.groupBy("status")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.countDistinct("c_custkey").alias("n_customers"),
            F.round(F.sum("rev"), 2).alias("revenue"),
        )
        .orderBy("status")
    )


@query(
    "orders_state_asof_date",
    oracle="""
    WITH upd AS (
      SELECT o_custkey AS c, o_orderdate AS d,
             arg_max(o_orderstatus, o_orderkey) AS st
      FROM orders WHERE o_orderdate <= DATE '1994-06-30'
      GROUP BY o_custkey, o_orderdate),
    latest AS (
      SELECT c, arg_max(st, d) AS st FROM upd GROUP BY c),
    base AS (
      SELECT cu.c_custkey, COALESCE(l.st, 'NEW') AS status
      FROM customer cu LEFT JOIN latest l ON cu.c_custkey = l.c)
    SELECT status, CAST(count(*) AS BIGINT) AS n_customers
    FROM base GROUP BY status ORDER BY status
    """,
    priority=5,
)
def orders_state_asof_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time travel: reconstruct the dimension's state AS OF a past date
    from the change log alone — the lakehouse "SELECT ... TIMESTAMP AS
    OF" semantics, expressed against the same order-status change
    stream the SCD2 build consumes. Snapshot = per customer, the
    latest update at or before the cut; customers with no update yet
    are in their initial 'NEW' state.

    Plan: the date filter pushes into the scan (only pre-cut rows are
    read — at 100 TB with date-partitioned logs this is partition
    pruning, the whole point of log-structured time travel), then two
    max_by aggregates on the customer key and one broadcast-sized
    status count. No SCD2 interval materialization needed for a single
    cut; the PIT join above is the general many-timestamps form."""
    t = Tables(spark, sf_dir)
    cut = F.lit("1994-06-30").cast("date")
    upd = (
        t.orders.where(F.col("o_orderdate") <= cut)
        .groupBy(F.col("o_custkey").alias("c"), F.col("o_orderdate").alias("d"))
        .agg(F.max_by("o_orderstatus", "o_orderkey").alias("st"))
    )
    latest = upd.groupBy("c").agg(F.max_by("st", "d").alias("st"))
    cust = t.customer.select("c_custkey")
    base = cust.join(
        latest, cust["c_custkey"] == latest["c"], "left"
    ).select(F.coalesce(F.col("st"), F.lit("NEW")).alias("status"))
    return (
        base.groupBy("status")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy("status")
    )
