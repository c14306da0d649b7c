"""Operators STAGED for round 9 — implemented and oracle-checked by
pytest, but NOT registered: VERDICT r7 item 1 froze the registry at 274
until the driver's verdict window drains the 52-query backlog. Round 9
flips them live by calling ``register()`` (or moving the entries into
their natural modules with ``@query``) once CORRECTNESS_r08 lands.

Each entry follows the registry discipline (registry.py module
docstring): aliases identical on both sides, epsilon-rounded floats,
deterministic tiebreaks. ``tests/test_staged_r9.py`` runs the same
Spark-vs-DuckDB comparison the driver gate does.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ror_etl_spark.operators.util import spread
from ror_etl_spark.queries.corpusops import _TOKS_SQL
from ror_etl_spark.functions.text import tokens
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
    """r9 switch: move every staged query into the live registry."""
    from ror_etl_spark.registry import query

    for name, (fn, oracle) in STAGED.items():
        query(name, oracle=oracle)(fn)


@staged(
    "good_turing_word_smoothing",
    oracle=f"""
    WITH wc AS (
      SELECT w, count(*) AS c
      FROM (SELECT unnest({_TOKS_SQL}) AS w FROM documents)
      WHERE w <> '' GROUP BY w),
    s AS (SELECT c AS r, CAST(count(*) AS BIGINT) AS n_types FROM wc GROUP BY c)
    SELECT CAST(s.r AS BIGINT) AS r,
           s.n_types,
           round((s.r + 1) * s2.n_types / s.n_types + 1e-9, 4) AS r_star
    FROM s LEFT JOIN s s2 ON s2.r = s.r + 1
    ORDER BY r
    """,
)
def good_turing_word_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Good-Turing frequency smoothing over the corpus unigram counts:
    S(r) = number of word types seen exactly r times, and the adjusted
    count r* = (r+1)·S(r+1)/S(r) — the classical estimator every
    language-model smoother (Katz backoff, simple GT) starts from.
    r* is NULL where S(r+1)=0 (the raw estimator is undefined there;
    production smoothers regress log S(r) — out of scope for the
    frequency table itself).

    Scale shape: one corpus-sized word-count aggregate (the same pass
    the BPE trainer makes), then a count-of-counts aggregate over the
    VOCABULARY-sized table and a self-join on the count-domain-sized
    S(r) table (hundreds of rows at any corpus size — frequency of
    frequencies collapses Heaps-law vocabularies)."""
    d = spread(Tables(spark, sf_dir).documents)
    wc = (
        d.select(F.explode(tokens(F.col("text"))).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    s = wc.groupBy(F.col("c").alias("r")).agg(F.count(F.lit(1)).alias("n_types"))
    s2 = s.select((F.col("r") - 1).alias("r"), F.col("n_types").alias("n_next"))
    return (
        s.join(s2, "r", "left")
        .select(
            "r",
            "n_types",
            F.round(
                (F.col("r") + 1) * F.col("n_next") / F.col("n_types") + 1e-9, 4
            ).alias("r_star"),
        )
        .orderBy("r")
    )


@staged(
    "seasonal_naive_backtest",
    oracle="""
    WITH daily AS (
      SELECT o_orderdate AS dt, sum(o_totalprice) AS rev
      FROM orders GROUP BY o_orderdate),
    fc AS (
      SELECT dt, rev,
             lag(rev, 7) OVER (ORDER BY dt) AS pred
      FROM daily)
    SELECT CAST(date_diff('day', DATE '1970-01-01', dt) % 7 AS BIGINT) AS weekday,
           CAST(count(*) AS BIGINT) AS n_days,
           round(avg(abs(rev - pred) / rev) + 1e-9, 4) AS mape,
           round(avg(pred - rev) + 1e-9, 2) AS bias
    FROM fc WHERE pred IS NOT NULL
    GROUP BY weekday ORDER BY weekday
    """,
)
def seasonal_naive_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive forecast backtest — the baseline every revenue
    forecaster must beat: predict each day's revenue as the revenue
    seven days earlier, then score per weekday (MAPE + signed bias).
    Weekday is days-since-epoch mod 7, integer-exact on both engines
    (same convention as timeseries_decompose_weekday).

    Scale shape: one date-keyed aggregate is the only corpus-sized
    work; the lag window and scoring run on the calendar-bounded daily
    frame and a 7-row aggregate."""
    from pyspark.sql import Window

    o = Tables(spark, sf_dir).orders
    daily = o.groupBy(F.col("o_orderdate").alias("dt")).agg(
        F.sum("o_totalprice").alias("rev")
    )
    fc = daily.select(
        "dt", "rev", F.lag("rev", 7).over(Window.orderBy("dt")).alias("pred")
    ).filter(F.col("pred").isNotNull())
    weekday = F.datediff(F.col("dt"), F.lit("1970-01-01").cast("date")) % 7
    return (
        fc.groupBy(weekday.cast("long").alias("weekday"))
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.round(
                F.avg(F.abs(F.col("rev") - F.col("pred")) / F.col("rev")) + 1e-9, 4
            ).alias("mape"),
            F.round(F.avg(F.col("pred") - F.col("rev")) + 1e-9, 2).alias("bias"),
        )
        .orderBy("weekday")
    )


@staged(
    "theil_sen_daily_revenue",
    oracle="""
    WITH daily AS (
      SELECT date_diff('day', DATE '1970-01-01', o_orderdate) AS day_idx,
             sum(o_totalprice) AS rev
      FROM orders GROUP BY o_orderdate),
    slopes AS (
      SELECT (b.rev - a.rev) / (b.day_idx - a.day_idx) AS slope
      FROM daily a JOIN daily b ON b.day_idx > a.day_idx),
    sl AS (SELECT round(quantile_cont(slope, 0.5) + 1e-9, 4) AS slope
           FROM slopes)
    SELECT CAST((SELECT count(*) FROM daily) AS BIGINT) AS n_days,
           CAST((SELECT count(*) FROM slopes) AS BIGINT) AS n_pairs,
           sl.slope,
           round(quantile_cont(d.rev - sl.slope * d.day_idx, 0.5) + 1e-9, 2)
             AS intercept
    FROM daily d, sl
    GROUP BY sl.slope
    """,
)
def theil_sen_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust trend: the median of all pairwise slopes of the
    daily-revenue series, plus the matching median intercept — the
    outlier-proof alternative to OLS for drift monitoring (29% breakdown
    point vs OLS's zero). The slope is quantized BEFORE the intercept
    pass so the second median sees identical inputs on both engines.

    Scale shape: the corpus-sized work is one date-keyed aggregate; the
    pairwise self-join is over the CALENDAR-bounded daily frame (~2.4k
    days → ~3M slope pairs at 7 years, flat in data volume), and both
    medians interpolate over sorted bounded frames (exact percentile,
    not a sketch — the estimator's definition)."""
    o = Tables(spark, sf_dir).orders
    daily = (
        o.groupBy(F.col("o_orderdate").alias("dt"))
        .agg(F.sum("o_totalprice").alias("rev"))
        .select(
            F.datediff(F.col("dt"), F.lit("1970-01-01").cast("date"))
            .cast("long")
            .alias("day_idx"),
            "rev",
        )
    )
    a, b = daily.alias("a"), daily.alias("b")
    slopes = a.join(b, F.col("b.day_idx") > F.col("a.day_idx")).select(
        (
            (F.col("b.rev") - F.col("a.rev"))
            / (F.col("b.day_idx") - F.col("a.day_idx"))
        ).alias("slope")
    )
    sl = slopes.agg(
        F.round(F.expr("percentile(slope, 0.5)") + 1e-9, 4).alias("slope"),
        F.count(F.lit(1)).alias("n_pairs"),
    )
    return (
        daily.crossJoin(F.broadcast(sl))
        .groupBy("slope", "n_pairs")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.round(
                F.expr("percentile(rev - slope * day_idx, 0.5)") + 1e-9, 2
            ).alias("intercept"),
        )
        .select("n_days", "n_pairs", "slope", "intercept")
    )


@staged(
    "hierarchy_depth_layers",
    oracle="""
    SELECT CAST(o_orderkey + 1 AS BIGINT) AS id,
           CAST(o_orderkey % 10 AS BIGINT) AS layer
    FROM orders
    ORDER BY id
    """,
)
def hierarchy_depth_layers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Topological LAYER of every node in the parent forest (its depth
    below the root — what a Kahn peel emits round by round): the rollup
    kernel's doubling recurrence extended to carry hop COUNTS, so depth
    resolves in ⌈log2 depth⌉ shuffles instead of depth peel rounds.
    Each doubling step jumps anc → anc's anc and adds the jumped-over
    hop count; roots self-loop with 0 hops, so the sum converges to the
    exact depth. Oracle is the forest's closed form (chains of 10 —
    see queries/graph.py): depth = (id-1) mod 10.

    Scale shape: identical to ultimate_parent_rollup — log-depth
    iterations of one join each over a 3-column frame."""
    from ror_etl_spark.queries.graph import synthetic_edges

    edges = synthetic_edges(spark, sf_dir)
    m = edges.select(
        "id",
        F.col("parent").alias("anc"),
        F.when(F.col("parent") == F.col("id"), F.lit(0))
        .otherwise(F.lit(1))
        .cast("long")
        .alias("steps"),
    ).localCheckpoint(eager=False)
    for _ in range(4):  # chains are 10 deep; 2^4 = 16 covers them
        hop = m.select(
            F.col("id").alias("h_id"),
            F.col("anc").alias("h_anc"),
            F.col("steps").alias("h_steps"),
        )
        m = (
            m.join(hop, m["anc"] == hop["h_id"], "left")
            .select(
                m["id"],
                F.coalesce(hop["h_anc"], m["anc"]).alias("anc"),
                (m["steps"] + F.coalesce(hop["h_steps"], F.lit(0))).alias("steps"),
            )
            .localCheckpoint(eager=False)
        )
    return m.select("id", F.col("steps").alias("layer")).orderBy("id")


_LPA_ROUNDS = 3


def _lpa_oracle(rounds: int = _LPA_ROUNDS) -> str:
    ctes = [
        """edges AS (
      SELECT s.s_nationkey AS u, c.c_nationkey AS v, CAST(count(*) AS BIGINT) AS w
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      GROUP BY u, v)""",
        """und AS (
      SELECT u, v, w FROM edges UNION ALL
      SELECT v AS u, u AS v, w FROM edges)""",
        """nodes AS (SELECT n_nationkey AS id FROM nation)""",
        """l0 AS (SELECT id, id AS label FROM nodes)""",
    ]
    for i in range(rounds):
        ctes.append(
            f"""c{i} AS (
      SELECT e.u AS id, l.label, sum(e.w) AS wt
      FROM und e JOIN l{i} l ON l.id = e.v
      GROUP BY e.u, l.label)"""
        )
        ctes.append(
            f"""p{i} AS (
      SELECT id, label FROM (
        SELECT id, label,
               row_number() OVER (PARTITION BY id ORDER BY wt DESC, label) AS rn
        FROM c{i}) WHERE rn = 1)"""
        )
        ctes.append(
            f"""l{i + 1} AS (
      SELECT nodes.id, coalesce(p{i}.label, nodes.id) AS label
      FROM nodes LEFT JOIN p{i} ON p{i}.id = nodes.id)"""
        )
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"""
    SELECT CAST(id AS BIGINT) AS nationkey, CAST(label AS BIGINT) AS community
    FROM l{rounds}
    ORDER BY nationkey
    """
    )


@staged("label_propagation_communities", oracle=_lpa_oracle())
def label_propagation_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synchronous label propagation (community detection) on the
    undirected nation trade graph: every node starts as its own label;
    each round it adopts the label with the greatest incident edge
    weight among its neighbours (tiebreak: smallest label — the
    determinism knob async LPA lacks). Three fixed rounds, so the DuckDB
    oracle replays the trajectory round for round, exactly like the
    PageRank twin.

    Scale shape: per round ONE shuffle — labels join edges on the
    neighbour key and re-aggregate at the node (weights are integer
    counts, so the argmax is exact); labels are node-sized, edges are
    the big table, same plan as pagerank_nation_trade."""
    t = Tables(spark, sf_dir)
    edges = (
        t.lineitem.join(t.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t.customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(t.supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.col("s_nationkey").alias("u"), F.col("c_nationkey").alias("v"))
        .agg(F.count(F.lit(1)).alias("w"))
    )
    und = edges.unionAll(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"), "w")
    ).localCheckpoint(eager=False)
    nodes = t.nation.select(F.col("n_nationkey").alias("id"))
    labels = nodes.select("id", F.col("id").alias("label"))
    from pyspark.sql import Window

    for _ in range(_LPA_ROUNDS):
        votes = (
            und.join(labels, und["v"] == labels["id"])
            .groupBy(und["u"].alias("nid"), "label")
            .agg(F.sum("w").alias("wt"))
        )
        pick = (
            votes.withColumn(
                "rn",
                F.row_number().over(
                    Window.partitionBy("nid").orderBy(
                        F.desc("wt"), F.asc("label")
                    )
                ),
            )
            .filter(F.col("rn") == 1)
            .select("nid", "label")
        )
        labels = nodes.join(pick, nodes["id"] == pick["nid"], "left").select(
            "id", F.coalesce(pick["label"], nodes["id"]).alias("label")
        )
    return labels.select(
        F.col("id").cast("long").alias("nationkey"),
        F.col("label").cast("long").alias("community"),
    ).orderBy("nationkey")
