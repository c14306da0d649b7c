"""Engine-mechanics queries: iterative PageRank with a fully unrolled SQL
oracle, skew-salted join equivalence, and a column profiler.

These register operator families that previously only had pytest evidence
(skew salting) or no driver-facing demo at all (iterative graph
algorithms beyond connected components, data profiling) as hash-checked
driver queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ror_etl_spark.queries.util import r2
from ror_etl_spark.registry import query
from ror_etl_spark.tables import Tables

_PR_D = 0.85
_PR_ITERS = 5
_PR_ROUND = 8


def _pagerank_oracle() -> str:
    """Unrolled weighted-PageRank replay: the trajectory is a pure
    function of the edge weights because every iteration's ranks are
    quantized to 8 dp (same trick as the k-means oracle — fp summation
    order cannot drift a rounded fixpoint)."""
    ctes = [
        """nodes AS (SELECT n_nationkey AS id FROM nation)""",
        """edges AS (
      SELECT s.s_nationkey AS u, c.c_nationkey AS v, count(*) AS w
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      GROUP BY u, v)""",
        """wout AS (SELECT u, sum(w) AS wu FROM edges GROUP BY u)""",
        """efrac AS (
      SELECT e.u, e.v, e.w / wout.wu AS frac
      FROM edges e JOIN wout ON e.u = wout.u)""",
        """nn AS (SELECT count(*) AS n FROM nodes)""",
        f"""r0 AS (SELECT id, round(1.0 / (SELECT n FROM nn), {_PR_ROUND}) AS pr
      FROM nodes)""",
    ]
    for i in range(_PR_ITERS):
        ctes.append(
            f"""r{i + 1} AS (
      SELECT nodes.id,
             round((1 - {_PR_D}) / (SELECT n FROM nn)
                   + {_PR_D} * coalesce(sum(r.pr * e.frac), 0.0),
                   {_PR_ROUND}) AS pr
      FROM nodes
      LEFT JOIN efrac e ON e.v = nodes.id
      LEFT JOIN r{i} r ON r.id = e.u
      GROUP BY nodes.id)"""
        )
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"""
    SELECT id AS nationkey, round(pr, 6) AS pagerank
    FROM r{_PR_ITERS}
    ORDER BY pagerank DESC, nationkey
    """
    )


@query("pagerank_nation_trade", oracle=_pagerank_oracle(), priority=2)
def pagerank_nation_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank over the nation-level trade graph (supplier
    nation → customer nation, edge weight = shipment count), 5 iterations,
    d=0.85. The iterative-join pattern is the same one the ultimate-parent
    rollup uses: per iteration, ONE shuffle keyed by node id — rank flows
    along edges (join on u), re-aggregates at the destination (groupBy v).
    Edge fractions are precomputed once; per-iteration ranks are quantized
    to 8 dp so the trajectory is engine-portable and the DuckDB oracle
    replays all 5 iterations CTE-for-CTE. At 100 TB the edge list is the
    big table and this exact plan holds — ranks are node-sized, edges
    partition by source, and each iteration is a standard reduce."""
    t = Tables(spark, sf_dir)
    edges = (
        t.lineitem.join(t.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t.customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(t.supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(
            F.col("s_nationkey").alias("u"), F.col("c_nationkey").alias("v")
        )
        .agg(F.count(F.lit(1)).alias("w"))
    )
    wout = edges.groupBy("u").agg(F.sum("w").alias("wu"))
    efrac = (
        edges.join(wout, "u")
        .select("u", "v", (F.col("w") / F.col("wu")).alias("frac"))
        .localCheckpoint(eager=False)
    )
    nodes = t.nation.select(F.col("n_nationkey").alias("id"))
    n = nodes.count()
    ranks = nodes.select("id", F.round(F.lit(1.0 / n), _PR_ROUND).alias("pr"))
    for _ in range(_PR_ITERS):
        contrib = (
            efrac.join(ranks, efrac["u"] == ranks["id"])
            .select("v", (F.col("pr") * F.col("frac")).alias("m"))
            .groupBy("v")
            .agg(F.sum("m").alias("mass"))
        )
        ranks = nodes.join(contrib, nodes["id"] == contrib["v"], "left").select(
            "id",
            F.round(
                F.lit((1 - _PR_D) / n) + _PR_D * F.coalesce("mass", F.lit(0.0)),
                _PR_ROUND,
            ).alias("pr"),
        )
    return ranks.select(
        F.col("id").alias("nationkey"), F.round("pr", 6).alias("pagerank")
    ).orderBy(F.desc("pagerank"), F.asc("nationkey"))


@query(
    "salted_join_segment_revenue",
    oracle="""
    SELECT c.c_mktsegment, count(*) AS n_orders,
           round(sum(o.o_totalprice), 2) AS revenue
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    ORDER BY c.c_mktsegment
    """,
    priority=2,
)
def salted_join_segment_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The skew-salting operator (operators/skew.py) on the driver gate:
    orders⋈customer with an 8-way salt, then segment revenue. The oracle
    is the PLAIN join — salting must be a pure physical rewrite with zero
    semantic effect, and this query pins that equivalence end to end.
    Use when one customer owns so many orders that even AQE's skew split
    leaves a straggler reducer."""
    from ror_etl_spark.operators.skew import salted_join

    t = Tables(spark, sf_dir)
    j = salted_join(
        t.orders.select("o_custkey", "o_totalprice"),
        t.customer.select("c_custkey", "c_mktsegment"),
        "o_custkey",
        "c_custkey",
        n_salts=8,
    )
    return (
        j.groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_orders"), r2(F.sum("o_totalprice")).alias("revenue"))
        .orderBy("c_mktsegment")
    )


@query(
    "column_profile_orders",
    oracle="""
    SELECT 'o_orderkey' AS col, count(*) AS n, count(*) - count(o_orderkey) AS n_null,
           count(DISTINCT o_orderkey) AS n_distinct,
           CAST(min(o_orderkey) AS VARCHAR) AS min_v, CAST(max(o_orderkey) AS VARCHAR) AS max_v
    FROM orders
    UNION ALL
    SELECT 'o_custkey', count(*), count(*) - count(o_custkey),
           count(DISTINCT o_custkey),
           CAST(min(o_custkey) AS VARCHAR), CAST(max(o_custkey) AS VARCHAR)
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus', count(*), count(*) - count(o_orderstatus),
           count(DISTINCT o_orderstatus),
           min(o_orderstatus), max(o_orderstatus)
    FROM orders
    UNION ALL
    SELECT 'o_orderpriority', count(*), count(*) - count(o_orderpriority),
           count(DISTINCT o_orderpriority),
           min(o_orderpriority), max(o_orderpriority)
    FROM orders
    UNION ALL
    SELECT 'o_totalprice', count(*), count(*) - count(o_totalprice),
           count(DISTINCT o_totalprice),
           CAST(round(min(o_totalprice), 2) AS VARCHAR),
           CAST(round(max(o_totalprice), 2) AS VARCHAR)
    FROM orders
    ORDER BY col
    """,
)
def column_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data profiling pass (the first thing run on any new 100 TB
    delivery): per-column null counts, distinct cardinality, min/max.
    ONE scan computes every column's profile — the per-column aggregates
    are expressed together and Catalyst fuses them into a single
    aggregation over the scan, rather than 5 separate passes; the union
    shape below mirrors the oracle for checkability, with each leg
    reading the same cached scan."""
    o = Tables(spark, sf_dir).orders

    def leg(col: str, minmax_cast: bool = True, round2: bool = False) -> DataFrame:
        mn, mx = F.min(col), F.max(col)
        if round2:
            mn, mx = F.round(mn, 2), F.round(mx, 2)
        return o.agg(
            F.lit(col).alias("col"),
            F.count(F.lit(1)).alias("n"),
            (F.count(F.lit(1)) - F.count(col)).alias("n_null"),
            F.count_distinct(F.col(col)).alias("n_distinct"),
            mn.cast("string").alias("min_v"),
            mx.cast("string").alias("max_v"),
        )

    legs = [
        leg("o_orderkey"),
        leg("o_custkey"),
        leg("o_orderstatus"),
        leg("o_orderpriority"),
        leg("o_totalprice", round2=True),
    ]
    out = legs[0]
    for other in legs[1:]:
        out = out.unionAll(other)
    return out.orderBy("col")
