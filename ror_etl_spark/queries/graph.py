"""Driver-contract exposure of the ultimate-parent rollup kernel (SURVEY §2
G1/G2, the reference's get_ultimate_parent.py re-expressed as a distributed
pointer-doubling fixpoint — see ror_etl_spark.operators.rollup).

The query derives a deterministic parent forest from the orders table:
ids are ``o_orderkey + 1`` (orderkeys are contiguous 0..N-1, so no
global row_number window is needed — the derivation is embarrassingly
parallel); each id points to id-1 except ids with ``id % 10 == 1`` which
are roots (self-loops). Chains are 10 deep, so the fixpoint needs
⌈log2 10⌉ = 4 doubling rounds — and the oracle is the closed form
``ultimate_parent = id - (id-1) % 10``, which checks every hop of the
distributed loop without needing recursion in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

# Loop-internal checkpoint blocks go to DISK, not storage memory:
# the r9 sf0.1 endurance sweep showed memory-backed checkpoint
# blocks accumulating across queries faster than the async
# ContextCleaner reaps them, starving later broadcast builds
# (NOTES.md r9; pinned by tests/test_checkpoint_discipline.py).
_DISK_ONLY = StorageLevel.DISK_ONLY

from ror_etl_spark.operators.rollup import ultimate_parent
from ror_etl_spark.registry import query
from ror_etl_spark.tables import Tables


def synthetic_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(id, parent) forest derived deterministically from orders."""
    o = Tables(spark, sf_dir).orders
    ids = o.select((F.col("o_orderkey") + 1).cast("long").alias("id"))
    return ids.select(
        "id",
        F.when(F.col("id") % 10 == 1, F.col("id")).otherwise(F.col("id") - 1).alias("parent"),
    )


@query(
    "ultimate_parent_rollup",
    oracle="""
    SELECT CAST(o_orderkey + 1 AS BIGINT) AS id,
           CAST(o_orderkey + 1 - o_orderkey % 10 AS BIGINT) AS ultimate_parent
    FROM orders
    ORDER BY id
    """,
    # r5: the kernel gained adaptive strategy routing — keep the flagship
    # (pinned-distributed) rollup in the driver's capped window so the
    # changed code path re-proves against the driver's own oracle run
    priority=2,
)
def ultimate_parent_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship kernel: resolve every node to its forest root."""
    edges = synthetic_edges(spark, sf_dir)
    # chains are 10 deep: 4 doubling rounds reach 16; a single combined
    # convergence+duplicate check lands on round 4 (check_every=4) and
    # exits there — one aggregate job for the whole fixpoint
    # local_threshold=0 pins the DISTRIBUTED fixpoint: this registered
    # query is the bench/plan-test evidence surface of the scale path —
    # the adaptive default would route an input this small to the
    # single-task strategy (covered by the shootout, the pipeline, and
    # the path-equivalence tests)
    result = ultimate_parent(edges, max_depth=16, check_every=4, local_threshold=0)
    return result.mapping


@query(
    "ultimate_parent_rollup_adaptive",
    oracle="""
    SELECT CAST(o_orderkey + 1 AS BIGINT) AS id,
           CAST(o_orderkey + 1 - o_orderkey % 10 AS BIGINT) AS ultimate_parent
    FROM orders
    ORDER BY id
    """,
)
def ultimate_parent_rollup_adaptive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same forest as ultimate_parent_rollup resolved through the
    kernel's ADAPTIVE routing (no local_threshold pin): at every test SF
    the edge count sits below the threshold, so this registers the
    single-task numpy-doubling strategy against the same closed-form
    oracle the distributed twin answers — driver-gate coverage for both
    physical strategies, not just pytest equivalence."""
    edges = synthetic_edges(spark, sf_dir)
    result = ultimate_parent(edges, max_depth=16, check_every=4)
    return result.mapping.orderBy("id")


@query(
    "ultimate_parent_deep_chain",
    oracle="""
    SELECT CAST(o_orderkey + 1 AS BIGINT) AS id, CAST(1 AS BIGINT) AS ultimate_parent
    FROM orders
    WHERE o_orderkey < 1000
    ORDER BY id
    """,
)
def ultimate_parent_deep_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One chain 1000 deep (id → id-1, root=1): exercises the log-depth
    guarantee — 1000 hops resolve in ⌈log2 1000⌉ = 10 doubling rounds,
    where the reference's recursive walk would exceed its depth-200 cap."""
    o = Tables(spark, sf_dir).orders
    ids = o.select((F.col("o_orderkey") + 1).cast("long").alias("id")).filter(
        F.col("id") <= 1000
    )
    edges = ids.select(
        "id", F.greatest(F.col("id") - 1, F.lit(1).cast("long")).alias("parent")
    )
    result = ultimate_parent(edges, max_depth=1024, check_every=2, local_threshold=0)
    return result.mapping.orderBy("id")


@query(
    "ultimate_parent_rollup_wide",
    oracle="""
    WITH pairs AS (SELECT DISTINCT l_orderkey AS k, l_linenumber AS ln FROM lineitem)
    SELECT CAST(k * 8 + ln AS BIGINT) AS id,
           CAST(k * 8 + min(ln) OVER (PARTITION BY k) AS BIGINT) AS ultimate_parent
    FROM pairs
    ORDER BY id
    """,
    priority=2,  # r5 kernel change — see ultimate_parent_rollup
)
def ultimate_parent_rollup_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kernel at fact-table width: one node per distinct (orderkey,
    linenumber) (≈480k at sf0.1); each node's parent is the previous
    existing linenumber of the same order (per-order lag window — keyed,
    parallel), the order's smallest linenumber is the root. The oracle is
    the closed form min-linenumber per order.

    Edge derivation is ONE shuffle and pure streaming codegen (r13): one
    l_orderkey exchange, sort by (order, linenumber), and a single lag()
    window. Duplicate (order, linenumber) rows (the fact table has ~25%)
    sort adjacent, so a row is the FIRST occurrence of its linenumber
    iff lag(linenumber) differs — and for those rows that same lag value
    IS the previous DISTINCT linenumber (null at the order's smallest →
    coalesce to self: the root). Row-identical to the r12
    groupBy+collect_set+sort_array+explode form (proved against the
    same closed-form oracle at 3 SFs), but with no ObjectHashAggregate
    (row-at-a-time, per-group set allocation on both sides of the
    exchange) and no Generate: the r12 shape spent ~1.1 s of this
    query's 2.9 s warm wall in those two stages (r13 event-log
    profile). The naive distinct-then-window form shuffles twice; this
    keeps the single exchange."""
    from pyspark.sql.window import Window

    li = Tables(spark, sf_dir).lineitem
    w = Window.partitionBy("l_orderkey").orderBy("l_linenumber")
    prev = F.lag("l_linenumber").over(w)
    k8 = F.col("l_orderkey") * 8
    edges = (
        li.select("l_orderkey", "l_linenumber")
        .withColumn("__prev", prev)
        .filter(F.col("__prev").isNull() | (F.col("__prev") != F.col("l_linenumber")))
        .select(
            (k8 + F.col("l_linenumber")).cast("long").alias("id"),
            (k8 + F.coalesce("__prev", "l_linenumber")).cast("long").alias("parent"),
        )
    )
    result = ultimate_parent(edges, max_depth=8, check_every=4, local_threshold=0)
    # no ORDER BY: the correctness gate hashes order-insensitively, and a
    # global sort of the full mapping is pure overhead at scale
    return result.mapping


_RECURSIVE_CTE_SQL = """
    WITH RECURSIVE chase (id, cur) AS (
      SELECT id, parent FROM parent_edges
      UNION ALL
      SELECT c.id, e.parent
      FROM chase c JOIN parent_edges e ON c.cur = e.id
      WHERE e.parent <> c.cur
    )
    SELECT c.id, c.cur AS ultimate_parent
    FROM chase c JOIN parent_edges r ON c.cur = r.id AND r.parent = c.cur
"""


@query(
    "ultimate_parent_recursive_cte",
    oracle="""
    SELECT CAST(o_orderkey + 1 AS BIGINT) AS id,
           CAST(o_orderkey + 1 - o_orderkey % 10 AS BIGINT) AS ultimate_parent
    FROM orders
    ORDER BY id
    """,
)
def ultimate_parent_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The G1 rollup expressed declaratively as a Spark 4 recursive CTE
    (WITH RECURSIVE) over the same synthetic forest as
    ultimate_parent_rollup — same closed-form oracle.

    Each recursion level chases one parent hop and stops at self-loop
    roots, so a chain of depth d costs d joins (linear) versus the
    pointer-doubling kernel's ⌈log2 d⌉ — this variant documents the
    declarative surface; the kernel remains the scale path for deep
    chains. The final self-join keeps only rows whose ancestor is a
    root, yielding exactly one row per id."""
    synthetic_edges(spark, sf_dir).createOrReplaceTempView("parent_edges")
    return spark.sql(_RECURSIVE_CTE_SQL)


@query(
    "connected_components_trade_graph",
    oracle="""
    WITH RECURSIVE w AS (
      SELECT s.s_nationkey AS u, c.c_nationkey AS v,
             CAST(count(*) AS BIGINT) AS wt
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      WHERE s.s_nationkey <> c.c_nationkey
      GROUP BY 1, 2),
    bar AS (SELECT 1.3 * avg(wt) AS b FROM w),
    edges AS (
      SELECT u, v FROM w CROSS JOIN bar WHERE wt >= bar.b
      UNION SELECT v, u FROM w CROSS JOIN bar WHERE wt >= bar.b),
    reach AS (
      SELECT n_nationkey AS v, CAST(n_nationkey AS BIGINT) AS r FROM nation
      UNION
      SELECT e.v, reach.r FROM reach JOIN edges e ON e.u = reach.v),
    comp AS (SELECT v, min(r) AS component FROM reach GROUP BY v),
    sizes AS (SELECT component, count(*) AS sz FROM comp GROUP BY component)
    SELECT CAST(comp.v AS BIGINT) AS n_nationkey, comp.component,
           CAST(sizes.sz AS BIGINT) AS component_size
    FROM comp JOIN sizes ON comp.component = sizes.component
    ORDER BY n_nationkey
    """,
    priority=5,
)
def connected_components_trade_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components as a FIRST-CLASS graph query (the fourth
    iterative graph algorithm on the gate, after PageRank, components
    inside the dedup funnel, and BFS): partition the nation trade graph
    into clusters connected by heavy trade lanes (edges at >= 1.3x the
    mean lane weight — a scale-free rule both engines re-derive, so the
    same decomposition falls out at every SF; isolated nations form
    singleton components).

    Drives operators/components.py::connected_components — iterative
    Hash-Min label propagation: per round ONE join (edges keyed by node)
    + one min-aggregate; state is (node, label), two longs; rounds are
    O(component diameter). The oracle is an independent formulation:
    recursive-CTE transitive closure (min reachable node id), so the
    hash gate proves the fixpoint loop computes true reachability, not
    just a stable labeling. At 100 TB the same loop runs with the edge
    list as the only big table — exactly the dedup-cluster plan, here
    exposed on the analytics surface."""
    from ror_etl_spark.operators.components import connected_components

    t = Tables(spark, sf_dir)
    w = (
        t.lineitem.join(t.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t.customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(t.supplier, F.col("s_suppkey") == F.col("l_suppkey"))
        .where(F.col("s_nationkey") != F.col("c_nationkey"))
        .groupBy(F.col("s_nationkey").alias("u"), F.col("c_nationkey").alias("v"))
        .agg(F.count(F.lit(1)).alias("wt"))
    )
    bar = w.agg((F.lit(1.3) * F.avg("wt")).alias("b"))
    edges = w.crossJoin(F.broadcast(bar)).where(F.col("wt") >= F.col("b"))
    res = connected_components(edges, left_col="u", right_col="v")
    nations = t.nation.select(F.col("n_nationkey").cast("long").alias("n_nationkey"))
    labeled = nations.join(
        res.labels.select(
            F.col("id").cast("long").alias("n_nationkey"),
            F.col("component").cast("long").alias("component"),
        ),
        "n_nationkey",
        "left",
    ).select(
        "n_nationkey",
        F.coalesce(F.col("component"), F.col("n_nationkey")).alias("component"),
    )
    sizes = labeled.groupBy("component").agg(F.count(F.lit(1)).alias("component_size"))
    return (
        labeled.join(F.broadcast(sizes), "component")
        .select("n_nationkey", "component", "component_size")
        .orderBy("n_nationkey")
    )


_BF_HOPS = 4


def _bf_oracle() -> str:
    """Unrolled Bellman-Ford replay: one CTE per relaxation round —
    integer edge costs, so the trajectory is exact in both engines."""
    ctes = [
        """edges AS (
      SELECT s.s_nationkey AS u, c.c_nationkey AS v,
             CAST(min(l.l_quantity) AS BIGINT) AS cost
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      WHERE s.s_nationkey <> c.c_nationkey
      GROUP BY 1, 2)""",
        """d0 AS (SELECT CAST(0 AS BIGINT) AS node, CAST(0 AS BIGINT) AS dist)""",
    ]
    for i in range(_BF_HOPS):
        ctes.append(
            f"""d{i + 1} AS (
      SELECT node, min(dist) AS dist FROM (
        SELECT node, dist FROM d{i}
        UNION ALL
        SELECT e.v AS node, d.dist + e.cost AS dist
        FROM d{i} d JOIN edges e ON e.u = d.node) q
      GROUP BY node)"""
        )
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"""
    SELECT node, dist FROM d{_BF_HOPS} ORDER BY node
    """
    )


@query("cheapest_path_bounded_hops", oracle=_bf_oracle(), priority=5)
def cheapest_path_bounded_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted single-source shortest path, bounded to 4 hops
    (distributed Bellman-Ford) — the WEIGHTED sibling of the BFS-levels
    query: relaxation replaces frontier expansion, integer lane costs
    (min shipment quantity per trade lane) replace hop counts, and the
    per-round recurrence d_{i+1}(v) = min(d_i(v), min_u d_i(u) + c(u,v))
    is exactly one join (state keyed by node against edges keyed by
    source) plus one min-aggregate per round.

    The hop bound makes the trajectory a finite exact object both
    engines replay: the oracle unrolls the four relaxation rounds
    CTE-for-CTE over the same integer costs, so the hash gate checks
    every round's fixpoint algebra, not just a converged answer. At
    100 TB the edge list is the one big table (same contract as
    PageRank/BFS/components here): state is node-sized, each round is
    a standard reduce, and the bound caps the iteration count the way
    a production path query caps search depth."""
    t = Tables(spark, sf_dir)
    edges = (
        t.lineitem.join(t.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t.customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(t.supplier, F.col("s_suppkey") == F.col("l_suppkey"))
        .where(F.col("s_nationkey") != F.col("c_nationkey"))
        .groupBy(F.col("s_nationkey").alias("u"), F.col("c_nationkey").alias("v"))
        .agg(F.min("l_quantity").cast("long").alias("cost"))
        .localCheckpoint(eager=False)
    )
    d = spark.range(1).select(
        F.lit(0).cast("long").alias("node"), F.lit(0).cast("long").alias("dist")
    )
    for _ in range(_BF_HOPS):
        relaxed = (
            d.join(edges, d["node"] == edges["u"])
            .select(F.col("v").alias("node"), (F.col("dist") + F.col("cost")).alias("dist"))
        )
        d = (
            d.unionByName(relaxed)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
            .localCheckpoint(eager=False, storageLevel=_DISK_ONLY)
        )
    return d.orderBy("node")


@query(
    "hierarchy_subtree_totals",
    oracle="""
    WITH ids AS (SELECT CAST(o_orderkey + 1 AS BIGINT) AS id FROM orders),
    lim AS (
      SELECT a.id,
             a.id - ((a.id - 1) % 10) AS root
      FROM ids a),
    j AS (
      SELECT a.id, CAST(sum(b.id % 97) AS BIGINT) AS subtree_total,
             CAST(count(*) AS BIGINT) AS subtree_size
      FROM lim a JOIN ids b
        ON b.id >= a.id AND b.id - ((b.id - 1) % 10) = a.root
      GROUP BY a.id)
    SELECT id, subtree_size, subtree_total FROM j ORDER BY id
    """,
    priority=5,
)
def hierarchy_subtree_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bottom-up hierarchy aggregation: every node's SUBTREE total (its
    own measure plus all descendants') — the org-chart / BOM / account
    rollup that complements ultimate_parent (which answers "who is my
    root"; this answers "what do I contain"). Measure = id % 97,
    deterministic.

    Distributed formulation: message passing. Every node emits one
    packet carrying its own measure; each round every packet hops to
    its current node's parent (one equi-join on the edge list) and is
    COUNTED at every node it visits (union into the totals stream);
    packets retire at self-loop roots. After depth rounds one
    aggregate sums visits per node — total shuffle volume is
    O(edges x depth), state is packet-sized, and no node ever
    materializes its full descendant set (the transitive-closure
    explosion this operator exists to avoid). The driver forest has
    depth <= 9; production trees bound rounds the same way the rollup
    does, alerting rather than spinning. The oracle computes subtree
    sums closed-form from the chain structure — an independent
    formulation, so the hash gate checks the message-passing algebra
    end to end.

    r12 optimization round: the trailing data-sized ORDER BY is gone
    (the gate hashes order-insensitively — the
    ultimate_parent_rollup_wide precedent, driver-green every round
    since r5). The per-round ``isEmpty()`` STAYS: besides the early
    exit it materializes each round's packet checkpoint incrementally,
    and an A/B without it ran 3.6 → 12.1 s — the single deferred
    action's 9-round chained plan loses the round-by-round
    materialization (the same lesson as the rollup's reverted
    checkpoint-every-round experiment)."""
    edges = synthetic_edges(spark, sf_dir).localCheckpoint(eager=False)
    own = edges.select("id", (F.col("id") % 97).alias("amt"))
    totals = own.select(F.col("id").alias("node"), "amt", F.lit(1).alias("vis"))
    packets = edges.select(F.col("id").alias("cur"), (F.col("id") % 97).alias("amt"))
    for _ in range(9):
        moved = (
            packets.join(edges, packets["cur"] == edges["id"])
            .where(F.col("parent") != F.col("cur"))
            .select(F.col("parent").alias("cur"), "amt")
            .localCheckpoint(eager=False, storageLevel=_DISK_ONLY)
        )
        if moved.isEmpty():
            break
        totals = totals.unionByName(
            moved.select(F.col("cur").alias("node"), "amt", F.lit(1).alias("vis"))
        )
        packets = moved
    return totals.groupBy(F.col("node").alias("id")).agg(
        F.sum("vis").alias("subtree_size"),
        F.sum("amt").alias("subtree_total"),
    )
