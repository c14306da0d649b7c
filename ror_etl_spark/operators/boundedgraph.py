"""Bounded-graph BFS Arrow kernels (r12 optimization round).

The nation trade graph is bounded at |nations| nodes and |nations|·K
edges at ANY fact-table scale: the data-sized work — the 4-way fact
join, the groupBy(u, v) edge count, any per-u top-K sparsification —
stays fully distributed, and only the bounded edge aggregate crosses
into ONE Arrow kernel that replays the frontier loop (the
``_pr_trajectory_udf`` / ``_hits_trajectory_udf`` precedent). The old
loops ran one join + aggregate + DISK_ONLY checkpoint per round over
≤625-row frames (closeness additionally a driver ``isEmpty()`` action
per round) — pure fixed cost at every scale.

Exactness: hop levels are INTEGER arithmetic — the kernels reproduce
the relational frontier loops' outputs identically with no float
crossing (the one float, closeness's final ratio, stays a Spark
expression). Each kernel is ``asNondeterministic`` so Catalyst cannot
duplicate the eval under pushed filters (guide §4.4).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql.functions import pandas_udf


def _bfs_from(adj: dict, src, max_hops: int) -> dict:
    """Integer hop distances from ``src`` over ``adj`` (node -> list of
    successors), capped at ``max_hops`` rounds — exactly the relational
    frontier-delta loop: per round expand last round's discoveries,
    drop already-settled nodes."""
    dist = {src: 0}
    frontier = [src]
    lvl = 0
    while frontier and lvl < max_hops:
        lvl += 1
        nxt = []
        for u in frontier:
            for v in adj.get(u, ()):
                if v not in dist:
                    dist[v] = lvl
                    nxt.append(v)
        frontier = nxt
    return dist


def eccentricity_udf(max_hops: int):
    """(a, b) undirected edge list in, per-node eccentricity plus graph
    diameter and radius out — multi-source BFS over the bounded graph.
    Nodes are the edge endpoints (matching the relational loop's seed);
    eccentricity is the max distance over the set reached within
    ``max_hops``."""

    @pandas_udf("array<struct<id: int, ecc: bigint, diameter: bigint, radius: bigint>>")
    def ecc(es: pd.Series) -> pd.Series:
        out = []
        for edge_list in es:
            adj: dict = {}
            nodes = set()
            for e in edge_list:
                a, b = e["a"], e["b"]
                adj.setdefault(a, []).append(b)
                adj.setdefault(b, []).append(a)
                nodes.update((a, b))
            eccs = {
                s: max(_bfs_from(adj, s, max_hops).values()) for s in nodes
            }
            diam = max(eccs.values()) if eccs else 0
            rad = min(eccs.values()) if eccs else 0
            out.append(
                [
                    {"id": int(s), "ecc": e, "diameter": diam, "radius": rad}
                    for s, e in eccs.items()
                ]
            )
        return pd.Series(out)

    return ecc.asNondeterministic()


def bfs_levels_udf(source: int, max_hops: int):
    """(u, v) directed edge list in, (node, level) rows of the BFS tree
    from ``source`` out — the single-source variant. The source is
    settled at level 0 even when absent from the edge list, matching
    the relational loop's literal seed frontier."""

    @pandas_udf("array<struct<node: int, level: bigint>>")
    def levels(es: pd.Series) -> pd.Series:
        out = []
        for edge_list in es:
            adj: dict = {}
            for e in edge_list:
                adj.setdefault(e["u"], []).append(e["v"])
            dist = _bfs_from(adj, source, max_hops)
            out.append([{"node": int(n), "level": d} for n, d in dist.items()])
        return pd.Series(out)

    return levels.asNondeterministic()


def closeness_udf(max_hops: int):
    """(u, v) directed edge list in, per-source (src, n_reached,
    total_d) out — multi-source BFS seeded at every node WITH out-edges
    (the relational loop's distinct-u seed). n_reached excludes the
    source itself; total_d sums hop levels over the reached set."""

    @pandas_udf("array<struct<src: int, n_reached: bigint, total_d: bigint>>")
    def closeness(es: pd.Series) -> pd.Series:
        out = []
        for edge_list in es:
            adj: dict = {}
            for e in edge_list:
                adj.setdefault(e["u"], []).append(e["v"])
            rows = []
            for s in adj:
                dist = _bfs_from(adj, s, max_hops)
                rows.append(
                    {
                        "src": int(s),
                        "n_reached": len(dist) - 1,
                        "total_d": sum(dist.values()),
                    }
                )
            out.append(rows)
        return pd.Series(out)

    return closeness.asNondeterministic()
