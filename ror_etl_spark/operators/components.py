"""Connected components by iterative min-label propagation.

The dedup funnel needs transitive closure over near-dup pairs: if A~B and
B~C, then {A,B,C} is one duplicate cluster even when A and C never share a
bucket. Pointer-doubling (operators/rollup.py) resolves directed forests;
undirected similarity graphs instead get min-label propagation:

    label(v) ← min(label(v), min over neighbors label(u))

repeated until fixpoint — O(diameter) rounds, each one join + one
aggregate, state = (node, label) two columns. Dedup clusters are shallow
(diameter a handful), so the loop ends in a few rounds; the bound caps
adversarial chains. At 100 TB this is the standard Hash-Min formulation:
shuffle volume per round is the edge list keyed by node, payload one long.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

# iteration frames are re-read a few times then dead; DISK_ONLY keeps
# them out of storage memory (see queries/util.ordered)
_DISK_ONLY = StorageLevel.DISK_ONLY


class ConvergenceError(RuntimeError):
    """Min-label propagation hit its iteration cap with labels still
    changing — components would be silently split if results were used."""


@dataclass
class ComponentsResult:
    labels: DataFrame  # columns: id, component (min member id)
    iterations: int
    converged: bool


def connected_components(
    pairs: DataFrame,
    left_col: str = "id_a",
    right_col: str = "id_b",
    max_iters: int = 20,
) -> ComponentsResult:
    """(id, component) for every node in the pair list; component = the
    minimum node id reachable through the pair graph."""
    fwd = pairs.select(F.col(left_col).alias("src"), F.col(right_col).alias("dst"))
    sym = fwd.union(
        pairs.select(F.col(right_col).alias("src"), F.col(left_col).alias("dst"))
    )
    sym = sym.localCheckpoint(eager=False, storageLevel=_DISK_ONLY)

    labels = (
        sym.select(F.col("src").alias("id"))
        .distinct()
        .select("id", F.col("id").alias("component"))
        .localCheckpoint(eager=False, storageLevel=_DISK_ONLY)
    )

    iterations = 0
    converged = False
    for _ in range(max_iters):
        iterations += 1
        # min neighbor label per node, via labels of the dst side
        neighbor_min = (
            sym.join(labels, sym["dst"] == labels["id"])
            .groupBy("src")
            .agg(F.min("component").alias("nmin"))
        )
        updated = (
            labels.join(neighbor_min, labels["id"] == neighbor_min["src"], "left")
            .select(
                labels["id"],
                labels["component"].alias("prev"),
                F.least(
                    labels["component"], F.coalesce(F.col("nmin"), labels["component"])
                ).alias("component"),
            )
            .localCheckpoint(eager=False, storageLevel=_DISK_ONLY)
        )
        n_changed = updated.filter(F.col("prev") != F.col("component")).count()
        labels = updated.select("id", "component")
        if n_changed == 0:
            converged = True
            break

    return ComponentsResult(labels=labels, iterations=iterations, converged=converged)


def dedup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    max_iters: int = 20,
    alert: Callable[[str], None] | None = None,
) -> DataFrame:
    """(id, cluster, is_keeper) for every document: near-dup pairs close
    transitively into clusters labeled by their minimum id; docs in no pair
    are their own singleton cluster; the keeper is the minimum id.

    Non-convergence (a component with diameter > max_iters) would silently
    split clusters, so it is never ignored: with an ``alert`` callback the
    pipeline alerts and continues (the reference's alert-don't-fail shape,
    get_ultimate_parent.py:25-39); without one it raises
    ``ConvergenceError``."""
    result = connected_components(pairs, max_iters=max_iters)
    if not result.converged:
        msg = (
            f"dedup_clusters: label propagation still changing after "
            f"{result.iterations} iterations — a duplicate cluster has "
            f"diameter > {max_iters} and would be split"
        )
        if alert is None:
            raise ConvergenceError(msg)
        alert(msg)
    comp = result.labels
    all_ids = docs.select(F.col(id_col).alias("id"))
    labeled = (
        all_ids.join(comp, "id", "left")
        .select("id", F.coalesce("component", F.col("id")).alias("cluster"))
    )
    return labeled.withColumn("is_keeper", F.col("id") == F.col("cluster"))
