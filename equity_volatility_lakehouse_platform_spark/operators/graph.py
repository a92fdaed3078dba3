"""Iterative graph operators (duplicate clustering).

Connected components by min-label propagation: every node starts
labeled with its own id; each round, a node adopts the minimum label
among itself and its neighbors; convergence when no label changes.
Rounds are pure DataFrame joins/aggregations (distributed); only the
per-round convergence count touches the driver. ``localCheckpoint``
truncates lineage so the plan doesn't grow with iterations.

Scale: each round is one shuffle-join on the edge list — the standard
large-scale CC formulation (GraphFrames/Pregel does the same data
movement). Round count is bounded by the component diameter; near-dup
clusters are shallow (pairs come from LSH bands), so a handful of
rounds converge. The ``max_iterations`` guard raises rather than
silently emitting a half-propagated clustering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 25,
) -> DataFrame:
    """(node id, cluster_id = min node id reachable). ``edges`` may be
    directed input; it is symmetrized here. Isolated nodes (absent from
    ``edges``) are not emitted."""
    sym = edges.select(F.col(src).alias("s"), F.col(dst).alias("d")).unionByName(
        edges.select(F.col(dst).alias("s"), F.col(src).alias("d"))
    )
    sym = sym.distinct().localCheckpoint(eager=True)
    labels = (
        sym.select(F.col("s").alias("id")).distinct().select("id", F.col("id").alias("label"))
    ).localCheckpoint(eager=True)

    for _ in range(max_iterations):
        neigh = (
            sym.join(labels, sym.s == labels.id)
            .groupBy(F.col("d").alias("id"))
            .agg(F.min("label").alias("nlabel"))
        )
        new_labels = (
            labels.join(neigh, "id", "left")
            .select("id", F.least("label", F.coalesce("nlabel", "label")).alias("label"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels.select("id", F.col("label").alias("cluster_id"))
    raise RuntimeError(f"connected_components: no convergence in {max_iterations} rounds")
