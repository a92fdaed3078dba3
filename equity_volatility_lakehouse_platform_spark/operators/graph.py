"""Iterative graph operators (duplicate clustering).

Connected components via ALTERNATING large-star / small-star rounds
(Kiveris et al., "Connected Components in MapReduce and Beyond",
ACM SoCC 2014 — the standard massive-graph CC formulation): each round
rewires edges toward each neighborhood's minimum, and the edge set
converges to min-rooted stars in O(log n) rounds REGARDLESS of component
diameter. Round 5 shipped plain min-label propagation here, which is
O(diameter) rounds — the round-6 adversarial fixture (one 10k-node path
component, tests/test_properties.py) showed that degrading exactly as
predicted, so the algorithm was switched; the output contract is
unchanged (node -> min reachable id).

Rounds are pure DataFrame joins/aggregations (distributed); only the
per-round convergence count touches the driver. ``localCheckpoint``
truncates lineage so the plan doesn't grow with iterations.

Scale: each round is a constant number of shuffles on the CURRENT edge
set (which shrinks toward one edge per non-root node), so total work is
O(E log n) — the same data movement GraphFrames' implementation of the
same paper performs. The ``max_iterations`` guard raises rather than
silently emitting a half-propagated clustering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 40,
    stats: dict | None = None,
) -> DataFrame:
    """(node id, cluster_id = min node id reachable). ``edges`` may be
    directed input; neighborhoods are symmetrized per round. Isolated
    nodes (absent from ``edges``) are not emitted. Pass ``stats`` to
    receive {"rounds": n} for convergence assertions."""
    cur = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u").isNotNull() & F.col("v").isNotNull())
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        edges.select(F.col(src).alias("id"))
        .unionByName(edges.select(F.col(dst).alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )

    converged = False
    for it in range(1, max_iterations + 1):
        # Large-star: for each node u (symmetrized neighborhood), connect
        # every STRICTLY LARGER neighbor to m = min(N(u) + {u}).
        sym = cur.unionByName(
            cur.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        mins = sym.groupBy("u").agg(F.min("v").alias("mv"))
        mins = mins.select("u", F.least("u", "mv").alias("m"))
        ls = (
            sym.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        # Small-star: key each edge on its LARGER endpoint u; connect u
        # and all its (smaller) neighbors to m = min(N(u) + {u}).
        g = ls.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        gm = g.groupBy("u").agg(F.min("v").alias("m"))
        ss = (
            g.join(gm, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .unionByName(gm.select(F.col("u"), F.col("m").alias("v")))
            .filter(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        if stats is not None:
            stats["rounds"] = it
        # Fixpoint: the edge SET is unchanged (both are distinct sets).
        same = (
            ss.exceptAll(cur).count() == 0 and cur.exceptAll(ss).count() == 0
        )
        cur = ss
        if same:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"connected_components: no convergence in {max_iterations} rounds"
        )
    # At the fixpoint the edges form min-rooted stars: every non-root node
    # carries exactly its (node -> root) edge; roots and isolated-by-self-
    # loop nodes label themselves.
    lab = cur.groupBy("u").agg(F.min("v").alias("label"))
    return nodes.join(lab, nodes.id == lab.u, "left").select(
        "id", F.coalesce("label", F.col("id")).alias("cluster_id")
    )
