"""Distributed connected components over an edge DataFrame.

Near-dup candidate pairs (MinHash/LSH, SimHash bands, embedding
buckets) form a GRAPH; the unit of deduplication is its connected
component — every doc in a component is (transitively) a near-dup of
the others, and the curator keeps one canonical doc per component.
The reference has no graph operator at all; at 100 TB this is the step
that turns pairwise candidates into dedup decisions.

Algorithm: minimum-label propagation.  Every node starts labeled with
itself; each round replaces a node's label with the minimum label in
its closed neighborhood (itself + neighbors, edges both directions).
Labels are monotonically non-increasing, so convergence is detected by
an O(1)-row aggregate (``sum(label)`` stable ⇒ fixed point) — one
cheap action per round, no row-by-row diff.  Rounds needed = graph
diameter; dedup graphs are unions of band-bucket cliques with tiny
diameter (2–4 in practice).  For adversarially long chains the
large-star/small-star variant (Kiveris et al., "Connected Components
in MapReduce and Beyond", SoCC'14) converges in O(log² n) rounds —
same per-round DataFrame shape, so it can replace the propagation rule
without touching callers; min-label is kept because its rounds are
cheaper and dedup diameters are small.

Scale notes per round: one shuffle to co-locate (node → incident
labels) + a map-side-combined min groupBy.  ``localCheckpoint``
truncates the lineage each round, keeping the plan O(1) deep instead
of O(rounds) (iterative DataFrame loops otherwise re-plan the whole
history every round).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str,
    dst: str,
    max_iter: int = 25,
    checkpoint: bool = True,
) -> DataFrame:
    """Label each node of the undirected graph ``edges`` with the
    minimum node id reachable from it (= a canonical component id).

    Returns ``(node, component)`` for every node incident to ≥1 edge.
    Raises ``RuntimeError`` if ``max_iter`` rounds don't reach the
    fixed point (diameter > max_iter — switch to the star algorithm).
    """
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
    )
    if checkpoint:
        sym = sym.localCheckpoint(eager=True)
    labels = sym.select(F.col("u").alias("node")).distinct().withColumn(
        "component", F.col("node")
    )

    prev_sum = None
    for _ in range(max_iter):
        # neighbor labels flow along edges; min over closed neighborhood
        neighbor = sym.join(
            labels, sym.v == labels.node, "inner"
        ).select(F.col("u").alias("node"), "component")
        labels = (
            labels.unionByName(neighbor)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
        )
        if checkpoint:
            labels = labels.localCheckpoint(eager=True)
        cur = labels.agg(
            F.sum("component").alias("s"), F.count(F.lit(1)).alias("n")
        ).collect()[0]
        cur_sum = (cur["s"], cur["n"])
        if cur_sum == prev_sum:
            return labels
        prev_sum = cur_sum
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds"
    )
