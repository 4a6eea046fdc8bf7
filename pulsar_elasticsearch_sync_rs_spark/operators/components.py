"""Connected components over near-dup pair edges — the transitive
closure that upgrades pairwise dedup (minhash/simhash/jaccard
suppression) to true cluster dedup.

Algorithm: alternating Large-Star / Small-Star (Kiveris, Lattanzi,
Mirrokni, Rastogi, Vassilvitskii — "Connected Components in MapReduce
and Beyond", SoCC 2014; public literature). Each round is two
groupBy-min + join passes; converges in O(log² n) rounds on any graph
(in practice a handful), unlike plain min-label propagation whose
round count is the graph DIAMETER — a pathological duplicate chain at
100 TB would stall propagation but not star contraction.

Scale posture: edges are (long, long) pairs — the shuffle unit is two
ids regardless of document size; per-round lineage is truncated with
``localCheckpoint`` so the iteration count never deepens the plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _min_neighbor(edges: DataFrame) -> DataFrame:
    """m(u) = min(Γ(u) ∪ {u}) for the directed edge list (u, v)."""
    return edges.groupBy("u").agg(
        F.least(F.min("v"), F.first("u")).alias("m")
    )


def _large_star(edges: DataFrame) -> DataFrame:
    """Connect every strictly-larger neighbor of u to m(u).
    Input/output: symmetric edge list as (u, v) pairs."""
    m = _min_neighbor(edges)
    return (
        edges.join(m, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Operating on (u, v) with u > v: connect every neighbor (and u)
    to m(u). Output keeps the u > v orientation."""
    directed = edges.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    ).distinct()
    m = _min_neighbor(directed)
    moved = (
        directed.join(m, "u")
        .select(F.col("v").alias("a"), F.col("m").alias("b"))
        .union(m.select(F.col("u").alias("a"), F.col("m").alias("b")))
        .filter(F.col("a") != F.col("b"))
        .select(F.greatest("a", "b").alias("u"), F.least("a", "b").alias("v"))
        .distinct()
    )
    return moved


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Label every vertex of the pair graph with its component root
    (the component's minimum vertex id). Returns (id, component).

    Convergence: alternate large-star / small-star until the directed
    edge set is stable; on a stable star graph every edge is
    (node, root). ``max_iter`` is a safety bound far above the
    O(log² n) theory — hitting it raises instead of silently returning
    partial components."""
    # canonicalize BEFORE symmetrizing: an input containing both (a,b)
    # and (b,a) would otherwise survive the directed distinct and then
    # duplicate under the reversal union, breaking the set-equality
    # convergence test
    edges = (
        pairs.select(F.col(src).cast("long").alias("a"), F.col(dst).cast("long").alias("b"))
        .filter(F.col("a") != F.col("b"))
        .select(F.greatest("a", "b").alias("u"), F.least("a", "b").alias("v"))
        .distinct()
    )
    edges = edges.union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    edges = edges.localCheckpoint()
    edges_count = edges.count()

    for _ in range(max_iter):
        ls = _large_star(edges)
        sym = ls.union(ls.select(F.col("v").alias("u"), F.col("u").alias("v"))).distinct()
        ss = _small_star(sym).localCheckpoint()
        new_sym = ss.union(ss.select(F.col("v").alias("u"), F.col("u").alias("v")))
        # converged when the star contraction is a fixed point. Both
        # sides are distinct sets, so subset + equal cardinality ⇒
        # equality: one exceptAll plus a cheap count instead of two
        # exceptAll jobs per round.
        new_count = new_sym.count()
        if new_count == edges_count and new_sym.exceptAll(edges).isEmpty():
            roots = ss  # (u > root, root)
            return roots.select(
                F.col("u").alias("id"), F.col("v").alias("component")
            ).union(
                roots.select("v", "v").distinct().toDF("id", "component")
            ).distinct()
        edges = new_sym.localCheckpoint()
        edges_count = new_count
    raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")


def dedup_clusters(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Assign every row of ``df`` its near-dup cluster id: the minimum
    ``id_col`` of its connected component in the pair graph (singletons
    are their own cluster). (id, cluster) is deterministic whenever the
    pair edges are — which makes this oracle-checkable against a SQL
    transitive closure even though the computation is iterative."""
    cc = connected_components(pairs, src=src, dst=dst)
    return (
        df.select(F.col(id_col).cast("long").alias("id"))
        .join(cc, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("component", F.col("id")).alias("cluster"),
        )
    )
