"""Connected components — the clustering step that turns near-dup PAIRS
into dedup GROUPS (keep one doc per component).

Iterative min-label propagation: every vertex starts as its own component;
each round adopts the smallest component id among itself and its neighbors;
converged when no label changes. Near-dup graphs have tiny diameters
(dup clusters are cliques-ish), so this converges in 2-3 rounds.

Scale notes: each round is one join + one min-aggregate on the edge list —
shuffle ∝ |E|; rounds ∝ component diameter. Lineage is cut every round
(``localCheckpoint``; swap for ``checkpoint`` with a cluster checkpoint dir
at real scale). For web-scale graphs with long-diameter components,
``connected_components_star`` implements the alternating
large-star/small-star rounds of Kiveris et al. ("Connected Components in
MapReduce and Beyond", SoCC'14): each round is a pure groupBy + re-emit on
the edge list (no vertex-label join), and the round count is
O(log² n) in the worst case instead of O(diameter) — the label-propagation
form wins on the tiny-diameter near-dup graphs this module usually sees,
the star form on adversarial chains. The convergence check is a counted
action per round — the driver sees only a scalar.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 256,
) -> DataFrame:
    """(v, comp) for every vertex in ``edges``; comp = min vertex id in the
    component.

    Rounds ∝ component diameter; raises instead of silently returning an
    unconverged partition if ``max_iter`` rounds don't reach a fixpoint —
    switch to ``connected_components_star`` (O(log² n) rounds) for
    long-diameter graphs."""
    bidir = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        # the edge list is static across rounds but every round's join
        # would otherwise re-run the union + |E| distinct shuffle from the
        # raw source (labels are checkpointed per round; the edges were
        # not — review finding, r11)
        .localCheckpoint()
    )
    labels = (
        bidir.select(F.col("a").alias("v"))
        .distinct()
        .select("v", F.col("v").alias("comp"))
        .localCheckpoint()
    )
    # max_iter bounds label-CHANGING rounds; the +1 grants the zero-change
    # confirmation round, so a graph converging exactly on round max_iter
    # returns instead of spuriously raising
    for _ in range(max_iter + 1):
        nbr = (
            bidir.join(labels, bidir.b == labels.v)
            .select(F.col("a").alias("v"), F.col("comp"))
        )
        new_labels = (
            labels.union(nbr).groupBy("v").agg(F.min("comp").alias("comp"))
        ).localCheckpoint()
        changed = (
            new_labels.select("v", F.col("comp").alias("_new"))
            .join(labels, "v")
            .filter(F.col("_new") != F.col("comp"))
            .count()
        )
        labels.unpersist()  # free the previous round's checkpoint blocks
        labels = new_labels
        if changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds "
        "(long-diameter graph?) — use connected_components_star"
    )


def _star_round(edges: DataFrame, large: bool) -> DataFrame:
    """One large-star (attach strictly-larger neighbors to the neighborhood
    min) or small-star (attach smaller-or-equal neighbors) round. ``edges``
    and the result are canonical directed pairs (a, b); each round is one
    groupBy(min) + join re-emit — shuffle ∝ |E|, no vertex-label state."""
    bidir = edges.select("a", "b").union(edges.select(F.col("b").alias("a"), F.col("a").alias("b")))
    mins = bidir.groupBy("a").agg(
        F.least(F.min("b"), F.first("a")).alias("_m")
    )
    nbrs = bidir.join(mins, "a")
    if large:
        out = nbrs.filter(F.col("b") > F.col("a")).select(
            F.col("b").alias("a"), F.col("_m").alias("b")
        )
    else:
        out = (
            nbrs.filter(F.col("b") <= F.col("a"))
            .select(F.col("b").alias("a"), F.col("_m").alias("b"))
            .union(mins.select(F.col("a"), F.col("_m").alias("b")))
        )
    return (
        out.filter(F.col("a") != F.col("b"))
        .select(F.greatest("a", "b").alias("a"), F.least("a", "b").alias("b"))
        .distinct()
    )


def connected_components_star(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 30,
) -> DataFrame:
    """(v, comp) via alternating large-star/small-star rounds (Kiveris et
    al. SoCC'14) — the web-scale CC layout: every round is edge-local
    (groupBy + emit, shuffle ∝ |E|), converging in O(log² n) rounds even on
    long chains where label propagation needs O(diameter). Converged when
    the edge set is a fixpoint (all edges point at component minima); the
    roots plus their attached vertices are the components."""
    cur = (
        edges.select(
            F.greatest(F.col(src), F.col(dst)).alias("a"),
            F.least(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint()
    )
    vertices = (
        edges.select(F.col(src).alias("v"))
        .union(edges.select(F.col(dst).alias("v")))
        .distinct()
        .localCheckpoint()
    )
    converged = False
    for _ in range(max_iter):
        nxt = _star_round(_star_round(cur, large=True), large=False).localCheckpoint()
        changed = (
            nxt.union(cur).distinct().count() - cur.count()
            if nxt.count() == cur.count()
            else 1
        )
        cur.unpersist()
        cur = nxt
        if changed == 0:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"connected_components_star did not reach an edge fixpoint in "
            f"{max_iter} rounds (O(log² n) expected — raise max_iter)"
        )
    # fixpoint edges are (vertex, component-min) stars; roots map to themselves
    comp = cur.select(F.col("a").alias("v"), F.col("b").alias("comp"))
    return vertices.join(comp, "v", "left").select(
        "v", F.coalesce("comp", F.col("v")).alias("comp")
    )
