"""Connected components — the clustering step that turns near-dup PAIRS
into dedup GROUPS (keep one doc per component).

Iterative min-label propagation: every vertex starts as its own component;
each round adopts the smallest component id among itself and its neighbors;
converged when no label changes. Near-dup graphs have tiny diameters
(dup clusters are cliques-ish), so this converges in 2-3 rounds.

Scale notes: each round is one join + one min-aggregate on the edge list —
shuffle ∝ |E|. Lineage is cut every round (``localCheckpoint``; swap for
``checkpoint`` with a cluster checkpoint dir at real scale, or the
large-star/small-star variant from the map-reduce CC literature when
components are web-scale). The convergence check is a counted action per
round — the driver sees only a scalar.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """(v, comp) for every vertex in ``edges``; comp = min vertex id in the
    component."""
    bidir = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
    )
    labels = (
        bidir.select(F.col("a").alias("v"))
        .distinct()
        .select("v", F.col("v").alias("comp"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
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
            break
    return labels
