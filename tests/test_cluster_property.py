"""Property tests for connected components on adversarial graph shapes.

The round-2 label-propagation unconvergence bug argues for fuzzing its
replacement: both CC implementations are checked against a driver-side
union-find ground truth on chains (worst diameter), stars (worst fan-in),
combs, and seeded random graphs. Union-find is ~20 lines and obviously
correct — exactly what a property oracle should be.
"""

from __future__ import annotations

import random

import pandas as pd
import pytest

from elastic_surv_spark.operators.cluster import (
    connected_components,
    connected_components_star,
)


def _union_find(edges: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {v: find(v) for v in parent}


def _check(spark, edges: list[tuple[int, int]], impl) -> None:
    truth = _union_find(edges)
    df = spark.createDataFrame(
        pd.DataFrame(edges, columns=["id_a", "id_b"]),
        schema="id_a long, id_b long",
    )
    got = {r["v"]: r["comp"] for r in impl(df).collect()}
    assert got == truth


GRAPHS = {
    # 400-vertex chain: diameter 399 — the shape that breaks any
    # fixed-small-round-count scheme and exercises star-CC's O(log^2 n) path
    "chain": [(i, i + 1) for i in range(400)],
    # star with max-id hub: every leaf two hops from every other
    "star_hub_max": [(1000, i) for i in range(200)],
    # comb: chain with pendant leaves — mixes both pathologies
    "comb": [(i, i + 1) for i in range(0, 200, 2)]
    + [(i, 10_000 + i) for i in range(0, 200, 2)],
    # two components that must NOT merge
    "two_cliques": [(a, b) for a in range(10) for b in range(a + 1, 10)]
    + [(a, b) for a in range(100, 110) for b in range(a + 1, 110)],
}


@pytest.mark.parametrize("name", sorted(GRAPHS))
def test_star_cc_matches_union_find(spark, name):
    _check(spark, GRAPHS[name], connected_components_star)


def test_label_prop_cc_matches_union_find_small_diameter(spark):
    # label-prop is the tiny-diameter fast path; check it on the shapes it
    # is actually used for (near-dup cliques + a short chain)
    _check(spark, GRAPHS["two_cliques"], connected_components)
    _check(spark, [(i, i + 1) for i in range(12)], connected_components)


def test_star_cc_random_graphs_match_union_find(spark):
    rng = random.Random(7)
    for trial in range(3):
        n = 300
        edges = [
            (rng.randrange(n), rng.randrange(n))
            for _ in range(rng.randrange(50, 400))
        ]
        edges = [(a, b) for a, b in edges if a != b]
        _check(spark, edges, connected_components_star)
