"""Semantic dedup (operators/semdedup.py): laws, recall on planted groups,
determinism, and the registry row's certification summary."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from elastic_surv_spark.operators.semdedup import semantic_dedup

SF = "/root/testdata/sf0.01"


def _clustered_frame(spark, n_groups=12, group_size=5, n_singletons=40, dim=32, seed=7):
    """Planted semantic-duplicate groups: each group is one base direction
    plus tiny noise (pairwise cosine ≥ ~0.999), singletons are independent
    random directions (pairwise cosine ≪ 0.9 w.h.p. at dim=32)."""
    rng = np.random.default_rng(seed)
    rows = []
    vid = 0
    for g in range(n_groups):
        base = rng.normal(size=dim)
        base /= np.linalg.norm(base)
        for _ in range(group_size):
            v = base + rng.normal(scale=1e-3, size=dim)
            rows.append((vid, g, [float(x) for x in v]))
            vid += 1
    for _ in range(n_singletons):
        v = rng.normal(size=dim)
        rows.append((vid, -1, [float(x) for x in v]))
        vid += 1
    return spark.createDataFrame(rows, "vec_id long, group int, embedding array<double>")


def _laws(pdf, tau, round_to=6):
    """Exact numpy re-verification of soundness + independence per cell."""
    by_id = {r.vec_id: r for r in pdf.itertuples()}
    X = {r.vec_id: np.asarray(r.embedding, dtype=np.float64) for r in pdf.itertuples()}
    for r in pdf.itertuples():
        cellmates = [s for s in pdf.itertuples() if s.cell == r.cell and s.vec_id != r.vec_id]
        a = X[r.vec_id] / np.linalg.norm(X[r.vec_id])
        sims = {
            s.vec_id: np.round(float(a @ (X[s.vec_id] / np.linalg.norm(X[s.vec_id]))), round_to)
            for s in cellmates
        }
        if r.keep:
            # independence: no kept cellmate at >= tau (checked one-sided
            # here; the loop visits both endpoints)
            for s in cellmates:
                if by_id[s.vec_id].keep:
                    assert sims[s.vec_id] < tau, (r.vec_id, s.vec_id)
        else:
            # soundness: some kept cellmate at >= tau
            assert any(
                by_id[s.vec_id].keep and sims[s.vec_id] >= tau for s in cellmates
            ), r.vec_id


def test_semantic_dedup_laws_and_recall_on_planted_groups(spark):
    df = _clustered_frame(spark)
    tau = 0.9
    dd = semantic_dedup(df, tau=tau, n_cells=8, seed=42)
    joined = dd.join(df.select("vec_id", "group", "embedding"), "vec_id").toPandas()
    assert len(joined) == df.count()  # every row assigned exactly once

    _laws(joined, tau)

    # planted groups: near-identical vectors co-cluster (same nearest
    # centroid) and collapse to one kept member per group
    grp = joined[joined["group"] >= 0]
    kept_per_group = grp.groupby("group")["keep"].sum()
    assert (kept_per_group == 1).all(), kept_per_group.to_dict()
    # the kept member is the smallest id (greedy scans in id order)
    kept_ids = grp[grp["keep"]].groupby("group")["vec_id"].min()
    first_ids = grp.groupby("group")["vec_id"].min()
    assert (kept_ids == first_ids).all()

    # dropped rows carry the kept id + the triggering cosine
    dropped = grp[~grp["keep"]]
    assert dropped["kept_by"].notna().all()
    assert (dropped["kept_by_cosine"] >= tau).all()

    # singletons survive: none of them is within tau of anything
    single = joined[joined["group"] < 0]
    assert single["keep"].all()


def test_semantic_dedup_deterministic(spark):
    df = _clustered_frame(spark, seed=11)
    a = semantic_dedup(df, tau=0.9, n_cells=8).toPandas().sort_values("vec_id", ignore_index=True)
    b = semantic_dedup(df, tau=0.9, n_cells=8).toPandas().sort_values("vec_id", ignore_index=True)
    assert a.equals(b)


def test_semantic_dedup_registry_summary(spark):
    from elastic_surv_spark.plans.queries import REGISTRY

    row = REGISTRY["embedding_semantic_dedup"].fn(spark, SF).collect()
    assert len(row) == 1
    r = row[0]
    n = spark.read.parquet(f"{SF}/embeddings.parquet").count()
    assert r.n_vectors == n
    assert r.soundness_ok is True
    assert r.independence_ok is True


def test_semantic_dedup_string_ids(spark):
    # the grouped-apply schema derives the id type from the input (ADVICE
    # r9: a hardcoded `long` failed string/decimal ids); greedy order is
    # lexicographic for string ids
    df = spark.createDataFrame(
        [
            ("doc-a", [1.0, 0.0, 0.0, 0.0]),
            ("doc-b", [1.0, 1e-4, 0.0, 0.0]),
            ("doc-c", [0.0, 1.0, 0.0, 0.0]),
        ],
        "vec_id string, embedding array<double>",
    )
    out = {r.vec_id: r for r in semantic_dedup(df, tau=0.9, n_cells=2).collect()}
    assert set(out) == {"doc-a", "doc-b", "doc-c"}
    assert out["doc-c"].keep is True
    if out["doc-a"].cell == out["doc-b"].cell:
        assert out["doc-a"].keep is True and out["doc-b"].keep is False
        assert out["doc-b"].kept_by == "doc-a"
        assert out["doc-b"].kept_by_cosine >= 0.9


def test_semantic_dedup_zero_vector_survives(spark):
    # zero vectors define cosine 0 against everything: never dropped, never
    # block others
    df = spark.createDataFrame(
        [(0, [0.0, 0.0, 0.0, 0.0]), (1, [1.0, 0.0, 0.0, 0.0]), (2, [1.0, 1e-4, 0.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    out = {r.vec_id: r for r in semantic_dedup(df, tau=0.9, n_cells=2).collect()}
    assert out[0].keep is True
    # 1 and 2 are near-identical; if co-clustered exactly one survives
    if out[1].cell == out[2].cell:
        assert out[1].keep != out[2].keep or not (out[1].keep and out[2].keep)
        assert out[1].keep is True and out[2].keep is False
