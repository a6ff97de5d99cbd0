"""Streaming SemDeDup ingest (streaming/ingest.py:
semdedup_ingest_batch_incremental): cross-batch greedy dedup against the
table-resident kept set, law checks, and exactly-once replay — mirroring
test_streaming_ingest.py's structure for the semantic twin."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from elastic_surv_spark.operators.semdedup import semantic_dedup_incremental
from elastic_surv_spark.streaming.ingest import (
    run_incremental_semdedup_ingest,
    semdedup_ingest_batch_incremental,
)

SCHEMA = "vec_id long, embedding array<double>"
DIM = 8
TAU = 0.9


def _vec(axis: int, noise_seed: int | None = None):
    v = np.zeros(DIM)
    v[axis] = 1.0
    if noise_seed is not None:
        v = v + np.random.default_rng(noise_seed).normal(scale=1e-3, size=DIM)
    return [float(x) for x in v]


# planted groups g0..g3 = axes 0..3; duplicates within AND across batches
BATCHES = [
    [(1, _vec(0)), (2, _vec(0, 21)), (3, _vec(1))],
    [(10, _vec(0, 22)), (11, _vec(2)), (12, _vec(1, 23))],
    [(20, _vec(2, 24)), (21, _vec(3))],
]
EXPECTED_KEPT = [1, 3, 11, 21]  # first occurrence of each planted group


def _run_batches(spark, root):
    for i, rows in enumerate(BATCHES):
        semdedup_ingest_batch_incremental(
            spark.createDataFrame(rows, SCHEMA), i, root, tau=TAU, n_cells=2
        )


def test_semdedup_ingest_dedups_across_batches(spark, tmp_path):
    root = str(tmp_path / "sem_hist")
    _run_batches(spark, root)
    kept = spark.read.parquet(f"{root}/kept")
    assert sorted(r.vec_id for r in kept.collect()) == EXPECTED_KEPT

    # final-state laws over ALL input vectors: every kept pair in a cell is
    # below tau; every dropped vector has a kept vector within tau
    cents = {
        int(r.cell): np.array(r.centroid)
        for r in spark.read.parquet(f"{root}/centroids").collect()
    }
    C = np.stack([cents[i] for i in sorted(cents)])
    vecs = {i: np.array(v) for rows in BATCHES for i, v in rows}

    def cell_of(v):
        return int(((C - v) ** 2).sum(1).argmin())

    def cos(a, b):
        na, nb = np.linalg.norm(a), np.linalg.norm(b)
        return round(float(a @ b / (na * nb)), 6) if na and nb else 0.0

    kept_ids = set(EXPECTED_KEPT)
    for i in kept_ids:
        for j in kept_ids:
            if i < j and cell_of(vecs[i]) == cell_of(vecs[j]):
                assert cos(vecs[i], vecs[j]) < TAU, (i, j)
    for i in vecs:
        if i not in kept_ids:
            assert any(
                cell_of(vecs[k]) == cell_of(vecs[i]) and cos(vecs[k], vecs[i]) >= TAU
                for k in kept_ids
            ), i


def test_semdedup_ingest_replay_is_idempotent(spark, tmp_path):
    root = str(tmp_path / "sem_hist")
    frames = [spark.createDataFrame(rows, SCHEMA) for rows in BATCHES]
    for i, b in enumerate(frames):
        semdedup_ingest_batch_incremental(b, i, root, tau=TAU, n_cells=2)
    kept_before = sorted(map(tuple, spark.read.parquet(f"{root}/kept").collect()))
    cents_before = sorted(
        map(tuple, spark.read.parquet(f"{root}/centroids").collect())
    )

    # replay the last epoch, then an interior one, then the FIRST (which
    # must reuse the persisted quantizer, not refit-and-diverge)
    for replay in (2, 1, 0):
        semdedup_ingest_batch_incremental(frames[replay], replay, root, tau=TAU, n_cells=2)
        assert (
            sorted(map(tuple, spark.read.parquet(f"{root}/kept").collect()))
            == kept_before
        ), replay
    assert (
        sorted(map(tuple, spark.read.parquet(f"{root}/centroids").collect()))
        == cents_before
    )


def test_semdedup_incremental_operator_first_batch(spark):
    # no kept state: behaves as a greedy in-batch dedup under fixed cells
    cents = np.stack([np.eye(DIM)[0], np.eye(DIM)[2]])
    batch = spark.createDataFrame(BATCHES[0], SCHEMA)
    got = {
        r.vec_id: r
        for r in semantic_dedup_incremental(batch, None, cents, tau=TAU).collect()
    }
    assert got[1].keep is True
    assert got[2].keep is False and got[2].kept_by == 1
    assert got[2].kept_by_cosine >= TAU
    assert got[3].keep is True


def test_semdedup_ingest_compaction_preserves_results(spark, tmp_path):
    from elastic_surv_spark.streaming.ingest import compact_history

    root = str(tmp_path / "sem_hist")
    _run_batches(spark, root)
    kept_before = sorted(r.vec_id for r in spark.read.parquet(f"{root}/kept").collect())
    assert compact_history(spark, f"{root}/kept", 2, key_cols=("vec_id",)) == 2
    assert sorted(r.vec_id for r in spark.read.parquet(f"{root}/kept").collect()) == kept_before
    parts = sorted(
        p.name
        for p in (tmp_path / "sem_hist" / "kept").iterdir()
        if p.name.startswith("_batch_id=")
    )
    assert parts == ["_batch_id=-1", "_batch_id=2"]
    # the live epoch still replays idempotently against the compacted state
    semdedup_ingest_batch_incremental(
        spark.createDataFrame(BATCHES[2], SCHEMA), 2, root, tau=TAU, n_cells=2
    )
    assert sorted(r.vec_id for r in spark.read.parquet(f"{root}/kept").collect()) == kept_before


def test_run_incremental_semdedup_stream(spark, tmp_path):
    src = str(tmp_path / "src")
    root = str(tmp_path / "sem_hist")
    ckpt = str(tmp_path / "ckpt")
    for i, rows in enumerate(BATCHES):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{src}/b{i}")
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/b*")
    )
    run_incremental_semdedup_ingest(stream, root, ckpt, tau=TAU, n_cells=2)
    assert sorted(
        r.vec_id for r in spark.read.parquet(f"{root}/kept").collect()
    ) == EXPECTED_KEPT
    # restart over the unchanged source: offsets consumed, nothing changes
    stream2 = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/b*")
    )
    run_incremental_semdedup_ingest(stream2, root, ckpt, tau=TAU, n_cells=2)
    assert sorted(
        r.vec_id for r in spark.read.parquet(f"{root}/kept").collect()
    ) == EXPECTED_KEPT
