"""Streaming certified training (streaming/training.py): per-epoch
integer-GD updates with exactly-once weight state — sequential-mirror
equivalence, crash replay, empty-batch carry-forward, restart determinism."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from elastic_surv_spark.streaming.training import (
    read_latest_weights,
    run_incremental_training,
    training_batch_incremental,
)

SCHEMA = "rid long, x0 double, x1 double, y int"


def _batches(seed=17, n_batches=3, n=120):
    rng = np.random.default_rng(seed)
    out = []
    rid = 0
    for _ in range(n_batches):
        rows = []
        for _ in range(n):
            x0 = round(float(rng.normal()), 3)
            x1 = round(float(rng.normal()), 3)
            y = int(1.5 * x0 - x1 + rng.normal(scale=0.7) > 0)
            rows.append((rid, x0, x1, y))
            rid += 1
        out.append(rows)
    return out


def _local_mirror(batches, steps=2, lr=500_000):
    """Sequential numpy mirror of the per-batch integer recipe."""
    w = np.zeros(2, dtype=np.int64)
    b = 0
    for rows in batches:
        if not rows:
            continue
        X = np.array([[r[1], r[2]] for r in rows], dtype=float)
        y = np.array([float(r[3]) for r in rows])
        n = len(rows)
        for _ in range(steps):
            z = X @ (w / 1e6) + b / 1e6
            p = 0.5 + 0.5 * z / (1 + np.abs(z))
            g = p - y
            for j in range(2):
                G = int(np.floor(g * X[:, j] * 1e9 + 0.5).astype(np.int64).sum())
                w[j] -= math.floor((G / (n * 1e9)) * lr + 0.5)
            Gb = int(np.floor(g * 1e9 + 0.5).astype(np.int64).sum())
            b -= math.floor((Gb / (n * 1e9)) * lr + 0.5)
    return list(w), b


def test_streaming_training_equals_sequential_mirror(spark, tmp_path):
    """The stream's final weights equal the sequential local mirror of the
    same per-batch recipe — online training certified end to end."""
    batches = _batches()
    src = str(tmp_path / "src")
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{src}/b{i}")
    wpath = str(tmp_path / "weights")
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/b*")
    )
    run_incremental_training(
        stream, wpath, str(tmp_path / "ckpt"), ["x0", "x1"], "y",
        steps_per_batch=2,
    )
    w, b, epoch = read_latest_weights(spark, wpath, n_features=2)
    assert epoch == len(batches) - 1
    assert (w, b) == tuple(_local_mirror(batches, steps=2))
    # every epoch committed exactly one row, chain contiguous
    rows = spark.read.parquet(wpath).orderBy("_batch_id").collect()
    assert [r._batch_id for r in rows] == list(range(len(batches)))
    assert all(r.n_rows == 120 for r in rows)


def test_training_replay_is_idempotent(spark, tmp_path):
    """A crash-replayed epoch reads the identical predecessor (exclude-own-
    epoch) and rewrites its partition byte-identically — rerunning batch k
    any number of times never changes the state."""
    batches = _batches(seed=5, n_batches=2, n=80)
    wpath = str(tmp_path / "weights")
    for i, rows in enumerate(batches):
        training_batch_incremental(
            spark.createDataFrame(rows, SCHEMA), i, wpath, ["x0", "x1"], "y"
        )
    before = {
        (r._batch_id): (list(r.weights_micro), r.bias_micro, r.n_rows)
        for r in spark.read.parquet(wpath).collect()
    }
    # replay BOTH epochs, twice each, out of order
    for i in (1, 0, 1):
        training_batch_incremental(
            spark.createDataFrame(batches[i], SCHEMA), i, wpath,
            ["x0", "x1"], "y",
        )
    after = {
        (r._batch_id): (list(r.weights_micro), r.bias_micro, r.n_rows)
        for r in spark.read.parquet(wpath).collect()
    }
    assert after == before


def test_training_empty_batch_carries_state_forward(spark, tmp_path):
    """A legitimately-empty micro-batch (even the FIRST) commits its epoch
    row with the predecessor's weights instead of wedging the stream."""
    wpath = str(tmp_path / "weights")
    empty = spark.createDataFrame([], SCHEMA)
    training_batch_incremental(empty, 0, wpath, ["x0", "x1"], "y")
    w, b, epoch = read_latest_weights(spark, wpath, n_features=2)
    assert (w, b, epoch) == ([0, 0], 0, 0)

    rows = _batches(seed=9, n_batches=1, n=60)[0]
    training_batch_incremental(
        spark.createDataFrame(rows, SCHEMA), 1, wpath, ["x0", "x1"], "y"
    )
    w1, b1, _ = read_latest_weights(spark, wpath, n_features=2)
    training_batch_incremental(empty, 2, wpath, ["x0", "x1"], "y")
    w2, b2, epoch2 = read_latest_weights(spark, wpath, n_features=2)
    assert (w2, b2) == (w1, b1) and epoch2 == 2
    assert spark.read.parquet(wpath).filter(F.col("_batch_id") == 2).first().n_rows == 0


def test_read_latest_weights_requires_sizing_without_state(spark, tmp_path):
    with pytest.raises(ValueError, match="n_features"):
        read_latest_weights(spark, str(tmp_path / "nope"))


def test_compact_weights_table_replay_byte_parity(spark, tmp_path):
    """VERDICT r11 stretch #9: folding committed weight epochs into the
    -1 partition keeps warm-start reads and crash replays byte-identical
    — the epoch-per-partition state compacts like the ingest family's
    history tables."""
    from elastic_surv_spark.streaming.training import compact_weights_table

    batches = _batches(seed=9, n_batches=4, n=60)
    wpath = str(tmp_path / "weights")
    for i, rows in enumerate(batches):
        training_batch_incremental(
            spark.createDataFrame(rows, SCHEMA), i, wpath, ["x0", "x1"], "y"
        )
    w_pre, b_pre, _ = read_latest_weights(spark, wpath, n_features=2)
    # replay frontier: epochs 0-2 committed, epoch 3 still live
    assert compact_weights_table(spark, wpath, committed_batch_id=3) == 3
    ids = sorted(
        r._batch_id for r in spark.read.parquet(wpath)
        .select("_batch_id").distinct().collect()
    )
    assert ids == [-1, 3]
    # latest state (and its true epoch) unchanged by the fold
    assert read_latest_weights(spark, wpath, n_features=2) == (w_pre, b_pre, 3)
    # the -1 row is epoch 2's state exactly (the highest folded epoch),
    # and the fold KEEPS the true epoch as a data column (audit trail)
    w2, b2 = _local_mirror(batches[:3], steps=1)
    folded = spark.read.parquet(wpath).filter(F.col("_batch_id") == -1).collect()
    assert len(folded) == 1
    assert (list(folded[0].weights_micro), folded[0].bias_micro) == (w2, b2)
    assert folded[0].epoch == 2

    # replay-after-compaction byte parity: re-running the live epoch 3
    # (any number of times) reproduces the identical table — its
    # exclude-own-epoch read now lands on the -1 partition
    before = sorted(
        (r._batch_id, list(r.weights_micro), r.bias_micro, r.n_rows)
        for r in spark.read.parquet(wpath).collect()
    )
    for _ in range(2):
        training_batch_incremental(
            spark.createDataFrame(batches[3], SCHEMA), 3, wpath,
            ["x0", "x1"], "y",
        )
    after = sorted(
        (r._batch_id, list(r.weights_micro), r.bias_micro, r.n_rows)
        for r in spark.read.parquet(wpath).collect()
    )
    assert after == before

    # idempotent: re-folding with the same frontier is a no-op; folding
    # the now-committed epoch 3 collapses the table to one -1 row whose
    # state is the full-run final weights
    assert compact_weights_table(spark, wpath, committed_batch_id=3) == 0
    assert compact_weights_table(spark, wpath, committed_batch_id=4) == 1
    allrows = spark.read.parquet(wpath).collect()
    assert [r._batch_id for r in allrows] == [-1]
    # fully folded: one -1 row, still reporting the run's final epoch
    assert read_latest_weights(spark, wpath, n_features=2) == (w_pre, b_pre, 3)

    # empty / nothing-to-fold guards
    assert compact_weights_table(spark, str(tmp_path / "nope"), 5) == 0


def test_certified_fold_run_matches_trajectory_sql(spark, tmp_path):
    """VERDICT r12 stretch #9: the train→fold→train lifecycle is
    hash-certifiable — certified_fold_run's returned weights table equals
    DuckDB's batched-chain trajectory view integer-exactly. A wrong fold
    (or a warm start that misread the compacted row) would corrupt every
    post-fold epoch's weights, so the match certifies the fold itself."""
    import duckdb
    import pandas as pd

    from elastic_surv_spark.operators.quality_model import (
        fixed_point_gd_batched_trajectory_sql,
    )
    from elastic_surv_spark.streaming.training import certified_fold_run

    rows = [r for batch in _batches(seed=29, n_batches=3, n=80) for r in batch]
    pdf = pd.DataFrame(rows, columns=["rid", "x0", "x1", "y"])
    df = spark.createDataFrame(pdf)
    wpath = str(tmp_path / "weights_fold")
    got = (
        certified_fold_run(
            df, ["x0", "x1"], "y", "rid", wpath, n_batches=4, fold_after=1
        )
        .toPandas()
        .sort_values("epoch", ignore_index=True)
    )
    con = duckdb.connect()
    con.register("rows", pdf)
    want = (
        con.execute(
            fixed_point_gd_batched_trajectory_sql(
                ["x0", "x1"], "y", "rid", n_batches=4, visible_from=1
            )
            + " ORDER BY epoch"
        )
        .df()
    )
    assert got.columns.tolist() == want.columns.tolist()
    assert got.astype("int64").equals(want.astype("int64")), (got, want)
    # the fold really happened: epochs 0..fold_after collapsed into the
    # compacted row (epoch = fold_after), later epochs live
    assert got.epoch.tolist() == [1, 2, 3]
    ids = sorted(
        r._batch_id
        for r in spark.read.parquet(wpath).select("_batch_id").distinct().collect()
    )
    assert ids == [-1, 2, 3]
    # training moved and kept moving after the fold
    assert got.bias_micro.nunique() > 1

    with pytest.raises(ValueError, match="fold_after"):
        certified_fold_run(
            df, ["x0", "x1"], "y", "rid", wpath, n_batches=4, fold_after=4
        )


def test_certified_fold_run_rejects_bad_ids(spark, tmp_path):
    """ADVICE r13 #4: the fold run applies the batched trainer's hash key,
    so it must also apply its guard — a negative id hashes to a negative
    _bid and a NULL/uncastable one to a NULL _bid, matching no epoch's
    batch filter: the rows would silently drop from EVERY epoch on both
    engines. Both shapes must raise BEFORE any epoch writes state."""
    import os

    from elastic_surv_spark.streaming.training import certified_fold_run

    rows = [r for batch in _batches(seed=31, n_batches=2, n=30) for r in batch]
    for poison in (-7, None):
        bad = [(poison, 1.0, 2.0, 1)] + rows
        df = spark.createDataFrame(bad, "rid long, x0 double, x1 double, y int")
        wpath = str(tmp_path / f"weights_bad_{poison}")
        with pytest.raises(ValueError, match="negative or NULL"):
            certified_fold_run(
                df, ["x0", "x1"], "y", "rid", wpath, n_batches=4
            )
        # the guard fired before epoch 0 — no state was written
        assert not os.path.exists(wpath)


def test_weights_reads_consistent_inside_fold_crash_window(spark, tmp_path):
    """ADVICE r12 #2: compact_weights_table overwrites the -1 partition
    BEFORE the per-partition deletes, so a crash between the two leaves
    the folded row AND the live epoch rows it supersedes visible to a raw
    read (duplicate state, double-counted n_rows). read_weights_table
    must restore the exact pre-fold view (one row per epoch, live
    partition preferred), read_latest_weights must be unaffected, and a
    re-fold must heal the files."""
    from elastic_surv_spark.streaming.training import (
        compact_weights_table,
        read_weights_table,
    )

    batches = _batches(seed=23, n_batches=3, n=50)
    wpath = str(tmp_path / "weights")
    for i, rows in enumerate(batches):
        training_batch_incremental(
            spark.createDataFrame(rows, SCHEMA), i, wpath, ["x0", "x1"], "y"
        )
    pre = sorted(
        (r.epoch, r._batch_id, list(r.weights_micro), r.bias_micro, r.n_rows)
        for r in spark.read.parquet(wpath).collect()
    )
    w_pre, b_pre, e_pre = read_latest_weights(spark, wpath, n_features=2)

    # simulate the crash window: the fold's -1 overwrite landed (the
    # supersede rule keeps the HIGHEST epoch's state), the deletes didn't
    folded = (
        spark.read.parquet(wpath)
        .orderBy(F.col("epoch").desc())
        .limit(1)
        .withColumn("_batch_id", F.lit(-1))
    )
    folded.write.mode("append").partitionBy("_batch_id").parquet(wpath)

    raw = spark.read.parquet(wpath)
    assert raw.count() == len(batches) + 1  # the duplicate IS visible raw
    # consistent reader: one row per epoch, live partition preferred,
    # n_rows sums like the pre-fold table (no double count)
    view = read_weights_table(spark, wpath)
    got = sorted(
        (r.epoch, r._batch_id, list(r.weights_micro), r.bias_micro, r.n_rows)
        for r in view.collect()
    )
    assert got == pre
    assert read_latest_weights(spark, wpath, n_features=2) == (
        w_pre, b_pre, e_pre,
    )

    # the re-fold heals the files: folded epochs deleted, one -1 row,
    # reads unchanged
    assert compact_weights_table(spark, wpath, committed_batch_id=3) == 3
    ids = sorted(
        r._batch_id
        for r in spark.read.parquet(wpath).select("_batch_id").distinct().collect()
    )
    assert ids == [-1]
    assert read_latest_weights(spark, wpath, n_features=2) == (
        w_pre, b_pre, e_pre,
    )
    assert read_weights_table(spark, str(tmp_path / "nope")) is None


def test_certified_fold_run_registry_row_owns_its_rows(spark):
    """ADVICE r14 #1: the registry row deletes its per-call temp weights
    dir in ``finally``, so the returned frame must not depend on ANY
    storage — the earlier ``localCheckpoint(eager=True)`` kept blocks on
    executors that a real cluster can lose, making the frame
    unrecomputable once the parquet underneath is gone. The fix collects
    the 3 rows and returns a driver-local relation: assert the optimized
    plan is a LocalRelation (no RDD scan, no file scan) and that the
    frame stays collectable on repeated actions after the dir is
    deleted."""
    from elastic_surv_spark.plans.queries import REGISTRY

    out = REGISTRY["certified_fold_run"].fn(spark, "/root/testdata/sf0.001")
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "LocalRelation" in plan, plan
    assert "LogicalRDD" not in plan, plan
    assert "Relation [" not in plan or "parquet" not in plan, plan
    first = sorted(tuple(r) for r in out.collect())
    again = sorted(tuple(r) for r in out.collect())
    assert first == again and len(first) == 3
