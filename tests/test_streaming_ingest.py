"""Streaming incremental ingest (streaming/ingest.py): cross-batch dedup
through the history table, sequential-batch equivalence, and exactly-once
replay of a micro-batch."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from elastic_surv_spark.streaming.ingest import (
    ingest_batch_incremental,
    run_incremental_ingest,
)

BATCHES = [
    # (doc_id, text) per micro-batch; duplicates planted within AND across
    [(1, "alpha doc"), (2, "ALPHA  doc"), (3, "beta doc")],
    [(4, "alpha doc"), (5, "gamma doc"), (6, "gamma DOC"), (7, "delta doc")],
    [(8, "beta doc"), (9, "epsilon doc")],
]
SCHEMA = "doc_id long, text string"


def _write_stream_files(spark, src_dir: str) -> None:
    # FileStreamSource orders files by modification time: write SEQUENTIALLY
    # (same lesson as the document-pipeline fixture, SURVEY §5)
    for i, rows in enumerate(BATCHES):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{src_dir}/b{i}")


def _expected_survivors():
    seen, out = set(), []
    for rows in BATCHES:
        batch_seen = {}
        for doc_id, text in rows:
            key = " ".join(text.lower().split())
            if key in seen:
                continue
            if key not in batch_seen:
                batch_seen[key] = doc_id
        for key, doc_id in batch_seen.items():
            seen.add(key)
            out.append(doc_id)
    return sorted(out)


def test_incremental_ingest_stream_dedups_across_batches(spark, tmp_path):
    src = str(tmp_path / "src")
    hist = str(tmp_path / "hist")
    ckpt = str(tmp_path / "ckpt")
    _write_stream_files(spark, src)

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/b*")
    )
    run_incremental_ingest(stream, hist, ckpt)

    got = spark.read.parquet(hist)
    assert sorted(r.doc_id for r in got.select("doc_id").collect()) == _expected_survivors()
    # history is duplicate-free on the normalized-text fingerprint
    assert got.select("fingerprint").distinct().count() == got.count()
    # restart over the unchanged source: offsets consumed, nothing changes
    stream2 = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/b*")
    )
    run_incremental_ingest(stream2, hist, ckpt)
    assert sorted(
        r.doc_id for r in spark.read.parquet(hist).select("doc_id").collect()
    ) == _expected_survivors()


def test_incremental_ingest_replay_is_idempotent(spark, tmp_path):
    """A crash between the partition commit and the checkpoint advance makes
    Structured Streaming re-run the SAME epoch: the sink must converge, not
    double rows (naive append) or wipe its own partition (naive anti-join
    against a history that already contains this epoch's commit)."""
    hist = str(tmp_path / "hist")
    b0 = spark.createDataFrame(BATCHES[0], SCHEMA)
    b1 = spark.createDataFrame(BATCHES[1], SCHEMA)

    ingest_batch_incremental(b0, 0, hist)
    ingest_batch_incremental(b1, 1, hist)
    first = sorted(r.doc_id for r in spark.read.parquet(hist).collect())

    # replay epoch 1 (e.g. checkpoint lost after commit)
    ingest_batch_incremental(b1, 1, hist)
    again = sorted(r.doc_id for r in spark.read.parquet(hist).collect())
    assert again == first

    # and a replay of epoch 0 with epoch 1 already committed
    ingest_batch_incremental(b0, 0, hist)
    assert sorted(r.doc_id for r in spark.read.parquet(hist).collect()) == first


def test_read_history_first_batch_vs_real_read_errors(spark, tmp_path):
    """Only "no committed history yet" maps to first-batch behavior; a real
    read failure must RAISE so the micro-batch fails and replays instead of
    silently skipping history dedup (ADVICE r9)."""
    from elastic_surv_spark.streaming.ingest import _read_history

    # (1) path never created -> first batch
    assert _read_history(spark, str(tmp_path / "absent"), 0) is None
    # (2) directory exists but holds no committed parquet (crash between
    # mkdir and first file commit) -> also first batch, stream not wedged
    empty = tmp_path / "empty_hist"
    empty.mkdir()
    assert _read_history(spark, str(empty), 0) is None
    # (3) corrupt data file -> the read error propagates
    bad = tmp_path / "bad_hist" / "_batch_id=0"
    bad.mkdir(parents=True)
    (bad / "part-00000.parquet").write_bytes(b"this is not a parquet file")
    with pytest.raises(Exception) as exc_info:
        df = _read_history(spark, str(tmp_path / "bad_hist"), 99)
        if df is not None:  # schema inference may defer the footer read
            df.collect()
    assert "PATH_NOT_FOUND" not in str(exc_info.value)


def _hist_partitions(tmp_path, name="hist"):
    return sorted(
        p.name for p in (tmp_path / name).iterdir() if p.name.startswith("_batch_id=")
    )


def test_compact_history_folds_committed_epochs(spark, tmp_path):
    """(a) post-compaction dedup results identical, (b) a replayed live
    epoch is still idempotent, (c) partition count bounded after N batches
    + compact (the r9 judge's unbounded-epoch finding)."""
    from elastic_surv_spark.streaming.ingest import compact_history

    hist = str(tmp_path / "hist")
    batches = [spark.createDataFrame(rows, SCHEMA) for rows in BATCHES]
    for i, b in enumerate(batches):
        ingest_batch_incremental(b, i, hist)
    before = sorted(r.doc_id for r in spark.read.parquet(hist).collect())
    assert before == _expected_survivors()
    assert len(_hist_partitions(tmp_path)) == 3  # one per epoch pre-compact

    # epochs 0 and 1 are committed once batch 2 runs: fold them
    folded = compact_history(spark, hist, committed_batch_id=2)
    assert folded == 2
    assert _hist_partitions(tmp_path) == ["_batch_id=-1", "_batch_id=2"]
    after = spark.read.parquet(hist)
    assert sorted(r.doc_id for r in after.collect()) == before
    assert after.select("fingerprint").distinct().count() == after.count()

    # (b) replay the LIVE epoch 2 against the compacted history: idempotent
    ingest_batch_incremental(batches[2], 2, hist)
    assert sorted(r.doc_id for r in spark.read.parquet(hist).collect()) == before

    # (a) the next batch dedups identically against the compacted history
    nxt = spark.createDataFrame(
        [(20, "alpha doc"), (21, "epsilon DOC"), (22, "zeta doc")], SCHEMA
    )
    ingest_batch_incremental(nxt, 3, hist)
    got = sorted(r.doc_id for r in spark.read.parquet(hist).collect())
    assert got == sorted(before + [22])  # 20/21 are history duplicates

    # re-compacting at the same frontier is a no-op; a later frontier folds
    # everything below it into the same single consolidated partition
    assert compact_history(spark, hist, committed_batch_id=2) == 0
    assert compact_history(spark, hist, committed_batch_id=4) == 2
    assert _hist_partitions(tmp_path) == ["_batch_id=-1"]
    assert sorted(r.doc_id for r in spark.read.parquet(hist).collect()) == got


def test_compact_history_heals_promote_then_crash_overlap(spark, tmp_path):
    """A crash between the consolidated promote and the old-partition
    deletes leaves the same fingerprint in -1 AND an old epoch; the next
    compaction collapses the overlap (self-healing contract)."""
    from elastic_surv_spark.streaming.ingest import compact_history

    hist = str(tmp_path / "hist")
    ingest_batch_incremental(
        spark.createDataFrame([(1, "alpha doc")], SCHEMA), 0, hist
    )
    ingest_batch_incremental(
        spark.createDataFrame([(2, "beta doc")], SCHEMA), 1, hist
    )
    compact_history(spark, hist, committed_batch_id=2)
    # simulate the crash remnant: epoch 0's rows exist again next to -1
    (
        spark.read.parquet(hist)
        .filter(F.col("doc_id") == 1)
        .drop("_batch_id")
        .withColumn("_batch_id", F.lit(0))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("_batch_id")
        .parquet(hist)
    )
    dup = spark.read.parquet(hist)
    assert dup.count() == 3  # overlapped state
    assert dup.select("fingerprint").distinct().count() == 2
    compact_history(spark, hist, committed_batch_id=2)
    healed = spark.read.parquet(hist)
    assert healed.count() == 2
    assert sorted(r.doc_id for r in healed.collect()) == [1, 2]
    assert _hist_partitions(tmp_path) == ["_batch_id=-1"]


def test_run_incremental_ingest_with_compaction(spark, tmp_path):
    from elastic_surv_spark.streaming.ingest import latest_committed_batch

    src = str(tmp_path / "src")
    hist = str(tmp_path / "hist")
    ckpt = str(tmp_path / "ckpt")
    _write_stream_files(spark, src)

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/b*")
    )
    run_incremental_ingest(stream, hist, ckpt, compact_every=1)
    assert sorted(
        r.doc_id for r in spark.read.parquet(hist).select("doc_id").collect()
    ) == _expected_survivors()
    # bounded partitions: -1 plus at most the live tail
    assert len(_hist_partitions(tmp_path)) <= 2
    assert latest_committed_batch(spark, ckpt) == len(BATCHES) - 1
    assert latest_committed_batch(spark, str(tmp_path / "no_ckpt")) is None

    # restart over the unchanged source: offsets consumed, nothing changes
    stream2 = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/b*")
    )
    run_incremental_ingest(stream2, hist, ckpt, compact_every=1)
    assert sorted(
        r.doc_id for r in spark.read.parquet(hist).select("doc_id").collect()
    ) == _expected_survivors()


def test_incremental_ingest_duplicate_only_batch(spark, tmp_path):
    hist = str(tmp_path / "hist")
    ingest_batch_incremental(
        spark.createDataFrame([(1, "only doc")], SCHEMA), 0, hist
    )
    # batch of pure duplicates: commits nothing, history unchanged
    ingest_batch_incremental(
        spark.createDataFrame([(2, "ONLY  doc"), (3, "only doc")], SCHEMA), 1, hist
    )
    got = spark.read.parquet(hist)
    assert [r.doc_id for r in got.collect()] == [1]


def test_compact_history_no_committed_data_is_noop(spark, tmp_path):
    """compact_history on a path with no readable parquet (nothing
    committed yet — e.g. every epoch so far was empty) returns 0 instead
    of raising and wedging the stream on replay (review finding)."""
    from elastic_surv_spark.streaming.ingest import compact_history

    assert compact_history(spark, str(tmp_path / "nohist"), 5) == 0
    # _SUCCESS-only directory (an empty epoch write): same contract
    d = tmp_path / "emptyhist"
    d.mkdir()
    (d / "_SUCCESS").touch()
    assert compact_history(spark, str(d), 5) == 0
