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
