"""Streaming incremental corpus ingest with exactly-once history dedup.

The streaming twin of ``operators/dedup.py:incremental_dedup``: documents
arrive as a stream, each micro-batch collapses within itself, anti-joins
the corpus ingested so far, and appends only its survivors — so the
history parquet is duplicate-free by construction, forever, without ever
re-deduping the full corpus.

Exactly-once without a transactional store: survivors land under a
``_batch_id=<epoch>`` partition written with DYNAMIC partition overwrite,
and the dedup reads the history EXCLUDING the current epoch's partition.
A replayed micro-batch (restart after a crash mid-commit) therefore
recomputes the same survivor set against the same prior history and
overwrites its own partition with identical content — idempotent — while
the naive append-only sink would double its rows, and a naive
"anti-join everything" would see the batch's own earlier commit and
overwrite the partition with NOTHING (silent data loss; caught while
building the test).

At 100 TB: the history side is a parquet scan pruned to ``fingerprint``
(8 bytes) + id columns; per-batch cost is one small-batch shuffle + an
anti-join whose history side streams (or bucket-locally joins, if the
history is maintained as a bucketed table). State lives in the table, not
the stream — no watermark-unbounded streaming state for an unbounded key
space (compare ``events_dedup_stream``'s watermark-bounded variant).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["ingest_batch_incremental", "run_incremental_ingest"]


def _read_history(
    spark: SparkSession, history_path: str, exclude_batch_id: int
) -> DataFrame | None:
    try:
        hist = spark.read.parquet(history_path)
    except Exception:  # first batch: no history yet
        return None
    return hist.filter(F.col("_batch_id") != exclude_batch_id)


def ingest_batch_incremental(
    batch_df: DataFrame,
    batch_id: int,
    history_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> None:
    """Commit one micro-batch's survivors to the history (foreachBatch body).

    Split out from the stream wiring so a restart replay is directly
    testable: calling this twice with the same ``batch_id`` leaves the
    history byte-identical.
    """
    from elastic_surv_spark.operators.dedup import normalize_text

    spark = batch_df.sparkSession
    hist = _read_history(spark, history_path, batch_id)

    keep = (
        batch_df.select(
            F.xxhash64(normalize_text(F.col(text_col))).alias("fingerprint"),
            F.col(id_col),
        )
        .groupBy("fingerprint")
        .agg(F.min(id_col).alias("keep_id"))
    )
    if hist is not None:
        # the history stores the fingerprint it was ingested under, so the
        # anti-join scans ONLY the 8-byte key column (pruned at the parquet
        # scan) — never the corpus text
        keep = keep.join(
            hist.select("fingerprint").distinct(), "fingerprint", "left_anti"
        )

    survivors = batch_df.join(
        keep.select(F.col("keep_id").alias(id_col)), id_col, "left_semi"
    ).withColumns(
        {
            "fingerprint": F.xxhash64(normalize_text(F.col(text_col))),
            "_batch_id": F.lit(int(batch_id)),
        }
    )
    # dynamic overwrite scoped to THIS write (DataFrameWriter option, not a
    # session conf mutation that would leak into later writes on the stream's
    # session): only the partitions present in `survivors` are replaced
    (
        survivors.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("_batch_id")
        .parquet(history_path)
    )


def run_incremental_ingest(
    stream_df: DataFrame,
    history_path: str,
    checkpoint_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> None:
    """Drive a bounded document stream through the incremental-ingest sink."""

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        ingest_batch_incremental(batch_df, batch_id, history_path, text_col, id_col)

    q = (
        stream_df.writeStream.outputMode("append")
        .foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
