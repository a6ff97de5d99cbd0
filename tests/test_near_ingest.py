"""Incremental near-dup ingest: the batch operator's decision table against
an exact-Jaccard python mirror, the persisted-band-index path, and the
streaming twin's exactly-once replay (operators/dedup_fuzzy.py:
incremental_near_dedup + streaming/ingest.py:near_ingest_batch_incremental)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from elastic_surv_spark.operators.dedup_fuzzy import band_index, incremental_near_dedup
from elastic_surv_spark.streaming.ingest import (
    near_ingest_batch_incremental,
    run_incremental_near_ingest,
)

SCHEMA = "doc_id long, text string"

BASE = "the quick brown fox jumps over the lazy dog near the old river bank"
OTHER = "completely different content about spark catalyst optimizer plans and shuffles"
THIRD = "yet another unrelated passage concerning parquet row groups and predicate pushdown"

# history: 3 docs; batch: near-dup of hist(1), near-dup of batch-mate(11),
# fresh docs, a too-short doc (no shingles -> survives)
HISTORY = [(1, BASE), (2, OTHER), (3, THIRD)]
BATCH = [
    (10, BASE + " today"),               # near-dup of history doc 1
    (11, "fresh unique sentence with plenty of brand new words in this batch"),
    (12, "fresh unique sentence with plenty of brand new words in this batch today"),  # near-dup of 11
    (13, "totally singular text mentioning bloom filters and adaptive query execution"),
    (14, "tiny doc"),                    # < 3 words of shingle: survives
]


def _shingles(text: str, n: int = 3) -> set[str]:
    w = text.split()
    return {" ".join(w[i : i + n]) for i in range(len(w) - n + 1)}


def _jaccard(a: str, b: str) -> float:
    sa, sb = _shingles(a), _shingles(b)
    if not sa or not sb:
        return 0.0
    inter = len(sa & sb)
    return round(inter / (len(sa) + len(sb) - inter), 6)


def _expected_flags(batch, history, threshold=0.5):
    out = {}
    for doc_id, text in batch:
        hist_dup = any(_jaccard(text, ht) >= threshold for _, ht in history)
        batch_dup = any(
            _jaccard(text, at) >= threshold for aid, at in batch if aid < doc_id
        )
        out[doc_id] = (hist_dup, batch_dup, not hist_dup and not batch_dup)
    return out


def test_incremental_near_dedup_matches_exact_mirror(spark):
    batch = spark.createDataFrame(BATCH, SCHEMA)
    hist = spark.createDataFrame(HISTORY, SCHEMA)
    got = {
        r.doc_id: (r.dup_of_history, r.dup_in_batch, r.keep)
        for r in incremental_near_dedup(batch, hist).collect()
    }
    want = _expected_flags(BATCH, HISTORY)
    assert got == want
    # the planted structure actually exercised every case
    assert want[10] == (True, False, False)
    assert want[12] == (False, True, False)
    assert want[13] == (False, False, True)
    assert want[14] == (False, False, True)


def test_incremental_near_dedup_prebuilt_band_index_equivalent(spark):
    """The table-resident path (persisted band index) decides identically to
    re-signing the history from its docs."""
    batch = spark.createDataFrame(BATCH, SCHEMA)
    hist = spark.createDataFrame(HISTORY, SCHEMA)
    idx = band_index(hist)
    a = sorted(
        map(tuple, incremental_near_dedup(batch, hist).collect())
    )
    b = sorted(
        map(tuple, incremental_near_dedup(batch, hist, history_bands=idx).collect())
    )
    assert a == b


def test_incremental_near_dedup_first_batch_no_history(spark):
    batch = spark.createDataFrame(BATCH, SCHEMA)
    got = {
        r.doc_id: (r.dup_of_history, r.dup_in_batch, r.keep)
        for r in incremental_near_dedup(batch, None).collect()
    }
    want = _expected_flags(BATCH, [])
    assert got == want
    assert not any(h for h, _, _ in got.values())  # no history -> no hist dups


STREAM_BATCHES = [
    [(1, BASE), (2, OTHER)],
    [(10, BASE + " today"), (11, THIRD), (3, OTHER + " extended further")],
    [(20, THIRD + " again"), (21, "entirely novel closing text about window functions and watermarks here")],
]


def _expected_stream_survivors(threshold=0.5):
    kept: list[tuple[int, str]] = []
    for rows in STREAM_BATCHES:
        flags = _expected_flags(rows, kept, threshold)
        kept.extend((i, t) for i, t in rows if flags[i][2])
    return sorted(i for i, _ in kept)


def test_near_ingest_sequential_batches_match_mirror(spark, tmp_path):
    root = str(tmp_path / "near_hist")
    for i, rows in enumerate(STREAM_BATCHES):
        near_ingest_batch_incremental(
            spark.createDataFrame(rows, SCHEMA), i, root
        )
    docs = spark.read.parquet(f"{root}/docs")
    assert sorted(r.doc_id for r in docs.collect()) == _expected_stream_survivors()
    # the band index covers exactly the kept docs
    bands = spark.read.parquet(f"{root}/bands")
    assert sorted(
        r.doc_id for r in bands.select("doc_id").distinct().collect()
    ) == [i for i in _expected_stream_survivors()]


def test_near_ingest_replay_is_idempotent(spark, tmp_path):
    root = str(tmp_path / "near_hist")
    frames = [spark.createDataFrame(rows, SCHEMA) for rows in STREAM_BATCHES]
    for i, b in enumerate(frames):
        near_ingest_batch_incremental(b, i, root)
    docs_before = sorted(map(tuple, spark.read.parquet(f"{root}/docs").collect()))
    bands_before = sorted(map(tuple, spark.read.parquet(f"{root}/bands").collect()))

    # replay the last epoch (crash between commit and checkpoint advance)
    near_ingest_batch_incremental(frames[2], 2, root)
    assert sorted(map(tuple, spark.read.parquet(f"{root}/docs").collect())) == docs_before
    assert sorted(map(tuple, spark.read.parquet(f"{root}/bands").collect())) == bands_before

    # and an interior epoch with later epochs already committed
    near_ingest_batch_incremental(frames[1], 1, root)
    assert sorted(map(tuple, spark.read.parquet(f"{root}/docs").collect())) == docs_before


def _hist_partitions(tmp_path, name):
    return sorted(
        p.name for p in (tmp_path / name).iterdir() if p.name.startswith("_batch_id=")
    )


def test_near_ingest_compaction_preserves_results(spark, tmp_path):
    """compact_history generalizes to the near-dup tables: docs fold on the
    id, bands on (id, band); dedup decisions after compaction are identical
    and partition counts stay bounded."""
    from elastic_surv_spark.streaming.ingest import compact_history

    root = str(tmp_path / "near_hist")
    frames = [spark.createDataFrame(rows, SCHEMA) for rows in STREAM_BATCHES]
    for i, b in enumerate(frames):
        near_ingest_batch_incremental(b, i, root)
    docs_before = sorted(r.doc_id for r in spark.read.parquet(f"{root}/docs").collect())
    bands_before = sorted(
        map(tuple, spark.read.parquet(f"{root}/bands").select("doc_id", "band", "key").collect())
    )

    assert compact_history(spark, f"{root}/docs", 2, key_cols=("doc_id",)) == 2
    assert compact_history(spark, f"{root}/bands", 2, key_cols=("doc_id", "band")) == 2
    assert _hist_partitions(tmp_path, "near_hist/docs") == ["_batch_id=-1", "_batch_id=2"]
    assert sorted(r.doc_id for r in spark.read.parquet(f"{root}/docs").collect()) == docs_before
    assert (
        sorted(map(tuple, spark.read.parquet(f"{root}/bands").select("doc_id", "band", "key").collect()))
        == bands_before
    )

    # the live epoch still replays idempotently against the compacted state
    near_ingest_batch_incremental(frames[2], 2, root)
    assert sorted(r.doc_id for r in spark.read.parquet(f"{root}/docs").collect()) == docs_before

    # the next batch dedups identically against the compacted band index
    nxt = spark.createDataFrame([(30, BASE + " today again"), (31, BASE)], SCHEMA)
    near_ingest_batch_incremental(nxt, 3, root)
    got = sorted(r.doc_id for r in spark.read.parquet(f"{root}/docs").collect())
    assert got == docs_before  # both are near-dups of the kept BASE doc


def test_run_incremental_near_ingest_stream(spark, tmp_path):
    src = str(tmp_path / "src")
    root = str(tmp_path / "near_hist")
    ckpt = str(tmp_path / "ckpt")
    for i, rows in enumerate(STREAM_BATCHES):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{src}/b{i}")
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/b*")
    )
    run_incremental_near_ingest(stream, root, ckpt)
    assert sorted(
        r.doc_id for r in spark.read.parquet(f"{root}/docs").collect()
    ) == _expected_stream_survivors()
    # restart over the unchanged source: offsets consumed, nothing changes
    stream2 = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/b*")
    )
    run_incremental_near_ingest(stream2, root, ckpt)
    assert sorted(
        r.doc_id for r in spark.read.parquet(f"{root}/docs").collect()
    ) == _expected_stream_survivors()


def test_near_ingest_empty_first_batch_does_not_wedge(spark, tmp_path):
    """An EMPTY first micro-batch commits zero survivors, so the docs
    read-back has no parquet footer to infer a schema from — before the
    guard this raised UNABLE_TO_INFER_SCHEMA inside the foreachBatch body,
    failing the micro-batch, and every replay hit the identical error: the
    stream wedged permanently on a legitimately empty batch (ADVICE r10).
    The guarded path must no-op, replay cleanly, and leave later batches
    deduping as if the empty epoch never happened."""
    root = str(tmp_path / "near_hist")
    empty = spark.createDataFrame([], SCHEMA)

    near_ingest_batch_incremental(empty, 0, root)  # must not raise
    near_ingest_batch_incremental(empty, 0, root)  # replay: still clean

    # the history then bootstraps from the first non-empty batch
    near_ingest_batch_incremental(spark.createDataFrame(HISTORY, SCHEMA), 1, root)
    near_ingest_batch_incremental(spark.createDataFrame(BATCH, SCHEMA), 2, root)
    got = sorted(r.doc_id for r in spark.read.parquet(f"{root}/docs").collect())
    flags = _expected_flags(BATCH, HISTORY)
    want = sorted([i for i, _ in HISTORY] + [i for i, _ in BATCH if flags[i][2]])
    assert got == want
    # band index stays consistent with the kept docs (docs too short to
    # shingle — like 14, "tiny doc" — legitimately have no band rows)
    texts = dict(HISTORY + BATCH)
    bands = spark.read.parquet(f"{root}/bands")
    assert sorted(
        r.doc_id for r in bands.select("doc_id").distinct().collect()
    ) == [i for i in want if _shingles(texts[i])]


def test_bucketed_band_index_candidate_join_shuffles_only_the_batch(spark):
    """The band-index docstring's 100 TB posture, executable: with the
    history's band index saved as a (band, key)-bucketed table (bucket
    count == shuffle partitions), the candidate join's plan exchanges ONLY
    the new batch's banded signatures — the index side is shuffle-free.
    Broadcast disabled so the asserted path is the sort-merge one a web-
    scale index takes."""
    import re
    import uuid

    from pyspark.sql import functions as F

    from elastic_surv_spark.operators.dedup_fuzzy import band_index

    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    n_buckets = int(spark.conf.get("spark.sql.shuffle.partitions"))
    tbl = f"band_idx_{uuid.uuid4().hex[:8]}"
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        hist = spark.createDataFrame(
            [(i, f"history document number {i} with several words inside") for i in range(300)],
            SCHEMA,
        )
        (
            band_index(hist)
            .write.bucketBy(n_buckets, "band", "key")
            .sortBy("band", "key")
            .mode("overwrite")
            .saveAsTable(tbl)
        )
        batch = spark.createDataFrame(BATCH, SCHEMA)
        bands_b = band_index(batch)
        cand = (
            bands_b.select(F.col("doc_id").alias("id_b"), "band", "key")
            .join(
                spark.table(tbl).select(F.col("doc_id").alias("id_a"), "band", "key"),
                ["band", "key"],
            )
            .select("id_a", "id_b")
            .dropDuplicates(["id_a", "id_b"])
        )
        plan = cand._jdf.queryExecution().executedPlan().toString()
        join_exchanges = re.findall(r"Exchange hashpartitioning\(band#", plan)
        assert len(join_exchanges) == 1, plan  # ONLY the batch side
        assert "Bucketed: true" in plan, plan
        cand.collect()  # the plan actually executes
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)


def test_incremental_near_dedup_tolerates_duplicated_history_ids(spark):
    """A compact_history promote-then-crash legitimately leaves a doc in
    BOTH the -1 partition and its source epoch until the next fold heals
    it; duplicated postings would double intersection counts and flip
    replay keep decisions (review finding, r11). Decisions must equal the
    deduped-history run exactly."""
    hist_rows = [(1, "alpha beta gamma delta"), (2, "one two three four")]
    batch_rows = [(10, "alpha beta gamma delta"), (11, "five six seven eight")]
    schema = "doc_id long, text string"
    hist = spark.createDataFrame(hist_rows, schema)
    hist_dup = spark.createDataFrame(hist_rows + [hist_rows[0]], schema)
    batch = spark.createDataFrame(batch_rows, schema)

    def decide(h):
        return {
            r.doc_id: (r.dup_of_history, r.keep)
            for r in incremental_near_dedup(batch, h, n=2).collect()
        }

    want = decide(hist)
    assert want[10] == (True, False) and want[11] == (False, True)
    assert decide(hist_dup) == want
