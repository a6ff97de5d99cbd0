"""Streaming twins vs batch truth: replay the events table as 4 time-ordered
micro-batches, run the streaming plans to completion, compare against the
batch operators. Append-mode aggregations only emit watermark-closed
windows, so emitted rows are checked as a (non-empty) subset of batch."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from elastic_surv_spark.operators.sessionize import session_stats
from elastic_surv_spark.sources.parquet import load_table
from elastic_surv_spark.streaming.windows import (
    hourly_counts_stream,
    read_events_stream,
    run_to_memory,
    session_window_stream,
    stateful_running_max,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def stream_dir(spark, tmp_path_factory):
    """Events re-written as 4 range-partitioned-by-ts files (micro-batches)."""
    out = str(tmp_path_factory.mktemp("events_stream"))
    events = load_table(spark, SF, "events")
    events.repartitionByRange(4, "ts").write.mode("overwrite").parquet(out)
    return out


def test_hourly_stream_matches_batch(spark, stream_dir):
    stream = read_events_stream(spark, stream_dir)
    got = run_to_memory(hourly_counts_stream(stream), "hourly_out").toPandas()
    batch = (
        load_table(spark, SF, "events")
        .groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,6)")), 4)
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
        .toPandas()
    )
    assert len(got) > 0
    bmap = {
        (r.window_start, r.event_type): (r.n_events, r.sum_value)
        for r in batch.itertuples()
    }
    for r in got.itertuples():
        assert bmap[(r.window_start, r.event_type)] == (r.n_events, r.sum_value)


def test_session_window_stream_matches_batch_sessionize(spark, stream_dir):
    stream = read_events_stream(spark, stream_dir)
    got = run_to_memory(
        session_window_stream(stream, gap="30 minutes"), "sessions_out"
    ).toPandas()
    batch = session_stats(
        load_table(spark, SF, "events"), gap_seconds=1800
    ).toPandas()
    assert len(got) > 0
    bmap = {
        (r.user_id, r.session_start_us): (r.n_events, r.sum_value)
        for r in batch.itertuples()
    }
    # every emitted (closed) streaming session must exactly match a batch one
    for r in got.itertuples():
        assert bmap[(r.user_id, r.session_start_us)] == (r.n_events, r.sum_value)


def _ordered_copy(stream_dir: str, dst_dir: str) -> str:
    """Private copy of the stream fixture with strictly increasing mtimes
    in range-partition (= event-time) order. The parallel fixture writer
    stamps near-equal mtimes and FileStreamSource replays by mtime, so
    without this the 4 micro-batches can arrive out of event-time order —
    the watermark then jumps ahead and silently late-drops whole earlier
    chunks (a latent flake that surfaced in r12; the transitions test
    already used this recipe)."""
    import glob
    import os
    import shutil
    import time

    now = time.time()
    for i, f in enumerate(sorted(glob.glob(os.path.join(stream_dir, "part-*")))):
        dst = os.path.join(dst_dir, os.path.basename(f))
        shutil.copyfile(f, dst)
        os.utime(dst, (now + i, now + i))
    return dst_dir


def test_stateful_running_max(spark, stream_dir, tmp_path_factory):
    ordered = _ordered_copy(
        stream_dir, str(tmp_path_factory.mktemp("events_peaks_ordered"))
    )
    stream = read_events_stream(spark, ordered)
    got = run_to_memory(
        stateful_running_max(stream), "peaks_out", output_mode="update"
    ).toPandas()
    final = got.groupby("user_id").agg({"peak": "max", "n": "max"})
    batch = (
        load_table(spark, SF, "events")
        .groupBy("user_id")
        .agg(F.max("value").alias("peak"), F.count("*").alias("n"))
        .toPandas()
        .set_index("user_id")
    )
    assert len(final) == len(batch)
    for uid, row in final.iterrows():
        assert abs(row["peak"] - batch.loc[uid, "peak"]) < 1e-12
        assert row["n"] == batch.loc[uid, "n"]


def test_event_epoch_ms_is_timezone_explicit():
    """The event-time-timeout base must not depend on the session being
    UTC (ADVICE r12 #4): a NAIVE batch-max timestamp is localized to the
    declared session zone before epoch math — the same wall-clock value
    under New York (UTC-5 in January) is five hours of epoch later than
    under UTC — and an already-aware value passes through unchanged."""
    import pandas as pd

    from elastic_surv_spark.streaming.windows import _event_epoch_ms

    naive = pd.Timestamp("2024-01-15 12:00:00")
    utc_ms = _event_epoch_ms(naive, "UTC")
    assert utc_ms == int(naive.tz_localize("UTC").value // 1_000_000)
    ny_ms = _event_epoch_ms(naive, "America/New_York")
    assert ny_ms - utc_ms == 5 * 3_600_000
    aware = naive.tz_localize("UTC")
    assert _event_epoch_ms(aware, "America/New_York") == utc_ms


def test_event_epoch_ms_survives_dst_edges():
    """DST edge wall times must resolve deterministically, never raise
    (ADVICE r13 #1 — pandas' default ambiguous='raise'/nonexistent=
    'raise' would kill the streaming query on a batch-max landing in a
    fall-back or spring-forward hour). Ambiguous (fall-back, two
    instants) picks the EARLIER instant (DST); nonexistent
    (spring-forward gap) shifts forward to the first valid instant."""
    import pandas as pd

    from elastic_surv_spark.streaming.windows import _event_epoch_ms

    # 2024-11-03 01:30 America/New_York happens twice (EDT then EST):
    # must not raise, and must pick the first (EDT, UTC-4) occurrence
    amb = pd.Timestamp("2024-11-03 01:30:00")
    got = _event_epoch_ms(amb, "America/New_York")
    edt = int(
        amb.tz_localize("America/New_York", ambiguous=True).value
        // 1_000_000
    )
    assert got == edt
    # The disclosed cost (ADVICE r14 #2): an event truly in the SECOND
    # (EST) pass is stamped with the EDT instant — exactly one DST
    # offset early, so a timeout keyed on this base fires at most one
    # hour late for that hour's second-pass events. Pin the bound: the
    # two candidate instants differ by exactly 3_600_000 ms.
    est_ms = int(
        amb.tz_localize("America/New_York", ambiguous=False).value
        // 1_000_000
    )
    assert est_ms - got == 3_600_000

    # 2024-03-10 02:30 America/New_York does not exist (clocks jump
    # 02:00→03:00): shifts forward to 03:00 EDT instead of raising
    gap = pd.Timestamp("2024-03-10 02:30:00")
    got_gap = _event_epoch_ms(gap, "America/New_York")
    three = pd.Timestamp("2024-03-10 03:00:00").tz_localize(
        "America/New_York"
    )
    assert got_gap == int(three.value // 1_000_000)


def test_checkpointed_parquet_sink_exactly_once(spark, stream_dir, tmp_path_factory):
    # the file-sink transaction log + source offsets make restarts idempotent:
    # a second run over the same bounded source must commit zero new rows
    from elastic_surv_spark.streaming.windows import dedup_keys_stream, run_to_parquet

    out = str(tmp_path_factory.mktemp("sink_out"))
    ckpt = str(tmp_path_factory.mktemp("sink_ckpt"))

    def run_once():
        stream = read_events_stream(spark, stream_dir)
        run_to_parquet(
            dedup_keys_stream(stream, ["user_id", "event_type"]), out, ckpt
        )
        return spark.read.parquet(out).count()

    n1 = run_once()
    expected = (
        load_table(spark, SF, "events")
        .select("user_id", "event_type").distinct().count()
    )
    assert n1 == expected
    n2 = run_once()  # restart with same checkpoint: nothing new committed
    assert n2 == n1


def test_stateful_transitions_stitch_across_batches(spark, stream_dir, tmp_path_factory):
    import glob
    import os
    import shutil
    import time

    from pyspark.sql import Window

    from elastic_surv_spark.streaming.windows import stateful_transitions

    # stateful_transitions' contract is event-time-ordered batch arrival:
    # work on a PRIVATE ordered copy (see _ordered_copy).
    ordered_dir = _ordered_copy(
        stream_dir, str(tmp_path_factory.mktemp("events_stream_ordered"))
    )

    stream = read_events_stream(spark, ordered_dir, max_files_per_trigger=1)
    pairs = run_to_memory(
        stateful_transitions(stream), "_transitions_multi", output_mode="append"
    )
    got = {
        (r["prev_type"], r["event_type"]): r["n"]
        for r in pairs.groupBy("prev_type", "event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    batch = load_table(spark, SF, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    want = {
        (r["prev_type"], r["event_type"]): r["n"]
        for r in batch.select(
            "event_type", F.lag("event_type").over(w).alias("prev_type")
        )
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    # 4 time-ordered micro-batches: cross-batch state stitching must make
    # the streaming pair counts EXACTLY the batch lag-window counts
    assert got == want


@pytest.fixture(scope="module")
def docs_stream_dir(spark, tmp_path_factory):
    """Documents replayed as a 4-micro-batch stream. Event time derives
    from the CONTENT fingerprint (epoch + pmod(xxhash64(text), 720) min),
    so every copy of a duplicate text shares one timestamp/window — making
    the streaming dedup's first-arrival choice deterministic and the batch
    truth well-defined."""
    out = str(tmp_path_factory.mktemp("docs_stream"))
    docs = load_table(spark, SF, "documents").withColumn(
        "ts",
        F.timestamp_seconds(
            F.lit(1704067200) + F.pmod(F.xxhash64("text"), F.lit(720)) * 60
        ),
    )
    # FileStreamSource orders micro-batches by file MODIFICATION TIME, not
    # name — a single parallel repartitionByRange write gives the range
    # files arbitrary mtimes, replaying them out of event-time order and
    # silently late-dropping whole batches. Write the four 3-hour slices
    # SEQUENTIALLY so arrival order matches event time, like a real feed.
    for i in range(4):
        lo, hi = i * 180 * 60, (i + 1) * 180 * 60
        (
            docs.filter(
                (F.unix_timestamp("ts") - 1704067200 >= lo)
                & (F.unix_timestamp("ts") - 1704067200 < hi)
            )
            .coalesce(1)
            .write.mode("append")
            .parquet(out)
        )
    return out


def test_document_pipeline_stream_matches_batch(spark, docs_stream_dir):
    """The streaming twin of llm_data_pipeline_e2e: quality filter →
    fingerprint dedup-within-watermark → token stats per (window, lang).
    Emitted (append-closed) windows must agree EXACTLY with the batch
    computation on per-window totals (lang split is arrival-dependent for
    a multi-lang duplicate text, totals are not)."""
    from elastic_surv_spark.functions.text import quality_score, token_count
    from elastic_surv_spark.streaming.windows import document_pipeline_stream

    stream = (
        spark.readStream.schema(
            "doc_id long, text string, lang string, source string, "
            "n_chars long, ts timestamp"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(docs_stream_dir)
    )
    got = run_to_memory(
        document_pipeline_stream(stream), "doc_pipe_out"
    ).toPandas()
    assert len(got) > 0  # watermark closed at least some windows
    got_totals = (
        got.groupby("window_start")[["n_docs", "n_tokens"]].sum().to_dict("index")
    )
    batch = (
        spark.read.parquet(docs_stream_dir)
        .filter(quality_score(F.col("text")) >= 0.5)
        .withColumn("_fp", F.xxhash64("text"))
        .groupBy("_fp")
        .agg(F.first("ts").alias("ts"), F.first("text").alias("text"))
        .select("ts", token_count(F.col("text")).alias("n_tokens"))
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count("*").alias("n_docs"), F.sum("n_tokens").cast("long").alias("n_tokens"))
        .select(F.col("w.start").alias("window_start"), "n_docs", "n_tokens")
        .toPandas()
    )
    batch_totals = {
        r.window_start: {"n_docs": r.n_docs, "n_tokens": r.n_tokens}
        for r in batch.itertuples()
    }
    for w, vals in got_totals.items():
        assert batch_totals[w] == vals, (w, vals, batch_totals.get(w))
    # emitted ⊆ batch and strictly informative
    assert set(got_totals) <= set(batch_totals)


def test_stateful_running_max_survives_first_batch_watermark_zero(
    spark, tmp_path_factory
):
    """ADVICE r11 #1: during the FIRST micro-batch the watermark is 0, so
    a timeout of wm + ttl put every first-batch key at ~epoch + ttl — the
    key was evicted as soon as the watermark advanced, silently restarting
    its running max long before the advertised quiet period. The timeout
    base is now max(watermark, batch max event time): a user seen only in
    batch 1 and again in batch 3 (within ttl) must keep one continuous
    state."""
    import os
    import time

    from elastic_surv_spark.streaming.windows import (
        run_to_memory,
        stateful_running_max,
    )

    t0 = 1704067200  # 2024-01-01
    batches = [
        [(1, t0, 1, "view", 10.0), (2, t0, 2, "view", 1.0)],
        [(3, t0 + 1800, 2, "view", 2.0)],  # user 1 absent: eviction window
        [(4, t0 + 2400, 1, "view", 5.0), (5, t0 + 2400, 2, "view", 3.0)],
    ]
    out = str(tmp_path_factory.mktemp("peak_stream"))
    now = time.time()
    for i, rows in enumerate(batches):
        (
            spark.createDataFrame(
                rows, "event_id long, sec long, user_id long, "
                "event_type string, value double"
            )
            .select(
                "event_id",
                F.timestamp_seconds("sec").alias("ts"),
                "user_id",
                "event_type",
                "value",
                F.lit(None).cast("string").alias("props"),
            )
            .coalesce(1)
            .write.mode("append")
            .parquet(out)
        )
    # file source replays by mtime: make arrival order = event-time order
    parts = sorted(
        f for f in os.listdir(out) if f.startswith("part-")
    )
    for i, f in enumerate(
        sorted(parts, key=lambda f: os.path.getmtime(os.path.join(out, f)))
    ):
        os.utime(os.path.join(out, f), (now + i, now + i))

    from elastic_surv_spark.streaming.windows import read_events_stream

    stream = read_events_stream(spark, out, max_files_per_trigger=1)
    got = run_to_memory(
        stateful_running_max(stream), "peaks_wm0", output_mode="update"
    ).toPandas()
    u1 = got[got.user_id == 1]
    # continuous state: the batch-3 emission still remembers batch 1
    assert (u1.n.max(), u1[u1.n == u1.n.max()].peak.iloc[0]) == (2, 10.0)
