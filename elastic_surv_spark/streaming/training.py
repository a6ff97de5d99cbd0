"""Streaming certified training: per-epoch integer-GD weight updates with
exactly-once state — online learning joining the exactly-once ingest family
(``streaming/ingest.py``), built on the deterministic fixed-point trainer
(``operators/quality_model.py:fixed_point_logistic_gd``).

The model state is an epoch-partitioned weights table, one row per epoch:
``(weights_micro array<long>, bias_micro long, n_rows long, epoch,
_batch_id)`` — ``epoch`` rides as a data column so the compaction fold
(``compact_weights_table``) keeps the true epoch while the partition
collapses to ``-1``.
Epoch *k* warm-starts from the LAST COMMITTED epoch strictly below *k*
(exclude-own-epoch read, exactly like ``_read_history``), runs
``steps_per_batch`` integer-exact GD steps on the micro-batch, and
dynamic-overwrites its OWN partition — so a crash-replayed epoch reads the
identical predecessor, recomputes the identical weights (the trainer is
bit-deterministic at any partitioning), and overwrites its partition
byte-identically. State lives in the table, not the stream.

Because every update is integer-exact, the whole training RUN is
reproducible: replaying the full source through a fresh checkpoint yields
the same weight trajectory, and the final weights equal a sequential local
mirror of the same per-batch recipe (asserted in tests). That is the
100 TB contract: online training whose result does not depend on executor
count, task order, or restart history.

An EMPTY micro-batch carries the predecessor weights forward into its own
epoch row (n_rows = 0) — the chain stays contiguous and the replay guard
never wedges on a legitimately-empty first batch (the near-ingest ADVICE
r10 lesson, applied from day one here).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from elastic_surv_spark.operators.quality_model import fixed_point_logistic_gd
from elastic_surv_spark.streaming.ingest import (
    COMPACTED_BATCH_ID,
    _fs_and_path,
    _read_table_or_none,
)

__all__ = [
    "read_weights_table",
    "read_latest_weights",
    "training_batch_incremental",
    "run_incremental_training",
    "compact_weights_table",
    "certified_fold_run",
]


def read_weights_table(
    spark: SparkSession, weights_path: str
) -> DataFrame | None:
    """Consistent full-table read of the weights state — one row per
    epoch even inside the fold's duplicate-visibility window, so audit
    readers never double-count.

    ``compact_weights_table`` dynamic-overwrites the ``_batch_id=-1``
    partition BEFORE deleting the folded epoch partitions, so a raw
    ``spark.read.parquet`` between the two steps (a crash there leaves
    the table that way until a re-fold) sees the folded row AND live
    rows for the same epoch — duplicate state, double-counted n_rows
    (ADVICE r12 #2). The duplicates are byte-identical except
    ``_batch_id``, so keeping one row per epoch — the LIVE partition
    preferred, deterministically (``_batch_id`` descending; the folded
    row's is ``-1``) — restores exactly the pre-fold view. The dedup
    window partitions by ``epoch``: at most two rows per partition, by
    construction. Returns None when no state exists."""
    from pyspark.sql import Window

    tbl = _read_table_or_none(spark, weights_path)
    if tbl is None:
        return None
    w = Window.partitionBy("epoch").orderBy(F.col("_batch_id").desc())
    return (
        tbl.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def read_latest_weights(
    spark: SparkSession,
    weights_path: str,
    before_batch_id: int | None = None,
    n_features: int | None = None,
) -> tuple[list[int], int, int]:
    """The committed model: ``(weights_micro, bias_micro, epoch)`` from the
    highest epoch row (optionally strictly below ``before_batch_id`` — the
    exclude-own-epoch read a replayed batch needs). Returns zeros and epoch
    ``-1`` when no state exists yet (``n_features`` sizes the zero vector;
    required in that case).

    Filtering and ordering use the ``epoch`` DATA column, not the
    ``_batch_id`` partition: the two agree on live epoch rows, but the
    compacted ``-1`` partition keeps the folded state's true epoch
    (r12), so reads after a fold report the real epoch and the
    exclude-own-epoch comparison stays exact.

    Well-defined inside the fold's duplicate-visibility window WITHOUT
    the :func:`read_weights_table` window pass (r15, one ordered
    ``limit(1)`` job instead of window + sort): the only duplicates a
    raw read can hold are one epoch's live row and its folded ``-1``
    twin, byte-identical except ``_batch_id`` — so the single row with
    the max ``(epoch, _batch_id)`` IS the per-epoch-dedup'd table's max
    ``epoch`` row (live partition preferred, exactly the window rule)."""
    tbl = _read_table_or_none(spark, weights_path)
    if tbl is not None and before_batch_id is not None:
        tbl = tbl.filter(F.col("epoch") < int(before_batch_id))
    row = (
        None
        if tbl is None
        else (
            tbl.orderBy(
                F.col("epoch").desc(), F.col("_batch_id").desc()
            ).limit(1).collect()
            or [None]
        )[0]  # bounded: one row — the state is one weight vector per epoch
    )
    if row is None:
        if n_features is None:
            raise ValueError(
                "read_latest_weights: no committed state and no n_features "
                "to size the zero init"
            )
        return [0] * int(n_features), 0, -1
    return list(row["weights_micro"]), int(row["bias_micro"]), int(row["epoch"])


def training_batch_incremental(
    batch_df: DataFrame,
    batch_id: int,
    weights_path: str,
    feature_cols: list[str],
    label_col: str,
    steps_per_batch: int = 1,
    lr_micro: int = 500_000,
) -> None:
    """Commit one micro-batch's weight update (foreachBatch body).

    Split out from the stream wiring so a restart replay is directly
    testable: calling this twice with the same ``batch_id`` leaves the
    weights table byte-identical (the predecessor read excludes the own
    epoch, and the trainer is deterministic).
    """
    spark = batch_df.sparkSession
    feats = list(feature_cols)
    w0, b0, _ = read_latest_weights(
        spark, weights_path, before_batch_id=batch_id, n_features=len(feats)
    )
    # No pre-count and no outer persist (r15): the trainer's first-step
    # aggregate already computes n over ITS OWN persisted projection —
    # ``empty_ok`` folds the carry-forward-on-empty rule in and ``n_out``
    # hands the count back, so the epoch costs one fewer Spark job and
    # caches the micro-batch once instead of twice. Values are untouched:
    # same weights on data, same (w0, b0) carry on an empty batch.
    n_info: dict = {}
    w, b = fixed_point_logistic_gd(
        batch_df,
        feats,
        label_col,
        steps=steps_per_batch,
        lr_micro=lr_micro,
        init=(w0, b0),
        empty_ok=True,
        n_out=n_info,
    )
    n_rows = n_info["n"]
    row = spark.createDataFrame(
        # epoch rides as a DATA column too: the compaction fold keeps it
        # while the _batch_id partition collapses to -1 (r12)
        [(w, b, int(n_rows), int(batch_id), int(batch_id))],
        "weights_micro array<long>, bias_micro long, n_rows long,"
        " epoch int, _batch_id int",
    )
    (
        row.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("_batch_id")
        .parquet(weights_path)
    )


def run_incremental_training(
    stream_df: DataFrame,
    weights_path: str,
    checkpoint_dir: str,
    feature_cols: list[str],
    label_col: str,
    steps_per_batch: int = 1,
    lr_micro: int = 500_000,
) -> None:
    """Drive a bounded labeled stream through the training sink."""

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        training_batch_incremental(
            batch_df,
            batch_id,
            weights_path,
            feature_cols,
            label_col,
            steps_per_batch=steps_per_batch,
            lr_micro=lr_micro,
        )

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


def certified_fold_run(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    id_col: str,
    weights_path: str,
    n_batches: int = 4,
    fold_after: int = 1,
    steps_per_batch: int = 1,
    lr_micro: int = 500_000,
) -> DataFrame:
    """The streaming training+compaction lifecycle as ONE certifiable
    dataflow (VERDICT r12 stretch #9): drive ``n_batches`` deterministic
    hash-keyed epochs through :func:`training_batch_incremental`, FOLD
    the committed prefix after epoch ``fold_after``
    (:func:`compact_weights_table` — so every later epoch warm-starts off
    the COMPACTED row), and return the final weights table through
    :func:`read_weights_table` with the int64 micro-weights as columns:
    ``(epoch, n_rows, w0_micro …, bias_micro)``.

    Batch membership is the batched trainer's engine-portable hash key
    (``operators/quality_model.py:_batch_id_col`` — id-hashed, not
    row-order windows), and each epoch runs ``steps_per_batch`` warm-
    started integer-GD steps, so with ``steps_per_batch=1`` the whole
    trajectory is EXACTLY the sequential batched chain
    (``fixed_point_gd_batched_sql`` at epochs=1) evaluated after each
    batch — and the visible epoch set after the fold is
    ``[fold_after, n_batches)`` (the folded row keeps the highest folded
    epoch; later epochs keep live rows). DuckDB regenerates the entire
    returned frame via ``fixed_point_gd_batched_trajectory_sql(...,
    visible_from=fold_after)``: a hash match certifies at once that (a)
    per-epoch training is bit-exact, (b) the fold retained the right
    state, and (c) the post-fold WARM START read the compacted row
    correctly — a wrong fold would corrupt every later epoch's weights.

    Scale: one persisted keyed projection; each epoch is one filtered
    warm-started trainer pass (bounded driver traffic), the fold is the
    bounded one-row supersede; nothing corpus-sized ever reaches the
    driver.
    """
    from elastic_surv_spark.operators.quality_model import _batch_id_col

    feats = list(feature_cols)
    if not (0 <= fold_after < n_batches):
        raise ValueError(
            "certified_fold_run: fold_after must be in [0, n_batches) "
            f"(got {fold_after} of {n_batches})"
        )
    spark = df.sparkSession
    base = df.select(
        *feats,
        label_col,
        (_batch_id_col(id_col) % F.lit(int(n_batches))).alias("_bid"),
        F.col(id_col).cast("long").alias("_id"),
    ).persist()
    try:
        # the batched trainer's guard, applied here too (ADVICE r13 #4):
        # a negative id hashes to a negative _bid and a NULL/uncastable id
        # to a NULL one — either matches no batch filter, so the rows
        # would silently drop from EVERY epoch on both engines. Bounded
        # probe: limit(1) before the count.
        bad = (
            base.filter(F.col("_id").isNull() | (F.col("_id") < 0))
            .limit(1)
            .count()
        )
        if bad:
            raise ValueError(
                "certified_fold_run: id_col has negative or NULL values "
                "— they hash outside every batch"
            )
        for bid in range(n_batches):
            training_batch_incremental(
                base.filter(F.col("_bid") == bid).drop("_bid", "_id"),
                bid,
                weights_path,
                feats,
                label_col,
                steps_per_batch=steps_per_batch,
                lr_micro=lr_micro,
            )
            if bid == fold_after:
                # epochs <= fold_after are committed (sequential drive):
                # fold them; epoch fold_after's state survives as the
                # compacted row every later epoch warm-starts from
                compact_weights_table(
                    spark, weights_path, committed_batch_id=fold_after + 1
                )
    finally:
        base.unpersist()
    tbl = read_weights_table(spark, weights_path)
    nf = len(feats)
    return tbl.select(
        F.col("epoch").cast("long").alias("epoch"),
        F.col("n_rows").cast("long").alias("n_rows"),
        *[
            F.element_at("weights_micro", j + 1).alias(f"w{j}_micro")
            for j in range(nf)
        ],
        "bias_micro",
    )


def compact_weights_table(
    spark: SparkSession,
    weights_path: str,
    committed_batch_id: int,
) -> int:
    """Fold committed weight epochs into the consolidated ``_batch_id=-1``
    partition — the ingest family's ``compact_history`` applied to the
    training state, completing the symmetry (VERDICT r11 stretch #9): the
    table otherwise grows one partition per epoch forever. Returns how
    many epoch partitions were folded.

    Unlike the row-union history fold, weight epochs SUPERSEDE each other:
    the consolidated partition keeps exactly ONE row — the highest folded
    epoch's state (a prior ``-1`` row participates and always loses to
    any newer epoch, which is also what heals a promote-then-crash
    overlap: re-folding the same epochs reproduces the same single row).

    ``committed_batch_id`` must be a replay frontier (epochs strictly
    below it can never re-run — ``latest_committed_batch`` + 1 offline).
    Warm-start semantics are preserved by construction:
    ``read_latest_weights`` orders and filters on the ``epoch`` DATA
    column, which the fold KEEPS (the ``-1`` partition's single row
    carries its true epoch and batch size), so a post-fold replay reads
    exactly the state the pre-fold table would have given it — byte
    parity asserted in tests — and audit reads still see the real epoch.

    Crash window (ADVICE r12 #2): between the ``-1`` overwrite and the
    per-partition deletes, the table holds the folded row AND the live
    rows it supersedes — byte-identical except ``_batch_id``. Readers go
    through :func:`read_weights_table` (one row per epoch, live partition
    preferred), which restores the exact pre-fold view in that state;
    ``read_latest_weights`` does. A re-fold with the same frontier heals
    the files themselves (same supersede rule, same bytes, deletes
    re-attempted).
    """
    tbl = _read_table_or_none(spark, weights_path)
    if tbl is None:
        return 0
    old = tbl.filter(F.col("_batch_id") < int(committed_batch_id))
    old_ids = sorted(
        r["_batch_id"]
        for r in old.select("_batch_id").distinct().collect()  # bounded: epochs
    )
    fold_ids = [i for i in old_ids if i != COMPACTED_BATCH_ID]
    if not fold_ids:
        return 0

    # The superseding state is ONE bounded row (a weight vector + scalars):
    # collect it and rewrite it as a driver-local relation instead of the
    # earlier staging-dir round-trip (write + read-back + two extra
    # filesystem deletes — r15). The crash story is unchanged: the -1
    # overwrite below is still the first mutation, so a crash before it
    # leaves the table untouched and a crash after it leaves the
    # duplicate-visibility window `read_latest_weights` already handles.
    keep = old.orderBy(F.col("epoch").desc()).limit(1).drop("_batch_id")
    rows = keep.collect()  # bounded: exactly one superseding state row
    (
        spark.createDataFrame(rows, keep.schema)
        .withColumn("_batch_id", F.lit(int(COMPACTED_BATCH_ID)))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("_batch_id")
        .parquet(weights_path)
    )
    fs, root = _fs_and_path(spark, weights_path)
    for bid in fold_ids:
        fs.delete(
            spark._jvm.org.apache.hadoop.fs.Path(root, f"_batch_id={bid}"), True
        )
    return len(fold_ids)
