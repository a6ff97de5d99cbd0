"""Distributed prefix sums — the two-pass scan primitive.

A running total ordered within a low-cardinality stratum (e.g. cumulative
tokens per language over a whole corpus) is the canonical Spark scale trap:
``Window.partitionBy(stratum).orderBy(k)`` plans ONE sequential task per
stratum value, so five languages at 100 TB means five tasks each scanning
~20 % of the corpus. The classic fix (same as GPU scan / MPI exscan) is a
two-level pass:

1. shard each stratum by contiguous ranges of the order key,
2. cumsum *within* (stratum, shard) — thousands of parallel window tasks,
3. aggregate per-shard totals (tiny: |strata| x |shards| rows), take their
   running total per stratum on the tiny side, and broadcast-join the
   resulting exclusive offsets back,
4. local cumsum + shard offset == the global cumsum, exactly.

Pass 3's window runs over the aggregated table only, so the sequential part
is O(|shards|), not O(rows). Output is bit-identical to the single-window
form for integer values (addition is associative); float users should expect
the usual reassociation jitter.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def sharded_cumsum(
    df: DataFrame,
    part_cols: list[str],
    order_col: str,
    value_col: str,
    shard: Column,
    out_col: str = "cum",
) -> DataFrame:
    """Cumulative sum of ``value_col`` over ``order_col`` within each
    ``part_cols`` stratum, computed with bounded parallelism.

    ``shard`` must be a monotone function of ``order_col`` (contiguous
    ranges — e.g. ``floor(col("doc_id") / 4096)``) so that shard order
    equals key order within every stratum.
    """
    d = df.withColumn("_shard", shard)

    local_w = (
        Window.partitionBy(*part_cols, "_shard")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    d = d.withColumn("_local_cum", F.sum(value_col).over(local_w))

    # Per-shard totals: |strata| x |shards| rows — broadcastable by design.
    totals = d.groupBy(*part_cols, "_shard").agg(
        F.sum(value_col).alias("_shard_total")
    )
    offset_w = (
        Window.partitionBy(*part_cols)
        .orderBy("_shard")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.withColumn(
        "_offset", F.coalesce(F.sum("_shard_total").over(offset_w), F.lit(0))
    ).select(*part_cols, "_shard", "_offset")

    # Null-safe rejoin: a plain equi-join would drop rows whose stratum key
    # is NULL (NULL != NULL), diverging from the single-window form, which
    # keeps a NULL partition. eqNullSafe keeps the two bit-identical.
    off = offsets.select(
        *[F.col(c).alias(f"_off_{c}") for c in part_cols],
        F.col("_shard").alias("_off_shard"),
        "_offset",
    )
    cond = d["_shard"].eqNullSafe(off["_off_shard"])
    for c in part_cols:
        cond = cond & d[c].eqNullSafe(off[f"_off_{c}"])
    return (
        d.join(F.broadcast(off), cond)
        .withColumn(out_col, F.col("_local_cum") + F.col("_offset"))
        .drop(
            "_shard",
            "_local_cum",
            "_offset",
            "_off_shard",
            *[f"_off_{c}" for c in part_cols],
        )
    )
