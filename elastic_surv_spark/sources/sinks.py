"""Sinks: partitioned/bucketed parquet, CSV/JSON interchange.

The reference's only sink is `ed.pandas_to_eland(...)` uploading demo frames
to an ES index (reference README.md:65-78; SURVEY §2.1 S4). Spark-native
equivalents, plus the two layout decisions that matter at 100 TB:

- **partitionBy(cols)** → directory-level partition pruning: a reader's
  filter on the partition column skips whole directories at file-listing
  time (shows as PartitionFilters in the scan).
- **bucketBy(n, cols)** (table sink) → co-located joins: two tables
  bucketed on the same key join WITHOUT a shuffle (both sides already hash
  to the same bucket layout).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def write_parquet(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed managed table (bucketing needs the catalog —
    plain path writes can't record bucket metadata)."""
    w = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table, format="parquet")


def zorder_column(
    df: DataFrame, cols: list[str], bits: int = 10, relative_error: float = 1e-4
) -> Column:
    """Morton (Z-order) key over ``cols``: quantile-coded then bit-interleaved.

    The third 100 TB layout decision next to partitionBy/bucketBy: sorting a
    table by ONE column gives min/max pruning on that column only; sorting
    by the interleaved key clusters ALL the listed dimensions at once, so a
    reader's filter on ANY of them skips most files/row-groups (Delta/
    Iceberg ``OPTIMIZE ZORDER BY`` — this is the plain-Spark equivalent).

    Each column maps to a ``bits``-bit rank code via its own quantile
    boundaries (``approxQuantile`` — a bounded driver-side array of
    2^bits·|cols| doubles, never corpus rows; rank coding keeps skewed
    columns from collapsing into a few codes the way uniform min/max
    bucketing would), then codes interleave bit-by-bit into one long.
    NULLs code to 0 (sort first, same contract as Spark's NULLS FIRST
    default). ``bits·|cols|`` must fit 63 bits.
    """
    if bits * len(cols) > 63:
        raise ValueError(f"zorder_column: {bits} bits x {len(cols)} cols > 63")
    n_codes = 1 << bits
    probs = [i / n_codes for i in range(1, n_codes)]
    bounds = {
        c: np.asarray(
            df.select(F.col(c).cast("double").alias(c)).approxQuantile(
                c, probs, relative_error
            )
        )
        for c in cols
    }
    n_cols = len(cols)

    @F.pandas_udf("long")
    def z(*series: pd.Series) -> pd.Series:
        codes = []
        for c, s in zip(cols, series):
            v = s.to_numpy(dtype=np.float64, na_value=-np.inf)
            codes.append(np.searchsorted(bounds[c], v, side="right").astype(np.int64))
        out = np.zeros(len(series[0]), dtype=np.int64)
        for b in range(bits):
            for j, code in enumerate(codes):
                out |= ((code >> b) & 1) << (b * n_cols + j)
        return pd.Series(out)

    return z(*[F.col(c).cast("double") for c in cols])


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int | None = None,
    bits: int = 10,
    mode: str = "overwrite",
) -> None:
    """Write parquet clustered on the Z-order key of ``cols``.

    ``repartitionByRange`` on the key (range exchange: contiguous z-runs
    per file, which is what makes per-file min/max stats selective on
    every listed dimension) + a within-partition sort so row-group stats
    inside each file are tight too. The key is dropped before the write —
    layout, not schema.
    """
    n_files = n_files or df.sparkSession.sparkContext.defaultParallelism
    (
        df.withColumn("_z", zorder_column(df, cols, bits=bits))
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode(mode)
        .parquet(path)
    )


def read_csv(
    spark: SparkSession, path: str, schema: str | None = None, header: bool = True
) -> DataFrame:
    r = spark.read.option("header", str(header).lower())
    if schema:
        r = r.schema(schema)
    else:
        r = r.option("inferSchema", "true")
    return r.csv(path)


def read_json(spark: SparkSession, path: str, schema: str | None = None) -> DataFrame:
    r = spark.read
    if schema:
        r = r.schema(schema)
    return r.json(path)
