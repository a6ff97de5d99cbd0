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

from pyspark.sql import DataFrame, SparkSession


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
