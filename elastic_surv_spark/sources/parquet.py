"""Parquet star-schema sources.

Reference equivalents: ``ESDataset`` wraps a lazy eland frame over an ES index
(reference src/elastic_surv/dataset.py:228-271) and ``PandasDataset`` wraps an
in-memory frame (dataset.py:306-344). Here every source is a lazy Spark
DataFrame over parquet: Catalyst pushes column pruning and predicates into the
scan (the same role eland's query compiler plays against ES), and the physical
read parallelizes across executors via ``spark.sql.files.maxPartitionBytes``
splits — the 100 TB path needs no code change, only more executors.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # The driver's events table carries TIMESTAMP(NANOS) parquet columns,
    # which Spark rejects by default; nanosAsLong (runtime-settable) reads
    # them as long nanos and we rebuild a proper timestamp at micro
    # precision (truncating, matching duckdb's nanos→micros behavior).
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:  # pragma: no cover - conf locked by session owner
        pass
    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events" and isinstance(df.schema["ts"].dataType, T.LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def spread_partitions(df: DataFrame) -> DataFrame:
    """Round-robin repartition when the scan yields fewer partitions than
    cores (small-file artifact at tiny SFs) — so an expensive projection
    (tokenization, vector math) never runs on one task. At real scale the
    parquet scan already splits at ``spark.sql.files.maxPartitionBytes``
    and this is a no-op."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in names}


def register_views(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> None:
    """Register each table as a temp view so operators can use spark.sql."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
