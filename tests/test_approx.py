"""approx_count_distinct ≡ the reference's eland nunique → ES cardinality
aggregation (HyperLogLog++, SURVEY §2.4 A1) — bounded relative error."""

from __future__ import annotations

from pyspark.sql import functions as F

from elastic_surv_spark.sources.parquet import load_table

SF = "/root/testdata/sf0.01"


def test_approx_count_distinct_within_rsd(spark):
    e = load_table(spark, SF, "events")
    row = e.agg(
        F.countDistinct("user_id").alias("exact"),
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx"),
    ).first()
    exact, approx = row["exact"], row["approx"]
    assert abs(approx - exact) / exact < 0.1
