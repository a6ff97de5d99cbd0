"""Bucketed range join vs naive BETWEEN cross-join ground truth."""

from __future__ import annotations

from pyspark.sql import functions as F

from elastic_surv_spark.operators.range_join import range_join
from elastic_surv_spark.sources.parquet import load_table

SF = "/root/testdata/sf0.001"


def _naive(purchases, views, lower_s):
    p = purchases.select(
        F.col("event_id"), F.col("user_id"), F.unix_micros("ts").alias("_l")
    )
    v = views.select(F.col("user_id"), F.unix_micros("ts").alias("_r"))
    return (
        p.join(v, "user_id")
        .filter(
            (F.col("_r") >= F.col("_l") - lower_s * 1_000_000)
            & (F.col("_r") <= F.col("_l"))
        )
        .groupBy("event_id")
        .count()
    )


def test_range_join_matches_naive(spark):
    e = load_table(spark, SF, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = e.filter(F.col("event_type") == "view").select("user_id", "ts", "value")

    got = (
        range_join(
            purchases, views, on="user_id", left_ts="ts", right_ts="ts",
            lower_seconds=3600, upper_seconds=0,
        )
        .groupBy("event_id")
        .count()
        .toPandas()
        .set_index("event_id")["count"]
        .to_dict()
    )
    want = _naive(purchases, views, 3600).toPandas().set_index("event_id")["count"].to_dict()
    assert got == want and len(want) > 0


def test_range_join_bucket_width_invariance(spark):
    e = load_table(spark, SF, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = e.filter(F.col("event_type") == "view").select("user_id", "ts")
    base = None
    for bucket in (600, 3600, 7200):
        n = range_join(
            purchases, views, on="user_id", left_ts="ts", right_ts="ts",
            lower_seconds=3600, upper_seconds=0, bucket_seconds=bucket,
        ).count()
        base = n if base is None else base
        assert n == base
