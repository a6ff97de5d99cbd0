"""Property check: two-level sharded cumsum == naive single-window cumsum."""

from __future__ import annotations

import random

import pandas as pd
from pyspark.sql import Window
from pyspark.sql import functions as F

from elastic_surv_spark.operators.prefix import sharded_cumsum


def test_sharded_cumsum_matches_single_window(spark):
    rng = random.Random(11)
    n = 500
    pdf = pd.DataFrame(
        {
            "k": [rng.randrange(n * 3) for _ in range(n)],  # sparse, gappy keys
            "g": [rng.choice(["a", "b", "c"]) for _ in range(n)],
            "v": [rng.randrange(-50, 50) for _ in range(n)],
        }
    ).drop_duplicates(subset=["g", "k"])
    df = spark.createDataFrame(pdf, schema="k long, g string, v long")

    got = sharded_cumsum(
        df, ["g"], "k", "v", shard=F.floor(F.col("k") / 37)
    ).toPandas()

    w = Window.partitionBy("g").orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    want = (
        df.withColumn("cum", F.sum("v").over(w)).toPandas()
    )

    key = ["g", "k"]
    got = got.sort_values(key, ignore_index=True)
    want = want.sort_values(key, ignore_index=True)
    assert list(got["cum"]) == list(want["cum"])
    assert sorted(got.columns) == sorted(want.columns)


def test_sharded_cumsum_keeps_null_stratum(spark):
    """A NULL stratum key is a real partition in the single-window form; the
    sharded rejoin must not drop it (plain equi-join would: NULL != NULL)."""
    pdf = pd.DataFrame(
        {
            "k": list(range(10)),
            "g": [None if i % 2 else "a" for i in range(10)],
            "v": [1] * 10,
        }
    )
    df = spark.createDataFrame(pdf, schema="k long, g string, v long")
    got = (
        sharded_cumsum(df, ["g"], "k", "v", shard=F.floor(F.col("k") / 3))
        .toPandas()
        .sort_values(["g", "k"], ignore_index=True)
    )
    w = Window.partitionBy("g").orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    want = (
        df.withColumn("cum", F.sum("v").over(w))
        .toPandas()
        .sort_values(["g", "k"], ignore_index=True)
    )
    assert len(got) == 10
    assert list(got["cum"]) == list(want["cum"])
