"""Heavy hitters: the two-pass Misra-Gries + exact-recount operator must
equal the brute-force answer on any input, even with a capacity small
enough to force constant sketch evictions."""

from __future__ import annotations

import random
from collections import Counter

import pandas as pd
import pytest

from elastic_surv_spark.operators.heavy_hitters import heavy_hitters, misra_gries


def _exact(values, num, den):
    n = len(values)
    c = Counter(values)
    return {t: v for t, v in c.items() if v * den > num * n}


def _zipf_values(rng, n_rows, vocab):
    # Skewed draw: term i with weight 1/(i+1) — a few true heavy hitters,
    # a long tail.
    weights = [1.0 / (i + 1) for i in range(vocab)]
    return rng.choices([f"t{i}" for i in range(vocab)], weights=weights, k=n_rows)


@pytest.mark.parametrize("seed,vocab,num,den", [(1, 400, 2, 100), (2, 1000, 1, 100)])
def test_heavy_hitters_equals_bruteforce_under_eviction(spark, seed, vocab, num, den):
    rng = random.Random(seed)
    values = _zipf_values(rng, 20_000, vocab)
    # capacity far under vocab so per-partition MG must evict constantly,
    # but still > 2*den/num (the operator's guarantee precondition).
    capacity = 2 * den // num + 8
    df = spark.createDataFrame(pd.DataFrame({"term": values})).repartition(8)
    got = {r["term"]: r["cnt"] for r in heavy_hitters(df, "term", num, den, capacity).collect()}
    assert got == _exact(values, num, den)


def test_heavy_hitters_shares_and_empty(spark):
    df = spark.createDataFrame(pd.DataFrame({"term": ["a"] * 6 + ["b"] * 3 + ["c"]}))
    rows = {r["term"]: r for r in heavy_hitters(df, "term", 1, 4, capacity=16).collect()}
    assert set(rows) == {"a", "b"}
    assert rows["a"]["cnt"] == 6 and rows["a"]["share"] == 0.6
    empty = spark.createDataFrame([], "term string")
    assert heavy_hitters(empty, "term", 1, 4, capacity=16).count() == 0


def test_heavy_hitters_rejects_bad_params(spark):
    df = spark.range(1).selectExpr("cast(id as string) as term")
    with pytest.raises(ValueError):
        heavy_hitters(df, "term", 0, 10)
    with pytest.raises(ValueError):
        heavy_hitters(df, "term", 1, 1000, capacity=100)  # slack > phi


def test_misra_gries_undercount_bound():
    rng = random.Random(7)
    values = _zipf_values(rng, 5_000, 300)
    capacity = 32
    counters: dict = {}
    series = pd.Series(values)
    for start in range(0, len(values), 500):
        misra_gries(counters, series.iloc[start : start + 500].value_counts(), capacity)
    assert len(counters) <= capacity
    true = Counter(values)
    slack = len(values) / capacity
    for t, lb in counters.items():
        assert lb <= true[t]
        assert true[t] - lb <= slack
    # every term the sketch dropped must be small enough that the bound holds
    for t, v in true.items():
        if t not in counters:
            assert v <= slack
