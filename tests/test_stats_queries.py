"""Independent validation of the distributed-statistics queries.

Their duckdb oracles restate the same closed forms, so a transcription
error in the formula would pass the hash gate in both engines. These tests
recompute each statistic with numpy's own implementations (corrcoef,
polyfit, ddof variance) from the raw parquet and require agreement."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from elastic_surv_spark.plans.queries import REGISTRY

SF = "/root/testdata/sf0.001"


def _pdf(name: str) -> pd.DataFrame:
    return pd.read_parquet(f"{SF}/{name}.parquet")


def test_welch_ttest_matches_numpy(spark):
    row = REGISTRY["event_value_ttest"].fn(spark, SF).collect()[0]
    e = _pdf("events")
    a = e.loc[e.event_type == "purchase", "value"].to_numpy()
    b = e.loc[e.event_type == "view", "value"].to_numpy()
    t = (a.mean() - b.mean()) / np.sqrt(
        a.var(ddof=1) / len(a) + b.var(ddof=1) / len(b)
    )
    assert row["n1"] == len(a) and row["n2"] == len(b)
    assert row["mean_purchase"] == pytest.approx(a.mean(), abs=1e-5)
    assert row["t_stat"] == pytest.approx(t, abs=1e-5)


def test_pearson_matches_numpy_corrcoef(spark):
    got = {r["l_returnflag"]: r for r in REGISTRY["price_quantity_corr"].fn(spark, SF).collect()}
    li = _pdf("lineitem")
    for flag, grp in li.groupby("l_returnflag"):
        r = np.corrcoef(grp["l_extendedprice"], grp["l_quantity"])[0, 1]
        assert got[flag]["pearson_r"] == pytest.approx(r, abs=1e-5), flag
        assert got[flag]["n"] == len(grp)


def test_grouped_ols_matches_numpy_polyfit(spark):
    got = {r["n_name"]: r for r in REGISTRY["nation_revenue_trend"].fn(spark, SF).collect()}
    li, o = _pdf("lineitem"), _pdf("orders")
    c, n = _pdf("customer"), _pdf("nation")
    j = (
        li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
        .merge(c, left_on="o_custkey", right_on="c_custkey")
        .merge(n, left_on="c_nationkey", right_on="n_nationkey")
    )
    j["x"] = (j.o_orderdate.dt.year - 1995) * 12 + (j.o_orderdate.dt.month - 1)
    j["rev"] = j.l_extendedprice * (1 - j.l_discount)
    for name, grp in j.groupby("n_name"):
        monthly = grp.groupby("x")["rev"].sum()
        slope, intercept = np.polyfit(monthly.index, monthly.to_numpy(), 1)
        assert got[name]["n_months"] == len(monthly)
        assert got[name]["slope_per_month"] == pytest.approx(slope, rel=1e-4), name
        assert got[name]["intercept"] == pytest.approx(intercept, rel=1e-4), name


def test_retention_cohort_zero_offset_is_cohort_size(spark):
    rows = REGISTRY["events_retention_cohorts"].fn(spark, SF).collect()
    by = {(r["cohort_week"], r["week_offset"]): r["n_users"] for r in rows}
    e = _pdf("events")
    e["week"] = (e.ts.dt.normalize() - pd.Timestamp("1970-01-01")).dt.days // 7
    firsts = e.groupby("user_id")["week"].min()
    for cohort, size in firsts.value_counts().items():
        # offset 0 must equal the cohort's size, and retention never exceeds it
        assert by[(cohort, 0)] == size
        for (cw, off), nu in by.items():
            if cw == cohort and off > 0:
                assert nu <= size
