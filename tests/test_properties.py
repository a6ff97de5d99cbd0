"""Property-based invariants (hypothesis) for the hand-built operators.

Spark-job-per-example is too slow for hypothesis' default profile, so each
property draws a handful of examples and asserts invariants that would catch
the classic implementation mistakes (risk-set off-by-one, tie mishandling,
asof boundary direction, bucket boundary loss).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from elastic_surv_spark.metrics.concordance import harrell_cindex
from elastic_surv_spark.metrics.km import km_curve

_surv_lists = st.lists(
    st.tuples(
        st.floats(0.125, 50.0, allow_nan=False, width=32),
        st.integers(0, 1),
    ),
    min_size=3,
    max_size=40,
)

_SETTINGS = settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


@given(data=_surv_lists)
@_SETTINGS
def test_km_is_monotone_nonincreasing_in_unit_interval(spark, data):
    pdf = pd.DataFrame(data, columns=["t", "e"])
    curve = (
        km_curve(spark.createDataFrame(pdf), "t", "e")
        .orderBy("t")
        .toPandas()
    )
    s = curve["survival"].to_numpy()
    assert np.all(s <= 1.0 + 1e-9) and np.all(s >= -1e-9)
    assert np.all(np.diff(s) <= 1e-9)  # non-increasing
    # risk set at the earliest time is everyone
    assert int(curve["n_risk"].iloc[0]) == len(pdf)


@given(data=_surv_lists)
@_SETTINGS
def test_cindex_perfect_and_inverted_risk(spark, data):
    pdf = pd.DataFrame(data, columns=["t", "e"])
    pdf["t"] = pdf["t"] + np.arange(len(pdf)) * 1e-3  # break exact ties
    t, e = pdf["t"].to_numpy(), pdf["e"].to_numpy()
    comparable = any(
        e[i] == 1 and t[i] < t[j] for i in range(len(t)) for j in range(len(t))
    )
    if not comparable:
        return
    sdf_perfect = spark.createDataFrame(pdf.assign(risk=-pdf["t"]))
    sdf_inverted = spark.createDataFrame(pdf.assign(risk=pdf["t"]))
    c_perfect = harrell_cindex(sdf_perfect, "t", "e", "risk")
    c_inverted = harrell_cindex(sdf_inverted, "t", "e", "risk")
    assert c_perfect == pytest.approx(1.0)
    assert c_inverted == pytest.approx(0.0)
    assert c_perfect + c_inverted == pytest.approx(1.0)


@given(
    lefts=st.lists(st.integers(0, 1000), min_size=1, max_size=25),
    rights=st.lists(st.integers(0, 1000), min_size=1, max_size=25),
    window=st.integers(1, 300),
)
@_SETTINGS
def test_range_join_equals_pandas_oracle(spark, lefts, rights, window):
    from elastic_surv_spark.operators.range_join import range_join

    lp = pd.DataFrame({"k": 1, "lid": range(len(lefts)), "lt": [float(x) for x in lefts]})
    rp = pd.DataFrame({"k": 1, "rt": [float(x) for x in rights]})
    got = (
        range_join(
            spark.createDataFrame(lp),
            spark.createDataFrame(rp),
            on="k", left_ts="lt", right_ts="rt",
            lower_seconds=float(window), upper_seconds=0.0,
            bucket_seconds=37.0,  # deliberately unaligned bucket width
        )
        .groupBy("lid")
        .count()
        .toPandas()
        .set_index("lid")["count"]
        .to_dict()
    )
    want = {}
    for lid, lt in zip(lp["lid"], lp["lt"]):
        n = int(((rp["rt"] >= lt - window) & (rp["rt"] <= lt)).sum())
        if n:
            want[lid] = n
    assert got == want
