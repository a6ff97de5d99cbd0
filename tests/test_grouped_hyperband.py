"""Per-segment successive halving (models/grouped_hyperband.py): the
better-specified family wins its own segment, winners retrain at the output
budget into loadable serde JSON, and the loop is deterministic."""

from __future__ import annotations

import json

import numpy as np
import pytest

from elastic_surv_spark.models.grouped_hyperband import (
    sample_configs,
    successive_halving_per_segment,
)

# Two configs with opposite specification biases (verified driver-side with
# fit_one_local before pinning — deterministic given the seeds):
# - cox_ph with a 1-unit linear bottleneck: RIGHT for a small linear-risk
#   segment, underfits a nonlinear one
# - logistic_hazard with a 32x32 net: RIGHT for the nonlinear segment,
#   overfits the 60-row linear one
CONFIGS = [
    ("cox_ph", {"hidden_nodes": [1], "batch_norm": False, "dropout": 0.0, "lr": 1e-2}),
    (
        "logistic_hazard",
        {
            "num_durations": 10,
            "hidden_nodes": [32, 32],
            "batch_norm": False,
            "dropout": 0.0,
            "lr": 1e-2,
        },
    ),
]


def _fixture(spark):
    rng = np.random.default_rng(0)
    rows = []
    # segment A: nonlinear risk |x0| — needs capacity
    nA = 200
    xA = rng.normal(size=(nA, 2))
    tA = np.maximum(1.0, 100.0 * np.exp(-np.abs(xA[:, 0]) * 2.0) * rng.uniform(0.5, 1.5, nA))
    for i in range(nA):
        rows.append(("nonlinear", i, float(tA[i]), 1, float(xA[i, 0]), float(xA[i, 1])))
    # segment B: linear risk, small n — the linear bottleneck generalizes
    nB = 60
    xB = rng.normal(size=(nB, 2))
    tB = np.maximum(1.0, 100.0 * np.exp(-xB[:, 0] * 2.0) * rng.uniform(0.5, 1.5, nB))
    for i in range(nB):
        rows.append(("linear", i, float(tB[i]), 1, float(xB[i, 0]), float(xB[i, 1])))
    # segment C: below min_rows — degenerate guard
    for i in range(3):
        rows.append(("tiny", i, 5.0 + i, 1, 0.1 * i, 0.2))
    return spark.createDataFrame(
        rows, "seg string, idx long, t double, e int, x0 double, x1 double"
    )


def _run(spark):
    return successive_halving_per_segment(
        _fixture(spark),
        group_col="seg",
        order_col="idx",
        time_col="t",
        event_col="e",
        feature_cols=["x0", "x1"],
        configs=CONFIGS,
        eta=2,
        rung_epochs=2,
        output_epochs=40,
        seed=42,
        train_ratio=0.8,
    ).collect()


def test_better_specified_family_wins_per_segment(spark):
    out = {r.seg: r for r in _run(spark)}
    assert set(out) == {"nonlinear", "linear", "tiny"}
    # per-segment family selection: each segment picks ITS right model
    assert out["nonlinear"].family == "logistic_hazard"
    assert out["linear"].family == "cox_ph"
    # winners discriminate on their own held-out prefix
    assert out["nonlinear"].c_index > 0.6
    assert out["linear"].c_index > 0.8
    # params_json round-trips the pinned config
    assert json.loads(out["linear"].params_json)["hidden_nodes"] == [1]
    # degenerate segment: NULL model, config -1
    assert out["tiny"].config_idx == -1
    assert out["tiny"].model_json is None
    # the trained winners load WITHOUT Spark and predict
    from elastic_surv_spark.models.serde import model_from_json

    for seg in ("nonlinear", "linear"):
        m = model_from_json(out[seg].model_json)
        surv = m._surv_from_output(
            m.net.forward(np.array([[0.5, -0.2]]), training=False)
        )
        assert np.isfinite(surv).all()


def test_halving_is_deterministic(spark):
    a = sorted((r.seg, r.config_idx, r.family, r.model_json) for r in _run(spark))
    b = sorted((r.seg, r.config_idx, r.family, r.model_json) for r in _run(spark))
    assert a == b


def test_sample_configs_seeded_and_deduped():
    a = sample_configs(["logistic_hazard", "cox_ph"], 6, seed=7)
    b = sample_configs(["logistic_hazard", "cox_ph"], 6, seed=7)
    assert a == b
    keys = {fam + json.dumps(p, sort_keys=True) for fam, p in a}
    assert len(keys) == len(a)
    with pytest.raises(ValueError):
        sample_configs(["nope"], 2)


def test_halving_base_is_scanned_once_not_per_rung(spark):
    """The halving base persists across rungs (VERDICT r10 #3): an
    accumulator-instrumented source must be evaluated ~once, not once per
    rung — before the fix every rung's filter+groupBy re-ran the parent
    (O(rungs) full input scans; at 100 TB each is a corpus read)."""
    from pyspark.sql import functions as F  # noqa: F401

    src = _fixture(spark)
    n_rows = src.count()
    acc = spark.sparkContext.accumulator(0)

    def counting(batches):
        for pdf in batches:
            acc.add(len(pdf))
            yield pdf

    counted = src.mapInPandas(counting, schema=src.schema)
    out = successive_halving_per_segment(
        counted,
        group_col="seg",
        order_col="idx",
        time_col="t",
        event_col="e",
        feature_cols=["x0", "x1"],
        configs=CONFIGS,
        eta=2,
        rung_epochs=2,
        output_epochs=5,
        seed=42,
        train_ratio=0.8,
    ).collect()
    assert len(out) == 3
    # one materialization fills the cache (groups-distinct); rungs + the
    # final retrain must hit it. 2x headroom absorbs an evicted partition,
    # but the un-persisted shape (>= 3 full scans: distinct + 1 rung + final)
    # trips the bound.
    assert n_rows <= acc.value <= 2 * n_rows, acc.value


def test_fit_one_local_subsampled_cindex_above_gate():
    """cindex_subsample=True scores a test split larger than the gate on a
    deterministic even-stride subsample instead of returning None (ADVICE
    r10: a None-scored rung promoted by config order)."""
    from elastic_surv_spark.models.grouped import fit_one_local

    rng = np.random.default_rng(3)
    n = 400
    X = rng.normal(size=(n, 2))
    t = np.maximum(1.0, 100.0 * np.exp(-X[:, 0] * 2.0) * rng.uniform(0.5, 1.5, n))
    e = np.ones(n)
    kwargs = dict(
        hidden_nodes=[1], batch_norm=False, dropout=0.0, lr=1e-2,
        epochs=20, seed=42,
    )
    # gate of 20 << the 80-row test split: ungated -> None
    _, _, n_test, _, c_none = fit_one_local(
        "cox_ph", X, t, e, 0.8, cindex_max_test=20, **kwargs
    )
    assert n_test == 80 and c_none is None
    _, _, _, _, c_sub = fit_one_local(
        "cox_ph", X, t, e, 0.8, cindex_max_test=20, cindex_subsample=True,
        **kwargs,
    )
    assert c_sub is not None and c_sub > 0.6  # informative, not 0.5
    # deterministic: same subsample, same score
    _, _, _, _, c_sub2 = fit_one_local(
        "cox_ph", X, t, e, 0.8, cindex_max_test=20, cindex_subsample=True,
        **kwargs,
    )
    assert c_sub == c_sub2


def test_halving_promotes_by_score_above_cindex_gate(spark):
    """End to end: with every segment's test split above the gate, the
    better config must still win (pre-fix, all scores collapsed to 0.5 and
    the lowest config index won regardless of quality)."""
    rng = np.random.default_rng(1)
    rows = []
    n = 300
    x = rng.normal(size=(n, 2))
    t = np.maximum(1.0, 100.0 * np.exp(-x[:, 0] * 2.0) * rng.uniform(0.5, 1.5, n))
    for i in range(n):
        rows.append(("big", i, float(t[i]), 1, float(x[i, 0]), float(x[i, 1])))
    df = spark.createDataFrame(
        rows, "seg string, idx long, t double, e int, x0 double, x1 double"
    )
    # config 0 is GARBAGE (lr=0: never learns), config 1 is the right model;
    # index order favors the garbage config if promotion is uninformative
    configs = [
        ("cox_ph", {"hidden_nodes": [1], "batch_norm": False, "dropout": 0.0, "lr": 0.0}),
        ("cox_ph", {"hidden_nodes": [1], "batch_norm": False, "dropout": 0.0, "lr": 1e-2}),
    ]
    out = {
        r.seg: r
        for r in successive_halving_per_segment(
            df,
            group_col="seg",
            order_col="idx",
            time_col="t",
            event_col="e",
            feature_cols=["x0", "x1"],
            configs=configs,
            eta=2,
            rung_epochs=10,
            output_epochs=20,
            seed=42,
            train_ratio=0.8,
            cindex_max_test=20,  # << the 60-row test split
        ).collect()
    }
    assert out["big"].config_idx == 1, out["big"]


def test_halving_warns_when_rung_scores_are_uninformative(spark):
    """A segment with zero events has no comparable pairs under ANY config —
    promotion carries no signal, and the loop must say so instead of
    silently keeping the lowest config index (ADVICE r10)."""
    import warnings

    rows = [
        ("cens", i, float(10 + i), 0, 0.1 * i, 0.2 * i) for i in range(40)
    ]
    df = spark.createDataFrame(
        rows, "seg string, idx long, t double, e int, x0 double, x1 double"
    )
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        out = successive_halving_per_segment(
            df,
            group_col="seg",
            order_col="idx",
            time_col="t",
            event_col="e",
            feature_cols=["x0", "x1"],
            configs=CONFIGS,
            eta=2,
            rung_epochs=2,
            output_epochs=5,
            seed=42,
            train_ratio=0.8,
        ).collect()
    assert len(out) == 1  # still emits the segment's winner row
    assert any(
        issubclass(w.category, RuntimeWarning)
        and "no comparable test pairs" in str(w.message)
        for w in caught
    ), [str(w.message) for w in caught]


def test_full_hyperband_per_segment(spark):
    """The multi-bracket schedule: fresh deduped configs per bracket, each
    segment keeps its best (score, config) ACROSS brackets, winners retrain
    at the output budget into loadable serde JSON. Deterministic."""
    from elastic_surv_spark.models.grouped_hyperband import hyperband_per_segment

    df = _fixture(spark)

    def run():
        return {
            r.seg: r
            for r in hyperband_per_segment(
                df,
                group_col="seg",
                order_col="idx",
                time_col="t",
                event_col="e",
                feature_cols=["x0", "x1"],
                families=("logistic_hazard", "cox_ph"),
                max_iter=4,
                eta=2,
                output_epochs=30,
                seed=42,
                train_ratio=0.8,
            ).collect()
        }

    out = run()
    assert set(out) == {"nonlinear", "linear", "tiny"}
    for seg in ("nonlinear", "linear"):
        r = out[seg]
        assert r.config_idx >= 0 and r.family in ("logistic_hazard", "cox_ph")
        assert r.model_json is not None
        assert r.c_index is not None and r.c_index > 0.5, (seg, r.c_index)
        # params_json round-trips to a dict the family accepts
        assert isinstance(json.loads(r.params_json), dict)
    assert out["tiny"].config_idx == -1 and out["tiny"].model_json is None

    again = run()
    assert {s: (r.config_idx, r.family, r.model_json) for s, r in out.items()} == {
        s: (r.config_idx, r.family, r.model_json) for s, r in again.items()
    }


def test_s_max_exact_power_not_floored():
    """log(243)/log(3) = 4.999999999999999 — a bare int() would drop the
    most exploratory bracket on exact-power max_iter (review finding)."""
    from elastic_surv_spark.models.grouped_hyperband import _s_max

    assert _s_max(243, 3) == 5
    assert _s_max(9, 3) == 2
    assert _s_max(81, 3) == 4
    assert _s_max(256, 2) == 8
    assert _s_max(10, 3) == 2  # non-power still floors


def test_halving_drops_null_group_rows(spark):
    """A NULL-group segment would never match isin(active) and emitted a
    NULL-model row regardless of size — now it is dropped up front."""
    import pandas as pd

    from elastic_surv_spark.models.grouped_hyperband import (
        successive_halving_per_segment,
    )

    rng = np.random.default_rng(6)
    n = 120
    pdf = pd.DataFrame(
        {
            "rid": np.arange(n),
            "seg": [None if i % 3 == 0 else float(i % 2) for i in range(n)],
            "x0": rng.normal(size=n),
            "t": np.exp(rng.normal(size=n)),
            "e": rng.integers(0, 2, size=n),
        }
    )
    df = spark.createDataFrame(pdf)
    out = successive_halving_per_segment(
        df, "seg", "rid", "t", "e", ["x0"],
        configs=[("cox_ph", {"hidden_nodes": [1], "batch_norm": False,
                             "dropout": 0.0, "lr": 0.01})],
        output_epochs=2,
    ).collect()
    segs = [r.seg for r in out]
    assert None not in segs and sorted(segs) == [0.0, 1.0]
