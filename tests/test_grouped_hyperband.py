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
