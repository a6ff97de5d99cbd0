"""Model persistence round-trips.

Contract (models/serde.py): a saved-then-loaded model predicts
BIT-IDENTICALLY to the in-memory one — the JSON payload carries the net's
full state (trainable params + BatchNorm running stats), the duration cuts,
and every per-model extra, and shortest-repr float serialization is exact
for float64. Also pins the BN-fidelity invariant the r8 state refactor
introduced: distributed predict (which rebuilds the net on executors from
the broadcast state vector) matches a driver-local eval-mode forward pass.
"""

from __future__ import annotations

import numpy as np
import pytest

from elastic_surv_spark.frame import SurvFrame
from elastic_surv_spark.models import (
    AFTBaselineModel,
    CoxPHModel,
    DeepHitModel,
    LogisticHazardModel,
    load_model,
    model_from_json,
    model_to_json,
    save_model,
)
from elastic_surv_spark.models.data import SurvDataset
from tests.fixtures import gbsg2_like


@pytest.fixture(scope="module")
def dataset(spark):
    frame = SurvFrame.from_pandas(spark, gbsg2_like(), "time", "cens")
    return SurvDataset(frame)


@pytest.fixture(scope="module")
def scoring(spark, dataset):
    """(df, pdf) scoring input with a unique ``rid`` key — the role-projected
    test split has no id column, and time/event ties would make orderBy
    non-deterministic across the before/after predict jobs."""
    pdf = dataset.test_df.toPandas().reset_index(drop=True)
    pdf["rid"] = range(len(pdf))
    return spark.createDataFrame(pdf), pdf


def _surv_matrix(model, scoring, features) -> np.ndarray:
    df, _ = scoring
    rows = (
        model.predict(df, id_cols=["rid"], features=features)
        .orderBy("rid")
        .collect()
    )
    return np.array([r["surv"] for r in rows], dtype=float)


@pytest.mark.parametrize(
    "model_cls", [CoxPHModel, LogisticHazardModel, DeepHitModel]
)
def test_mlp_model_json_roundtrip_bit_identical(dataset, scoring, model_cls, tmp_path):
    model = model_cls(
        in_features=dataset.in_features, epochs=5, patience=5, seed=42
    ).train(dataset)
    before = _surv_matrix(model, scoring, dataset.features)

    path = tmp_path / f"{model_cls.name()}.json"
    save_model(model, path)
    loaded = load_model(path)

    assert type(loaded) is model_cls
    assert np.array_equal(loaded.cuts, model.cuts)
    assert np.array_equal(loaded.net.get_state(), model.net.get_state())
    after = _surv_matrix(loaded, scoring, dataset.features)
    assert before.shape == after.shape
    assert np.array_equal(before, after), "loaded model predicts differently"


def test_cox_baseline_hazards_survive_roundtrip(dataset):
    model = CoxPHModel(
        in_features=dataset.in_features, epochs=5, patience=5, seed=7
    ).train(dataset)
    loaded = model_from_json(model_to_json(model))
    assert np.array_equal(loaded.baseline_cumhaz, model.baseline_cumhaz)
    assert loaded.max_curve_points == model.max_curve_points


def test_deephit_extras_survive_roundtrip(dataset):
    model = DeepHitModel(
        in_features=dataset.in_features, epochs=3, patience=3,
        num_durations=7, alpha=0.3, sigma=0.25, seed=3,
    ).train(dataset)
    loaded = model_from_json(model_to_json(model))
    assert loaded.num_durations == 7
    assert loaded.alpha == 0.3 and loaded.sigma == 0.25
    # the rebuilt label transform must discretize exactly like the original
    t = np.array([0.0, 15.0, 400.0, 2500.0])
    e = np.array([1.0, 0.0, 1.0, 1.0])
    got = loaded.labtrans.transform_np(t, e)
    want = model.labtrans.transform_np(t, e)
    assert np.array_equal(got[0], want[0]) and np.array_equal(got[1], want[1])


def test_aft_json_roundtrip_bit_identical(dataset, scoring, tmp_path):
    model = AFTBaselineModel(num_durations=8, max_iter=50).train(dataset)
    before = _surv_matrix(model, scoring, dataset.features)

    path = tmp_path / "aft.json"
    save_model(model, path)
    loaded = load_model(path)

    assert loaded.model is None  # no MLlib object needed for inference
    assert np.array_equal(loaded.coefficients, model.coefficients)
    assert loaded.scale == model.scale
    after = _surv_matrix(loaded, scoring, dataset.features)
    assert np.array_equal(before, after)


def test_untrained_model_refuses_to_serialize(dataset):
    with pytest.raises(ValueError, match="untrained"):
        model_to_json(CoxPHModel(in_features=dataset.in_features))
    with pytest.raises(ValueError, match="untrained"):
        model_to_json(AFTBaselineModel())


def test_distributed_predict_matches_local_eval_forward(dataset, scoring):
    """BN running stats must ship with the broadcast state: the executors'
    rebuilt net normalizes with the TRAINED statistics, so mapInPandas
    inference equals a driver-local training=False forward pass."""
    model = LogisticHazardModel(
        in_features=dataset.in_features, epochs=5, patience=5,
        batch_norm=True, seed=11,
    ).train(dataset)
    # non-trivial running stats: training moved them away from (0, 1)
    bn_buffers = model.net.buffers()
    assert any(np.abs(b).max() > 1e-6 for b in bn_buffers[::2])  # means
    _, pdf = scoring
    X = pdf.sort_values("rid")[dataset.features].to_numpy(dtype=float)
    local = model._surv_from_output(model.net.forward(X, training=False))
    dist = _surv_matrix(model, scoring, dataset.features)
    assert np.allclose(local, dist, atol=1e-12, rtol=0.0)
