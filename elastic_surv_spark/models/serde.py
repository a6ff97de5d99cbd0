"""Model persistence: train once, serve from anywhere.

The reference keeps trained nets only in process memory — pycox/torchtuples
could pickle them, but the reference API (src/elastic_surv/models/base.py:
11-82) exposes no save/load, so a trained model dies with the interpreter.
At pipeline scale that is not workable: training reads the full corpus once,
while inference runs in many later jobs (batch scoring, the streaming
enricher, the hyperband winner re-used across days). These helpers make a
trained model a small self-contained JSON document:

- MLP-family models (CoxPH / DeepHit / LogisticHazard): constructor
  hyperparameters + the net's FULL state vector (trainable parameters and
  BatchNorm running statistics — ``MLP.get_state``) + duration cuts +
  per-model extras (Breslow baseline hazards, DeepHit α/σ, …).
- AFT baseline: the closed-form Weibull parameters (β, intercept, σ) plus
  the duration grid — prediction never needs the MLlib model object.

Everything is finite float64, and ``json`` round-trips Python floats via
shortest-repr, so a loaded model predicts BIT-IDENTICALLY to the one that
was saved (asserted in tests/test_model_serde.py). The payload is a few KB:
embed it in an ES doc, a table cell, or object storage next to the data.

No Spark session is needed to load; the first ``predict`` call binds to
whatever session owns the input DataFrame.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any

import numpy as np

from elastic_surv_spark.models.aft import AFTBaselineModel
from elastic_surv_spark.models.cox_ph import CoxPHModel
from elastic_surv_spark.models.deephit import DeepHitModel
from elastic_surv_spark.models.labels import LabelTransform
from elastic_surv_spark.models.logistic_hazard import LogisticHazardModel
from elastic_surv_spark.models.nn import MLP

FORMAT_VERSION = 1

# base-class constructor args shared by every MLP-family model
_COMMON_PARAMS = (
    "in_features", "hidden_nodes", "batch_norm", "dropout", "lr",
    "epochs", "patience", "batch_size", "seed", "verbose", "mode",
)

_MLP_CLASSES: dict[str, type] = {
    CoxPHModel.name(): CoxPHModel,
    DeepHitModel.name(): DeepHitModel,
    LogisticHazardModel.name(): LogisticHazardModel,
}


def model_to_dict(model: Any) -> dict:
    """Serializable snapshot of a TRAINED model (raises if untrained)."""
    if isinstance(model, AFTBaselineModel):
        if model.coefficients is None or model.cuts is None:
            raise ValueError("cannot serialize an untrained AFT model")
        return {
            "format_version": FORMAT_VERSION,
            "model": model.name(),
            "params": {
                "num_durations": int(model.num_durations),
                "max_iter": int(model.max_iter),
            },
            "features": list(model._features),
            "coefficients": [float(b) for b in model.coefficients],
            "intercept": float(model.intercept),
            "scale": float(model.scale),
            "cuts": [float(c) for c in model.cuts],
        }

    name = model.name()
    if name not in _MLP_CLASSES:
        raise TypeError(f"don't know how to serialize model {type(model).__name__}")
    if model.net is None or model.cuts is None:
        raise ValueError(f"cannot serialize an untrained {name} model")

    d = {
        "format_version": FORMAT_VERSION,
        "model": name,
        "params": {k: getattr(model, k) for k in _COMMON_PARAMS},
        "net": {
            "out_features": int(model.net.layers[-1].W.shape[1]),
            "output_bias": bool(model._output_bias()),
            "state": model.net.get_state().tolist(),
        },
        "cuts": [float(c) for c in model.cuts],
    }
    if isinstance(model, CoxPHModel):
        d["params"]["max_curve_points"] = int(model.max_curve_points)
        d["baseline_cumhaz"] = [float(h) for h in model.baseline_cumhaz]
    elif isinstance(model, DeepHitModel):
        d["params"]["num_durations"] = int(model.num_durations)
        d["params"]["alpha"] = float(model.alpha)
        d["params"]["sigma"] = float(model.sigma)
    elif isinstance(model, LogisticHazardModel):
        d["params"]["num_durations"] = int(model.num_durations)
    return d


def model_from_dict(d: dict) -> Any:
    """Rebuild a trained model from ``model_to_dict`` output."""
    version = d.get("format_version")
    if version != FORMAT_VERSION:
        raise ValueError(f"unsupported model format_version {version!r}")
    name = d.get("model")

    if name == AFTBaselineModel.name():
        m = AFTBaselineModel(**d["params"])
        m._features = list(d["features"])
        m.coefficients = np.asarray(d["coefficients"], dtype=float)
        m.intercept = float(d["intercept"])
        m.scale = float(d["scale"])
        m.cuts = np.asarray(d["cuts"], dtype=float)
        return m

    cls = _MLP_CLASSES.get(name)
    if cls is None:
        raise ValueError(f"unknown model name {name!r}")
    m = cls(**d["params"])
    m.cuts = np.asarray(d["cuts"], dtype=float)
    net_d = d["net"]
    m.net = MLP(
        m.in_features,
        m.hidden_nodes,
        int(net_d["out_features"]),
        batch_norm=m.batch_norm,
        dropout=m.dropout,
        output_bias=bool(net_d["output_bias"]),
        seed=m.seed,
    )
    m.net.set_state(np.asarray(net_d["state"], dtype=float))
    if isinstance(m, CoxPHModel):
        m.baseline_cumhaz = np.asarray(d["baseline_cumhaz"], dtype=float)
    elif isinstance(m, (DeepHitModel, LogisticHazardModel)):
        m.labtrans = LabelTransform(m.cuts)
    return m


def model_to_json(model: Any) -> str:
    return json.dumps(model_to_dict(model), sort_keys=True)


def model_from_json(s: str) -> Any:
    return model_from_dict(json.loads(s))


def save_model(model: Any, path: str | Path) -> None:
    """Write the model as one JSON file (parent dirs created)."""
    p = Path(path)
    p.parent.mkdir(parents=True, exist_ok=True)
    p.write_text(model_to_json(model))


def load_model(path: str | Path) -> Any:
    return model_from_json(Path(path).read_text())
