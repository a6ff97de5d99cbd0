"""Minimum end-to-end slice (SURVEY §7 step 4): the reference README's
sample usage (README.md:47-62) reproduced on Spark — churn-shaped table →
SurvFrame → featurize → train → score."""

from __future__ import annotations

import numpy as np

from elastic_surv_spark.frame import SurvFrame
from elastic_surv_spark.models.cox_ph import CoxPHModel
from elastic_surv_spark.models.data import SurvDataset
from tests.fixtures import churn_like


def test_readme_slice_cox(spark):
    frame = SurvFrame.from_pandas(
        spark, churn_like(800), "months_active", "churned"
    )
    dataset = SurvDataset(frame)
    # one-hot expanded: product_purchased → 3 columns + 6 numeric
    assert "product_purchased_basic" in dataset.features
    assert dataset.in_features == 9
    model = CoxPHModel(in_features=dataset.in_features, epochs=10, seed=42)
    model.train(dataset)
    scores = model.score(dataset)
    assert np.isfinite(scores["c_index"])
    assert np.isfinite(scores["brier_score"])
