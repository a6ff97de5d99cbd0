"""≡ reference tests/test_optimizer.py: constructor math sanity + an
end-to-end select_model with max_iter=1 asserting the return type."""

from __future__ import annotations

import pytest

from elastic_surv_spark.frame import SurvFrame
from elastic_surv_spark.models.base import SurvModel
from elastic_surv_spark.models.data import SurvDataset
from elastic_surv_spark.models.logistic_hazard import LogisticHazardModel
from elastic_surv_spark.optimizer import HyperbandOptimizer
from tests.fixtures import gbsg2_like


def test_constructor_math():
    opt = HyperbandOptimizer(max_iter=81, eta=3)
    assert opt.s_max == 4
    assert opt.B == 5 * 81
    assert len(opt.seeds) == 3


def test_select_model_end_to_end(spark):
    frame = SurvFrame.from_pandas(spark, gbsg2_like(300), "time", "cens")
    dataset = SurvDataset(frame)
    opt = HyperbandOptimizer(
        seeds=[LogisticHazardModel], max_iter=1, output_epochs=3, parallelism=2
    )
    model = opt.select_model(dataset)
    assert isinstance(model, SurvModel)
    assert model.epochs == 3
    # returned model is fresh/untrained (≡ reference optimizer.py:176-180)
    assert model.net is None
    model.train(dataset)
    scores = model.score(dataset)
    assert 0 <= scores["c_index"] <= 1
