"""Golden-output tests mirroring the reference's unit strategy.

Fixture F1 "dummy" (FIXTURES.md): row i (1-based) is [i, 2i, 3i, "a"*i],
columns A,B,C,D, time=A, event=B. Goldens from reference
tests/test_dataset.py:20-51.
"""

from __future__ import annotations

import pandas as pd
import pytest

from elastic_surv_spark.frame import SurvFrame
from elastic_surv_spark.functions.featurize import OneHotFeaturizer


def generate_dummy(n: int) -> pd.DataFrame:
    return pd.DataFrame(
        [[i, 2 * i, 3 * i, "a" * i] for i in range(1, n + 1)],
        columns=["A", "B", "C", "D"],
    )


def test_feature_inference_sorted(spark):
    sf = SurvFrame.from_pandas(spark, generate_dummy(3), "A", "B")
    assert sf.features == ["C", "D"]
    assert sf.columns == ["C", "D", "A", "B"]


def test_ohe_golden_names(spark):
    sf = SurvFrame.from_pandas(spark, generate_dummy(3), "A", "B")
    enc = OneHotFeaturizer.fit(sf.df, sf.features)
    # golden: reference tests/test_dataset.py:23
    assert enc.features == ["C", "D_a", "D_aa", "D_aaa"]


def test_ohe_transform_values(spark):
    sf = SurvFrame.from_pandas(spark, generate_dummy(3), "A", "B")
    enc = OneHotFeaturizer.fit(sf.df, sf.features)
    out = (
        enc.transform(sf.df, passthrough=["_row_id"])
        .orderBy("_row_id")
        .drop("_row_id")
        .toPandas()
    )
    assert list(out.columns) == ["C", "D_a", "D_aa", "D_aaa"]
    assert out["C"].tolist() == [3.0, 6.0, 9.0]
    assert out["D_a"].tolist() == [1.0, 0.0, 0.0]
    assert out["D_aa"].tolist() == [0.0, 1.0, 0.0]
    assert out["D_aaa"].tolist() == [0.0, 0.0, 1.0]


def test_ohe_unseen_category_all_zeros(spark):
    sf = SurvFrame.from_pandas(spark, generate_dummy(3), "A", "B")
    enc = OneHotFeaturizer.fit(sf.df, sf.features)
    unseen = pd.DataFrame([[0, 0, 0, "zzz", 0]], columns=["A", "B", "C", "D", "_row_id"])
    out = enc.transform(spark.createDataFrame(unseen)).toPandas()
    assert out[["D_a", "D_aa", "D_aaa"]].iloc[0].tolist() == [0.0, 0.0, 0.0]


def test_prefix_split_goldens(spark):
    # golden: reference tests/test_dataset.py:29-51 — n=3, ratio 0.9 →
    # train rows 1..2 (T=[1,2], E=[2,4]), test row 3 (T=[3], E=[6])
    sf = SurvFrame.from_pandas(spark, generate_dummy(3), "A", "B")
    train, test = sf.split()
    tr = sf.outcome(train).orderBy("A").toPandas()
    te = sf.outcome(test).orderBy("A").toPandas()
    assert tr["A"].tolist() == [1, 2]
    assert tr["B"].tolist() == [2, 4]
    assert te["A"].tolist() == [3]
    assert te["B"].tolist() == [6]
    assert train.count() == 2 and test.count() == 1


def test_string_time_column_raises(spark):
    pdf = generate_dummy(3)
    with pytest.raises(ValueError):
        SurvFrame.from_pandas(spark, pdf, "D", "B")
    with pytest.raises(ValueError):
        SurvFrame.from_pandas(spark, pdf, "A", "D")


def test_hash_split_deterministic_disjoint(spark):
    sf = SurvFrame.from_pandas(spark, generate_dummy(100), "A", "B")
    tr1, te1 = sf.hash_split()
    tr2, te2 = sf.hash_split()
    assert tr1.count() == tr2.count()
    assert tr1.count() + te1.count() == 100
    # disjoint
    assert tr1.join(te1, on="_row_id", how="inner").count() == 0


def test_label_transformer_hook_applied_at_batch_time(spark):
    # ≡ reference dataset.py:25,213-214 — injected (t, e) transform runs on
    # every extracted batch
    from elastic_surv_spark.models.data import SurvDataset

    pdf = generate_dummy(50)
    sf = SurvFrame.from_pandas(
        spark, pdf, "A", "B", label_transformer=lambda t, e: (t * 2.0, e)
    )
    ds = SurvDataset(sf, cache=False)
    _, t_train, _ = ds.train_numpy()
    expected = pdf["A"].to_numpy(dtype=float)[: len(t_train)] * 2.0
    assert (t_train == expected).all()
    # copy() carries the hook (reference copies the callable too)
    assert sf.copy().label_transformer is sf.label_transformer


def test_discrete_outcome_fits_on_train_and_installs_hook(spark):
    # ≡ reference dataset.py:122-132
    import numpy as np

    pdf = generate_dummy(60)
    sf = SurvFrame.from_pandas(spark, pdf, "A", "B")
    assert sf.label_transformer is None
    labtrans = sf.discrete_outcome(num_durations=5)
    assert sf.label_transformer is not None
    assert len(labtrans.cuts) == 5
    # cuts span the TRAIN split's time range only
    train_max = pdf["A"].to_numpy()[: int(0.9 * len(pdf))].max()
    assert labtrans.cuts[-1] == float(train_max)
    t, e = sf.label_transformer(pdf["A"].to_numpy(dtype=float), pdf["B"].to_numpy(dtype=float))
    assert t.min() >= 0 and t.max() <= 4
    assert np.array_equal(e, pdf["B"].to_numpy(dtype=float))
