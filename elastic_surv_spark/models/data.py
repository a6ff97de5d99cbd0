"""SurvDataset — featurized train/test splits feeding the models.

≡ reference dataflow: ``BasicDataset`` construction → encoder fit → prefix
split → per-batch one-hot + tensor conversion (reference
src/elastic_surv/dataset.py:16-225). Here the featurization is fit ONCE on
the full frame (fixing the reference's refit-per-copy waste), the transform
is a lazy column expression fused into every downstream plan by Catalyst,
and the split DataFrames are cached — the reference re-pulled every batch
from ES every epoch (SURVEY §4 'Caching / reuse').
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame

from elastic_surv_spark.frame import SurvFrame
from elastic_surv_spark.functions.featurize import OneHotFeaturizer


class SurvDataset:
    def __init__(self, frame: SurvFrame, use_hash_split: bool = False, cache: bool = True):
        self.frame = frame
        self.time_column = frame.time_column
        self.event_column = frame.event_column
        self.encoder = OneHotFeaturizer.fit(frame.df, frame.features)
        self.features = self.encoder.features

        train_raw, test_raw = (
            frame.hash_split() if use_hash_split else frame.split()
        )
        roles = [frame.time_column, frame.event_column]
        self.train_df: DataFrame = self.encoder.transform(train_raw, passthrough=roles)
        self.test_df: DataFrame = self.encoder.transform(test_raw, passthrough=roles)
        if cache:
            self.train_df = self.train_df.cache()
            self.test_df = self.test_df.cache()

    @property
    def in_features(self) -> int:
        return len(self.features)

    def to_numpy(self, df: DataFrame) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """(X, t, e) arrays — the local training path (Arrow transfer).

        Valid when the split fits driver memory (harness scale / reference
        parity); the distributed path never calls this.
        """
        pdf = df.toPandas()
        X = pdf[self.features].to_numpy(dtype=float)
        t = pdf[self.time_column].to_numpy(dtype=float)
        e = pdf[self.event_column].to_numpy(dtype=float)
        if self.frame.label_transformer is not None:
            # ≡ reference dataset.py:213-214 — outcome hook at batch time
            t, e = self.frame.label_transformer(t, e)
        return X, t, e

    def train_numpy(self):
        return self.to_numpy(self.train_df)

    def test_numpy(self):
        return self.to_numpy(self.test_df)
