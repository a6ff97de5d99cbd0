"""One-hot featurization with reference-compatible column naming.

Reference behavior (src/elastic_surv/dataset.py:80-106): every string-typed
column among the selected features is one-hot encoded by a sklearn
``OneHotEncoder(handle_unknown="ignore", sparse=False)`` fit on its distinct
values; output columns are named ``{col}_{value}`` and replace the original
column in the feature list (golden: ``["C", "D_a", "D_aa", "D_aaa"]`` —
reference tests/test_dataset.py:23).

Spark-first design: instead of MLlib's StringIndexer→OneHotEncoder→vector
(which would then need vector_to_array + getItem to recover the golden column
names), the fit is ONE distinct-aggregate job per categorical column and the
transform is a pure column expression — ``when(col == v, 1.0).otherwise(0.0)``
per category. That keeps the whole transform inside whole-stage codegen (no
UDF, no vector boxing), and `handle_unknown="ignore"` falls out for free:
an unseen value matches no category and yields the all-zeros row.

Fit once, share across train/test/copies — fixing the reference's
refit-per-copy waste (dataset.py:283-297, SURVEY §4 "Caching / reuse").
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


class OneHotFeaturizer:
    """Fit/transform one-hot encoding over the string-typed feature columns."""

    def __init__(self, categories: dict[str, list[str]], features: list[str]):
        # categories: {col: sorted distinct values}; features: post-encode
        # feature list with originals replaced in place by their expansions.
        self.categories = categories
        self.features = features

    @classmethod
    def fit(cls, df: DataFrame, features: list[str]) -> "OneHotFeaturizer":
        string_cols = [
            f.name
            for f in df.schema.fields
            if f.name in features and isinstance(f.dataType, T.StringType)
        ]
        categories: dict[str, list[str]] = {}
        if string_cols:
            # One job for all categorical columns: collect_set per column,
            # sorted to match sklearn's sorted categories_ (≡ golden naming
            # order). Distinct sets are small by assumption (they become
            # physical columns); the aggregate is a map-side-combined
            # hash-agg, no full shuffle of row data.
            row = df.agg(
                *[F.sort_array(F.collect_set(c)).alias(c) for c in string_cols]
            ).first()
            for c in string_cols:
                categories[c] = [v for v in row[c] if v is not None]

        out_features: list[str] = []
        for f in features:
            if f in categories:
                out_features.extend(f"{f}_{v}" for v in categories[f])
            else:
                out_features.append(f)
        return cls(categories, out_features)

    def transform(self, df: DataFrame, passthrough: list[str] | None = None) -> DataFrame:
        """Expand categoricals to ``col_value`` 0/1 doubles; keep others.

        ≡ reference dataset.py:172-187 (encode → concat → drop original).
        Unseen categories produce all-zeros (handle_unknown="ignore").
        """
        cols: list = []
        for f in self.features:
            src = self._source_of(f)
            if src is None:
                cols.append(F.col(f).cast("double").alias(f))
            else:
                col, value = src
                cols.append(
                    F.when(F.col(col) == F.lit(value), F.lit(1.0))
                    .otherwise(F.lit(0.0))
                    .alias(f)
                )
        for p in passthrough or []:
            cols.append(F.col(p))
        return df.select(*cols)

    def _source_of(self, feature: str) -> tuple[str, str] | None:
        for col, values in self.categories.items():
            prefix = col + "_"
            if feature.startswith(prefix) and feature[len(prefix):] in values:
                return col, feature[len(prefix):]
        return None
