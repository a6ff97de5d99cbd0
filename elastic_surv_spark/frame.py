"""SurvFrame — a DataFrame plus survival role columns.

Rebuild of the reference's ``BasicDataset`` contract
(reference src/elastic_surv/dataset.py:15-106):

- role columns: features X, duration ``time_column`` T, event indicator
  ``event_column`` E (0 = right-censored, 1 = event);
- feature inference = sorted set-difference of columns minus roles
  (dataset.py:44-47 — ``np.setdiff1d`` sorts, and that sorted order is
  load-bearing for the reference's golden tests);
- dtype validation: a string-typed time or event column raises ``ValueError``
  before any job runs (dataset.py:58-62);
- deterministic 0.9 prefix train/test split (dataset.py:64-68).

Spark has no stable row order, so prefix-split semantics require an explicit
order column. ``from_pandas`` materializes the input row order as ``_row_id``;
parquet-backed frames pass ``order_column`` (any monotonic key). The split is
computed with ``row_number()`` over that order.

Scale note: a global ``row_number`` over one window is a single-reducer sort —
fine for parity tests, wrong at 100 TB. ``hash_split`` is the scale path: a
deterministic, shuffle-free, per-row hash split (same contract as the
reference's *intent* — disjoint train/test views of one table — without the
total order). Both are exposed; callers pick semantics vs scale.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

ROW_ID = "_row_id"

_NUMERIC_TYPES = (
    T.ByteType,
    T.ShortType,
    T.IntegerType,
    T.LongType,
    T.FloatType,
    T.DoubleType,
    T.DecimalType,
)


def _is_numeric(dtype: T.DataType) -> bool:
    return isinstance(dtype, _NUMERIC_TYPES)


class SurvFrame:
    def __init__(
        self,
        df: DataFrame,
        time_column: str,
        event_column: str,
        features: list[str] | None = None,
        order_column: str | None = None,
        train_ratio: float = 0.9,
        label_transformer: Callable | None = None,
    ) -> None:
        self.df = df
        self.time_column = time_column
        self.event_column = event_column
        self.order_column = order_column
        self.train_ratio = train_ratio
        # ≡ reference dataset.py:25,76,213-214 — caller-injected outcome
        # transform (t, e) -> (t', e'), applied at batch-extraction time
        self.label_transformer = label_transformer

        schema = {f.name: f.dataType for f in df.schema.fields}
        for col in (time_column, event_column):
            if col not in schema:
                raise ValueError(f"column {col!r} not in DataFrame")
            # ≡ reference dataset.py:58-62 (object-dtype time/event rejected)
            if not _is_numeric(schema[col]):
                raise ValueError(
                    f"{col!r} must be numeric, got {schema[col].simpleString()}"
                )

        if features is None:
            # ≡ reference dataset.py:44-47 — np.setdiff1d sorts feature names
            excluded = {time_column, event_column, ROW_ID}
            if order_column:
                excluded.add(order_column)
            features = sorted(set(df.columns) - excluded)
        self.features = list(features)
        for col in self.features:
            if col not in schema:
                raise ValueError(f"feature column {col!r} not in DataFrame")

    # ------------------------------------------------------------------ #
    @classmethod
    def from_pandas(
        cls,
        spark: SparkSession,
        pdf,
        time_column: str,
        event_column: str,
        features: list[str] | None = None,
        train_ratio: float = 0.9,
        label_transformer: Callable | None = None,
    ) -> "SurvFrame":
        """≡ reference PandasDataset (dataset.py:306-344).

        Materializes the pandas row order as ``_row_id`` so the prefix split
        is reproducible on an engine with no intrinsic row order.
        """
        pdf = pdf.copy()
        pdf[ROW_ID] = range(len(pdf))
        df = spark.createDataFrame(pdf)
        return cls(
            df,
            time_column,
            event_column,
            features=features,
            order_column=ROW_ID,
            train_ratio=train_ratio,
            label_transformer=label_transformer,
        )

    # ------------------------------------------------------------------ #
    @classmethod
    def from_es(
        cls,
        spark: SparkSession,
        base_url: str,
        index: str,
        schema=None,
        time_column: str = "",
        event_column: str = "",
        features: list[str] | None = None,
        slices: int = 8,
        query: dict | None = None,
        order_column: str | None = None,
        train_ratio: float = 0.9,
        label_transformer: Callable | None = None,
        page_size: int = 1000,
        mode: str = "scroll",
    ) -> "SurvFrame":
        """≡ reference ESDataset (dataset.py:228-271, construction at 260):
        a survival frame whose rows live in an Elasticsearch index.

        The scan is the jar-free sliced-scroll reader
        (:func:`elastic_surv_spark.sources.elastic.scan_es` — one Spark
        partition per ES slice, server-side ``query``/``_source`` pushdown,
        the pushdown role eland plays for the reference). Column pruning is
        applied at the source: only role columns ship out of the cluster.
        ES document order is not a stable total order, so without
        ``order_column`` use the order-free ``hash_split()`` path (e.g.
        ``SurvDataset(frame, use_hash_split=True)``); pass ``order_column``
        (a monotone id field) to enable exact prefix-``split()`` semantics.
        ``mode`` picks the pagination API: ``"scroll"`` (ES 7 parity with
        the reference's eland pin) or ``"pit"`` (ES 8, scroll deprecated).
        ``schema=None`` types the frame from the index's own mapping
        (``GET /{index}/_mapping``) — exactly how ``ed.DataFrame`` types
        itself for the reference; pass an explicit schema to override
        (e.g. for multi-valued fields, which ES mappings can't declare).
        """
        from elastic_surv_spark.sources.elastic import fetch_index_schema, scan_es

        if not time_column or not event_column:
            raise ValueError("from_es requires time_column and event_column")
        if schema is None:
            schema = fetch_index_schema(base_url, index)
        if isinstance(schema, str):
            schema = T.StructType.fromDDL(schema)
        if features is None:
            excluded = {time_column, event_column, ROW_ID, order_column}
            features = sorted(f.name for f in schema.fields if f.name not in excluded)
        fields = list(
            dict.fromkeys(
                [*features, time_column, event_column]
                + ([order_column] if order_column else [])
            )
        )
        pruned = T.StructType([f for f in schema.fields if f.name in set(fields)])
        df = scan_es(
            spark, base_url, index, pruned,
            slices=slices, query=query, fields=fields, page_size=page_size,
            mode=mode,
        )
        return cls(
            df,
            time_column,
            event_column,
            features=features,
            order_column=order_column,
            train_ratio=train_ratio,
            label_transformer=label_transformer,
        )

    # ------------------------------------------------------------------ #
    @property
    def columns(self) -> list[str]:
        """Role projection ≡ reference dataset.py:51 (features + [time, event])."""
        return self.features + [self.time_column, self.event_column]

    def projected(self) -> DataFrame:
        """Column-role projection; Catalyst prunes the scan to these columns."""
        cols = list(self.columns)
        if self.order_column and self.order_column not in cols:
            cols.append(self.order_column)
        return self.df.select(*cols)

    # ------------------------------------------------------------------ #
    def _with_row_number(self) -> DataFrame:
        if self.order_column is None:
            raise ValueError(
                "prefix split requires order_column (no stable row order in Spark); "
                "use hash_split() for an order-free deterministic split"
            )
        w = Window.orderBy(F.col(self.order_column))
        return self.projected().withColumn("_rn", F.row_number().over(w))

    def split(self) -> tuple[DataFrame, DataFrame]:
        """Deterministic prefix split ≡ reference dataset.py:64-68.

        train = first ``floor(train_ratio * n)`` rows in ``order_column``
        order, test = remainder. Exact reference semantics (head/tail views).
        """
        n = self.df.count()
        train_len = int(self.train_ratio * n)
        ranked = self._with_row_number()
        train = ranked.filter(F.col("_rn") <= train_len).drop("_rn")
        test = ranked.filter(F.col("_rn") > train_len).drop("_rn")
        return train, test

    def hash_split(self, key: str | None = None, salt: int = 42) -> tuple[DataFrame, DataFrame]:
        """Scale-path split: deterministic per-row hash, no global sort/shuffle.

        Partitions rows by ``pmod(xxhash64(key, salt), 100) < 100*train_ratio``.
        Fully parallel, reproducible across runs, and independent of
        partitioning — the right split at 100 TB. Without a ``key`` (and
        with no ``order_column`` — e.g. a frame scanned out of ES, where
        document order is not a stable total order), the hash covers ALL
        projected columns: still deterministic and shuffle-free, with
        fully-duplicate rows landing on the same side by construction.
        """
        key = key or self.order_column
        proj = self.projected()
        key_cols = [F.col(key)] if key is not None else [F.col(c) for c in proj.columns]
        bucket = F.pmod(F.xxhash64(*key_cols, F.lit(salt)), F.lit(100))
        thresh = int(self.train_ratio * 100)
        return proj.filter(bucket < thresh), proj.filter(bucket >= thresh)

    # ------------------------------------------------------------------ #
    def outcome(self, df: DataFrame | None = None) -> DataFrame:
        """(T, E) projection ≡ reference dataset.py:273-281 / 346-352."""
        return (df if df is not None else self.df).select(
            self.time_column, self.event_column
        )

    def discrete_outcome(self, num_durations: int, scheme: str = "equidistant"):
        """Fit a duration discretizer on the TRAIN split and install its
        transform as this frame's label_transformer — ≡ reference
        dataset.py:122-132 (``discrete_outcome`` fits on train().outcome()
        and sets ``self._label_transformer = labtrans.transform``). Returns
        the fitted transform (its ``cuts`` seed a model's duration_index).
        """
        from elastic_surv_spark.models.labels import LabelTransform

        train, _ = self.split() if self.order_column else self.hash_split()
        labtrans = LabelTransform.fit(
            train, self.time_column, num_durations=num_durations, scheme=scheme
        )
        self.label_transformer = labtrans.transform_np
        return labtrans

    def copy(self) -> "SurvFrame":
        """≡ reference dataset.py:283-297 — but free: DataFrames are immutable
        and fitted featurizers are shared rather than refit (fixes the
        reference's refit-per-copy inefficiency noted in SURVEY §4)."""
        return SurvFrame(
            self.df,
            self.time_column,
            self.event_column,
            features=list(self.features),
            order_column=self.order_column,
            train_ratio=self.train_ratio,
            label_transformer=self.label_transformer,
        )
