"""Kaplan-Meier censoring/survival estimator as a window aggregate.

≡ reference: KM is used inside scoring via pycox ``EvalSurv(...,
censor_surv="km")`` (reference src/elastic_surv/models/base.py:75). Here it is
a first-class distributed operator: group events per distinct time, reverse
cumulative sum for the at-risk counts, cumulative ``exp(sum(log(1 - d/n)))``
for the product-limit curve.

Scale: the grouped aggregate shuffles once on the (small) distinct-time
domain; the two windows run over the *aggregated* curve (thousands of rows,
not the raw 100 TB), partitioned as a single ordered frame — negligible.
The raw-data pass is a map-side-combinable groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def km_curve(
    df: DataFrame,
    time_col: str,
    event_col: str,
    round_to: int | None = 6,
) -> DataFrame:
    """Product-limit estimate.

    Returns one row per distinct time: (t, n_risk, n_event, n_censored,
    survival), ordered semantics: S(t) = prod_{t_i <= t} (1 - d_i / n_i).

    ``log(max(eps, 1 - d/n))`` guards the all-events-at-last-time case where
    the factor is 0 (Spark's ``log(0)`` is NULL, duckdb's is -inf; the guard
    makes both engines produce survival == 0 after rounding).
    """
    grouped = df.groupBy(F.col(time_col).alias("t")).agg(
        F.count("*").cast("long").alias("n_total"),
        F.sum(F.col(event_col).cast("long")).alias("n_event"),
    )
    w_rev = Window.orderBy(F.desc("t")).rowsBetween(Window.unboundedPreceding, 0)
    w_fwd = Window.orderBy(F.asc("t")).rowsBetween(Window.unboundedPreceding, 0)
    curve = (
        grouped.withColumn("n_risk", F.sum("n_total").over(w_rev).cast("long"))
        .withColumn(
            "survival",
            F.exp(
                F.sum(
                    F.log(
                        F.greatest(
                            F.lit(1e-300),
                            F.lit(1.0) - F.col("n_event") / F.col("n_risk"),
                        )
                    )
                ).over(w_fwd)
            ),
        )
        .withColumn("n_censored", (F.col("n_total") - F.col("n_event")).cast("long"))
    )
    if round_to is not None:
        curve = curve.withColumn("survival", F.round(F.col("survival"), round_to))
    return curve.select("t", "n_risk", "n_event", "n_censored", "survival")


def km_survival_at(df: DataFrame, time_col: str, event_col: str, t) -> float:
    """S(t) lookup — the last curve point at or before t."""
    curve = km_curve(df, time_col, event_col, round_to=None)
    row = (
        curve.filter(F.col("t") <= t)
        .orderBy(F.desc("t"))
        .select("survival")
        .first()
    )
    return 1.0 if row is None else float(row[0])
