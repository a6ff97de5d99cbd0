"""Competing-risks cumulative incidence (Aalen-Johansen estimator).

Beyond the reference's single-event surface: with K mutually-exclusive event
causes, the naive per-cause Kaplan-Meier overestimates each cause's
incidence (it treats competing events as censoring). The Aalen-Johansen
cumulative incidence function for cause k is

    F_k(t) = Σ_{t_i ≤ t}  S(t_i⁻) · d_ki / n_i

with S the ANY-cause KM survival, d_ki the cause-k events at t_i and n_i
the at-risk count — the standard estimator (Aalen & Johansen 1978; see also
Putter et al., "Tutorial in biostatistics: competing risks", Stat Med 2007).

Plan shape: identical scale posture to km_curve — one map-side-combinable
groupBy on the (bounded, quantizable) time domain, then constant-partition
windows over the aggregated curve. ``max_curve_points`` gates the same
equidistant quantization for continuous times.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from elastic_surv_spark.metrics.km import quantize_times


def cumulative_incidence(
    df: DataFrame,
    time_col: str,
    cause_col: str,
    n_causes: int = 2,
    round_to: int | None = 6,
    max_curve_points: int | None = None,
) -> DataFrame:
    """Aalen-Johansen CIF curves for causes 1..n_causes (0 = censored).

    Returns one row per distinct time: (t, n_risk, d_1..d_K, cif_1..cif_K),
    cif_k non-decreasing and Σ_k cif_k ≤ 1 − S(t) ≤ 1.
    """
    if max_curve_points is not None:
        df = quantize_times(df, time_col, max_curve_points)
    cause = F.col(cause_col)
    grouped = df.groupBy(F.col(time_col).alias("t")).agg(
        F.count("*").cast("long").alias("n_total"),
        *[
            F.sum((cause == k).cast("long")).alias(f"d_{k}")
            for k in range(1, n_causes + 1)
        ],
    )
    # constant-valued, non-foldable partition column — bounded curve frame
    # (see km_curve for why a literal does not survive the optimizer)
    grouped = grouped.withColumn("_p", F.pmod(F.col("n_total"), F.lit(1)))
    w_rev = (
        Window.partitionBy("_p").orderBy(F.desc("t"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_fwd = (
        Window.partitionBy("_p").orderBy(F.asc("t"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_lag = Window.partitionBy("_p").orderBy(F.asc("t"))
    d_any = sum(F.col(f"d_{k}") for k in range(1, n_causes + 1))
    curve = (
        grouped.withColumn("n_risk", F.sum("n_total").over(w_rev).cast("long"))
        .withColumn(
            "_s",
            F.exp(
                F.sum(
                    F.log(
                        F.greatest(
                            F.lit(1e-300),
                            F.lit(1.0) - d_any / F.col("n_risk"),
                        )
                    )
                ).over(w_fwd)
            ),
        )
        .withColumn("_s_prev", F.lag("_s", 1, 1.0).over(w_lag))
    )
    for k in range(1, n_causes + 1):
        cif = F.sum(
            F.col("_s_prev") * F.col(f"d_{k}") / F.col("n_risk")
        ).over(w_fwd)
        if round_to is not None:
            cif = F.round(cif, round_to)
        curve = curve.withColumn(f"cif_{k}", cif)
    return curve.select(
        "t",
        "n_risk",
        *[f"d_{k}" for k in range(1, n_causes + 1)],
        *[f"cif_{k}" for k in range(1, n_causes + 1)],
    )
