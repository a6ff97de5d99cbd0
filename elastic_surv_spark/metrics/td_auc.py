"""Cumulative/dynamic time-dependent AUC as a distributed aggregation.

The standard discrimination metric next to the C-index (scikit-survival's
``cumulative_dynamic_auc``, Heagerty & Zheng 2005 — published definition,
independent implementation): at horizon t, cases are subjects with
T ≤ t and E = 1, controls are subjects with T > t, and AUC(t) is the
probability a random case out-ranks a random control on the risk score
(risk ties count ½). The reference scores models with a single scalar
C-index (src/elastic_surv/models/base.py:80); AUC(t) resolves WHERE on
the horizon a model discriminates.

Scale posture — no pairwise join anywhere: risk scores quantize to
``n_bins`` fixed-width bins (the bin edges come from ONE 1-row min/max
aggregate that broadcasts; same posture as the metric family's ≤64-point
curves), so each horizon reduces to a ``(horizon, bin)`` count grid and
the case-control pair count is a cumulative window over ≤ ``n_bins`` rows
per horizon. Work is O(n·horizons) map-side + a bounded aggregate —
never O(n²). Counts stay integer until the final division, making the
result bit-portable across engines (the SQL oracle reproduces it
exactly). Binned AUC is the operator's definition: within-bin risk order
is deliberately coarsened (ties at bin resolution), exact given the bins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["cumulative_dynamic_auc"]


def cumulative_dynamic_auc(
    df: DataFrame,
    time_col: str,
    event_col: str,
    risk_col: str,
    n_times: int = 8,
    n_bins: int = 256,
    round_to: int | None = 6,
) -> DataFrame:
    """(t, n_cases, n_controls, auc) at ``n_times`` equispaced interior
    horizons between min and max observed time.

    Higher risk must mean earlier events: AUC ≫ 0.5 ⇔ the score
    discriminates. Horizons with no cases or no controls are dropped
    (AUC undefined there).
    """
    bounds = df.agg(
        F.min(time_col).alias("_tmin"),
        F.max(time_col).alias("_tmax"),
        F.min(risk_col).cast("double").alias("_rmin"),
        F.max(risk_col).cast("double").alias("_rmax"),
    )
    step = n_times + 1
    grid = bounds.select(
        "_rmin",
        "_rmax",
        F.explode(F.sequence(F.lit(1), F.lit(n_times))).alias("_i"),
        "_tmin",
        "_tmax",
    ).select(
        "_rmin",
        "_rmax",
        (
            F.col("_tmin")
            + F.floor(
                F.col("_i")
                * (F.col("_tmax") - F.col("_tmin")).cast("double")
                / F.lit(float(step))
            )
        ).alias("_gt"),
    )
    # map-side classify + bin: subjects × n_times rows, integer statuses
    r_span = F.col("_rmax") - F.col("_rmin")
    bin_col = F.when(r_span <= 0, F.lit(0)).otherwise(
        F.least(
            F.lit(n_bins - 1),
            F.floor(
                (F.col(risk_col).cast("double") - F.col("_rmin"))
                / r_span
                * F.lit(n_bins)
            ),
        )
    )
    cls = (
        df.select(time_col, event_col, risk_col)
        .crossJoin(F.broadcast(grid))
        .select(
            F.col("_gt"),
            bin_col.cast("int").alias("_bin"),
            (
                (F.col(time_col) <= F.col("_gt"))
                & (F.col(event_col).cast("int") == 1)
            ).cast("long").alias("_case"),
            (F.col(time_col) > F.col("_gt")).cast("long").alias("_control"),
        )
        .filter((F.col("_case") == 1) | (F.col("_control") == 1))
    )
    counts = cls.groupBy("_gt", "_bin").agg(
        F.sum("_case").alias("n_cases"),
        F.sum("_control").alias("n_controls"),
    )
    # bounded window: ≤ n_bins rows per horizon
    w = (
        Window.partitionBy("_gt")
        .orderBy(F.asc("_bin"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    scored = counts.withColumn(
        "_ctrl_below", F.coalesce(F.sum("n_controls").over(w), F.lit(0))
    )
    out = (
        scored.groupBy("_gt")
        .agg(
            F.sum("n_cases").cast("long").alias("n_cases"),
            F.sum("n_controls").cast("long").alias("n_controls"),
            F.sum(
                F.lit(2) * F.col("n_cases") * F.col("_ctrl_below")
                + F.col("n_cases") * F.col("n_controls")
            ).alias("_num"),
        )
        .filter((F.col("n_cases") > 0) & (F.col("n_controls") > 0))
        .withColumn(
            "auc",
            F.col("_num").cast("double")
            / (F.lit(2.0) * F.col("n_cases") * F.col("n_controls")),
        )
    )
    if round_to is not None:
        out = out.withColumn("auc", F.round("auc", round_to))
    return out.select(F.col("_gt").alias("t"), "n_cases", "n_controls", "auc")
