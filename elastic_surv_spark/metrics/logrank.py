"""Two-group log-rank test as a distributed aggregation.

The standard nonparametric comparison of two survival curves (Mantel 1966;
the statistic every lifelines/pycox user reaches for next to the KM plot —
the reference ships the estimator side via pycox, reference
src/elastic_surv/models/base.py:75, and this completes the inference side).

Statistic: at each distinct EVENT time t, with n_t subjects at risk overall,
n1_t at risk in group 1, d_t total events and d1_t group-1 events,

    E1_t = d_t · n1_t / n_t
    V_t  = d_t · (n1_t/n_t) · (1 − n1_t/n_t) · (n_t − d_t) / (n_t − 1)
    χ²   = (Σ d1_t − Σ E1_t)² / Σ V_t          (1 degree of freedom)

Scale shape (same as metrics/km.py): one hash-aggregate collapses subjects
to distinct times — everything after runs on the O(|distinct times|) curve
table, so the reverse-cumulative at-risk windows are deliberate single-task
frames over an already-tiny aggregate, never over subjects.

Engine parity: the per-time E1/V doubles are identical IEEE expressions in
Spark and the SQL oracle; their SUMs go through DECIMAL(38,18) so addition
is exact and order-independent (float sums would differ by partition
order), and χ² is derived from the ROUNDED sums in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def logrank_test(
    df: DataFrame,
    time_col: str,
    event_col: str,
    group_col: str,
    strata_cols: list[str] | None = None,
    round_to: int = 6,
) -> DataFrame:
    """One-row (n_times, o1, e1, v, chi2) log-rank comparison.

    ``group_col`` must be 0/1 (group 1 is the "treatment" arm whose
    observed-vs-expected difference is reported; the statistic is
    symmetric). ``chi2`` is NULL when the variance is 0 (no comparable
    event times — e.g. a single subject at risk at every event).

    ``strata_cols`` gives the STRATIFIED log-rank: the at-risk sets and
    per-time terms are computed within each stratum and the O−E and V
    sums pool across strata — the standard adjustment when a confounder
    (site, language, source) shifts baseline hazards. Scale: the curve
    table grows to O(Σ per-stratum distinct times) and the windows
    partition on the strata, so stratification only ADDS parallelism.
    """
    strata = list(strata_cols or [])
    g1 = F.when(F.col(group_col) == 1, 1).otherwise(0)
    grouped = (
        df.groupBy(*strata, F.col(time_col).alias("t"))
        .agg(
            F.count("*").cast("long").alias("_m"),
            F.sum(F.col(event_col).cast("long")).alias("_d"),
            F.sum(g1).cast("long").alias("_m1"),
            F.sum(F.col(event_col).cast("int") * g1).cast("long").alias("_d1"),
        )
        # constant-valued partition COLUMN (see km.py): keeps the window
        # partitioned-by-constant instead of degrading to the warned
        # unpartitioned form; the frame is the tiny aggregated curve (or
        # one stratum's slice of it).
        .withColumn("_p", F.pmod(F.col("_m"), F.lit(1)))
    )
    w_rev = (
        Window.partitionBy("_p", *strata)
        .orderBy(F.desc("t"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    risk = grouped.select(
        F.col("_d"),
        F.col("_d1"),
        F.sum("_m").over(w_rev).alias("_n"),
        F.sum("_m1").over(w_rev).alias("_n1"),
    ).filter(F.col("_d") > 0)

    r = F.col("_n1").cast("double") / F.col("_n").cast("double")
    e1 = F.col("_d").cast("double") * F.col("_n1").cast("double") / F.col(
        "_n"
    ).cast("double")
    v = F.when(
        F.col("_n") > 1,
        F.col("_d").cast("double")
        * r
        * (F.lit(1.0) - r)
        * (F.col("_n") - F.col("_d")).cast("double")
        / (F.col("_n") - F.lit(1)).cast("double"),
    ).otherwise(F.lit(0.0))
    per = risk.select(
        F.col("_d1"), e1.alias("_e1"), v.alias("_v")
    )
    sums = per.agg(
        F.count("*").cast("long").alias("n_times"),
        F.coalesce(F.sum("_d1"), F.lit(0)).cast("long").alias("o1"),
        F.round(
            F.coalesce(
                F.sum(F.col("_e1").cast("decimal(38,18)")), F.lit(0)
            ).cast("double"),
            round_to,
        ).alias("e1"),
        F.round(
            F.coalesce(
                F.sum(F.col("_v").cast("decimal(38,18)")), F.lit(0)
            ).cast("double"),
            round_to,
        ).alias("v"),
    )
    return sums.select(
        "n_times",
        "o1",
        "e1",
        "v",
        F.when(
            F.col("v") > 0,
            F.round(
                F.pow(F.col("o1").cast("double") - F.col("e1"), F.lit(2.0))
                / F.col("v"),
                round_to,
            ),
        ).alias("chi2"),
    )
