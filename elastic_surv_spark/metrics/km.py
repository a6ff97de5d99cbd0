"""Kaplan-Meier censoring/survival estimator as a window aggregate.

≡ reference: KM is used inside scoring via pycox ``EvalSurv(...,
censor_surv="km")`` (reference src/elastic_surv/models/base.py:75). Here it is
a first-class distributed operator: group events per distinct time, reverse
cumulative sum for the at-risk counts, cumulative ``exp(sum(log(1 - d/n)))``
for the product-limit curve.

Scale: the grouped aggregate shuffles once on the distinct-time domain; the
two cumulative windows run over the *aggregated* curve, not the raw rows.
With continuous times the curve domain is one row per subject — unbounded —
so ``max_curve_points`` gates an equidistant time quantization BEFORE the
groupBy: it only activates when the distinct-time count exceeds the cap
(value-identical below it), after which the curve, the windows, and any
driver collect are O(max_curve_points) regardless of n. The curve windows
are partitioned on a constant: the frame is bounded by construction, so the
one-task sort is deliberate (and the planner knows the partitioning instead
of warning about an undefined one). The raw-data pass stays a
map-side-combinable groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def quantize_times(
    df: DataFrame, time_col: str, max_curve_points: int,
    stats_from: DataFrame | None = None,
) -> DataFrame:
    """Equidistant time coarsening to ≤ max_curve_points+1 distinct values
    (each time maps to its bin's upper edge — the standard life-table
    discretization). No-op when the distinct-time count is already within
    the cap, so small-scale results are bit-identical to the exact form.
    Portable semantics: plain min/max + ceil arithmetic, reproducible in SQL.

    ``stats_from``: optional cheaper frame with the SAME time column to run
    the two eager stats jobs (distinct count, min/max) against — pass it
    when ``df`` is expensive to execute (e.g. carries a model-inference
    mapInPandas stage) but the raw input shares the time column.
    """
    stats = stats_from if stats_from is not None else df
    nd = stats.select(F.countDistinct(time_col).alias("nd")).first()["nd"]
    if nd <= max_curve_points:
        return df
    row = stats.agg(
        F.min(time_col).cast("double").alias("lo"),
        F.max(time_col).cast("double").alias("hi"),
    ).first()
    lo, hi = float(row["lo"]), float(row["hi"])
    width = (hi - lo) / max_curve_points
    t = F.col(time_col).cast("double")
    # bin index clamped to max_curve_points: IEEE division can put
    # ceil((hi-lo)/width) at max_curve_points+1 for ~1% of (lo, hi) ranges,
    # which would leak an extra distinct value past the cap
    k = F.least(F.lit(float(max_curve_points)), F.ceil((t - F.lit(lo)) / F.lit(width)))
    quant = F.least(F.lit(hi), F.lit(lo) + k * F.lit(width))
    return df.withColumn(time_col, quant)


def _risk_table(
    df: DataFrame,
    time_col: str,
    event_col: str,
    group_col: str | None = None,
    max_curve_points: int | None = None,
):
    """THE curve scaffolding, defined once (the r11 deferral): quantize →
    one (``[group,] t``) hash-aggregate → reverse-cumulative at-risk
    counts. Returns ``(risk_table, w_fwd)`` where the risk table carries
    ``([group,] t, n_total, n_event, n_risk)`` and ``w_fwd`` is the
    forward cumulative window every curve statistic folds over — KM's
    log-product, Nelson-Aalen's hazard sum, Greenwood's variance sum.

    Partitioning: the per-group form partitions every window on the real
    cohort key (cohort cardinality is free); the global form partitions on
    ``pmod(n_total, 1)`` — a constant-VALUED column that is not foldable
    (a bare literal would constant-fold out of the partition spec and the
    window would degrade to the warned unpartitioned one-reducer form).
    The frame is the bounded aggregated curve — one deliberate task.
    """
    if max_curve_points is not None:
        df = quantize_times(df, time_col, max_curve_points)
    keys = ([F.col(group_col)] if group_col else []) + [
        F.col(time_col).alias("t")
    ]
    grouped = df.groupBy(*keys).agg(
        F.count("*").cast("long").alias("n_total"),
        F.sum(F.col(event_col).cast("long")).alias("n_event"),
    )
    if group_col is None:
        grouped = grouped.withColumn("_p", F.pmod(F.col("n_total"), F.lit(1)))
        part = "_p"
    else:
        part = group_col
    w_rev = (
        Window.partitionBy(part)
        .orderBy(F.desc("t"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_fwd = (
        Window.partitionBy(part)
        .orderBy(F.asc("t"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    grouped = grouped.withColumn(
        "n_risk", F.sum("n_total").over(w_rev).cast("long")
    )
    return grouped, w_fwd


def _km_survival(w_fwd):
    """S(t) = exp(Σ log(1 − d/n)) over the forward window.

    ``log(max(eps, 1 − d/n))`` guards the all-events-at-last-time case
    where the factor is 0 (Spark's ``log(0)`` is NULL, duckdb's is −inf;
    the guard makes both engines produce survival == 0 after rounding)."""
    return F.exp(
        F.sum(
            F.log(
                F.greatest(
                    F.lit(1e-300),
                    F.lit(1.0) - F.col("n_event") / F.col("n_risk"),
                )
            )
        ).over(w_fwd)
    )


def km_curve(
    df: DataFrame,
    time_col: str,
    event_col: str,
    round_to: int | None = 6,
    max_curve_points: int | None = None,
) -> DataFrame:
    """Product-limit estimate.

    Returns one row per distinct time: (t, n_risk, n_event, n_censored,
    survival), ordered semantics: S(t) = prod_{t_i <= t} (1 - d_i / n_i).

    ``max_curve_points`` bounds the curve domain for continuous times (see
    module doc) — pass it whenever the result is collected or windowed and
    n is unbounded.
    """
    grouped, w_fwd = _risk_table(
        df, time_col, event_col, max_curve_points=max_curve_points
    )
    curve = grouped.withColumn("survival", _km_survival(w_fwd)).withColumn(
        "n_censored", (F.col("n_total") - F.col("n_event")).cast("long")
    )
    if round_to is not None:
        curve = curve.withColumn("survival", F.round(F.col("survival"), round_to))
    return curve.select("t", "n_risk", "n_event", "n_censored", "survival")


def km_curve_by(
    df: DataFrame,
    time_col: str,
    event_col: str,
    group_col: str,
    round_to: int | None = 6,
    max_curve_points: int | None = None,
) -> DataFrame:
    """Per-group product-limit curves in ONE pass: ``km_curve`` with every
    window partitioned by the real cohort key instead of the bounded-curve
    constant — (group, t, n_risk, n_event, n_censored, survival).

    The "many survival models" shape (one KM per segment/cohort/stratum):
    a single (group, t) hash-aggregate then group-partitioned cumulative
    windows — no per-group job scheduling, cohort cardinality is free.
    ``max_curve_points`` quantizes the shared time domain first (same
    boundedness contract as ``km_curve``) so each group's curve is capped
    for continuous times.
    """
    grouped, w_fwd = _risk_table(
        df, time_col, event_col, group_col=group_col,
        max_curve_points=max_curve_points,
    )
    curve = grouped.withColumn("survival", _km_survival(w_fwd)).withColumn(
        "n_censored", (F.col("n_total") - F.col("n_event")).cast("long")
    )
    if round_to is not None:
        curve = curve.withColumn("survival", F.round(F.col("survival"), round_to))
    return curve.select(group_col, "t", "n_risk", "n_event", "n_censored", "survival")


def km_survival_at(
    df: DataFrame,
    time_col: str,
    event_col: str,
    t,
    max_curve_points: int | None = None,
) -> float:
    """S(t) lookup — the last curve point at or before t.
    ``max_curve_points`` bounds the curve on continuous times (see rmst)."""
    curve = km_curve(
        df, time_col, event_col, round_to=None,
        max_curve_points=max_curve_points,
    )
    row = (
        curve.filter(F.col("t") <= t)
        .orderBy(F.desc("t"))
        .select("survival")
        .first()
    )
    return 1.0 if row is None else float(row[0])


def na_curve(
    df: DataFrame,
    time_col: str,
    event_col: str,
    round_to: int | None = 6,
    max_curve_points: int | None = None,
) -> DataFrame:
    """Nelson-Aalen cumulative-hazard estimate: H(t) = Σ_{t_i ≤ t} d_i/n_i.

    Same O(|distinct times|) curve shape as :func:`km_curve` (one
    hash-aggregate to distinct times, constant-partition windows over the
    tiny aggregate). The per-time hazard increment d/n is a single IEEE
    division; its running sum goes through DECIMAL(38,18) so the cumsum is
    exact and engine-portable (a float cumsum would depend on evaluation
    order)."""
    grouped, w_fwd = _risk_table(
        df, time_col, event_col, max_curve_points=max_curve_points
    )
    curve = grouped.withColumn(
        "cum_hazard",
        F.sum(
            (
                F.col("n_event").cast("double") / F.col("n_risk").cast("double")
            ).cast("decimal(38,18)")
        )
        .over(w_fwd)
        .cast("double"),
    )
    if round_to is not None:
        curve = curve.withColumn("cum_hazard", F.round("cum_hazard", round_to))
    return curve.select(
        "t", "n_risk", F.col("n_event").cast("long").alias("n_event"), "cum_hazard"
    )


def rmst(
    df: DataFrame,
    time_col: str,
    event_col: str,
    round_to: int = 6,
    max_curve_points: int | None = None,
) -> DataFrame:
    """Restricted mean survival time: ∫₀^τ S(t) dt with τ = the largest
    observed time — the step-function integral of the KM curve,
    Σ_i S(t_{i-1}) · (t_i − t_{i-1}) with S ≡ 1 before the first time.

    One row (tau, rmst_value). Computed from the ROUNDED survival curve so
    the SQL oracle reproduces it bit-for-bit; the segment products pass
    through DECIMAL(38,18) for an order-free exact sum. Runs on the
    O(|distinct times|) curve table only.

    ``max_curve_points`` passes through to :func:`km_curve` — on
    CONTINUOUS times (one distinct time per subject) the curve's
    constant-partition window otherwise funnels all n times into one
    task's sort; the default stays None because the registry oracles pin
    the exact (uncapped) curve. ``round_to`` rounds the final integral;
    the curve itself stays at km_curve's 6-digit rounding (the
    engine-parity hinge the oracle mirrors)."""
    curve = km_curve(df, time_col, event_col, max_curve_points=max_curve_points)
    curve = curve.withColumn("_p", F.pmod(F.col("n_risk"), F.lit(1)))
    w = Window.partitionBy("_p").orderBy(F.asc("t"))
    seg = curve.select(
        F.col("t"),
        (
            F.lag("survival", 1, 1.0).over(w)
            * (F.col("t") - F.lag("t", 1, 0).over(w)).cast("double")
        ).cast("decimal(38,18)").alias("_seg"),
    )
    return seg.agg(
        F.max("t").cast("double").alias("tau"),
        F.round(
            F.coalesce(F.sum("_seg"), F.lit(0)).cast("double"), round_to
        ).alias("rmst_value"),
    )


def km_ci_curve(
    df: DataFrame,
    time_col: str,
    event_col: str,
    z: float = 1.96,
    round_to: int = 6,
    max_curve_points: int | None = None,
) -> DataFrame:
    """KM curve with Greenwood variance and linear confidence bands.

    Greenwood's formula: Var[S(t)] = S(t)² · Σ_{t_i ≤ t} d_i/(n_i(n_i−d_i));
    bands are the plain linear S ± z·se clamped to [0, 1] (documented
    choice — log-log bands need transcendental parity both engines would
    have to round identically at every step). Terms with n_i == d_i (the
    curve has hit 0) contribute 0 — S is 0 there and stays 0.

    Same scale/parity posture as the other curves: one hash-aggregate to
    distinct times, windows over the tiny curve table, the Greenwood
    increments DECIMAL(38,18)-summed, and variance/bands derived from the
    ROUNDED survival so the SQL oracle is bit-identical.
    """
    if max_curve_points is not None:
        df = quantize_times(df, time_col, max_curve_points)
    curve = km_curve(df, time_col, event_col, round_to=round_to)
    curve = curve.withColumn("_p", F.pmod(F.col("n_risk"), F.lit(1)))
    w_fwd = (
        Window.partitionBy("_p")
        .orderBy(F.asc("t"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    g = F.when(
        F.col("n_risk") > F.col("n_event"),
        F.col("n_event").cast("double")
        / (F.col("n_risk") * (F.col("n_risk") - F.col("n_event"))).cast("double"),
    ).otherwise(F.lit(0.0))
    with_var = curve.withColumn(
        "_gsum",
        F.sum(g.cast("decimal(38,18)")).over(w_fwd).cast("double"),
    ).withColumn(
        "greenwood_var",
        F.round(F.col("survival") * F.col("survival") * F.col("_gsum"), round_to),
    )
    se = F.sqrt(F.col("greenwood_var"))
    return with_var.select(
        "t",
        "n_risk",
        "n_event",
        "survival",
        "greenwood_var",
        F.round(F.greatest(F.col("survival") - F.lit(z) * se, F.lit(0.0)), round_to).alias("ci_lo"),
        F.round(F.least(F.col("survival") + F.lit(z) * se, F.lit(1.0)), round_to).alias("ci_hi"),
    )
