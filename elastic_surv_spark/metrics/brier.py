"""IPCW (integrated) Brier score as distributed aggregations.

≡ reference scoring: ``EvalSurv(...).integrated_brier_score(linspace(t_min,
t_max, 100))`` with Kaplan-Meier censoring estimate (reference
src/elastic_surv/models/base.py:75-81, delegated to pycox). Definition
(Graf et al. 1999, inverse-probability-of-censoring weighting):

    BS(τ) = 1/N · Σ_i [ S_i(τ)² · 1{T_i ≤ τ, E_i = 1} / G(T_i⁻)
                      + (1 − S_i(τ))² · 1{T_i > τ} / G(τ) ]

where G is the KM estimate of the *censoring* distribution (event flipped).
IBS = ∫ BS(τ) dτ / (τ_max − τ_min), trapezoidal over the grid.

Plan shape: the censoring curve G is a KM aggregate (tiny) collected and
broadcast as a sorted-array literal; each subject row is then scored against
the grid with pure column expressions (no UDF), and one global aggregate per
grid point finishes the job. One shuffle total (the KM groupBy); the N-row
scan is map-only. Terms with G ≤ 0 are dropped (standard IPCW convention).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from elastic_surv_spark.metrics.km import km_curve


def step_lookup(ts: list[float], vals: list[float], t: Column, strict: bool = False) -> Column:
    """Right-continuous step function value at t: vals[max {k : ts[k] <= t}]
    (or < t when strict); 1.0 before the first step. Pure JVM expression."""
    ts_lit = F.array(*[F.lit(float(x)) for x in ts])
    vals_lit = F.array(*[F.lit(float(v)) for v in vals])
    cond = (lambda c: c < t) if strict else (lambda c: c <= t)
    idx = F.size(F.filter(ts_lit, cond))
    return F.when(idx > 0, F.element_at(vals_lit, idx)).otherwise(F.lit(1.0))


def censoring_km(
    df: DataFrame,
    time_col: str,
    event_col: str,
    max_curve_points: int | None = None,
) -> tuple[list[float], list[float]]:
    """KM of the censoring distribution (event indicator flipped), collected.

    With discrete times the curve is one row per distinct time — tiny. With
    continuous times it is one row per subject, so pass ``max_curve_points``
    to quantize first and keep the collect O(max_curve_points) at any n.
    """
    flipped = df.withColumn("_cens", 1 - F.col(event_col).cast("int"))
    curve = (
        km_curve(flipped, time_col, "_cens", round_to=None, max_curve_points=max_curve_points)
        .select("t", "survival")
        .orderBy("t")
        .collect()
    )
    return [float(r["t"]) for r in curve], [float(r["survival"]) for r in curve]


def brier_curve(
    pred: DataFrame,
    time_col: str,
    event_col: str,
    surv_at,
    grid: list[float],
    max_curve_points: int | None = 512,
) -> DataFrame:
    """BS(τ) for each τ in grid. ``surv_at(row_cols, tau_col) -> Column``
    evaluates the subject's predicted survival at τ. The censoring curve is
    bounded at ``max_curve_points`` (continuous-time safety; a no-op below
    the cap)."""
    ts, gs = censoring_km(pred, time_col, event_col, max_curve_points=max_curve_points)

    grid_df = F.explode(
        F.array(*[F.struct(F.lit(i).alias("k"), F.lit(float(t)).alias("tau")) for i, t in enumerate(grid)])
    ).alias("g")
    expanded = pred.select("*", grid_df).select("*", "g.k", "g.tau")

    t = F.col(time_col)
    e = F.col(event_col).cast("int")
    tau = F.col("tau")
    s_tau = surv_at(expanded, tau)
    g_tminus = step_lookup(ts, gs, t, strict=True)
    g_tau = step_lookup(ts, gs, tau, strict=False)

    term_event = F.when(
        (t <= tau) & (e == 1) & (g_tminus > 0), (s_tau ** 2) / g_tminus
    ).otherwise(F.lit(0.0))
    term_alive = F.when((t > tau) & (g_tau > 0), ((1 - s_tau) ** 2) / g_tau).otherwise(
        F.lit(0.0)
    )

    return (
        expanded.select(F.col("k"), tau.alias("tau"), (term_event + term_alive).alias("_term"))
        .groupBy("k", "tau")
        .agg((F.sum("_term") / F.count("*")).alias("brier"))
        .orderBy("k")
    )


def integrated_brier_score(
    pred: DataFrame,
    time_col: str,
    event_col: str,
    surv_at,
    grid: list[float],
    max_curve_points: int | None = 512,
) -> float:
    """Trapezoidal IBS over the grid (≡ EvalSurv.integrated_brier_score)."""
    rows = brier_curve(
        pred, time_col, event_col, surv_at, grid, max_curve_points=max_curve_points
    ).collect()
    bs = [float(r["brier"]) for r in rows]
    taus = [float(r["tau"]) for r in rows]
    if len(bs) < 2:
        return float("nan")
    area = 0.0
    for i in range(len(bs) - 1):
        area += 0.5 * (bs[i] + bs[i + 1]) * (taus[i + 1] - taus[i])
    return area / (taus[-1] - taus[0])


def surv_from_curve(cuts: list[float], surv_col: str):
    """surv_at factory for per-subject survival-array predictions over cuts."""

    def surv_at(df_cols, tau: Column) -> Column:
        cuts_lit = F.array(*[F.lit(float(c)) for c in cuts])
        idx = F.size(F.filter(cuts_lit, lambda c: c <= tau))
        return F.when(idx > 0, F.element_at(F.col(surv_col), idx)).otherwise(F.lit(1.0))

    return surv_at
