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


def ipcw_brier_km_by(
    df: DataFrame,
    group_col: str,
    time_col: str,
    event_col: str,
    n_grid: int = 20,
    max_curve_points: int = 512,
    round_to: int | None = 6,
    cache_input: bool = True,
) -> DataFrame:
    """Per-group IPCW Brier of each group's OWN KM predictor over an
    ``n_grid``-point per-group time grid: ``(group, k, tau, brier)``.

    Unlike the population row (which collects two bounded curves to the
    driver), the grouped form stays FULLY in-plan — at a million segments
    there are no driver-side curves to collect:

    - S and G are ``km_curve_by`` outputs (one hash-aggregate + bounded
      group-partitioned windows each; the shared time domain quantizes
      once upfront so every subject time IS a curve point);
    - G(T⁻) is a lag over the group-partitioned censoring curve, attached
      to subjects by a (group, t) equi-join;
    - S(τ)/G(τ) resolve by an in-plan as-of lookup: grid rows join curve
      points at ``t ≤ τ`` and a (group, k) row_number keeps the latest —
      join volume is curve_points × n_grid PER GROUP, bounded by the
      quantization cap regardless of group size;
    - per-τ means use DECIMAL(38,18) sums (order-free, engine-portable).

    Terms with G ≤ 0 drop (standard IPCW convention), matching the
    population row's formula exactly — a single-group input reproduces
    ``ipcw_brier_km_grid``'s values.
    """
    from pyspark.sql.window import Window

    from elastic_surv_spark.metrics.km import km_curve_by, quantize_times

    if n_grid < 2:
        raise ValueError("n_grid must be >= 2 (grid step divides by n_grid - 1)")
    g = group_col
    base = df.select(
        F.col(g),
        F.col(time_col).cast("double").alias("_t"),
        F.col(event_col).cast("int").alias("_e"),
    )
    if cache_input:
        # one source evaluation total: quantize_times' eager stats jobs
        # materialize the checkpoint, and the S curve, G curve, bounds and
        # subject-terms consumers below all read it instead of re-running
        # the source plan (~6 evaluations un-cached — the r13 scan sweep).
        # Callers whose input is already checkpointed (the segmented
        # pipelines' scored frame) pass False.
        base = base.localCheckpoint(eager=False)
    base = quantize_times(base, "_t", max_curve_points)
    s_curve = km_curve_by(base, "_t", "_e", g, round_to=10).select(
        F.col(g), F.col("t"), F.col("survival").alias("_s")
    )
    g_curve = km_curve_by(
        base.withColumn("_c", 1 - F.col("_e")), "_t", "_c", g, round_to=10
    ).select(F.col(g), F.col("t"), F.col("survival").alias("_gs"))
    w_lag = Window.partitionBy(g).orderBy(F.asc("t"))
    gprev = g_curve.select(
        F.col(g),
        F.col("t").alias("_t"),
        F.lag("_gs", 1, 1.0).over(w_lag).alias("_g_tminus"),
    )
    bounds = base.groupBy(g).agg(
        F.min("_t").alias("_tmin"), F.max("_t").alias("_tmax")
    )
    grid = bounds.select(
        F.col(g),
        F.explode(F.sequence(F.lit(0), F.lit(n_grid - 1))).alias("k"),
        "_tmin",
        "_tmax",
    ).select(
        F.col(g),
        "k",
        (
            F.col("_tmin")
            + F.col("k") * (F.col("_tmax") - F.col("_tmin")) / F.lit(float(n_grid - 1))
        ).alias("tau"),
    )

    def lookup(curve: DataFrame, val: str, out: str) -> DataFrame:
        c = curve.select(
            F.col(g).alias("_lg"), F.col("t").alias("_lt"), F.col(val).alias(out)
        )
        wk = Window.partitionBy(g, "k").orderBy(F.desc("_lt"))
        return (
            grid.join(
                c, (F.col(g) == F.col("_lg")) & (F.col("_lt") <= F.col("tau")), "left"
            )
            .withColumn("_rn", F.row_number().over(wk))
            .filter(F.col("_rn") == 1)
            .select(F.col(g), "k", "tau", F.coalesce(out, F.lit(1.0)).alias(out))
        )

    grid_vals = lookup(s_curve, "_s", "_s_tau").join(
        lookup(g_curve, "_gs", "_g_tau").drop("tau"), [g, "k"]
    )
    rows = base.join(gprev, [g, "_t"], "left").withColumn(
        "_g_tminus", F.coalesce("_g_tminus", F.lit(1.0))
    )
    expanded = rows.join(grid_vals, g)
    t, e, tau = F.col("_t"), F.col("_e"), F.col("tau")
    s_tau, g_tminus, g_tau = F.col("_s_tau"), F.col("_g_tminus"), F.col("_g_tau")
    term = (
        F.when(
            (t <= tau) & (e == 1),
            F.when(g_tminus > 0, F.pow(s_tau, 2) / g_tminus).otherwise(0.0),
        )
        .when(t > tau, F.when(g_tau > 0, F.pow(1.0 - s_tau, 2) / g_tau).otherwise(0.0))
        .otherwise(0.0)
    )
    out = (
        expanded.select(F.col(g), "k", tau.alias("tau"), term.alias("_term"))
        .groupBy(g, "k", "tau")
        .agg(
            (
                F.sum(F.col("_term").cast("decimal(38,18)")).cast("double")
                / F.count("*")
            ).alias("brier")
        )
    )
    if round_to is not None:
        out = out.withColumn("tau", F.round("tau", round_to)).withColumn(
            "brier", F.round("brier", round_to)
        )
    return out.select(g, "k", "tau", "brier")


def surv_from_curve(cuts: list[float], surv_col: str):
    """surv_at factory for per-subject survival-array predictions over cuts."""

    def surv_at(df_cols, tau: Column) -> Column:
        cuts_lit = F.array(*[F.lit(float(c)) for c in cuts])
        idx = F.size(F.filter(cuts_lit, lambda c: c <= tau))
        return F.when(idx > 0, F.element_at(F.col(surv_col), idx)).otherwise(F.lit(1.0))

    return surv_at
