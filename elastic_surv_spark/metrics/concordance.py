"""Concordance index (C-index) as a distributed aggregation.

≡ reference scoring: ``EvalSurv(...).concordance_td()`` (reference
src/elastic_surv/models/base.py:80, delegated to pycox). Two forms:

- ``harrell_cindex``: risk-score concordance (Harrell). A pair (i, j) is
  comparable iff T_i < T_j and E_i = 1; concordant iff risk_i > risk_j;
  risk ties count 0.5. This is the oracle-checkable exact form.
- ``concordance_td``: Antolini time-dependent variant over a survival matrix
  — risk of i at time T_i is 1 - S_i(T_i); used by ``models.base.score``.

Scale: the exact implementation is a self-join on the comparability
predicate — O(n²) pairs, correct tool at evaluation sizes (test splits,
≤10⁵ rows → ≤10¹⁰ pairs is already too many; use ``sample_frac``). The
documented scale path is pair *sampling* (unbiased estimator of the same
ratio) — set ``sample_frac`` so sampled_n² pairs fit the cluster; or the
O(n log n) single-pass Fenwick-tree count per sorted partition (not needed
at harness scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def harrell_cindex_counts(
    df: DataFrame,
    time_col: str,
    event_col: str,
    risk_col: str,
    sample_frac: float | None = None,
    seed: int = 42,
) -> DataFrame:
    """One row: (n_comparable, n_concordant, n_tied, c_index rounded 6)."""
    if sample_frac is not None:
        df = df.sample(fraction=sample_frac, seed=seed)
    a = df.select(
        F.col(time_col).alias("t_i"),
        F.col(event_col).alias("e_i"),
        F.col(risk_col).alias("r_i"),
    )
    b = df.select(
        F.col(time_col).alias("t_j"),
        F.col(risk_col).alias("r_j"),
    )
    pairs = a.join(b, (F.col("t_i") < F.col("t_j")) & (F.col("e_i") == 1))
    return pairs.agg(
        F.count("*").alias("n_comparable"),
        F.sum(F.when(F.col("r_i") > F.col("r_j"), 1).otherwise(0)).alias("n_concordant"),
        F.sum(F.when(F.col("r_i") == F.col("r_j"), 1).otherwise(0)).alias("n_tied"),
    ).select(
        "n_comparable",
        "n_concordant",
        "n_tied",
        F.round(
            (F.col("n_concordant") + 0.5 * F.col("n_tied")) / F.col("n_comparable"), 6
        ).alias("c_index"),
    )


def harrell_cindex(
    df: DataFrame, time_col: str, event_col: str, risk_col: str, **kw
) -> float:
    row = harrell_cindex_counts(df, time_col, event_col, risk_col, **kw).first()
    if row is None or row["c_index"] is None:
        return float("nan")  # no comparable pairs
    return float(row["c_index"])


def concordance_td(
    pred: DataFrame,
    time_col: str,
    event_col: str,
    surv_col: str,
    cuts: list[float],
) -> float:
    """Antolini time-dependent C-index over a survival-curve column.

    ``pred`` has one row per subject: (T, E, surv array over ``cuts``).
    Pair (i, j) comparable iff T_i < T_j and E_i = 1; concordant iff
    S_i(T_i) < S_j(T_i) (higher risk at the event time of i), ties 0.5.

    The curve lookup S(t) = surv[max {k : cuts[k] <= t}] is a JVM-side
    higher-order expression; the pairwise part is the same self-join as
    Harrell (same scale notes apply).
    """
    cuts_lit = F.array(*[F.lit(float(c)) for c in cuts])

    def surv_at(surv, t):
        idx = F.size(F.filter(cuts_lit, lambda c: c <= t))
        return F.when(idx > 0, F.element_at(surv, idx)).otherwise(F.lit(1.0))

    a = pred.select(
        F.col(time_col).alias("t_i"),
        F.col(event_col).alias("e_i"),
        F.col(surv_col).alias("s_i"),
    )
    b = pred.select(F.col(time_col).alias("t_j"), F.col(surv_col).alias("s_j"))
    pairs = a.join(b, (F.col("t_i") < F.col("t_j")) & (F.col("e_i") == 1)).select(
        surv_at(F.col("s_i"), F.col("t_i")).alias("si_ti"),
        surv_at(F.col("s_j"), F.col("t_i")).alias("sj_ti"),
    )
    row = pairs.agg(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("si_ti") < F.col("sj_ti"), 1.0).otherwise(0.0)).alias("conc"),
        F.sum(F.when(F.col("si_ti") == F.col("sj_ti"), 1.0).otherwise(0.0)).alias("tied"),
    ).first()
    if row["n"] == 0:
        return float("nan")
    return float((row["conc"] + 0.5 * row["tied"]) / row["n"])
