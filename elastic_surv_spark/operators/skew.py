"""Skew mitigation: salted joins and salted aggregation.

AQE's skew-join split (on by default in session.py) handles most skew by
splitting oversized shuffle partitions, but it only applies to sort-merge
joins after stats are known. A *salted* join is the explicit, plan-time
fix for pathological hot keys (the classic null-key / celebrity-user /
default-value skew) and works for any join the optimizer picks:

- fact side: append a uniform random salt in [0, n_salts) to the key,
- dim side: explode each row to all n_salts (key, salt) copies,
- equi-join on (key, salt) — the hot key's rows now spread across n_salts
  shuffle partitions instead of one straggler task.

Shuffle volume grows by ×n_salts on the (smaller) exploded side only; pick
n_salts ≈ hot-partition-size / target-partition-size.

Salted two-phase aggregation does the same for `groupBy(hot_key)`: partial
agg on (key, salt), then final agg on key — the classic map-side combine
made explicit when a single key overwhelms one reducer.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str | list[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Join with the fact side salted and the dim side replicated.

    Result equals ``fact.join(dim, on, how)`` for how in inner/left; the
    hot keys' rows spread over ``n_salts`` shuffle partitions.
    """
    keys = [on] if isinstance(on, str) else list(on)
    f = fact.withColumn("_salt", (F.rand(seed=7) * n_salts).cast("int"))
    d = dim.withColumn(
        "_salt", F.explode(F.array(*[F.lit(s) for s in range(n_salts)]))
    )
    return f.join(d, keys + ["_salt"], how).drop("_salt")


def salted_agg(
    df: DataFrame,
    group_cols: str | list[str],
    aggs: dict[str, Column],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation for decomposable aggregates (sum/count/min/max).

    ``aggs`` maps output name → aggregate over the input columns; phase 2
    re-aggregates the partials: sum/count → sum, min → min, max → max
    (inferred from the expression name).
    """
    keys = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    salted = df.withColumn("_salt", (F.rand(seed=7) * n_salts).cast("int"))
    partial = salted.groupBy(*keys, "_salt").agg(
        *[expr.alias(f"_p_{name}") for name, expr in aggs.items()]
    )

    def _refold(name: str) -> Column:
        # re-aggregate a partial by its aggregate kind
        expr_sql = aggs[name]._jc.toString().lower()
        src = F.col(f"_p_{name}")
        if expr_sql.startswith("min"):
            return F.min(src).alias(name)
        if expr_sql.startswith("max"):
            return F.max(src).alias(name)
        return F.sum(src).alias(name)  # sum and count both refold with sum

    return partial.groupBy(*keys).agg(*[_refold(n) for n in aggs])
