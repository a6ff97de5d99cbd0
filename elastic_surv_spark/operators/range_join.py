"""Interval / range join — the second time-join primitive Spark lacks
natively (SURVEY §2.3; as-of join is the other, see asof.py).

Semantics: for each left row, all right rows with the same key whose
timestamp falls in ``[left_ts − lower, left_ts + upper]``.

A naive implementation is a per-key cross join filtered by the range —
O(|L|·|R|) per key, hopeless at scale. The scalable plan buckets the time
axis at the window width:

1. right rows get bucket ``floor(ts / w)`` (map-only),
2. left rows explode to the 2-3 buckets their window overlaps,
3. equi-join on (key, bucket) — an ordinary shuffled hash join whose volume
   is O(|L| · buckets_per_window + |R|), independent of range density,
4. exact range predicate filters the bucket-coarse matches.

Every matched pair shares a bucket (window ⊆ explosion span), so the
bucketing loses nothing; AQE's skew-join handles hot keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _axis(df: DataFrame, col: str) -> tuple[F.Column, float]:
    """(numeric axis column, units-per-second). Timestamps compare at
    microsecond precision; numeric axes are taken to already be in seconds
    (offsets apply 1:1)."""
    dt = df.schema[col].dataType
    if isinstance(dt, T.TimestampType):
        return F.unix_micros(F.col(col)), 1_000_000.0
    return F.col(col).cast("double"), 1.0


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    lower_seconds: float,
    upper_seconds: float,
    bucket_seconds: float | None = None,
) -> DataFrame:
    """Inner interval join: left rows × right rows with the same ``on`` key
    and ``right_ts ∈ [left_ts − lower, left_ts + upper]``.

    Right columns (except the key) come back prefixed ``r_``. Timestamp
    columns are compared at microsecond precision; numeric time axes pass
    through unchanged.
    """
    if lower_seconds < 0 or upper_seconds < 0:
        raise ValueError("lower_seconds/upper_seconds must be >= 0")
    span = lower_seconds + upper_seconds
    if span <= 0:
        raise ValueError("window must have positive width")

    l_ax, l_scale = _axis(left, left_ts)
    r_ax, r_scale = _axis(right, right_ts)
    if l_scale != r_scale:
        raise ValueError("left/right time axes must both be timestamps or both numeric")
    w = float((bucket_seconds or span) * l_scale)
    lower = float(lower_seconds * l_scale)
    upper = float(upper_seconds * l_scale)

    lo = l_ax - lower
    hi = l_ax + upper
    l_bucketed = left.withColumn("_l_ax", l_ax).withColumn(
        "_bucket",
        F.explode(F.sequence(F.floor(lo / w), F.floor(hi / w))),
    )
    r_prefixed = right.select(
        F.col(on),
        r_ax.alias("_r_ax"),
        F.floor(r_ax / w).alias("_bucket"),
        *[
            F.col(c).alias(f"r_{c}")
            for c in right.columns
            if c != on
        ],
    )
    joined = l_bucketed.join(r_prefixed, [on, "_bucket"]).filter(
        (F.col("_r_ax") >= F.col("_l_ax") - lower)
        & (F.col("_r_ax") <= F.col("_l_ax") + upper)
    )
    return joined.drop("_bucket", "_l_ax", "_r_ax")
