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


def _as_micros(df: DataFrame, col: str) -> F.Column:
    dt = df.schema[col].dataType
    if isinstance(dt, T.TimestampType):
        return F.unix_micros(F.col(col))
    return F.col(col).cast("long")


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
    w_us = int((bucket_seconds or span) * 1_000_000)

    l_us = _as_micros(left, left_ts)
    r_us = _as_micros(right, right_ts)

    lo = l_us - int(lower_seconds * 1_000_000)
    hi = l_us + int(upper_seconds * 1_000_000)
    l_bucketed = left.withColumn("_l_us", l_us).withColumn(
        "_bucket",
        F.explode(F.sequence(F.floor(lo / w_us), F.floor(hi / w_us))),
    )
    r_prefixed = right.select(
        F.col(on),
        r_us.alias("_r_us"),
        F.floor(r_us / w_us).alias("_bucket"),
        *[
            F.col(c).alias(f"r_{c}")
            for c in right.columns
            if c != on
        ],
    )
    joined = l_bucketed.join(r_prefixed, [on, "_bucket"]).filter(
        (F.col("_r_us") >= F.col("_l_us") - int(lower_seconds * 1_000_000))
        & (F.col("_r_us") <= F.col("_l_us") + int(upper_seconds * 1_000_000))
    )
    return joined.drop("_bucket", "_l_us", "_r_us")
