"""Gap-based sessionization as a window-function composition.

The reference has no streaming operators (SURVEY §2.10); this is the batch
form of the `events` north-star surface. Classic pattern: a session boundary
is a row whose gap to the previous row (per user) exceeds ``gap``; session id
is the running count of boundaries.

Scale: one shuffle on ``user_col`` (the window partition key). No skew issue
unless a single user dominates; for that case pre-split hot users by day and
re-merge sessions crossing the split boundary (documented, not needed at
harness scale). All expressions are JVM-side — whole-stage codegen, no UDFs.

The streaming variant (``F.session_window`` with watermarks) lives in
``elastic_surv_spark.streaming.windows``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Assign a per-user ``session_id`` (1-based) to every row.

    Ordering ties on ``ts_col`` are broken by ``id_col`` so the assignment is
    deterministic (required for the duckdb oracle hash-match).
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    us = F.unix_micros(F.col(ts_col))
    gap_us = gap_seconds * 1_000_000
    new_sess = (
        F.when(F.lag(us).over(w).isNull(), F.lit(1))
        .when(us - F.lag(us).over(w) > F.lit(gap_us), F.lit(1))
        .otherwise(F.lit(0))
    )
    running = Window.partitionBy(user_col).orderBy(ts_col, id_col).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return df.withColumn("_new_sess", new_sess).withColumn(
        "session_id", F.sum("_new_sess").over(running).cast("long")
    ).drop("_new_sess")


def session_stats(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Per-session aggregates over the sessionized stream."""
    s = sessionize(df, user_col, ts_col, id_col, gap_seconds)
    return s.groupBy(user_col, "session_id").agg(
        F.count("*").alias("n_events"),
        F.min(F.unix_micros(F.col(ts_col))).alias("session_start_us"),
        F.max(F.unix_micros(F.col(ts_col))).alias("session_end_us"),
        F.round(F.sum(F.col(value_col).cast("decimal(18,6)")), 4)
        .cast("double")
        .alias("sum_value"),
    )
