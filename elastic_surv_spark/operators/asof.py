"""As-of (point-in-time) join — a primitive Spark lacks natively.

SURVEY §2.3: the reference has no joins at all; the rebuild needs as-of joins
for the `events` table. Implemented as the single-shuffle union-window plan
rather than a range cross-join:

1. tag right rows (the "quotes") and left rows (the "queries"),
2. union on the shared key/time axis,
3. one window per key ordered by (time, tag) carries the last right value
   forward (``last(..., ignorenulls=True)``),
4. keep left rows.

Cost: ONE shuffle on the key column for the union'd stream — the same cost as
a plain equi-join, independent of time-range density, so it scales to 100 TB
streams (a naive range join is O(|L|·|R|) per key). Ties at identical
timestamps order right-before-left, i.e. a right row at exactly t matches a
left row at t (``<=`` semantics, same as duckdb ASOF JOIN / pd.merge_asof).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_value_cols: list[str] | None = None,
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """For each left row, attach the most recent right row at or before its ts.

    Returns the left rows with ``right_value_cols`` (prefixed ``asof_``)
    from the matched right row, or nulls when no right row precedes.
    """
    right_value_cols = right_value_cols or [
        c for c in right.columns if c not in (on, right_ts)
    ]

    l_tag = left.withColumn("_is_left", F.lit(1)).withColumn(
        "_axis", F.col(left_ts)
    )
    r_proj = right.select(
        F.col(on),
        F.col(right_ts).alias("_axis"),
        F.lit(0).alias("_is_left"),
        *[F.col(c) for c in right_value_cols],
    ).withColumn("_r_ts", F.col("_axis"))

    for c in left.columns:
        if c not in r_proj.columns:
            r_proj = r_proj.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    for c in right_value_cols + ["_r_ts"]:
        if c not in l_tag.columns:
            l_tag = l_tag.withColumn(c, F.lit(None).cast(dict(r_proj.dtypes)[c]))

    cols = [on, "_axis", "_is_left", "_r_ts", *right_value_cols] + [
        c for c in left.columns if c not in (on, "_is_left", "_axis")
    ]
    unioned = l_tag.select(*cols).unionByName(r_proj.select(*cols))

    # right rows (_is_left=0) sort before left rows at the same instant
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("_axis"), F.col("_is_left"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.select(
        *[c for c in unioned.columns if c not in right_value_cols and c != "_r_ts"],
        F.last("_r_ts", ignorenulls=True).over(w).alias("_asof_ts"),
        *[
            F.last(c, ignorenulls=True).over(w).alias(f"asof_{c}")
            for c in right_value_cols
        ],
    )
    out = carried.filter(F.col("_is_left") == 1).drop("_is_left", "_axis")
    if tolerance_seconds is not None:
        within = (
            F.unix_micros(F.col(left_ts)) - F.unix_micros(F.col("_asof_ts"))
        ) <= tolerance_seconds * 1_000_000
        out = out.select(
            *[c for c in out.columns if not c.startswith("asof_") and c != "_asof_ts"],
            F.col("_asof_ts"),
            *[
                F.when(within, F.col(f"asof_{c}")).alias(f"asof_{c}")
                for c in right_value_cols
            ],
        )
    return out.withColumnRenamed("_asof_ts", f"asof_{right_ts}")
