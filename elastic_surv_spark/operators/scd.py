"""Slowly-changing-dimension (type 2) merge — incremental pipeline surface.

Training-data pipelines re-ingest dimension snapshots continually; SCD2
keeps full attribute history as (key, attrs…, valid_from, valid_to) rows
with NULL valid_to marking the open version. ``scd2_apply`` merges an
update batch into the history:

- open rows whose tracked attributes CHANGED close at the update's
  effective time and a new open version is inserted;
- unchanged keys pass through untouched;
- unseen keys insert as brand-new open rows;
- already-closed history rows are immutable.

Plan shape: ONE equi-join on the business key (broadcast when the update
batch is small — the common case; bucket both sides on the key at warehouse
scale for a shuffle-free merge), then map-side projections and a union —
no window, no global sort, no driver state. This is exactly the MERGE INTO
pattern lakehouse table formats run; expressed here over plain DataFrames
so any sink (parquet dirs, Delta, Iceberg) can land it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def scd2_apply(
    dim: DataFrame,
    updates: DataFrame,
    key: str,
    attrs: list[str],
    eff_col: str = "effective_ts",
    from_col: str = "valid_from",
    to_col: str = "valid_to",
) -> DataFrame:
    """Merged SCD2 history (same schema as ``dim``).

    ``dim``: (key, *attrs, valid_from, valid_to) with NULL valid_to = open.
    ``updates``: (key, *attrs, eff_col) — at most one row per key.
    Attribute comparison is null-safe; an update identical to the open
    version is a no-op for that key.
    """
    out_cols = [key, *attrs, from_col, to_col]
    closed = dim.filter(F.col(to_col).isNotNull()).select(*out_cols)
    # explicit presence flag: detecting join-side presence via a data column
    # (e.g. valid_from IS NOT NULL) would silently drop open rows whose
    # valid_from is legitimately NULL ("since forever" initial loads)
    open_rows = dim.filter(F.col(to_col).isNull()).withColumn("_open", F.lit(True))

    upd = updates.select(
        F.col(key),
        *[F.col(a).alias(f"_u_{a}") for a in attrs],
        F.col(eff_col).alias("_u_eff"),
        F.lit(True).alias("_upd"),
    )
    joined = open_rows.join(upd, key, "full_outer")

    has_open = F.col("_open").isNotNull()
    has_upd = F.col("_upd").isNotNull()
    diff = F.lit(False)
    for a in attrs:
        diff = diff | ~F.col(a).eqNullSafe(F.col(f"_u_{a}"))
    changed = has_open & has_upd & diff

    # open rows that survive unchanged (no update, or identical update)
    survive = joined.filter(has_open & ~changed).select(*out_cols)
    # changed: the old version closes at the effective time…
    close_out = joined.filter(changed).select(
        F.col(key), *attrs, F.col(from_col), F.col("_u_eff").alias(to_col)
    )
    # …and the update becomes the new open version; brand-new keys likewise
    insert = joined.filter(changed | (has_upd & ~has_open)).select(
        F.col(key),
        *[F.col(f"_u_{a}").alias(a) for a in attrs],
        F.col("_u_eff").alias(from_col),
        F.lit(None).cast(dim.schema[to_col].dataType).alias(to_col),
    )
    return closed.unionByName(survive).unionByName(close_out).unionByName(insert)
