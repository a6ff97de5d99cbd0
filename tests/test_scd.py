"""SCD2 merge operator: change/no-change/new-key/closed-immutability goldens."""

from __future__ import annotations

import pandas as pd

from elastic_surv_spark.operators.scd import scd2_apply


def test_scd2_apply_golden(spark):
    dim = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": [1, 2, 3, 3],
                "seg": ["A", "B", "OLD", "C"],
                "valid_from": [0.0, 0.0, 0.0, 5.0],
                "valid_to": [None, None, 5.0, None],
            }
        ),
        schema="k long, seg string, valid_from double, valid_to double",
    )
    updates = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": [1, 2, 4],
                "seg": ["A2", "B", "NEW"],  # 1 changes, 2 identical, 4 new
                "effective_ts": [10.0, 10.0, 10.0],
            }
        ),
        schema="k long, seg string, effective_ts double",
    )
    out = scd2_apply(dim, updates, "k", ["seg"]).toPandas()
    rows = {
        (r.k, r.seg, r.valid_from, None if pd.isna(r.valid_to) else r.valid_to)
        for r in out.itertuples()
    }
    assert rows == {
        (1, "A", 0.0, 10.0),    # changed: old version closed
        (1, "A2", 10.0, None),  # changed: new open version
        (2, "B", 0.0, None),    # identical update: untouched
        (3, "OLD", 0.0, 5.0),   # closed history immutable
        (3, "C", 5.0, None),    # open, no update: untouched
        (4, "NEW", 10.0, None), # brand-new key
    }


def test_scd2_null_safe_attr_compare(spark):
    dim = spark.createDataFrame(
        [(1, None, 0.0, None)], "k long, seg string, valid_from double, valid_to double"
    )
    updates = spark.createDataFrame(
        [(1, None, 9.0)], "k long, seg string, effective_ts double"
    )
    out = scd2_apply(dim, updates, "k", ["seg"]).toPandas()
    assert len(out) == 1 and pd.isna(out["valid_to"].iloc[0])  # NULL == NULL: no-op


def test_scd2_null_valid_from_open_row_still_closes(spark):
    # "since forever" open row (valid_from NULL) must close on update, not
    # vanish — presence is detected by a join flag, not a data column
    dim = spark.createDataFrame(
        [(1, "A", None, None)], "k long, seg string, valid_from double, valid_to double"
    )
    updates = spark.createDataFrame(
        [(1, "B", 7.0)], "k long, seg string, effective_ts double"
    )
    out = scd2_apply(dim, updates, "k", ["seg"]).toPandas()
    rows = {
        (r.seg, None if pd.isna(r.valid_from) else r.valid_from,
         None if pd.isna(r.valid_to) else r.valid_to)
        for r in out.itertuples()
    }
    assert rows == {("A", None, 7.0), ("B", 7.0, None)}
