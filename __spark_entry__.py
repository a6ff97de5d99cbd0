"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke on sf0.001.
``queries()`` — every implemented operator from SURVEY.md §2 (+ north-star).
``oracle_sql()`` — duckdb-equivalent SQL per query for the correctness gate.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from elastic_surv_spark.plans.queries import all_oracles, all_queries  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The capstone composition: quality filter → exact dedup → near-dup
    removal → chunking → per-language corpus stats, fused by Catalyst into
    one plan (plans/queries.py:llm_data_pipeline_e2e)."""
    from elastic_surv_spark.plans.queries import llm_data_pipeline_e2e

    return llm_data_pipeline_e2e(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return all_queries()


def oracle_sql() -> dict[str, str]:
    return all_oracles()
