"""Physical-plan regression tests — the scale posture, asserted.

These lock in the properties that make the queries survive a 100 TB
scale-up: filters and projections reach the parquet scan, dimension joins
broadcast, and no operator silently degrades to a cartesian/nested-loop
product. A refactor that breaks one of these fails here long before it
shows up as a 10× bench regression.
"""

from __future__ import annotations

import pytest

from elastic_surv_spark.plans.queries import REGISTRY

SF = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    df = REGISTRY[name].fn(spark, SF)
    return df._jdf.queryExecution().executedPlan().toString()


def test_pricing_summary_pushes_filter_and_prunes(spark):
    plan = _plan(spark, "pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # projection pruned to the 7 referenced columns — no full-row scan
    assert "l_comment" not in plan
    assert "l_orderkey" not in plan


def test_star_joins_broadcast(spark):
    for name in ("shipping_priority", "local_supplier_volume", "top_customers_per_nation"):
        plan = _plan(spark, name)
        assert "BroadcastHashJoin" in plan, name
        assert "CartesianProduct" not in plan, name


@pytest.mark.parametrize(
    "name",
    [
        "ngram_jaccard_dupes",
        "minhash_lsh_dupes",
        "simhash_near_dupes",
        "embedding_near_dupes",
        "purchase_prior_views_range_join",
        "events_asof_last_view",
    ],
)
def test_no_nested_loop_or_cartesian(spark, name):
    plan = _plan(spark, name)
    assert "CartesianProduct" not in plan, name
    assert "BroadcastNestedLoopJoin" not in plan, name


def test_semi_anti_joins_are_semi_anti(spark):
    assert "LeftSemi" in _plan(spark, "customers_urgent_not_low")
    assert "LeftAnti" in _plan(spark, "customers_without_orders")


def test_rollup_cube_single_expand(spark):
    for name in ("order_priority_rollup", "order_status_cube"):
        plan = _plan(spark, name)
        assert plan.count("Expand") >= 1, name
        assert "CartesianProduct" not in plan, name
