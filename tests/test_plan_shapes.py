"""Physical-plan regression tests — the scale posture, asserted.

These lock in the properties that make the queries survive a 100 TB
scale-up: filters and projections reach the parquet scan, dimension joins
broadcast, and no operator silently degrades to a cartesian/nested-loop
product. A refactor that breaks one of these fails here long before it
shows up as a 10× bench regression.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

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


def test_new_relational_queries_plan_shapes(spark):
    # Q7-like: both nation dims broadcast, no cartesian
    plan = _plan(spark, "nation_trade_volume")
    assert plan.count("BroadcastHashJoin") >= 2, plan[:500]
    assert "CartesianProduct" not in plan
    # Q18-like: the IN+HAVING decorrelates to a semi join
    plan = _plan(spark, "large_quantity_orders")
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan
    # Q21-like: EXISTS/NOT EXISTS become semi/anti, never nested-loop over facts
    plan = _plan(spark, "lonely_late_suppliers")
    assert "LeftSemi" in plan and "LeftAnti" in plan
    assert "CartesianProduct" not in plan
    # Q22-like: anti join present; the scalar-avg side is a 1-row broadcast
    plan = _plan(spark, "rich_idle_customers")
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan
    # Q2-like: min-subquery decorrelated to aggregate + equi-join
    plan = _plan(spark, "min_cost_part_supplier")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_chunking_is_map_only(spark):
    # one pass: no Exchange (shuffle) anywhere in the chunk plan
    plan = _plan(spark, "doc_token_chunks")
    assert "Exchange" not in plan, plan[:800]


def test_rollup_cube_single_expand(spark):
    for name in ("order_priority_rollup", "order_status_cube"):
        plan = _plan(spark, name)
        assert plan.count("Expand") >= 1, name
        assert "CartesianProduct" not in plan, name


@pytest.mark.parametrize(
    "name",
    ["llm_data_pipeline_e2e", "dedup_keep_best", "session_funnel_conversion",
     "doc_stratified_sample", "doc_context_packing", "customer_segment_scd2"],
)
def test_round2_compositions_no_cartesian(spark, name):
    plan = _plan(spark, name)
    assert "CartesianProduct" not in plan, name
    assert "BroadcastNestedLoopJoin" not in plan, name


def test_context_packing_no_single_stratum_window(spark):
    # The corpus-sized cumsum must partition by (lang, shard) — a window
    # partitioned by lang alone serializes each language into one task.
    # Only the tiny per-shard-totals window (over the aggregated table)
    # may partition by lang alone; it sits above an Aggregate, which the
    # sort-spec check below distinguishes via the _shard ordering column.
    plan = _plan(spark, "doc_context_packing")
    import re
    windows = re.findall(r"Window \[[^\n]*", plan)
    assert windows, plan[:500]
    big = [w for w in windows if "doc_id" in w and "windowspecdefinition" in w]
    assert big, windows
    for w in big:
        assert "_shard" in w, w  # corpus window is sharded


def test_decontaminate_broadcasts_holdout(spark):
    # The corpus side must NOT shuffle its grams: the holdout gram set is
    # the broadcast side of the contamination join.
    plan = _plan(spark, "doc_decontaminate")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_mixture_weights_single_agg_pass(spark):
    plan = _plan(spark, "doc_mixture_weights")
    # one corpus aggregation + a broadcast 1-row total; no corpus re-scan
    assert plan.count("FileScan parquet") == 1, plan[:600]


def test_export_order_rotation():
    # Rotation is a pure permutation of the registry; the env flag disables
    # reading driver artifacts and restores definition order verbatim.
    import os
    from elastic_surv_spark.plans import queries as q

    order = q._export_order()
    assert sorted(order) == sorted(q.REGISTRY)

    os.environ["ELASTIC_SURV_SPARK_NO_CERT_ROTATION"] = "1"
    try:
        assert q._export_order() == list(q.REGISTRY)
    finally:
        del os.environ["ELASTIC_SURV_SPARK_NO_CERT_ROTATION"]

    # Among all-green queries, less-recently-certified must sort earlier —
    # except ACTIVE plan-changed _RECERT_FIRST rows (not yet re-green since
    # their change round), which jump the stale queue so refactors never
    # ship without fresh certification (ADVICE r6 #3). Expired entries
    # (re-greened in a round >= their change round) rejoin the rotation, so
    # the active set is computed with the same expiry rule the export uses.
    _, latest_green, rounds = q._certification_state()
    active_recert = {
        n
        for n, changed in q._RECERT_FIRST.items()
        if n in latest_green and rounds.get(n, 0) < changed
    }
    greens = [
        n
        for n in order
        if n in latest_green and rounds.get(n) and n not in active_recert
    ]
    certified_rounds = [rounds[n] for n in greens]
    assert certified_rounds == sorted(certified_rounds)

    # Active recert rows precede every stale green row they outrank.
    recert_pos = [order.index(n) for n in active_recert]
    if recert_pos and greens:
        assert max(recert_pos) < order.index(greens[0])


def test_blocked_cosine_kernel_is_single_exchange_no_join(spark):
    # the vectorized near-dup kernel must shuffle each block ONCE to its
    # grouped-apply task — no pair join, no cartesian, no second exchange
    plan = _plan(spark, "embedding_near_dupes")
    assert "FlatMapGroupsInPandas" in plan
    assert "Join" not in plan
    assert plan.count("Exchange") - plan.count("ReusedExchange") == 1, plan


def test_simhash_signature_is_codegen_aggregate_not_interpreted_fold(spark):
    # r4's board-slowest query ran the signature as an interpreted per-row
    # aggregate/zip_with fold; the rewrite must keep it a codegen'd
    # hash-aggregate over exploded token hashes
    plan = _plan(spark, "simhash_near_dupes")
    # array_repeat(0, 64) was the interpreted fold's vote accumulator; the
    # shingle tokenizer's small zip_with remains, so key on the fold marker
    assert "array_repeat" not in plan
    assert "HashAggregate" in plan and "Generate explode" in plan


def test_wide_simhash_certification_is_one_pass(spark):
    # the three outputs must come from ONE aggregation over one full-outer
    # join — a per-check exceptAll formulation would show one aggregation
    # per boolean stitched together by crossJoins (and re-execute the
    # wide/exact subtrees per branch)
    plan = _plan(spark, "simhash_near_dupes_wide")
    assert "FullOuter" in plan
    assert "CartesianProduct" not in plan
    # exactly one global (keyless) aggregation pair: partial + final
    assert plan.count("HashAggregate(keys=[]") == 2, plan.count(
        "HashAggregate(keys=[]"
    )


def test_new_tpch_patterns_broadcast_and_no_cartesian(spark):
    for name in ("part_profit_by_nation_year", "disjunctive_part_revenue"):
        plan = _plan(spark, name)
        assert "BroadcastHashJoin" in plan, name
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_q13_left_outer_preserved(spark):
    # the priority filter must ride the join condition; a WHERE would make
    # the optimizer rewrite the outer join inner and drop zero-order
    # customers from the histogram
    plan = _plan(spark, "customer_order_distribution")
    assert "LeftOuter" in plan


# Global (unpartitioned) windows move ALL input to one task — fatal on raw
# rows at scale, deliberate on tiny aggregated inputs. These queries run a
# global window over a bounded post-aggregate domain, each documented at its
# site; anything NOT listed here that plans one is a regression.
# Whitelisted global (unpartitioned) windows. EVERY entry must run over a
# post-aggregate domain whose row count is bounded INDEPENDENT of input
# size — name the bound here AND in the plan's docstring in
# plans/queries.py (grep the query name) so a review can cross-check both;
# an entry without a stated bound is a lint escape, not an exemption.
_GLOBAL_WINDOW_OK = {
    # lag over month-grain aggregate rows: |domain| = #months in the data's
    # date span (~84 at any SF) — see orders_monthly_trend in plans/queries.py
    "orders_monthly_trend",
    # window computes ONE scalar (corpus token total) over source-grain
    # aggregates: |domain| = #sources — see doc_mixture_weights docstring
    "doc_mixture_weights",
    # scalar revenue total over a year-filtered part-grain aggregate:
    # |domain| = #qualifying parts, then one global sum — see
    # important_part_revenue_share docstring
    "important_part_revenue_share",
    # global rank over supplier-grain totals: |domain| = #suppliers (dim
    # table, not fact-scale) — see top_revenue_supplier docstring
    "top_revenue_supplier",
    # top-10 over the adjacent-pair vocabulary aggregate: |domain| =
    # #distinct symbol pairs (vocab-sized) — see bpe_merge_pairs docstring
    "bpe_merge_pairs",
    # second level of a two-level prefix sum: |domain| = 32 shard totals
    # (one row per shuffle partition) — see customer_spend_distribution
    "customer_spend_distribution",
    # same two-level prefix-sum pattern: |domain| = shard-total rows —
    # see doc_budget_selection / operators/prefix.py
    "doc_budget_selection",
}


def _trailing_bracket_groups(line: str) -> list[str]:
    """Peel `[...]` groups off the END of a plan line by backward bracket
    balance, stopping at the window-expression list (the group containing
    `windowspecdefinition`). Robust to parentheses/brackets INSIDE a group
    (e.g. `[coalesce(t#2, 0) ASC NULLS FIRST]`), which anchor-on-last-paren
    parsing misclassifies."""
    s = line.rstrip()
    groups: list[str] = []
    while s.endswith("]"):
        depth, i = 0, len(s) - 1
        while i >= 0:
            if s[i] == "]":
                depth += 1
            elif s[i] == "[":
                depth -= 1
                if depth == 0:
                    break
            i -= 1
        if i < 0:
            break
        group = s[i + 1 : -1]
        if "windowspecdefinition" in group:
            break  # reached the expr list — everything after it was a spec
        groups.append(group)
        s = s[:i].rstrip().rstrip(",").rstrip()
    groups.reverse()
    return groups


def _window_partition_group(line: str) -> str | None:
    """The partition-spec bracket group of a Window plan line, or None if
    the window is unpartitioned (that case belongs to
    :func:`_unpartitioned_windows`). Shapes per _unpartitioned_windows."""
    groups = _trailing_bracket_groups(line)
    if len(groups) == 2:
        return groups[0]
    if len(groups) == 1 and not ("ASC" in groups[0] or "DESC" in groups[0]):
        return groups[0]
    return None


#: project items that are plain literals aliased to a column: no column
#: refs (#), no function calls — e.g. `__all__ AS segment#12`, `1 AS k#3`.
_LITERAL_ALIAS = re.compile(r"(?:\[|, )\s*([^,\[\]()#]+?) AS (\w+)#\d+")


def _literal_partition_windows(plan: str) -> list[str]:
    """Window nodes partitioned by a column that is fed by a LITERAL
    projection with no aggregate in between — the `__all__` synthetic-
    segment trap (VERDICT r12 #1): the window LOOKS partitioned, passing
    the global-window lint, but the literal-valued branch funnels every
    row of that branch into ONE partition, so the window is corpus-sized
    there. An aggregate between the window and the literal projection
    breaks the trap (the window then runs over the aggregate's bounded
    domain — the certified_quality_eval fix). Heuristic over the printed
    tree: for each partitioned Window line, scan the lines BELOW it
    (children print below parents) for a literal aliased to one of the
    partition column names; aggregate lines seen before the literal clear
    the flag. Sibling subtrees printed below can in principle mask or
    over-flag — acceptable for a lint whose registry hits are reviewed by
    name against the whitelist."""
    lines = plan.splitlines()
    bad = []
    for i, line in enumerate(lines):
        if not re.search(r"\bWindow \[", line):
            continue
        part = _window_partition_group(line)
        if part is None:
            continue
        pnames = set(re.findall(r"(\w+)#\d+", part))
        for below in lines[i + 1 :]:
            if re.search(r"(HashAggregate|SortAggregate|ObjectHashAggregate)", below):
                break  # bounded domain between window and anything deeper
            for m in _LITERAL_ALIAS.finditer(below):
                if m.group(2) in pnames:
                    bad.append(
                        f"partition col {m.group(2)} <- literal "
                        f"{m.group(1).strip()!r}: {line.strip()[:120]}"
                    )
    return bad


#: windows partitioned by a literal-fed column, reviewed and safe: every
#: entry must state WHY the literal-valued partition stays bounded.
_LITERAL_PARTITION_WINDOW_OK: set[str] = set()


def _unpartitioned_windows(plan: str) -> list[str]:
    """Window nodes whose partition spec is empty (the WindowExec
    single-partition warning). Physical print shapes: trailing bracket
    groups after the expr list are [partition], [order] — both present when
    partitioned+ordered, only a no-ASC/DESC group when partitioned-
    unordered, only an ASC/DESC group when UNpartitioned-ordered, and no
    group at all when fully global."""
    import re

    bad = []
    for line in plan.splitlines():
        if not re.search(r"\bWindow \[", line):
            continue
        groups = _trailing_bracket_groups(line)
        if not groups or (
            len(groups) == 1 and ("ASC" in groups[0] or "DESC" in groups[0])
        ):
            bad.append(line.strip()[:160])
    return bad


# every batch query in the registry, one sweep: nothing may plan a true
# cartesian product (all-pairs work), and nothing outside the documented
# whitelist may plan a global window (single-task sort of its whole input).
# Stream queries are excluded (their fn drives a streaming harness, not a
# single batch plan) and the eager BPE trainer too (its result is a literal
# merge list, not a plan).
def test_registry_sweep_no_cartesian_or_rogue_global_window(spark):
    skipped, checked = [], 0
    global_window, literal_window = set(), set()
    for name, spec in REGISTRY.items():
        if "_stream" in name or name == "doc_bpe_learned_merges":
            skipped.append(name)
            continue
        plan = _plan(spark, name)
        assert "CartesianProduct" not in plan, f"{name} plans a cartesian product"
        if _unpartitioned_windows(plan):
            global_window.add(name)
        if _literal_partition_windows(plan):
            literal_window.add(name)
        checked += 1
    # the sweep really covers the registry: only streaming rows and the
    # eager BPE trainer may be skipped
    assert checked + len(skipped) == len(REGISTRY)
    assert len(skipped) <= 10, skipped
    assert global_window <= _GLOBAL_WINDOW_OK, (
        f"undocumented global window in {sorted(global_window - _GLOBAL_WINDOW_OK)}"
    )
    assert literal_window <= _LITERAL_PARTITION_WINDOW_OK, (
        "window partitioned by a literal-fed column (one partition holds "
        f"that branch's every row) in "
        f"{sorted(literal_window - _LITERAL_PARTITION_WINDOW_OK)}"
    )


def test_literal_partition_lint_catches_the_r12_eval_shape(spark):
    """The literal-partition lint must flag the exact shape VERDICT r12 #1
    found: a per-ROW window partitioned by a union-fed segment column one
    of whose branches is a literal (`__all__`) — every row lands in that
    one partition. The fixed certified_quality_eval plan (window over the
    bounded (segment, score) aggregate) must pass the same lint."""
    from pyspark.sql import Window

    df = spark.range(100).select(
        F.col("id"),
        (F.col("id") % 3).cast("string").alias("segment"),
        (F.col("id") % 7).cast("double").alias("score"),
    )
    uni = df.unionByName(
        df.select("id", F.lit("__all__").alias("segment"), "score")
    )
    broken = uni.withColumn(
        "r", F.rank().over(Window.partitionBy("segment").orderBy("score"))
    )
    plan = broken._jdf.queryExecution().executedPlan().toString()
    assert _literal_partition_windows(plan), "lint missed the r12 shape"

    fixed = (
        uni.groupBy("segment", "score")
        .agg(F.count("*").alias("c"))
        .withColumn(
            "r", F.rank().over(Window.partitionBy("segment").orderBy("score"))
        )
    )
    plan_fixed = fixed._jdf.queryExecution().executedPlan().toString()
    assert not _literal_partition_windows(plan_fixed), plan_fixed


def test_similar_part_names_candidates_blocked_on_segments(spark):
    # r5 flagged the fuzzy-match blocking key: p_brand has 25 values at
    # EVERY scale factor, so within-block candidate pairs grew O(n²). The
    # rewrite must (a) generate candidates from the PassJoin segment-key
    # equality join over the distinct-name dictionary — the equi-join keys
    # include the segment text, never brand alone — and (b) keep the
    # thresholded codegen levenshtein kernel (no UDF).
    plan = _plan(spark, "similar_part_names")
    import re

    # the candidate join is keyed on (target_len, slot, segment_text)
    assert re.search(r"HashJoin \[n#\d+, slot#\d+, txt#\d+\]", plan), plan[:800]
    # no join keyed on brand alone (brand appears only in the final
    # id-expansion join alongside the name equality)
    for m in re.finditer(r"HashJoin \[([^\]]*)\], \[([^\]]*)\]", plan):
        left = m.group(1)
        if "brand" in left:
            assert "name" in left or "n2" in left, f"brand-only join: {m.group(0)}"
    assert "levenshtein" in plan and "Some(2)" in plan  # thresholded kernel
    assert "Python" not in plan  # no UDF anywhere


def test_similar_part_names_candidate_volume_sub_quadratic(spark):
    # Property companion to the plan assertion: candidate work must track
    # the distinct-name dictionary, not corpus rows². At sf0.001 the
    # dictionary is tiny, so verified name pairs must be well under
    # dictionary² while the id-level output still expands per brand.
    from pyspark.sql import functions as F

    from elastic_surv_spark.sources.parquet import load_table

    sf = SF
    p = load_table(spark, sf, "part")
    n_names = p.select("p_name").distinct().count()
    out = REGISTRY["similar_part_names"].fn(spark, sf)
    name_pairs = out.select("name_a", "name_b").distinct().count()
    # every output name pair is within edit distance 2 (verified), and the
    # pair count is bounded by the dictionary's true near-dup pairs — far
    # below the all-pairs square
    assert name_pairs <= n_names * (n_names - 1) / 4


def test_affinity_pairs_basket_join_and_broadcast_dims(spark):
    # candidate pairs come from an equi-join keyed on l_orderkey — work is
    # Σ C(basket, 2), linear in orders for bounded baskets — and the
    # per-part counts + 1-row order total ride in as broadcasts, so the
    # only sized shuffles are the distinct and the pair aggregate
    plan = _plan(spark, "part_affinity_pairs")
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastHashJoin") >= 2, plan.count("BroadcastHashJoin")
    # the shared distinct (order, part) frame is a lazy checkpoint (r12:
    # three consumers, one scan), so the pruned scan sits in the
    # checkpoint's SOURCE plan, not the outer one — assert it on the same
    # projection the query feeds the checkpoint
    from elastic_surv_spark.sources.parquet import load_table

    src = (
        load_table(spark, SF, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    src_plan = src._jdf.queryExecution().executedPlan().toString()
    assert "ReadSchema: struct<l_orderkey:bigint,l_partkey:bigint>" in src_plan


def test_rfm_thresholds_broadcast_once(spark):
    # the three medians collapse to ONE keyless percentile aggregate that
    # broadcasts back onto the per-customer rows; segment labeling is then
    # map-side and the final aggregate has ≤ 8 groups — customer rows never
    # shuffle on anything but o_custkey
    plan = _plan(spark, "customer_rfm_segments")
    assert plan.count("Exchange SinglePartition") == 1, plan
    assert "IdentityBroadcastMode" in plan
    assert plan.count("Exchange hashpartitioning(o_custkey") == 2  # cust + its threshold twin
    assert "CartesianProduct" not in plan
