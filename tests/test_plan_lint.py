"""Repo-wide physical-plan lint: no ACCIDENTAL all-pairs join shapes.

A CartesianProduct or BroadcastNestedLoopJoin is O(|L|x|R|) compare work —
the single most common way a correct-at-sf0.01 plan dies at 100 TB (the r1
verdict's sim_embedding_neardup finding). Every batch query's executed plan
is checked; the whitelist names the operators where a nested-loop shape is
the OPERATOR ITSELF or is provably bounded — and still constrains WHICH
shape is allowed, so a regression from a bounded broadcast loop to a full
cartesian fails even on whitelisted queries.
"""

from __future__ import annotations

import pytest

from apache_flink_spark.queries import QUERIES
from apache_flink_spark.queries.registry import STREAMING

_PATTERNS = ("CartesianProduct", "BroadcastNestedLoopJoin")

# name -> (why a nested-loop shape is correct there, allowed shapes).
# BroadcastNestedLoopJoin-only entries are justified by a BOUNDED broadcast
# side; a CartesianProduct there means the bounded side stopped being
# broadcast and the justification no longer holds.
_WHITELIST = {
    "join_cross": (
        "cross join operator",
        {"CartesianProduct", "BroadcastNestedLoopJoin"},
    ),
    "join_theta_nonequi": (
        "theta (non-equi) join operator",
        {"CartesianProduct", "BroadcastNestedLoopJoin"},
    ),
    "pipeline_domain_mix": (
        "attaches a SINGLE-ROW global-totals relation",
        {"BroadcastNestedLoopJoin"},
    ),
    "sim_bruteforce_topk": (
        "deliberate exactness baseline; tiny broadcast query set",
        {"BroadcastNestedLoopJoin"},
    ),
    "pipeline_kmeans_assign": (
        "K-row centroid set broadcasts against the corpus — the k-means "
        "assignment shape; fan-out is K per vector, never corpus^2",
        {"BroadcastNestedLoopJoin"},
    ),
    "sim_lsh_recall": (
        "the exact-baseline arm is the deliberate brute-force broadcast "
        "of the 20-query probe set (recall evaluation needs ground truth)",
        {"BroadcastNestedLoopJoin"},
    ),
    "text_tfidf_topterms": (
        "corpus size attaches as a SINGLE-ROW broadcast aggregate "
        "(the oracle's CROSS JOIN n)",
        {"BroadcastNestedLoopJoin"},
    ),
    "sim_semdedup": (
        "same broadcast K-row centroid assignment shape as "
        "pipeline_kmeans_assign; the dedup pair join itself is an "
        "equi-join on centroid_id",
        {"BroadcastNestedLoopJoin"},
    ),
    "graph_hits": (
        "per-round normalization attaches a SINGLE-ROW global-max "
        "aggregate (the oracle's scalar subquery)",
        {"BroadcastNestedLoopJoin"},
    ),
    "pipeline_kmeans_iterate": (
        "same broadcast K-row centroid assignment shape as "
        "pipeline_kmeans_assign, plus the centroid re-aggregation",
        {"BroadcastNestedLoopJoin"},
    ),
    "temporal_join_sql": (
        "documented temporal-SQL rewrite limitation",
        {"BroadcastNestedLoopJoin"},
    ),
    "ds_q28_bucket_stats": (
        "TPC-DS q28 shape: six SINGLE-ROW aggregate subqueries combine "
        "into one row — each broadcast side is exactly one row",
        {"BroadcastNestedLoopJoin"},
    ),
    "ds_q88_hourly_buckets": (
        "TPC-DS q88 shape: eight SINGLE-ROW COUNT subqueries combine "
        "into one row — each broadcast side is exactly one row",
        {"BroadcastNestedLoopJoin"},
    ),
    "ds_q61_promo_ratio": (
        "TPC-DS q61 shape: two SINGLE-ROW scalar aggregates combine "
        "into one ratio row",
        {"BroadcastNestedLoopJoin"},
    ),
    "ds_q24_above_avg_group_sum": (
        "TPC-DS q24 shape: the scale threshold attaches as a SINGLE-ROW "
        "broadcast aggregate (avg group revenue)",
        {"BroadcastNestedLoopJoin"},
    ),
    "ds_q23b_best_customer_channel_union": (
        "TPC-DS q23b shape: the best-customer threshold attaches as a "
        "SINGLE-ROW broadcast aggregate (MAX customer sales)",
        {"BroadcastNestedLoopJoin"},
    ),
    "ds_q23_frequent_best_customers": (
        "TPC-DS q23a shape: the best-customer threshold attaches as a "
        "SINGLE-ROW broadcast aggregate (MAX customer sales)",
        {"BroadcastNestedLoopJoin"},
    ),
    "ds_q9_case_scalar_subqueries": (
        "TPC-DS q9 shape: the fused 15-aggregate stats row (one row) "
        "attaches to the single-row anchor",
        {"BroadcastNestedLoopJoin"},
    ),
    "subq_scalar_agg": (
        "both scalar subqueries attach as ONE single-row broadcast "
        "aggregate",
        {"BroadcastNestedLoopJoin"},
    ),
    "q22_global_sales_opportunity": (
        "both scalar subqueries attach as ONE single-row broadcast "
        "aggregate",
        {"BroadcastNestedLoopJoin"},
    ),
    "ds_q90_am_pm_ratio": (
        "TPC-DS q90 shape: two SINGLE-ROW COUNT subqueries combine "
        "into one ratio row",
        {"BroadcastNestedLoopJoin"},
    ),
}


# r8: multi-branch TPC-DS towers were fused to single-scan builders (the
# Spark analog of the reference's common-subgraph reuse,
# StreamCommonSubGraphBasedOptimizer.scala:47). Pin the fact-scan count so
# a regression back to inlined-CTE re-scans fails: at 100 TB each extra
# lineitem scan is a full re-read of the fact table.
_MAX_FACT_SCANS = {
    "ds_q14b_period_over_period_intersect": 2,  # plans 1 (verdict r7: 8)
    "ds_q14_cross_channel_items": 2,
    "ds_q33_channel_union_agg": 1,
    "ds_q56_channel_union_itemlist": 1,
    "ds_q60_channel_union_by_item": 1,
    "ds_q71_union_time_slots": 1,
    # r8 second wave (was 15/6/8/6/3/6/6/6/4/4/4/4/3/3/3/3/3/1)
    "ds_q9_case_scalar_subqueries": 1,
    "ds_q28_bucket_stats": 1,
    "ds_q4_three_channel_growth_chain": 1,
    "ds_q76_null_channel_union": 1,
    "ds_q77_channel_profit_outer": 1,
    "ds_q78_unreturned_ratio": 2,
    "ds_q80_channel_returns_rollup": 2,
    "ds_q83_return_share_by_channel": 2,
    "ds_q11_yoy_growth": 1,
    "ds_q31_quarterly_share_growth": 1,
    "ds_q47_monthly_deviation": 1,
    "ds_q74_two_channel_growth": 1,
    "ds_q38_three_channel_intersect": 1,
    "ds_q87_except_chain": 1,
    "ds_q58_channel_parity": 1,
    "ds_q57_lag_lead_deviation": 1,
    "q11_important_stock": 1,
    "q18_large_volume_customer": 1,
    "subq_scalar_agg": 2,
    "subq_correlated_scalar": 2,
    # r8 third wave: EXISTS/NOT-EXISTS chains as per-order statistics
    "q21_sole_blame_supplier": 1,
    "ds_q95_exists_chain": 1,
    "ds_q16_exists_not_exists": 1,
    "ds_q94_multi_warehouse_no_returns": 2,
    # EXISTS-disjunction family: per-customer channel-presence flags
    "ds_q10_exists_disjunction": 1,
    "ds_q35_exists_or_exists": 1,
    "ds_q69_store_only_customers": 1,
}

_MAX_EVENT_SCANS = {
    "ds_q88_hourly_buckets": 1,  # was 8
}


@pytest.mark.parametrize(
    "name,table,cap",
    [(n, "lineitem", c) for n, c in sorted(_MAX_FACT_SCANS.items())]
    + [(n, "events", c) for n, c in sorted(_MAX_EVENT_SCANS.items())],
)
def test_fused_towers_scan_fact_once(spark, sf_dir, name, table, cap):
    import re

    plan = (
        QUERIES[name](spark, sf_dir)
        ._jdf.queryExecution().executedPlan().toString()
    )
    scans = len(re.findall(rf"FileScan parquet.*{table}", plan))
    assert scans <= cap, (
        f"{name} re-scans {table} {scans}x (max {cap}) — the "
        "single-scan fusion regressed"
    )


@pytest.mark.parametrize(
    "name",
    [
        # queries whose different-key branches share one persisted
        # intermediate: the TEXTUAL FileScan count is unstable (the
        # InMemoryRelation prints its cached child plan, and cache-hit
        # asymmetries vary with session cache state), so the pin is the
        # presence of the cache read itself
        "ds_q23b_best_customer_channel_union",
        "ds_q23_frequent_best_customers",
        "ds_q75_yoy_decline",
        "ds_q2_week_over_week",
        "text_tfidf_topterms",
        "sim_semdedup",
        "sim_embedding_neardup",
        "sim_lsh_recall",
    ],
)
def test_shared_base_is_cached_not_rescanned(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "InMemoryTableScan" in plan or "InMemoryRelation" in plan


@pytest.mark.parametrize(
    # STREAMING (registry flag, not name prefix): those queries EXECUTE a
    # streaming job when called and return a memory-sink scan — linting
    # that plan costs a full run and covers nothing.
    "name",
    sorted(n for n in QUERIES if n not in STREAMING),
)
def test_no_accidental_allpairs_join(spark, sf_dir, name):
    plan = QUERIES[name](spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    hits = {p for p in _PATTERNS if p in plan}
    if name in _WHITELIST:
        reason, allowed = _WHITELIST[name]
        assert hits <= allowed, (
            f"{name} plans {sorted(hits - allowed)} — beyond its whitelist "
            f"justification ({reason}; allowed: {sorted(allowed)})"
        )
        return
    assert not hits, (
        f"{name} plans {sorted(hits)} — an all-pairs join shape outside "
        "the whitelist; fix the query or justify it in _WHITELIST"
    )
