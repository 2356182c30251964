"""Global sort / pagination — SURVEY §2.8 full-sort and sort-limit rows.

Reference parity: BatchExecSort over BinaryExternalSorter (external
merge-sort with spill, flink-table-runtime .../sort/BinaryExternalSorter.
java:68) and BatchExecSortLimit/Limit. Spark's SortExec is the built-in
twin: range-partitioned (sampled split points) so the global sort is
N-way parallel, spilling via UnsafeExternalSorter — nothing to build.

The pagination query validates ORDER semantics through the driver's
order-insensitive compare: the selected page CONTENTS depend on the global
order, so a wrong sort yields a different row set and fails the hash.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from apache_flink_spark.queries._util import t
from apache_flink_spark.queries.registry import query


@query(
    "sort_global_paginate",
    oracle="""
    SELECT o_orderkey, o_totalprice, o_orderpriority
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100 OFFSET 50
    """,
)
def sort_global_paginate(spark, sf_dir):
    """Global external sort + limit/offset pagination. Catalyst plans
    TakeOrderedAndProject for the limit path (per-partition top-150 then a
    driver-side merge — never a full global sort for a bounded page)."""
    o = t(spark, sf_dir, "orders")
    return (
        o.orderBy(F.desc("o_totalprice"), "o_orderkey")
        .offset(50)
        .limit(100)
        .select("o_orderkey", "o_totalprice", "o_orderpriority")
    )


@query(
    "sort_topk_per_engine",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
)
def sort_topk_per_engine(spark, sf_dir):
    """Sort-limit / Top-K (SortLimitOperator.java:37):
    TakeOrderedAndProjectExec — O(k) heap per partition + merge, the only
    sane global-top-k at 100 TB."""
    o = t(spark, sf_dir, "orders")
    return (
        o.orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(10)
        .select("o_orderkey", "o_totalprice")
    )
