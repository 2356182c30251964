"""Bucketed co-located joins — exchange elimination.

SURVEY §2.8 exchange row: the reference relies on its planner's distribution
traits to avoid re-shuffles; Spark's equivalent lever is BUCKETED tables —
a fact/fact join on the bucket key plans with ZERO Exchange nodes. At 100 TB
this is the difference between re-shuffling both tables per join and reading
co-located buckets; the layout decision (bucket column + count) is made once
at write time.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def bucketed(spark, sf_dir):
    for name, key in [("lineitem", "l_orderkey"), ("orders", "o_orderkey")]:
        table = f"b_{name}"
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        (
            spark.read.parquet(f"{sf_dir}/{name}.parquet")
            .write.bucketBy(8, key)
            .sortBy(key)
            .mode("overwrite")
            .saveAsTable(table)
        )
    yield
    for name in ["b_lineitem", "b_orders"]:
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_bucketed_join_has_no_exchange(spark, bucketed):
    # merge hint: at test SF the dim fits the broadcast threshold, which
    # would bypass the bucket-join path we're pinning (at 100 TB both
    # sides are fact-sized and SMJ is what the planner picks on its own).
    joined = (
        spark.table("b_lineitem")
        .hint("merge")
        .join(
            spark.table("b_orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    join_section = plan.split("HashAggregate")[-1]
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    assert "Exchange hashpartitioning(l_orderkey" not in plan, (
        "bucketed join should not re-shuffle the fact side"
    )
    assert "Exchange hashpartitioning(o_orderkey" not in plan


def test_bucketed_join_correct(spark, sf_dir, bucketed):
    got = (
        spark.table("b_lineitem")
        .join(spark.table("b_orders"), F.col("l_orderkey") == F.col("o_orderkey"))
        .count()
    )
    want = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .join(
            spark.read.parquet(f"{sf_dir}/orders.parquet"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .count()
    )
    assert got == want
