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


def test_distributed_by_ddl_join_no_exchange(spark, sf_dir):
    """FLIP-376 DISTRIBUTED BY DDL (r7): the declared clause must land in
    the native bucket lane — co-bucketed DDL tables join with no Exchange."""
    from apache_flink_spark.queries import QUERIES

    df = QUERIES["ddl_distributed_bucket_join"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "Exchange hashpartitioning(l_orderkey" not in plan
    assert "Exchange hashpartitioning(o_orderkey" not in plan


def test_distributed_by_ddl_guards(spark):
    import pytest as _pytest

    from apache_flink_spark.ddl import DdlError, execute_flink_ddl

    with _pytest.raises(DdlError, match="RANGE"):
        execute_flink_ddl(
            spark,
            "CREATE TABLE dd_r (k BIGINT) DISTRIBUTED BY RANGE(k) INTO 4 "
            "BUCKETS WITH ('connector' = 'filesystem')",
        )
    with _pytest.raises(DdlError, match="not declared"):
        execute_flink_ddl(
            spark,
            "CREATE TABLE dd_c (k BIGINT) DISTRIBUTED BY (nope) INTO 4 "
            "BUCKETS WITH ('connector' = 'filesystem')",
        )
    with _pytest.raises(DdlError, match="explicit columns"):
        execute_flink_ddl(
            spark,
            "CREATE TABLE dd_n (k BIGINT) DISTRIBUTED INTO 4 BUCKETS "
            "WITH ('connector' = 'filesystem')",
        )


def test_distributed_by_show_create_and_drop(spark):
    from apache_flink_spark.environment import TableEnvironment
    from apache_flink_spark.ddl import execute_flink_ddl

    te = TableEnvironment(spark=spark)
    execute_flink_ddl(
        spark,
        "CREATE TABLE dd_s (k BIGINT, v STRING) DISTRIBUTED BY (k) "
        "WITH ('connector' = 'filesystem', 'format' = 'parquet')",
    )
    try:
        ddl = te.sql("SHOW CREATE TABLE dd_s").collect()[0][0]
        assert "DISTRIBUTED BY (k) INTO 16 BUCKETS" in ddl
        spark.sql("INSERT INTO dd_s VALUES (1, 'a'), (2, 'b')")
        te.sql("ALTER TABLE dd_s DROP DISTRIBUTION")
        assert spark.table("dd_s").count() == 2
        # bucket spec gone: Spark's own SHOW CREATE has no CLUSTERED BY
        native = spark.sql("SHOW CREATE TABLE dd_s").collect()[0][0]
        assert "CLUSTERED BY" not in native
    finally:
        spark.sql("DROP TABLE IF EXISTS dd_s")


def test_ctas_distributed_by(spark, sf_dir):
    """FLIP-376 CTAS + distribution: schema from the query, one
    bucket-keyed write, zero-exchange joins afterwards."""
    from apache_flink_spark.catalog import load_tables
    from apache_flink_spark.ddl import DdlError, execute_flink_ddl
    import pytest as _pytest

    load_tables(spark, sf_dir)
    spark.sql("DROP TABLE IF EXISTS ctasd_o")
    execute_flink_ddl(
        spark,
        "CREATE TABLE ctasd_o DISTRIBUTED BY HASH(o_orderkey) INTO 8 "
        "BUCKETS WITH ('connector' = 'filesystem', 'format' = 'parquet') "
        "AS SELECT o_orderkey, o_orderpriority FROM orders",
    )
    try:
        n = spark.table("ctasd_o").count()
        assert n == spark.table("orders").count()
        native = spark.sql("SHOW CREATE TABLE ctasd_o").collect()[0][0]
        assert "CLUSTERED BY" in native
        # plain CTAS over existing errors; CREATE OR REPLACE replaces
        with _pytest.raises(DdlError, match="already exists"):
            execute_flink_ddl(
                spark,
                "CREATE TABLE ctasd_o DISTRIBUTED BY (o_orderkey) WITH "
                "('connector' = 'filesystem') AS SELECT o_orderkey, "
                "o_orderpriority FROM orders",
            )
        execute_flink_ddl(
            spark,
            "CREATE OR REPLACE TABLE ctasd_o DISTRIBUTED BY (o_orderkey) "
            "INTO 4 BUCKETS WITH ('connector' = 'filesystem', 'format' = "
            "'parquet') AS SELECT o_orderkey FROM orders LIMIT 10",
        )
        assert spark.table("ctasd_o").count() == 10
        assert spark.table("ctasd_o").columns == ["o_orderkey"]
    finally:
        spark.sql("DROP TABLE IF EXISTS ctasd_o")
