"""Aggregation operator inventory.

Reference parity (SURVEY.md §2.4): BatchExecHashAggregate/SortAggregate,
distinct-agg split, grouping sets/cube/rollup via the Expand node
(DecomposeGroupingSetsRule), and the built-in agg function set
(flink-table-planner .../functions/aggfunctions/). Catalyst plans
partial+final hash aggregation with the identical spill design — the queries
pin semantics; physical strategy is free.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from apache_flink_spark.queries._util import dec, dround, dsum, t
from apache_flink_spark.queries.registry import query


@query(
    "agg_distinct_count",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS n_parts,
           COUNT(DISTINCT l_suppkey) AS n_supps,
           COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_distinct_count(spark, sf_dir):
    """Multi-distinct aggregation — Catalyst plans the same two-level Expand
    rewrite as the reference's SplitAggregateRule (SURVEY.md §4.2)."""
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@query(
    "agg_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
           CAST(GROUPING(l_linestatus) AS INT) AS g_ls,
           COUNT(*) AS n,
           CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(12,4))), 2) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    """,
)
def agg_grouping_sets(spark, sf_dir):
    """GROUPING SETS -> Expand (reference StreamExecExpand /
    DecomposeGroupingSetsRule; Catalyst Expand node, identical design)."""
    t(spark, sf_dir, "lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(grouping(l_returnflag) AS INT) AS g_rf,
               CAST(grouping(l_linestatus) AS INT) AS g_ls,
               COUNT(*) AS n,
               CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(12,4))), 2) AS DOUBLE) AS sum_qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        """
    )


@query(
    "agg_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def agg_rollup(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n")
    )


@query(
    "agg_cube",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def agg_cube(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n")
    )


@query(
    "agg_minmax_argmax",
    oracle="""
    SELECT a.c_nationkey,
           a.min_bal, a.max_bal, a.first_name,
           b.c_name AS richest_customer
    FROM (SELECT c_nationkey,
                 MIN(c_acctbal) AS min_bal,
                 MAX(c_acctbal) AS max_bal,
                 MIN(c_name) AS first_name
          FROM customer GROUP BY c_nationkey) a
    JOIN (SELECT c_nationkey, c_name,
                 ROW_NUMBER() OVER (PARTITION BY c_nationkey
                                    ORDER BY c_acctbal DESC, c_custkey DESC) AS rn
          FROM customer) b
      ON a.c_nationkey = b.c_nationkey AND b.rn = 1
    """,
)
def agg_minmax_argmax(spark, sf_dir):
    """MIN/MAX (exact on doubles — no accumulation) + ARG_MAX with a unique
    tie-break (reference MaxWithRetractAggFunction / FirstValue family)."""
    c = t(spark, sf_dir, "customer")
    return c.groupBy("c_nationkey").agg(
        F.min("c_acctbal").alias("min_bal"),
        F.max("c_acctbal").alias("max_bal"),
        F.min("c_name").alias("first_name"),
        F.max_by("c_name", F.struct("c_acctbal", "c_custkey")).alias(
            "richest_customer"
        ),
    )


@query(
    "agg_stddev_manual",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n,
           CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(12,4))), 2) AS DOUBLE) AS s1,
           CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(12,4)) * CAST(l_quantity AS DECIMAL(12,4))), 2) AS DOUBLE) AS s2,
           SQRT((CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(12,4)) * CAST(l_quantity AS DECIMAL(12,4))), 2) AS DOUBLE)
                 - CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(12,4))), 2) AS DOUBLE)
                   * CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(12,4))), 2) AS DOUBLE) / COUNT(*))
                / (COUNT(*) - 1)) AS stddev_qty
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_stddev_manual(spark, sf_dir):
    """STDDEV decomposed into exact decimal sums (reference
    AGGREGATE_REDUCE_FUNCTIONS does the same STDDEV->SUM/COUNT rewrite,
    SURVEY.md §4.2) — built-in stddev would be float-order-dependent and
    unhashable across engines; this form is deterministic."""
    li = t(spark, sf_dir, "lineitem")
    q = dec("l_quantity")
    g = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        dround(F.sum(q)).alias("s1"),
        dround(F.sum(q * q)).alias("s2"),
    )
    return g.select(
        "l_returnflag",
        "n",
        "s1",
        "s2",
        F.sqrt((F.col("s2") - F.col("s1") * F.col("s1") / F.col("n")) / (F.col("n") - 1)).alias(
            "stddev_qty"
        ),
    )


@query(
    "agg_listagg_sorted",
    oracle="""
    SELECT n_regionkey, STRING_AGG(n_name, ',' ORDER BY n_name) AS nations
    FROM nation
    GROUP BY n_regionkey
    """,
)
def agg_listagg_sorted(spark, sf_dir):
    """LISTAGG / collect with deterministic order (reference
    ListAggWithRetractAggFunction, CollectAggFunction) — Spark collect_list is
    order-nondeterministic, so sort_array pins it."""
    n = t(spark, sf_dir, "nation")
    return n.groupBy("n_regionkey").agg(
        F.array_join(F.sort_array(F.collect_list("n_name")), ",").alias("nations")
    )


@query("agg_approx_count_distinct")  # no oracle: HLL sketches differ per engine
def agg_approx_count_distinct(spark, sf_dir):
    """APPROX_COUNT_DISTINCT — HyperLogLog++ in both the reference
    (flink-table-runtime .../hyperloglog/HyperLogLogPlusPlus.java:26) and
    Spark; sketch estimates aren't cross-engine comparable, so this is a
    rows-only declared query."""
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
        F.countDistinct("l_partkey").alias("exact_parts"),
    )


@query(
    "agg_having_filter",
    oracle="""
    SELECT o_custkey, COUNT(*) AS n_orders,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,4))), 2) AS DOUBLE) AS total_spent
    FROM orders
    GROUP BY o_custkey
    HAVING COUNT(*) >= 20
    """,
)
def agg_having_filter(spark, sf_dir):
    """Post-aggregation HAVING filter (Calc above agg in the reference)."""
    o = t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice").alias("total_spent"),
        )
        .where(F.col("n_orders") >= 20)
    )


@query(
    "agg_pivot",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) FILTER (WHERE l_linestatus = 'F') AS status_f,
           COUNT(*) FILTER (WHERE l_linestatus = 'O') AS status_o
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_pivot(spark, sf_dir):
    """PIVOT — conditional aggregation (Expand + agg in both engines)."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.count(F.lit(1)))
        .select(
            "l_returnflag",
            F.coalesce("F", F.lit(0)).alias("status_f"),
            F.coalesce("O", F.lit(0)).alias("status_o"),
        )
    )
