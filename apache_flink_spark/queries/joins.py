"""Join operator inventory — all 6 reference join types + physical strategies.

Reference parity (SURVEY.md §2.3): FlinkJoinType INNER/LEFT/RIGHT/FULL/SEMI/
ANTI (flink-table-runtime .../join/FlinkJoinType.java:23-28) executed by
HashJoinOperator / SortMergeJoinFunction / nested-loop codegen. Here Catalyst
picks Broadcast/ShuffledHash/SortMergeJoin; the queries pin the semantics and
the scale notes pin the intended physical shape.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from apache_flink_spark.queries._util import dround, dsum, t
from apache_flink_spark.queries.registry import query


@query(
    "join_inner_fact_dim",
    oracle="""
    SELECT n_name, COUNT(*) AS n_customers,
           CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(12,4))), 2) AS DOUBLE) AS total_acctbal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def join_inner_fact_dim(spark, sf_dir):
    """INNER equi-join fact->dim; dim broadcasts (BatchExecHashJoin with
    broadcast distribution in the reference)."""
    c, n = t(spark, sf_dir, "customer"), t(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            dsum("c_acctbal").alias("total_acctbal"),
        )
    )


@query(
    "join_left_outer",
    oracle="""
    SELECT c_custkey, COUNT(o_orderkey) AS n_orders
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey
    """,
)
def join_left_outer(spark, sf_dir):
    """LEFT OUTER: customers with zero orders survive with count 0."""
    c, o = t(spark, sf_dir, "customer"), t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@query(
    "join_right_outer",
    oracle="""
    SELECT n_name, COUNT(s_suppkey) AS n_suppliers
    FROM supplier RIGHT JOIN nation ON s_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def join_right_outer(spark, sf_dir):
    s, n = t(spark, sf_dir, "supplier"), t(spark, sf_dir, "nation")
    return (
        s.join(n, s.s_nationkey == n.n_nationkey, "right")
        .groupBy("n_name")
        .agg(F.count("s_suppkey").alias("n_suppliers"))
    )


@query(
    "join_full_outer",
    oracle="""
    WITH c AS (SELECT c_nationkey AS nk, COUNT(*) AS n_cust FROM customer GROUP BY 1),
         s AS (SELECT s_nationkey AS nk, COUNT(*) AS n_supp FROM supplier GROUP BY 1)
    SELECT COALESCE(c.nk, s.nk) AS nationkey,
           COALESCE(n_cust, 0) AS n_cust,
           COALESCE(n_supp, 0) AS n_supp
    FROM c FULL OUTER JOIN s ON c.nk = s.nk
    """,
)
def join_full_outer(spark, sf_dir):
    """FULL OUTER over two pre-aggregated sides (SortMergeFullOuterJoinIterator
    in the reference; SortMergeJoinExec here — full outer can't broadcast)."""
    cust = (
        t(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    supp = (
        t(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    return (
        cust.join(supp, cust.nk == supp.nk, "full")
        .select(
            F.coalesce(cust.nk, supp.nk).alias("nationkey"),
            F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
            F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
        )
    )


@query(
    "join_left_semi",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderstatus = 'F')
    GROUP BY c_mktsegment
    """,
)
def join_left_semi(spark, sf_dir):
    """SEMI join == EXISTS rewrite (reference StreamingSemiAntiJoinOperator;
    Catalyst RewritePredicateSubquery produces the same LeftSemi)."""
    c, o = t(spark, sf_dir, "customer"), t(spark, sf_dir, "orders")
    finished = o.where(F.col("o_orderstatus") == "F")
    return (
        c.join(finished, c.c_custkey == finished.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "join_left_anti",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY c_mktsegment
    """,
)
def join_left_anti(spark, sf_dir):
    c, o = t(spark, sf_dir, "customer"), t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "join_cross",
    oracle="""
    SELECT r_name, n_name FROM region CROSS JOIN nation
    """,
)
def join_cross(spark, sf_dir):
    """Cross product (BatchExecNestedLoopJoin; BroadcastNestedLoopJoinExec)."""
    r, n = t(spark, sf_dir, "region"), t(spark, sf_dir, "nation")
    return r.crossJoin(n).select("r_name", "n_name")


@query(
    "join_theta_nonequi",
    oracle="""
    SELECT s_name, COUNT(*) AS n_nations
    FROM supplier JOIN nation ON s_nationkey < n_nationkey
    GROUP BY s_name
    """,
)
def join_theta_nonequi(spark, sf_dir):
    """Theta (non-equi) join — nested-loop in both engines; the small side
    broadcasts so there is no shuffle at any scale."""
    s, n = t(spark, sf_dir, "supplier"), t(spark, sf_dir, "nation")
    return (
        s.join(F.broadcast(n), s.s_nationkey < n.n_nationkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("n_nations"))
    )


@query(
    "join_multi_key",
    oracle="""
    SELECT COUNT(*) AS n_pairs
    FROM supplier JOIN customer
      ON s_nationkey = c_nationkey AND s_acctbal < c_acctbal
    """,
)
def join_multi_key(spark, sf_dir):
    """Equi key + residual non-equi predicate (hash join w/ filter)."""
    s, c = t(spark, sf_dir, "supplier"), t(spark, sf_dir, "customer")
    return (
        s.join(
            c,
            (s.s_nationkey == c.c_nationkey) & (s.s_acctbal < c.c_acctbal),
        )
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )
