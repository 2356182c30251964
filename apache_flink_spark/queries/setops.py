"""Set operation inventory — UNION [ALL] / INTERSECT [ALL] / EXCEPT [ALL].

Reference parity (SURVEY.md §2.8): StreamExecUnion/BatchExecUnion plus the
Calcite rewrites UNION_TO_DISTINCT, ReplaceIntersectWithSemiJoinRule,
RewriteIntersectAllRule, ReplaceMinusWithAntiJoinRule, RewriteMinusAllRule
(FlinkStreamRuleSets.scala:258,296-299). Catalyst performs the identical
rewrites for DataFrame union/distinct/intersect/exceptAll — no custom code.

Scale note: UNION ALL is shuffle-free (plain concatenation of partitions);
the distinct variants shuffle once on the full row — at 100 TB prefer the
ALL forms + downstream dedup on a key when semantics allow.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from apache_flink_spark.queries._util import t
from apache_flink_spark.queries.registry import query


def _buyers(spark, sf_dir):
    """Customers with an open ('O') order — as (nationkey, mktsegment) pairs."""
    c, o = t(spark, sf_dir, "customer"), t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .where(F.col("o_orderstatus") == "O")
        .select("c_nationkey", "c_mktsegment")
    )


def _rich(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    return c.where(F.col("c_acctbal") > 5000).select("c_nationkey", "c_mktsegment")


_BUYERS_SQL = """
    SELECT c_nationkey, c_mktsegment
    FROM customer JOIN orders ON c_custkey = o_custkey
    WHERE o_orderstatus = 'O'
"""
_RICH_SQL = """
    SELECT c_nationkey, c_mktsegment FROM customer WHERE c_acctbal > 5000
"""


@query(
    "setop_union_all",
    oracle=f"""
    SELECT c_nationkey, c_mktsegment, COUNT(*) AS n FROM (
      ({_BUYERS_SQL}) UNION ALL ({_RICH_SQL})
    ) GROUP BY c_nationkey, c_mktsegment
    """,
)
def setop_union_all(spark, sf_dir):
    """UNION ALL — partition concatenation, zero shuffle until the agg."""
    u = _buyers(spark, sf_dir).unionAll(_rich(spark, sf_dir))
    return u.groupBy("c_nationkey", "c_mktsegment").agg(F.count(F.lit(1)).alias("n"))


@query(
    "setop_union_distinct",
    oracle=f"""
    ({_BUYERS_SQL}) UNION ({_RICH_SQL})
    """,
)
def setop_union_distinct(spark, sf_dir):
    """UNION (distinct) -> union + hash-dedup shuffle (UNION_TO_DISTINCT)."""
    return _buyers(spark, sf_dir).union(_rich(spark, sf_dir)).distinct()


@query(
    "setop_intersect",
    oracle=f"""
    ({_BUYERS_SQL}) INTERSECT ({_RICH_SQL})
    """,
)
def setop_intersect(spark, sf_dir):
    """INTERSECT -> left-semi join on all columns + distinct."""
    return _buyers(spark, sf_dir).intersect(_rich(spark, sf_dir))


@query(
    "setop_intersect_all",
    oracle=f"""
    ({_BUYERS_SQL}) INTERSECT ALL ({_RICH_SQL})
    """,
)
def setop_intersect_all(spark, sf_dir):
    """INTERSECT ALL — bag semantics (min multiplicity per row)."""
    return _buyers(spark, sf_dir).intersectAll(_rich(spark, sf_dir))


@query(
    "setop_except",
    oracle=f"""
    ({_BUYERS_SQL}) EXCEPT ({_RICH_SQL})
    """,
)
def setop_except(spark, sf_dir):
    """EXCEPT -> left-anti join + distinct (ReplaceMinusWithAntiJoinRule)."""
    return _buyers(spark, sf_dir).subtract(_rich(spark, sf_dir))


@query(
    "setop_except_all",
    oracle=f"""
    ({_BUYERS_SQL}) EXCEPT ALL ({_RICH_SQL})
    """,
)
def setop_except_all(spark, sf_dir):
    """EXCEPT ALL — bag difference (multiplicity-aware, RewriteMinusAllRule)."""
    return _buyers(spark, sf_dir).exceptAll(_rich(spark, sf_dir))
