"""Subquery surface — EXISTS / NOT EXISTS / IN / scalar / correlated scalar.

Reference parity (SURVEY.md §4.2 row 1): Flink rewrites subqueries with
FlinkSubQueryRemoveRule (-> semi/anti join) and the decorrelation phase
(FlinkStreamProgram 'decorrelate'). Catalyst performs the identical rewrites
(RewritePredicateSubquery, DecorrelateInnerQuery) — these queries go through
``spark.sql`` so the rewrite machinery itself is exercised; the oracle
confirms the semantics.

Determinism: the "above average" thresholds avoid engine-specific AVG(double)
by comparing value * COUNT(*) > SUM(decimal) — all-exact decimal/integer
arithmetic on both engines.

Scale: EXISTS/IN become shuffle semi-joins on the correlation key (no row
explosion); the correlated-scalar decorrelates to an aggregate + join on
o_custkey — one extra shuffle, the plan Catalyst picks automatically.
"""

from __future__ import annotations

from apache_flink_spark.catalog import load_tables
from apache_flink_spark.queries.registry import query


def _sql(spark, sf_dir, stmt: str):
    load_tables(spark, sf_dir)
    return spark.sql(stmt)


_EXISTS = """
    SELECT o_orderkey, o_totalprice
    FROM orders o
    WHERE EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey AND l.l_extendedprice > 90000
    )
"""


@query("subq_exists", oracle=_EXISTS)
def subq_exists(spark, sf_dir):
    """EXISTS -> left-semi join (FlinkSubQueryRemoveRule / Catalyst
    RewritePredicateSubquery)."""
    return _sql(spark, sf_dir, _EXISTS)


_NOT_EXISTS = """
    SELECT c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (
        SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
    )
"""


@query("subq_not_exists", oracle=_NOT_EXISTS)
def subq_not_exists(spark, sf_dir):
    """NOT EXISTS -> left-anti join."""
    return _sql(spark, sf_dir, _NOT_EXISTS)


_IN = """
    SELECT c_custkey, c_acctbal
    FROM customer
    WHERE c_custkey IN (
        SELECT o_custkey FROM orders WHERE o_totalprice > 400000
    )
"""


@query("subq_in", oracle=_IN)
def subq_in(spark, sf_dir):
    """IN subquery -> semi join on the subquery output."""
    return _sql(spark, sf_dir, _IN)


_SCALAR = """
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM lineitem
    WHERE CAST(l_extendedprice AS DECIMAL(12,4))
          * (SELECT COUNT(*) FROM lineitem)
        > (SELECT SUM(CAST(l_extendedprice AS DECIMAL(12,4))) FROM lineitem)
"""


@query("subq_scalar_agg", oracle=_SCALAR)
def subq_scalar_agg(spark, sf_dir):
    """Uncorrelated scalar subqueries: rows above the global mean, expressed
    exactly as price*N > total (no float AVG).

    Two-scan plan (r8, was 3+): both scalar subqueries come from ONE
    global aggregation row, broadcast back onto the main scan."""
    from pyspark.sql import functions as F

    from apache_flink_spark.queries._util import dec
    from apache_flink_spark.queries._util import t as _t

    li = _t(spark, sf_dir, "lineitem")
    stats = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec("l_extendedprice")).alias("tot"),
    )
    return (
        li.join(F.broadcast(stats))
        .filter(dec("l_extendedprice") * F.col("n") > F.col("tot"))
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
    )


_CORRELATED = """
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders o
    WHERE CAST(o_totalprice AS DECIMAL(12,4))
          * (SELECT COUNT(*) FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
        > (SELECT SUM(CAST(o2.o_totalprice AS DECIMAL(12,4)))
           FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
"""


@query("subq_correlated_scalar", oracle=_CORRELATED)
def subq_correlated_scalar(spark, sf_dir):
    """Correlated scalar subqueries (decorrelation phase parity): orders above
    their own customer's mean — decorrelates to a per-custkey aggregate
    joined back, one extra shuffle on o_custkey.

    Two-scan plan (r8, was 3): BOTH correlated aggregates come from one
    per-custkey aggregation joined back (Catalyst decorrelates each
    subquery separately, re-scanning per aggregate)."""
    from pyspark.sql import functions as F

    from apache_flink_spark.queries._util import dec
    from apache_flink_spark.queries._util import t as _t

    orders = _t(spark, sf_dir, "orders")
    per = orders.groupBy(F.col("o_custkey").alias("ck")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec("o_totalprice")).alias("tot"),
    )
    return (
        orders.join(per, F.col("o_custkey") == F.col("ck"))
        .filter(dec("o_totalprice") * F.col("n") > F.col("tot"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )
