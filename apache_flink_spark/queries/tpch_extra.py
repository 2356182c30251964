"""Additional TPC-H-shaped queries adapted to the fixture's columns.

The fixtures are TPC-H-ish (no commitdate/receiptdate/partsupp), so these are
the classic query SHAPES — large-volume customer (q18), disjunctive
predicates (q19), nation-pair volume shipping (q7), promo-style conditional
ratio (q14) — re-targeted at available columns. Each exercises a distinct
optimizer/execution pattern listed in SURVEY.md §4.2.
"""

from __future__ import annotations

from apache_flink_spark.catalog import load_tables
from apache_flink_spark.queries.registry import query


def _sql(spark, sf_dir, stmt):
    load_tables(spark, sf_dir)
    return spark.sql(stmt)


_Q18 = """
    SELECT c.c_name, o.o_orderkey, o.o_totalprice,
           CAST(ROUND(SUM(CAST(l.l_quantity AS DECIMAL(12,4))), 2) AS DOUBLE) AS total_qty
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(12,4))) > 150
    )
    GROUP BY c.c_name, o.o_orderkey, o.o_totalprice
"""


@query("q18_large_volume_customer", oracle=_Q18)
def q18_large_volume_customer(spark, sf_dir):
    """TPC-H q18 shape: IN over a HAVING aggregate subquery -> semi join on
    the aggregated key, then a 3-table join + re-aggregation.

    Single-scan plan (r8, was 3 lineitem scans): the final group key
    CONTAINS o_orderkey, so the re-aggregated total_qty IS the per-order
    sum the HAVING subquery already computed — one per-order aggregation
    feeds both the filter and the output."""
    from pyspark.sql import functions as F

    from apache_flink_spark.queries._util import dec, dround
    from apache_flink_spark.queries._util import t as _t

    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    per = (
        li.groupBy("l_orderkey")
        .agg(F.sum(dec("l_quantity")).alias("q"))
        .filter(F.col("q") > 150)
    )
    return (
        per.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(customer),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select(
            "c_name", "o_orderkey", "o_totalprice",
            dround(F.col("q")).alias("total_qty"),
        )
    )


_Q19 = """
    SELECT CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(12,4))
                          * (1.0000 - CAST(l.l_discount AS DECIMAL(6,4)))), 2)
                AS DOUBLE) AS revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity >= 5 AND l.l_quantity <= 25)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 10 AND 30
           AND l.l_quantity >= 10 AND l.l_quantity <= 35)
       OR (p.p_type = 'PROMO' AND p.p_size BETWEEN 5 AND 40
           AND l.l_quantity >= 15)
"""


@query("q19_disjunctive_predicates", oracle=_Q19)
def q19_disjunctive_predicates(spark, sf_dir):
    """TPC-H q19 shape: OR-of-ANDs predicate across both join sides —
    exercises CNF extraction so the common join key still drives a hash
    join with per-side partial filters pushed to the scans."""
    return _sql(spark, sf_dir, _Q19)


_Q7 = """
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           EXTRACT(year FROM l.l_shipdate) AS l_year,
           CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(12,4))
                          * (1.0000 - CAST(l.l_discount AS DECIMAL(6,4)))), 2)
                AS DOUBLE) AS volume
    FROM supplier s
    JOIN lineitem l ON s.s_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation sn ON sn.n_nationkey = s.s_nationkey
    JOIN nation cn ON cn.n_nationkey = c.c_nationkey
    WHERE sn.n_name IN ('NATION_1', 'NATION_2')
      AND cn.n_name IN ('NATION_1', 'NATION_2')
      AND sn.n_name <> cn.n_name
    GROUP BY 1, 2, 3
"""


@query("q7_nation_volume_shipping", oracle=_Q7)
def q7_nation_volume_shipping(spark, sf_dir):
    """TPC-H q7 shape: 6-table snowflake with two roles of the same dim
    (nation as supplier-nation and customer-nation) + cross-side inequality
    — join-reorder + broadcast territory."""
    return _sql(spark, sf_dir, _Q7)


_Q14 = """
    SELECT ROUND(100.0 * promo / total, 4) AS promo_revenue_pct
    FROM (
        SELECT
            CAST(ROUND(SUM(CASE WHEN p.p_type = 'PROMO'
                THEN CAST(l.l_extendedprice AS DECIMAL(12,4))
                     * (1.0000 - CAST(l.l_discount AS DECIMAL(6,4)))
                ELSE CAST(0.0000 AS DECIMAL(18,8)) END), 2) AS DOUBLE) AS promo,
            CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(12,4))
                           * (1.0000 - CAST(l.l_discount AS DECIMAL(6,4)))), 2)
                 AS DOUBLE) AS total
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE l.l_shipdate >= DATE '1996-01-01'
          AND l.l_shipdate < DATE '1996-04-01'
    )
"""


@query("q14_promo_revenue", oracle=_Q14)
def q14_promo_revenue(spark, sf_dir):
    """TPC-H q14 shape: conditional aggregation ratio with a tight date
    range — the shipdate filter must reach the scan so the join only sees
    the 3-month slice."""
    return _sql(spark, sf_dir, _Q14)


_Q4 = """
    SELECT o.o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= DATE '1996-01-01'
      AND o.o_orderdate < DATE '1996-04-01'
      AND EXISTS (
          SELECT 1 FROM lineitem l
          WHERE l.l_orderkey = o.o_orderkey
            AND l.l_shipdate > o.o_orderdate
      )
    GROUP BY o.o_orderpriority
"""


@query("q4_order_priority", oracle=_Q4)
def q4_order_priority(spark, sf_dir):
    """TPC-H q4 shape (commitdate/receiptdate absent from the fixture, so
    the lateness predicate becomes shipdate > orderdate): correlated EXISTS
    inside a date-windowed aggregate — semi join + pushdown-gated scan."""
    return _sql(spark, sf_dir, _Q4)


_Q12 = """
    SELECT CAST(EXTRACT(year FROM l.l_shipdate) AS BIGINT) AS ship_year,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
               THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
               THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= DATE '1996-01-01'
      AND l.l_shipdate < DATE '1998-01-01'
    GROUP BY 1
"""


@query("q12_priority_shipping", oracle=_Q12)
def q12_priority_shipping(spark, sf_dir):
    """TPC-H q12 shape (shipmode column absent — grouped by ship year
    instead): fact-fact join with conditional-sum pivoting of the priority
    dimension."""
    return _sql(spark, sf_dir, _Q12)
