"""TPC-DS query SHAPES (6 of 6): the final four distinct structures
(continues tpcds_shapes.py; same channel mapping and determinism
contract). Reference: flink-tpcds-test/tpcds-tool/query/.

- ds_q25 (query25.sql, family q29): THREE-period chain — the same
                        (supplier, item) must appear in a sale period, a
                        return period and a later re-sale period, three
                        per-period aggregates equi-joined
- ds_q40 (query40.sql): before/after pivot around a fixed date with
                        returns netting (LEFT JOIN + conditional CASE)
- ds_q45 (query45.sql): disjunction of an IN-LIST and an IN-SUBQUERY —
                        decorrelation meets literal pruning
- ds_q96 (query96.sql): the plain multi-join time-slot COUNT
"""

from __future__ import annotations

from apache_flink_spark.queries.registry import query
from apache_flink_spark.queries.tpcds_shapes import _PRICE, _QTY, _REV, _sql

_DS_Q25 = f"""
    WITH sold AS (
        SELECT l_suppkey AS sk, l_partkey AS pk,
               CAST(ROUND(SUM({_PRICE}), 2) AS DOUBLE) AS sale_amt
        FROM lineitem
        WHERE EXTRACT(YEAR FROM l_shipdate) = 1996
          AND EXTRACT(MONTH FROM l_shipdate) = 4 AND l_returnflag <> 'R'
        GROUP BY 1, 2
    ), returned AS (
        SELECT l_suppkey AS sk, l_partkey AS pk,
               CAST(ROUND(SUM({_PRICE}), 2) AS DOUBLE) AS ret_amt
        FROM lineitem
        WHERE EXTRACT(YEAR FROM l_shipdate) = 1996
          AND EXTRACT(MONTH FROM l_shipdate) BETWEEN 4 AND 10
          AND l_returnflag = 'R'
        GROUP BY 1, 2
    ), resold AS (
        SELECT l_suppkey AS sk, l_partkey AS pk,
               CAST(ROUND(SUM({_PRICE}), 2) AS DOUBLE) AS resale_amt
        FROM lineitem
        WHERE EXTRACT(YEAR FROM l_shipdate) = 1996
          AND EXTRACT(MONTH FROM l_shipdate) BETWEEN 5 AND 10
          AND l_returnflag <> 'R'
        GROUP BY 1, 2
    )
    SELECT s_name, p_name, sale_amt, ret_amt, resale_amt
    FROM sold
    JOIN returned ON sold.sk = returned.sk AND sold.pk = returned.pk
    JOIN resold ON sold.sk = resold.sk AND sold.pk = resold.pk
    JOIN supplier ON sold.sk = s_suppkey
    JOIN part ON sold.pk = p_partkey
    ORDER BY s_name, p_name, sold.sk, sold.pk
    LIMIT 100
"""


@query("ds_q25_three_period_chain", oracle=_DS_Q25)
def ds_q25_three_period_chain(spark, sf_dir):
    """TPC-DS query25 shape (query25.sql, family query29): the same
    (supplier, item) must show a sale, a subsequent return and a later
    re-sale — three per-period aggregate CTEs equi-joined on the
    composite key, then decorated with both dimensions."""
    return _sql(spark, sf_dir, _DS_Q25)


_DS_Q40 = f"""
    WITH ret AS (
        SELECT l_orderkey AS rok, l_linenumber AS rln
        FROM lineitem WHERE l_returnflag = 'R'
    )
    SELECT s_nationkey AS nation,
           CAST(ROUND(SUM(CASE WHEN l_shipdate <
                                    TIMESTAMP '1997-01-01 00:00:00'
                               THEN CASE WHEN rok IS NULL THEN {_PRICE}
                                         ELSE CAST(0 AS DECIMAL(12,4)) END
                               ELSE CAST(0 AS DECIMAL(12,4)) END), 2)
                AS DOUBLE) AS sales_before,
           CAST(ROUND(SUM(CASE WHEN l_shipdate >=
                                    TIMESTAMP '1997-01-01 00:00:00'
                               THEN CASE WHEN rok IS NULL THEN {_PRICE}
                                         ELSE CAST(0 AS DECIMAL(12,4)) END
                               ELSE CAST(0 AS DECIMAL(12,4)) END), 2)
                AS DOUBLE) AS sales_after
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    LEFT JOIN ret ON l_orderkey = rok AND l_linenumber = rln
    WHERE l_shipdate BETWEEN TIMESTAMP '1996-07-01 00:00:00'
                         AND TIMESTAMP '1997-07-01 00:00:00'
    GROUP BY s_nationkey
    ORDER BY nation
"""


@query("ds_q40_before_after_pivot", oracle=_DS_Q40)
def ds_q40_before_after_pivot(spark, sf_dir):
    """TPC-DS query40 shape (query40.sql): net (unreturned) sales pivoted
    into before/after columns around a fixed date — LEFT JOIN against the
    returns subset with nested CASE netting inside each pivot arm."""
    return _sql(spark, sf_dir, _DS_Q40)


_DS_Q45 = f"""
    SELECT n_name, CAST(ROUND(SUM({_REV}), 2) AS DOUBLE) AS total_sales
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE n_nationkey IN (1, 3, 5, 7, 11, 13)
       OR l_partkey IN (SELECT p_partkey FROM part
                        WHERE p_brand IN ('Brand#1', 'Brand#2'))
    GROUP BY n_name
    ORDER BY n_name
"""


@query("ds_q45_inlist_or_insubquery", oracle=_DS_Q45)
def ds_q45_inlist_or_insubquery(spark, sf_dir):
    """TPC-DS query45 shape (query45.sql): the predicate is a DISJUNCTION
    of a literal IN-list (zip codes there, nation keys here) and an IN
    SUBQUERY over a dimension — the OR forces the subquery into a join
    that cannot simply semi-filter."""
    return _sql(spark, sf_dir, _DS_Q45)


_DS_Q96 = """
    SELECT COUNT(*) AS cnt
    FROM events
    JOIN customer ON (user_id % 1500) + 1 = c_custkey
    WHERE EXTRACT(HOUR FROM ts) BETWEEN 16 AND 18
      AND event_type = 'purchase'
      AND c_mktsegment = 'BUILDING'
"""


@query("ds_q96_time_slot_count", oracle=_DS_Q96)
def ds_q96_time_slot_count(spark, sf_dir):
    """TPC-DS query96 shape (query96.sql): the plain multi-join time-slot
    COUNT — events in an hour band joined to a filtered dimension,
    reduced to one number (the derived join key maps stream users onto
    the customer dimension)."""
    return _sql(spark, sf_dir, _DS_Q96)
