"""TPC-DS query SHAPES (8): ds_q29..ds_q53 — round-6 port, batch 2
(reference: flink-tpcds-test/tpcds-tool/query/query*.sql; same porting +
determinism contract as tpcds_shapes7.py).

Distinct topologies in this batch: raw three-fact chain join aggregated
AFTER the join (q29, vs ds_q25's join-of-aggregates), correlated
per-state average threshold in SUBQUERY form (q30, vs ds_q1's join form),
correlated windowed average with an outer date window (q32), EXISTS with
an OR of two more EXISTS (q35), ratio-measure GROUPING() rank (q36),
inventory-band semijoin (q37/q82 family), correlated COUNT(*) over the
dimension itself with an OR-of-conjunctions forest (q41), the plain
(year, brand) revenue family (q42/q52/q55), sale->return latency
histogram via a fact-fact self-join (q50), and quarterly deviation from
a brand average (q53, vs ds_q89's monthly/brand-type form).
"""

from __future__ import annotations

from apache_flink_spark.queries.registry import query
from apache_flink_spark.queries.tpcds_shapes import (
    _CHANNEL,
    _PRICE,
    _QTY,
    _REV,
    _sql,
)
from apache_flink_spark.queries.tpcds_shapes7 import _davg

_DS_Q29 = f"""
    SELECT p_brand, n_name AS store_nation,
           CAST(ROUND(SUM(ss_qty), 2) AS DOUBLE) AS store_sales_quantity,
           CAST(ROUND(SUM(sr_qty), 2) AS DOUBLE) AS store_returns_quantity,
           CAST(ROUND(SUM(cs_qty), 2) AS DOUBLE) AS catalog_sales_quantity
    FROM (
        SELECT ss.l_partkey AS pk, ss.o_custkey AS ck,
               ss.l_suppkey AS sk, ss.qty AS ss_qty,
               sr.qty AS sr_qty, cs.qty AS cs_qty
        FROM (
            SELECT l_partkey, l_suppkey, o_custkey, {_QTY} AS qty
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            WHERE {_CHANNEL} = 'store' AND l_returnflag <> 'R'
              AND EXTRACT(YEAR FROM l_shipdate) = 1997
              AND EXTRACT(MONTH FROM l_shipdate) = 9
        ) ss
        JOIN (
            SELECT l_partkey, o_custkey, {_QTY} AS qty
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            WHERE l_returnflag = 'R'
              AND EXTRACT(YEAR FROM l_shipdate) = 1997
              AND EXTRACT(MONTH FROM l_shipdate) BETWEEN 9 AND 12
        ) sr ON ss.l_partkey = sr.l_partkey AND ss.o_custkey = sr.o_custkey
        JOIN (
            SELECT l_partkey, o_custkey, {_QTY} AS qty
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            WHERE {_CHANNEL} = 'catalog'
              AND EXTRACT(YEAR FROM l_shipdate) IN (1997, 1998, 1999)
        ) cs ON sr.l_partkey = cs.l_partkey AND sr.o_custkey = cs.o_custkey
    ) chain
    JOIN part ON pk = p_partkey
    JOIN supplier ON sk = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    GROUP BY p_brand, n_name
    ORDER BY p_brand, n_name
    LIMIT 100
"""


@query("ds_q29_sale_return_resale_chain", oracle=_DS_Q29)
def ds_q29_sale_return_resale_chain(spark, sf_dir):
    """TPC-DS query29 shape (query29.sql): three facts (store sale in one
    month, return within 3 months, catalog re-purchase within 2 years)
    chained on (item, customer) at ROW level and aggregated after the
    join — unlike ds_q25, which joins per-period aggregates. Quantity
    sums are decimal-exact over the fanned-out join (both engines fan
    identically)."""
    return _sql(spark, sf_dir, _DS_Q29)


_DS_Q30 = f"""
    WITH ctr AS (
        SELECT o_custkey AS ck, c_nationkey AS nk,
               SUM({_PRICE}) AS ret_dec
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE l_returnflag = 'R' AND {_CHANNEL} = 'web'
          AND EXTRACT(YEAR FROM l_shipdate) = 1999
        GROUP BY o_custkey, c_nationkey
    )
    SELECT c_name, c_mktsegment,
           CAST(ROUND(c_acctbal, 2) AS DOUBLE) AS acctbal,
           CAST(ROUND(ret_dec, 2) AS DOUBLE) AS ctr_total_return
    FROM ctr ctr1 JOIN customer ON ctr1.ck = c_custkey
    WHERE CAST(ROUND(ctr1.ret_dec, 2) AS DOUBLE) >
          CAST(1.2 AS DOUBLE) * (
              SELECT CAST(ROUND(SUM(ctr2.ret_dec), 2) AS DOUBLE) / COUNT(*)
              FROM ctr ctr2 WHERE ctr2.nk = ctr1.nk)
      AND c_nationkey = 5
    ORDER BY c_name
    LIMIT 100
"""


@query("ds_q30_state_return_outliers", oracle=_DS_Q30)
def ds_q30_state_return_outliers(spark, sf_dir):
    """TPC-DS query30 shape (query30.sql): web-return totals per
    (customer, state); customers above 1.2x their state's average via a
    CORRELATED scalar subquery over the same CTE (q1's shape uses a
    join; the reference validates both decorrelation paths), state
    equality on the customer output side.

    Single-derivation plan (r8, was 3 scans of the CTE's join): the
    correlated per-state average is a window over the TINY
    (customer, state) aggregate, so the fact join runs once."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from apache_flink_spark.queries._util import dec, dround
    from apache_flink_spark.queries._util import t as _t
    from apache_flink_spark.queries.tpcds_shapes import _CHANNEL as _CH

    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    ctr = (
        li.filter(
            (F.col("l_returnflag") == "R")
            & (F.expr(_CH) == "web")
            & (F.year("l_shipdate") == 1999)
        )
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(customer),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy(
            F.col("o_custkey").alias("ck"),
            F.col("c_nationkey").alias("nk"),
        )
        .agg(F.sum(dec("l_extendedprice")).alias("ret_dec"))
    )
    w = Window.partitionBy("nk")
    gated = ctr.withColumn(
        "nk_avg",
        F.round(F.sum("ret_dec").over(w), 2).cast("double")
        / F.count(F.lit(1)).over(w),
    ).filter(
        dround(F.col("ret_dec"))
        > F.lit(1.2).cast("double") * F.col("nk_avg")
    )
    return (
        gated.join(
            F.broadcast(customer), F.col("ck") == F.col("c_custkey")
        )
        .filter(F.col("c_nationkey") == 5)
        .select(
            "c_name", "c_mktsegment",
            F.round(F.col("c_acctbal"), 2).cast("double").alias("acctbal"),
            dround(F.col("ret_dec")).alias("ctr_total_return"),
        )
        .orderBy("c_name")
        .limit(100)
    )


_DISC_AMT = f"({_PRICE} * CAST(l_discount AS DECIMAL(6,4)))"

_DS_Q32 = f"""
    SELECT CAST(ROUND(SUM({_DISC_AMT}), 2) AS DOUBLE)
               AS excess_discount_amount,
           COUNT(*) AS n_lines
    FROM lineitem l1 JOIN part ON l1.l_partkey = p_partkey
    WHERE p_size IN (9, 27, 38, 44)
      AND l1.l_shipdate BETWEEN TIMESTAMP '2000-01-27 00:00:00'
                            AND TIMESTAMP '2000-04-26 00:00:00'
      AND CAST({_DISC_AMT.replace("l_", "l1.l_")} AS DOUBLE) >
          CAST(1.3 AS DOUBLE) * (
              SELECT CAST(ROUND(SUM(
                         CAST(l2.l_extendedprice AS DECIMAL(12,4))
                         * CAST(l2.l_discount AS DECIMAL(6,4))), 2)
                          AS DOUBLE) / COUNT(*)
              FROM lineitem l2
              WHERE l2.l_partkey = l1.l_partkey
                AND l2.l_shipdate BETWEEN TIMESTAMP '2000-01-27 00:00:00'
                                      AND TIMESTAMP '2000-04-26 00:00:00')
"""


@query("ds_q32_windowed_excess_discount", oracle=_DS_Q32)
def ds_q32_windowed_excess_discount(spark, sf_dir):
    """TPC-DS query32 shape (query32.sql): discount amounts above 1.3x
    the item's average WITHIN the same 90-day window — the correlated
    aggregate carries the outer query's date window, so decorrelation
    must keep the window predicate inside the built aggregate (ds_q92's
    correlation has no such shared window)."""
    return _sql(spark, sf_dir, _DS_Q32)


_DS_Q35 = f"""
    SELECT n_name, c_mktsegment,
           CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS bal_bucket,
           COUNT(*) AS cnt,
           MIN(CAST(FLOOR(c_acctbal / 1000) AS BIGINT)) AS min_bucket,
           MAX(CAST(FLOOR(c_acctbal / 1000) AS BIGINT)) AS max_bucket
    FROM customer c
    JOIN nation ON c_nationkey = n_nationkey
    WHERE EXISTS (
            SELECT 1 FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            WHERE o_custkey = c.c_custkey AND {_CHANNEL} = 'store'
              AND EXTRACT(YEAR FROM l_shipdate) = 1998
              AND EXTRACT(QUARTER FROM l_shipdate) < 4)
      AND (EXISTS (
            SELECT 1 FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            WHERE o_custkey = c.c_custkey AND {_CHANNEL} = 'web'
              AND EXTRACT(YEAR FROM l_shipdate) = 1998
              AND EXTRACT(QUARTER FROM l_shipdate) < 4)
        OR EXISTS (
            SELECT 1 FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            WHERE o_custkey = c.c_custkey AND {_CHANNEL} = 'catalog'
              AND EXTRACT(YEAR FROM l_shipdate) = 1998
              AND EXTRACT(QUARTER FROM l_shipdate) < 4))
    GROUP BY n_name, c_mktsegment, CAST(FLOOR(c_acctbal / 1000) AS BIGINT)
    ORDER BY n_name, c_mktsegment, bal_bucket
    LIMIT 100
"""


@query("ds_q35_exists_or_exists", oracle=_DS_Q35)
def ds_q35_exists_or_exists(spark, sf_dir):
    """TPC-DS query35 shape (query35.sql): customers who bought in the
    store channel AND (web OR catalog) — an EXISTS conjoined with a
    DISJUNCTION of two more EXISTS, which the planner must turn into one
    semijoin plus a union-style existence flag, never a fan-out join.

    Single-scan plan (r8, was 3): the three EXISTS share every filter
    except the channel tag — one per-customer channel-presence
    aggregation (the ds_q10 fusion with the 1998 Q1-Q3 window)."""
    from pyspark.sql import functions as F

    from apache_flink_spark.queries._util import t as _t
    from apache_flink_spark.queries.tpcds_shapes import _CHANNEL as _CH

    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    ch = F.expr(_CH)
    flags = (
        li.filter(
            (F.year("l_shipdate") == 1998)
            & (F.quarter("l_shipdate") < 4)
        )
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(
            F.max(ch == "store").alias("s"),
            F.max(ch == "web").alias("w"),
            F.max(ch == "catalog").alias("cg"),
        )
        .filter(F.col("s") & (F.col("w") | F.col("cg")))
        .select("o_custkey")
    )
    bucket = F.floor(F.col("c_acctbal") / 1000).cast("bigint")
    return (
        customer.join(
            flags, F.col("c_custkey") == F.col("o_custkey"), "semi"
        )
        .join(
            F.broadcast(nation),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("n_name", "c_mktsegment", bucket.alias("bal_bucket"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.min(bucket).alias("min_bucket"),
            F.max(bucket).alias("max_bucket"),
        )
        .orderBy("n_name", "c_mktsegment", "bal_bucket")
        .limit(100)
    )


_MARGIN = (
    f"CAST(ROUND(SUM({_REV}), 2) AS DOUBLE)"
    f" / NULLIF(CAST(ROUND(SUM({_PRICE}), 2) AS DOUBLE),"
    " CAST(0 AS DOUBLE))"
)

_DS_Q36 = f"""
    SELECT {_MARGIN} AS gross_margin,
           p_type, p_brand,
           GROUPING(p_type) + GROUPING(p_brand) AS lochierarchy,
           RANK() OVER (
               PARTITION BY GROUPING(p_type) + GROUPING(p_brand),
                            CASE WHEN GROUPING(p_brand) = 0
                                 THEN p_type END
               ORDER BY {_MARGIN} ASC) AS rank_within_parent
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN part ON l_partkey = p_partkey
    WHERE EXTRACT(YEAR FROM l_shipdate) = 2000
      AND n_regionkey IN (0, 0, 2)
    GROUP BY ROLLUP (p_type, p_brand)
    ORDER BY lochierarchy DESC,
             CASE WHEN GROUPING(p_type) + GROUPING(p_brand) = 0
                  THEN p_type END NULLS FIRST,
             rank_within_parent, p_type NULLS FIRST, p_brand NULLS FIRST
    LIMIT 100
"""


@query("ds_q36_margin_rank_within_parent", oracle=_DS_Q36)
def ds_q36_margin_rank_within_parent(spark, sf_dir):
    """TPC-DS query36 shape (query36.sql): gross-margin RATIO measure
    under ROLLUP with RANK() partitioned by the GROUPING() bits — the
    ratio-ordered sibling of ds_q70 (plain sums). Margin divides two
    exactly-rounded doubles, so rank order is identical in both
    engines."""
    return _sql(spark, sf_dir, _DS_Q36)


def _q37_like(channel: str, price_lo: int, sizes: str, lo: str, hi: str,
              qlo: int, qhi: int) -> str:
    return f"""
    SELECT p_name, p_type,
           CAST(ROUND(p_retailprice, 2) AS DOUBLE) AS current_price
    FROM part
    JOIN lineitem inv ON inv.l_partkey = p_partkey
    JOIN lineitem ch ON ch.l_partkey = p_partkey
    WHERE p_retailprice BETWEEN {price_lo} AND {price_lo} + 300
      AND p_size IN ({sizes})
      AND inv.l_shipdate BETWEEN TIMESTAMP '{lo} 00:00:00'
                             AND TIMESTAMP '{hi} 00:00:00'
      AND inv.l_quantity BETWEEN {qlo} AND {qhi}
      AND CASE ch.l_linenumber % 3 WHEN 0 THEN 'store'
               WHEN 1 THEN 'catalog' ELSE 'web' END = '{channel}'
    GROUP BY p_name, p_type, p_retailprice
    ORDER BY p_name, p_type
    LIMIT 100
"""


_DS_Q37 = _q37_like("catalog", 900, "1, 14, 27, 40", "2000-02-01",
                    "2000-04-01", 20, 40)
_DS_Q82 = _q37_like("store", 1100, "7, 21, 33, 46", "2000-05-25",
                    "2000-07-24", 10, 30)


@query("ds_q37_inventory_band_catalog", oracle=_DS_Q37)
def ds_q37_inventory_band_catalog(spark, sf_dir):
    """TPC-DS query37 shape (query37.sql): items in a price/manufact band
    whose stock (quantity band in a 60-day window) was sold through the
    catalog channel — part joins TWO lineitem roles (inventory window,
    channel sales) that GROUP BY collapses to a double semijoin."""
    return _sql(spark, sf_dir, _DS_Q37)


@query("ds_q82_inventory_band_store", oracle=_DS_Q82)
def ds_q82_inventory_band_store(spark, sf_dir):
    """TPC-DS query82 shape (query82.sql): the store-channel member of
    the q37/q82 inventory-band family, separately validated by the
    reference."""
    return _sql(spark, sf_dir, _DS_Q82)


_DS_Q41 = """
    SELECT DISTINCT p1.p_name AS i_product_name
    FROM part p1
    WHERE p1.p_size BETWEEN 10 AND 30
      AND (SELECT COUNT(*) FROM part p2
           WHERE p2.p_type = p1.p_type
             AND (((p2.p_brand = 'Brand#12' AND p2.p_size IN (5, 10))
                OR (p2.p_brand = 'Brand#23' AND p2.p_size IN (1, 15))
                OR (p2.p_brand = 'Brand#34' AND p2.p_size IN (20, 25))
                OR (p2.p_brand = 'Brand#45' AND p2.p_size IN (30, 35)))
               OR
                  ((p2.p_brand = 'Brand#11' AND p2.p_size IN (2, 4))
                OR (p2.p_brand = 'Brand#22' AND p2.p_size IN (6, 8))
                OR (p2.p_brand = 'Brand#33' AND p2.p_size IN (12, 14))
                OR (p2.p_brand = 'Brand#44' AND p2.p_size IN (16, 18))))
          ) > 0
    ORDER BY i_product_name
    LIMIT 100
"""


@query("ds_q41_self_correlated_count", oracle=_DS_Q41)
def ds_q41_self_correlated_count(spark, sf_dir):
    """TPC-DS query41 shape (query41.sql): DISTINCT product names whose
    manufacturer (type here) makes at least one item matching a forest of
    OR'd attribute conjunctions — a correlated COUNT(*) over the SAME
    dimension table, decorrelated into an aggregate-join on p_type."""
    return _sql(spark, sf_dir, _DS_Q41)


def _q42_like(cols: str, group: str, order: str, channel: str,
              moy: int, year: int, size: int) -> str:
    return f"""
    SELECT {cols},
           CAST(ROUND(SUM({_REV}), 2) AS DOUBLE) AS ext_price
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN part ON l_partkey = p_partkey
    WHERE {_CHANNEL} = '{channel}'
      AND p_size = {size}
      AND EXTRACT(MONTH FROM o_orderdate) = {moy}
      AND EXTRACT(YEAR FROM o_orderdate) = {year}
    GROUP BY {group}
    ORDER BY {order}
    LIMIT 100
"""


_DS_Q42 = _q42_like(
    "EXTRACT(YEAR FROM o_orderdate) AS d_year, p_type",
    "EXTRACT(YEAR FROM o_orderdate), p_type",
    "ext_price DESC, d_year, p_type", "store", 11, 1998, 15)
_DS_Q52 = _q42_like(
    "EXTRACT(YEAR FROM o_orderdate) AS d_year, p_brand",
    "EXTRACT(YEAR FROM o_orderdate), p_brand",
    "d_year, ext_price DESC, p_brand", "store", 12, 1999, 22)
_DS_Q55 = _q42_like(
    "p_brand", "p_brand", "ext_price DESC, p_brand", "web", 11, 2000, 28)


@query("ds_q42_category_month_revenue", oracle=_DS_Q42)
def ds_q42_category_month_revenue(spark, sf_dir):
    """TPC-DS query42 shape (query42.sql): (year, category) revenue for
    one month, ordered by revenue DESC — the head of the q42/q52/q55
    star-agg family the reference validates per member."""
    return _sql(spark, sf_dir, _DS_Q42)


@query("ds_q52_brand_month_revenue", oracle=_DS_Q52)
def ds_q52_brand_month_revenue(spark, sf_dir):
    """TPC-DS query52 shape (query52.sql): the (year, brand) member of
    the q42 family, year-then-revenue ordering."""
    return _sql(spark, sf_dir, _DS_Q52)


@query("ds_q55_brand_web_revenue", oracle=_DS_Q55)
def ds_q55_brand_web_revenue(spark, sf_dir):
    """TPC-DS query55 shape (query55.sql): brand-only projection of the
    q42 family on the web channel."""
    return _sql(spark, sf_dir, _DS_Q55)


_DS_Q50 = """
    SELECT s_name, n_name,
           COUNT(CASE WHEN d <= 30 THEN 1 END) AS d30,
           COUNT(CASE WHEN d > 30 AND d <= 60 THEN 1 END) AS d60,
           COUNT(CASE WHEN d > 60 AND d <= 90 THEN 1 END) AS d90,
           COUNT(CASE WHEN d > 90 AND d <= 120 THEN 1 END) AS d120,
           COUNT(CASE WHEN d > 120 THEN 1 END) AS dmore
    FROM (
        SELECT ss.l_suppkey AS sk,
               CAST(EXTRACT(DAY FROM (sr.l_shipdate - ss.l_shipdate))
                    AS BIGINT) AS d
        FROM lineitem ss
        JOIN lineitem sr
          ON ss.l_orderkey = sr.l_orderkey
         AND ss.l_partkey = sr.l_partkey
         AND ss.l_linenumber <> sr.l_linenumber
        WHERE ss.l_returnflag <> 'R' AND sr.l_returnflag = 'R'
          AND sr.l_shipdate >= ss.l_shipdate
          AND EXTRACT(YEAR FROM sr.l_shipdate) = 2000
          AND EXTRACT(MONTH FROM sr.l_shipdate) = 8
    ) pairs
    JOIN supplier ON sk = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    GROUP BY s_name, n_name
    ORDER BY s_name, n_name
    LIMIT 100
"""


@query("ds_q50_return_latency_by_store", oracle=_DS_Q50)
def ds_q50_return_latency_by_store(spark, sf_dir):
    """TPC-DS query50 shape (query50.sql): sale row joined to its RETURN
    row (same ticket = order+item, different line) with day-latency
    histogram per store — a fact-fact self-equi-join on the ticket key,
    unlike ds_q99 which derives latency within one row."""
    return _sql(spark, sf_dir, _DS_Q50)


_DS_Q53 = f"""
    SELECT p_brand, qoy, sum_sales, avg_quarterly_sales
    FROM (
        SELECT p_brand, qoy,
               CAST(ROUND(qsum, 2) AS DOUBLE) AS sum_sales,
               CAST(ROUND(SUM(qsum) OVER (PARTITION BY p_brand), 2)
                    AS DOUBLE)
                   / COUNT(*) OVER (PARTITION BY p_brand)
                   AS avg_quarterly_sales
        FROM (
            SELECT p_brand,
                   CAST(EXTRACT(QUARTER FROM l_shipdate) AS BIGINT) AS qoy,
                   SUM({_PRICE}) AS qsum
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE EXTRACT(YEAR FROM l_shipdate) = 1999
              AND ((p_type IN ('STANDARD', 'PROMO')
                    AND p_brand IN ('Brand#11', 'Brand#21', 'Brand#31'))
                OR (p_type IN ('ECONOMY', 'LARGE')
                    AND p_brand IN ('Brand#14', 'Brand#24', 'Brand#34')))
            GROUP BY p_brand, EXTRACT(QUARTER FROM l_shipdate)
        ) q
    ) w
    WHERE CASE WHEN avg_quarterly_sales > 0
               THEN ABS(sum_sales - avg_quarterly_sales)
                    / avg_quarterly_sales
               ELSE NULL END > CAST(0.1 AS DOUBLE)
    ORDER BY avg_quarterly_sales, sum_sales, p_brand, qoy
    LIMIT 100
"""


@query("ds_q53_quarterly_deviation", oracle=_DS_Q53)
def ds_q53_quarterly_deviation(spark, sf_dir):
    """TPC-DS query53 shape (query53.sql): quarters deviating >10% from
    the brand's average quarterly sales — window average over exact
    decimal quarter sums, with the OR'd category/brand conjunction
    filter; quarterly sibling of ds_q89's monthly form."""
    return _sql(spark, sf_dir, _DS_Q53)
