"""TPC-DS query SHAPES (5 of 5): the last five distinct structures —
the 6-way growth-ratio chain, CTE-average HAVING threshold, attribute-
mismatch join, concatenated-lookup projection and OR-blocks over joined
dimensions (continues tpcds_shapes.py; same channel mapping and
determinism contract). Reference: flink-tpcds-test/tpcds-tool/query/.

- ds_q4  (query4.sql):  per-customer growth ratios for ALL THREE channels
                        across consecutive years, chained comparisons
                        through a 6-way self-join of one CTE
- ds_q24 (query24a.sql): group sums kept only above a fraction of the
                        AVERAGE group sum (scalar subquery over the same
                        aggregation, the HAVING-against-CTE-avg shape)
- ds_q46 (query46.sql): the attribute-MISMATCH join (bought from a
                        supplier in a different nation than the customer)
- ds_q84 (query84.sql): dimension-chain lookup with a concatenated
                        display column
- ds_q85 (query85.sql): OR'd (segment x value-range) blocks evaluated on
                        JOINED dimensions, multiple averages per group
"""

from __future__ import annotations

from apache_flink_spark.queries.registry import query
from apache_flink_spark.queries.tpcds_shapes import _PRICE, _QTY, _REV, _sql

_DS_Q4 = f"""
    WITH yt AS (
        SELECT o_custkey AS cust,
               CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS yr,
               l_linenumber % 3 AS chan,
               CAST(ROUND(SUM({_REV}), 2) AS DOUBLE) AS tot
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY 1, 2, 3
    )
    SELECT s1.cust AS c_custkey,
           c2.tot / c1.tot AS catalog_growth,
           s2.tot / s1.tot AS store_growth,
           w2.tot / w1.tot AS web_growth
    FROM yt s1 JOIN yt s2 ON s1.cust = s2.cust
    JOIN yt c1 ON s1.cust = c1.cust
    JOIN yt c2 ON s1.cust = c2.cust
    JOIN yt w1 ON s1.cust = w1.cust
    JOIN yt w2 ON s1.cust = w2.cust
    WHERE s1.chan = 0 AND s1.yr = 1996 AND s2.chan = 0 AND s2.yr = 1997
      AND c1.chan = 1 AND c1.yr = 1996 AND c2.chan = 1 AND c2.yr = 1997
      AND w1.chan = 2 AND w1.yr = 1996 AND w2.chan = 2 AND w2.yr = 1997
      AND s1.tot > CAST(0 AS DOUBLE)
      AND c1.tot > CAST(0 AS DOUBLE)
      AND w1.tot > CAST(0 AS DOUBLE)
      AND c2.tot / c1.tot > s2.tot / s1.tot
      AND c2.tot / c1.tot > w2.tot / w1.tot
    ORDER BY c_custkey
    LIMIT 100
"""


@query("ds_q4_three_channel_growth_chain", oracle=_DS_Q4)
def ds_q4_three_channel_growth_chain(spark, sf_dir):
    """TPC-DS query4 shape (query4.sql): customers whose catalog growth
    beat BOTH store and web growth — one (customer, year, channel) CTE
    instantiated six ways with a chained pair of ratio comparisons on
    exact rounded doubles (q11's big sibling).

    Single-scan plan (r8, was 6 lineitem+orders scans): the six CTE
    instances select FIXED (channel, year) cells of one (customer, year,
    channel) aggregation, so one scan with six conditional rounded sums
    per customer replaces the 6-way self-join; the inner-join
    "all six cells exist" requirement becomes six IS NOT NULL guards."""
    from pyspark.sql import functions as F

    from apache_flink_spark.queries._util import dec, dround
    from apache_flink_spark.queries._util import t as _t

    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    rev = dec("l_extendedprice") * (
        F.lit(1).cast("decimal(6,4)") - dec("l_discount", "decimal(6,4)")
    )
    yr = F.year("o_orderdate")
    chan = F.col("l_linenumber") % 3

    def cell(ch, y):
        return dround(F.sum(F.when((chan == ch) & (yr == y), rev)))

    g = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(yr.isin(1996, 1997))
        .groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(
            cell(0, 1996).alias("s1"), cell(0, 1997).alias("s2"),
            cell(1, 1996).alias("c1"), cell(1, 1997).alias("c2"),
            cell(2, 1996).alias("w1"), cell(2, 1997).alias("w2"),
        )
    )
    zero = F.lit(0).cast("double")
    return (
        g.filter(
            F.col("s1").isNotNull() & F.col("s2").isNotNull()
            & F.col("c1").isNotNull() & F.col("c2").isNotNull()
            & F.col("w1").isNotNull() & F.col("w2").isNotNull()
            & (F.col("s1") > zero) & (F.col("c1") > zero)
            & (F.col("w1") > zero)
            & (F.col("c2") / F.col("c1") > F.col("s2") / F.col("s1"))
            & (F.col("c2") / F.col("c1") > F.col("w2") / F.col("w1"))
        )
        .select(
            "c_custkey",
            (F.col("c2") / F.col("c1")).alias("catalog_growth"),
            (F.col("s2") / F.col("s1")).alias("store_growth"),
            (F.col("w2") / F.col("w1")).alias("web_growth"),
        )
        .orderBy("c_custkey")
        .limit(100)
    )


_DS_Q24 = f"""
    WITH ssales AS (
        SELECT o_custkey AS cust, p_brand AS brand,
               SUM({_PRICE}) AS rev_dec
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN part ON l_partkey = p_partkey
        WHERE l_linenumber % 3 = 0
        GROUP BY 1, 2
    ), scale AS (
        SELECT CAST(ROUND(SUM(rev_dec), 2) AS DOUBLE) AS tot,
               COUNT(*) AS groups
        FROM ssales
    )
    SELECT cust AS c_custkey, brand,
           CAST(ROUND(rev_dec, 2) AS DOUBLE) AS paid
    FROM ssales, scale
    WHERE CAST(ROUND(rev_dec, 2) AS DOUBLE)
          > CAST(1.5 AS DOUBLE) * (tot / groups)
    ORDER BY c_custkey, brand
    LIMIT 100
"""


@query("ds_q24_above_avg_group_sum", oracle=_DS_Q24)
def ds_q24_above_avg_group_sum(spark, sf_dir):
    """TPC-DS query24a shape (query24a.sql): (customer, brand) revenue
    groups kept only when above a multiple of the AVERAGE group revenue —
    the threshold is a scalar subquery over the same aggregation (exact
    decimal global sum / group count, compared as identical double
    expressions)."""
    return _sql(spark, sf_dir, _DS_Q24)


_DS_Q46 = f"""
    SELECT c_custkey, c_name, o_orderkey,
           CAST(ROUND(SUM({_REV}), 2) AS DOUBLE) AS away_revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    WHERE s_nationkey <> c_nationkey
      AND EXTRACT(YEAR FROM o_orderdate) = 1997
      AND c_mktsegment IN ('BUILDING', 'MACHINERY')
    GROUP BY c_custkey, c_name, o_orderkey
    ORDER BY c_custkey, o_orderkey
    LIMIT 100
"""


@query("ds_q46_attribute_mismatch_join", oracle=_DS_Q46)
def ds_q46_attribute_mismatch_join(spark, sf_dir):
    """TPC-DS query46 shape (query46.sql, family query68): the
    attribute-MISMATCH condition — sales where the supplier's nation
    differs from the customer's (the reference's bought-in-a-different-
    city predicate), aggregated per (customer, order)."""
    return _sql(spark, sf_dir, _DS_Q46)


_DS_Q84 = """
    SELECT c_custkey,
           c_name || ' (' || c_mktsegment || ')' AS customer_label,
           n_name, r_name
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE c_acctbal BETWEEN 4000 AND 4500
    ORDER BY c_custkey
    LIMIT 100
"""


@query("ds_q84_concat_lookup", oracle=_DS_Q84)
def ds_q84_concat_lookup(spark, sf_dir):
    """TPC-DS query84 shape (query84.sql): a pure dimension-chain lookup
    (customer -> nation -> region) filtered on a value band, emitting a
    concatenated display column — the operational point-lookup shape."""
    return _sql(spark, sf_dir, _DS_Q84)


_DS_Q85 = f"""
    SELECT o_orderpriority,
           CAST(ROUND(SUM({_QTY}), 2) AS DOUBLE) / COUNT(*) AS avg_qty,
           CAST(ROUND(SUM(CAST(l_discount AS DECIMAL(6,4))), 2) AS DOUBLE)
               / COUNT(*) AS avg_disc,
           CAST(ROUND(SUM({_PRICE}), 2) AS DOUBLE) / COUNT(*) AS avg_price
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    WHERE l_returnflag = 'R'
      AND ((c_mktsegment = 'BUILDING'
            AND c_acctbal BETWEEN 0 AND 3000
            AND l_quantity BETWEEN 1 AND 20)
        OR (c_mktsegment = 'AUTOMOBILE'
            AND c_acctbal BETWEEN 3000 AND 7000
            AND l_quantity BETWEEN 10 AND 35)
        OR (c_mktsegment = 'HOUSEHOLD'
            AND c_acctbal BETWEEN 7000 AND 10000
            AND l_quantity BETWEEN 25 AND 50))
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
"""


@query("ds_q85_or_blocks_on_dims", oracle=_DS_Q85)
def ds_q85_or_blocks_on_dims(spark, sf_dir):
    """TPC-DS query85 shape (query85.sql): returned lines filtered by OR'd
    (segment x balance-band x quantity-band) blocks spanning JOINED
    dimension attributes, with three per-group averages (exact rounded
    sums over counts)."""
    return _sql(spark, sf_dir, _DS_Q85)
