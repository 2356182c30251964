"""TPC-DS query SHAPES (11): the four b-variants — ds_q14b, ds_q23b,
ds_q24b, ds_q39b — completing all 103 reference-validated query files
(flink-tpcds-test/tpcds-tool/query/ has query{14,23,24,39}{a,b}.sql; the
a-variants are ds_q14/ds_q23/ds_q24/ds_q39). Same porting + determinism
contract as tpcds_shapes7.py.

What each b-variant adds over its a-sibling:
- 14b: the 3-channel INTERSECT item set and the UNION-ALL average gate
  feed a THIS-PERIOD vs SAME-PERIOD-LAST-YEAR self-join (14a fans the
  set out per channel instead).
- 23b: the frequent-item and best-customer gates drive a 2-channel
  UNION re-aggregated BY CUSTOMER NAME (23a returns one combined total).
- 24b: the ticket sale-return join aggregates a WIDE group with a
  cross-dimension equality (zip) plus a non-equi pair, then re-groups
  under a HAVING gated on a scalar average over the SAME CTE.
- 39b: 39a's consecutive-month volatility pairs with an extra,
  asymmetric volatility threshold on the first month.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from apache_flink_spark.queries.registry import query
from apache_flink_spark.run_cache import run_persist
from apache_flink_spark.queries.tpcds_shapes import (
    _CHANNEL,
    _PRICE,
    _QTY,
    _REV,
    _sql,
)

_AMT = f"({_QTY} * {_PRICE})"


def _14b_chan(ch: str, years: str) -> str:
    return f"""
        SELECT p_brand FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE {_CHANNEL} = '{ch}'
          AND EXTRACT(YEAR FROM l_shipdate) IN ({years})"""


_DS_Q14B = f"""
    WITH cross_items AS (
        {_14b_chan("store", "1999, 2000, 2001")}
        INTERSECT
        {_14b_chan("catalog", "1999, 2000, 2001")}
        INTERSECT
        {_14b_chan("web", "1999, 2000, 2001")}
    ), avg_sales AS (
        SELECT CAST(ROUND(SUM(amt), 2) AS DOUBLE) / COUNT(*)
                   AS average_sales
        FROM (
            SELECT {_AMT} AS amt FROM lineitem
            WHERE {_CHANNEL} = 'store'
              AND EXTRACT(YEAR FROM l_shipdate) IN (1999, 2000, 2001)
            UNION ALL
            SELECT {_AMT} FROM lineitem
            WHERE {_CHANNEL} = 'catalog'
              AND EXTRACT(YEAR FROM l_shipdate) IN (1999, 2000, 2001)
            UNION ALL
            SELECT {_AMT} FROM lineitem
            WHERE {_CHANNEL} = 'web'
              AND EXTRACT(YEAR FROM l_shipdate) IN (1999, 2000, 2001)
        ) all_chan
    ), this_year AS (
        SELECT p_brand, SUM({_AMT}) AS sales_dec
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE {_CHANNEL} = 'store'
          AND EXTRACT(YEAR FROM l_shipdate) = 2000
          AND EXTRACT(MONTH FROM l_shipdate) = 12
          AND p_brand IN (SELECT p_brand FROM cross_items)
        GROUP BY p_brand
    ), last_year AS (
        SELECT p_brand, SUM({_AMT}) AS sales_dec
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE {_CHANNEL} = 'store'
          AND EXTRACT(YEAR FROM l_shipdate) = 1999
          AND EXTRACT(MONTH FROM l_shipdate) = 12
          AND p_brand IN (SELECT p_brand FROM cross_items)
        GROUP BY p_brand
    )
    SELECT ty.p_brand,
           CAST(ROUND(ty.sales_dec, 2) AS DOUBLE) AS this_year_sales,
           CAST(ROUND(ly.sales_dec, 2) AS DOUBLE) AS last_year_sales
    FROM this_year ty JOIN last_year ly ON ty.p_brand = ly.p_brand
    WHERE CAST(ROUND(ty.sales_dec, 2) AS DOUBLE)
              > (SELECT average_sales FROM avg_sales)
      AND CAST(ROUND(ly.sales_dec, 2) AS DOUBLE)
              > (SELECT average_sales FROM avg_sales)
    ORDER BY ty.p_brand
    LIMIT 100
"""


@query("ds_q14b_period_over_period_intersect", oracle=_DS_Q14B)
def ds_q14b_period_over_period_intersect(spark, sf_dir):
    """TPC-DS query14b shape (query14b.sql): the cross-channel INTERSECT
    item set and the UNION-ALL global average gate BOTH sides of a
    this-period vs same-period-last-year brand self-join — 14a's set
    instead fans out per channel.

    Single-scan plan (r8 — the SQL-text port above stays as the oracle):
    the oracle's 8 lineitem branches all filter the SAME rows by channel
    tag, so ONE year-filtered scan + broadcast part join feeds one brand-
    keyed conditional aggregation — the 3-channel INTERSECT becomes
    ``COUNT(DISTINCT channel) = 3`` (collect_set: avoids the expand),
    this-year/last-year become conditional sums, and the UNION-ALL global
    average is a whole-frame window over the TINY per-brand aggregate
    (brand cardinality, never fact rows). The reference gets the same
    dedup from its common-subgraph optimizer
    (StreamCommonSubGraphBasedOptimizer.scala:47); Spark inlines repeated
    CTEs, so the fusion lives in the builder. Plan-pinned to ≤2 lineitem
    scans by tests/test_plan_lint.py."""
    from pyspark.sql import Window

    from apache_flink_spark.queries._util import dec, dround
    from apache_flink_spark.queries._util import t as _t

    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    yr = F.year("l_shipdate")
    mo = F.month("l_shipdate")
    amt = dec("l_quantity") * dec("l_extendedprice")
    base = (
        li.filter(yr.isin(1999, 2000, 2001))
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .select(
            "p_brand",
            F.expr(_CHANNEL).alias("channel"),
            amt.alias("amt"),
            (
                (F.expr(_CHANNEL) == "store")
                & (yr == 2000) & (mo == 12)
            ).alias("is_ty"),
            (
                (F.expr(_CHANNEL) == "store")
                & (yr == 1999) & (mo == 12)
            ).alias("is_ly"),
        )
    )
    per_brand = base.groupBy("p_brand").agg(
        F.size(F.collect_set("channel")).alias("nchan"),
        F.sum("amt").alias("amt_all"),
        F.count(F.lit(1)).alias("cnt_all"),
        F.sum(F.when(F.col("is_ty"), F.col("amt"))).alias("sum_ty"),
        F.sum(F.when(F.col("is_ly"), F.col("amt"))).alias("sum_ly"),
    )
    w = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    gated = per_brand.withColumn(
        "average_sales",
        dround(F.sum("amt_all").over(w)) / F.sum("cnt_all").over(w),
    )
    return (
        gated.filter(
            (F.col("nchan") == 3)
            & F.col("sum_ty").isNotNull()
            & F.col("sum_ly").isNotNull()
            & (dround(F.col("sum_ty")) > F.col("average_sales"))
            & (dround(F.col("sum_ly")) > F.col("average_sales"))
        )
        .select(
            "p_brand",
            dround(F.col("sum_ty")).alias("this_year_sales"),
            dround(F.col("sum_ly")).alias("last_year_sales"),
        )
        .orderBy("p_brand")
        .limit(100)
    )


_DS_Q23B = f"""
    WITH freq AS (
        SELECT l_partkey AS item_sk
        FROM lineitem
        WHERE {_CHANNEL} = 'store'
          AND EXTRACT(YEAR FROM l_shipdate) IN (1998, 1999, 2000, 2001)
        GROUP BY l_partkey, l_shipdate
        HAVING COUNT(*) > 1
    ), maxs AS (
        SELECT MAX(csales) AS tpcds_cmax
        FROM (
            SELECT o_custkey,
                   CAST(ROUND(SUM({_AMT}), 2) AS DOUBLE) AS csales
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            WHERE {_CHANNEL} = 'store'
              AND EXTRACT(YEAR FROM l_shipdate)
                  IN (1998, 1999, 2000, 2001)
            GROUP BY o_custkey
        ) p
    ), best AS (
        SELECT o_custkey AS cust
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE {_CHANNEL} = 'store'
        GROUP BY o_custkey
        HAVING CAST(ROUND(SUM({_AMT}), 2) AS DOUBLE)
               > CAST(0.5 AS DOUBLE) * (SELECT tpcds_cmax FROM maxs)
    )
    SELECT c_name, CAST(ROUND(SUM(sales_dec), 2) AS DOUBLE) AS sales
    FROM (
        SELECT o_custkey AS ck, SUM({_AMT}) AS sales_dec
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE {_CHANNEL} = 'catalog'
          AND EXTRACT(YEAR FROM l_shipdate) = 2000
          AND EXTRACT(MONTH FROM l_shipdate) = 2
          AND l_partkey IN (SELECT item_sk FROM freq)
          AND o_custkey IN (SELECT cust FROM best)
        GROUP BY o_custkey
        UNION ALL
        SELECT o_custkey, SUM({_AMT})
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE {_CHANNEL} = 'web'
          AND EXTRACT(YEAR FROM l_shipdate) = 2000
          AND EXTRACT(MONTH FROM l_shipdate) = 2
          AND l_partkey IN (SELECT item_sk FROM freq)
          AND o_custkey IN (SELECT cust FROM best)
        GROUP BY o_custkey
    ) u
    JOIN customer ON ck = c_custkey
    GROUP BY c_name
    ORDER BY c_name, sales
    LIMIT 100
"""


@query("ds_q23b_best_customer_channel_union", oracle=_DS_Q23B)
def ds_q23b_best_customer_channel_union(spark, sf_dir):
    """TPC-DS query23b shape (query23b.sql): the frequent-item gate
    (per item-day count HAVING) and the best-customer gate (HAVING above
    half the MAX of a per-customer aggregate) restrict a catalog+web
    UNION that is re-aggregated per customer NAME — 23a emits one
    combined scalar instead.

    Single-scan plan (r8): the oracle's 5 lineitem branches become ONE
    scan + orders join into a NARROW persisted projection (channel,
    custkey, partkey, ship day, amt — the Spark analog of the reference's
    common-subgraph reuse, StreamCommonSubGraphBasedOptimizer.scala:47);
    the three gate aggregations (different grouping keys, so not fusable
    into one groupBy) each re-read the cached base instead of re-scanning
    the fact table. The two UNION ALL channel branches collapse into one
    aggregation: their inner per-customer DECIMAL sums are re-summed
    un-rounded by the outer GROUP BY c_name, so summing the qualifying
    rows directly is exact-identical."""
    from apache_flink_spark.queries._util import dec, dround
    from apache_flink_spark.queries._util import t as _t

    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    yr = F.year("l_shipdate")
    mo = F.month("l_shipdate")
    ch = F.expr(_CHANNEL)
    amt = dec("l_quantity") * dec("l_extendedprice")
    tagged = run_persist(
        li.filter(
            (ch == "store")
            | (ch.isin("catalog", "web") & (yr == 2000) & (mo == 2))
        )
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            ch.alias("channel"),
            "o_custkey",
            "l_partkey",
            "l_shipdate",
            yr.alias("yr"),
            amt.alias("amt"),
        ),
        "ds_q23b.tagged",
    )
    store = tagged.filter(F.col("channel") == "store")
    freq = (
        store.filter(F.col("yr").isin(1998, 1999, 2000, 2001))
        .groupBy("l_partkey", "l_shipdate")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") > 1)
        .select(F.col("l_partkey").alias("item_sk"))
        .distinct()
    )
    cust = store.groupBy("o_custkey").agg(
        F.sum("amt").alias("sum_all"),
        F.sum(
            F.when(F.col("yr").isin(1998, 1999, 2000, 2001), F.col("amt"))
        ).alias("sum_y"),
    )
    cmax = cust.agg(F.max(dround(F.col("sum_y"))).alias("tpcds_cmax"))
    best = (
        cust.join(F.broadcast(cmax))
        .filter(
            dround(F.col("sum_all"))
            > F.lit(0.5).cast("double") * F.col("tpcds_cmax")
        )
        .select(F.col("o_custkey").alias("cust"))
    )
    # gate sets are aggregated intermediates (item- / customer-dimension
    # bounded, never fact-sized) — left to AQE, which broadcasts them when
    # small and shuffle-joins when a 100 TB run makes them wide
    qualifying = (
        tagged.filter(F.col("channel").isin("catalog", "web"))
        .join(freq, F.col("l_partkey") == F.col("item_sk"), "semi")
        .join(best, F.col("o_custkey") == F.col("cust"), "semi")
    )
    return (
        qualifying.join(
            customer, F.col("o_custkey") == F.col("c_custkey")
        )
        .groupBy("c_name")
        .agg(dround(F.sum("amt")).alias("sales"))
        .orderBy("c_name", "sales")
        .limit(100)
    )


_DS_Q24B = f"""
    WITH ssales AS (
        SELECT c_name, s_name, p_brand, p_type,
               SUM(CAST(s.l_extendedprice AS DECIMAL(12,4))) AS netpaid_dec
        FROM lineitem s
        JOIN lineitem r
          ON s.l_orderkey = r.l_orderkey AND s.l_partkey = r.l_partkey
         AND s.l_linenumber <> r.l_linenumber
        JOIN orders ON s.l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation cn ON c_nationkey = cn.n_nationkey
        JOIN supplier ON s.l_suppkey = s_suppkey
        JOIN nation sn ON s_nationkey = sn.n_nationkey
        JOIN part ON s.l_partkey = p_partkey
        WHERE s.l_returnflag <> 'R' AND r.l_returnflag = 'R'
          AND substr(c_name, 17, 2) = substr(s_name, 17, 2)
          AND cn.n_name <> sn.n_name
        GROUP BY c_name, s_name, p_brand, p_type
    )
    SELECT c_name, s_name,
           CAST(ROUND(SUM(netpaid_dec), 2) AS DOUBLE) AS paid
    FROM ssales
    WHERE p_brand = 'Brand#23'
    GROUP BY c_name, s_name
    HAVING CAST(ROUND(SUM(netpaid_dec), 2) AS DOUBLE) >
           (SELECT CAST(0.05 AS DOUBLE)
                   * (CAST(ROUND(SUM(netpaid_dec), 2) AS DOUBLE)
                      / COUNT(*))
            FROM ssales)
    ORDER BY c_name, s_name
    LIMIT 100
"""


@query("ds_q24b_ticket_zip_wide_group", oracle=_DS_Q24B)
def ds_q24b_ticket_zip_wide_group(spark, sf_dir):
    """TPC-DS query24b shape (query24b.sql): sale rows joined to their
    return rows on the ticket key, restricted by a cross-dimension zip
    EQUALITY plus a nation INEQUALITY, aggregated over a wide group then
    RE-grouped with a HAVING against a scalar average over the same CTE
    (24a's threshold compares group sums directly)."""
    return _sql(spark, sf_dir, _DS_Q24B)


_DS_Q39B = f"""
    WITH m AS (
        SELECT l_suppkey AS wh, l_partkey AS item,
               CAST(EXTRACT(MONTH FROM l_shipdate) AS BIGINT) AS moy,
               COUNT(*) AS cnt,
               CAST(ROUND(SUM({_QTY}), 2) AS DOUBLE) AS qsum,
               CAST(ROUND(SUM({_QTY} * {_QTY}), 2) AS DOUBLE) AS qsq
        FROM lineitem WHERE EXTRACT(YEAR FROM l_shipdate) = 1996
        GROUP BY 1, 2, 3
    )
    SELECT m1.wh AS wh, m1.item AS item, m1.moy AS moy1, m2.moy AS moy2,
           m1.qsum AS qsum1, m2.qsum AS qsum2
    FROM m m1
    JOIN m m2 ON m1.wh = m2.wh AND m1.item = m2.item
             AND m1.moy = 1 AND m2.moy = 2
    WHERE m1.cnt > 1 AND m2.cnt > 1
      AND m1.qsq * m1.cnt > CAST(1.5 AS DOUBLE) * m1.qsum * m1.qsum
      AND m2.qsq * m2.cnt > CAST(1.5 AS DOUBLE) * m2.qsum * m2.qsum
      AND m1.qsq * m1.cnt > CAST(2.25 AS DOUBLE) * m1.qsum * m1.qsum
    ORDER BY wh, item, moy1
    LIMIT 100
"""


@query("ds_q39b_asymmetric_volatility", oracle=_DS_Q39B)
def ds_q39b_asymmetric_volatility(spark, sf_dir):
    """TPC-DS query39b shape (query39b.sql): 39a's consecutive-month
    volatility pair pinned to months (1, 2) with the b-variant's EXTRA
    threshold on the first month only (inv1.cov > 1.5 — here the
    cross-multiplied 2.25 factor, doubles from exact rounded sums)."""
    return _sql(spark, sf_dir, _DS_Q39B)
