"""TPC-DS query SHAPES (4 of 4): 8 more distinct structures — EXCEPT
chains, scalar-aggregate ratios, disjunctive range chains, time-slot
ratios, weekday pivots, windowed top-k under ROLLUP, YoY decline and
null-channel unions (continues tpcds_shapes.py; same channel mapping and
determinism contract). Reference: flink-tpcds-test/tpcds-tool/query/.

- ds_q43 (query43.sql): per-supplier weekday pivot columns
- ds_q48 (query48.sql): one aggregate under OR'd (segment x range) blocks
- ds_q61 (query61.sql): promotional / total revenue ratio — two one-row
                        scalar aggregates cross-joined, x100
- ds_q67 (query67.sql): ROLLUP + rank() <= k per category partition
- ds_q75 (query75.sql): year-over-year decline on BOTH count and amount,
                        UNION (distinct) of channel legs
- ds_q76 (query76.sql): UNION ALL of "degenerate-dimension" legs with
                        per-leg constants, counted together
- ds_q87 (query87.sql): EXCEPT chain (store minus catalog minus web)
- ds_q90 (query90.sql): morning / evening event-count ratio (events)
"""

from __future__ import annotations

from apache_flink_spark.queries.registry import query
from apache_flink_spark.queries.tpcds_shapes import _PRICE, _QTY, _REV, _sql
from apache_flink_spark.run_cache import run_persist

_DS_Q43 = f"""
    SELECT s_name,
           CAST(ROUND(SUM(CASE WHEN EXTRACT(MONTH FROM l_shipdate) = 1
                               THEN {_PRICE} ELSE CAST(0 AS DECIMAL(12,4))
                          END), 2) AS DOUBLE) AS jan_sales,
           CAST(ROUND(SUM(CASE WHEN EXTRACT(MONTH FROM l_shipdate) = 2
                               THEN {_PRICE} ELSE CAST(0 AS DECIMAL(12,4))
                          END), 2) AS DOUBLE) AS feb_sales,
           CAST(ROUND(SUM(CASE WHEN EXTRACT(MONTH FROM l_shipdate) = 3
                               THEN {_PRICE} ELSE CAST(0 AS DECIMAL(12,4))
                          END), 2) AS DOUBLE) AS mar_sales,
           CAST(ROUND(SUM(CASE WHEN EXTRACT(MONTH FROM l_shipdate) = 4
                               THEN {_PRICE} ELSE CAST(0 AS DECIMAL(12,4))
                          END), 2) AS DOUBLE) AS apr_sales
    FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
    WHERE EXTRACT(YEAR FROM l_shipdate) = 1996
    GROUP BY s_name
    ORDER BY s_name
    LIMIT 100
"""


@query("ds_q43_weekday_pivot", oracle=_DS_Q43)
def ds_q43_weekday_pivot(spark, sf_dir):
    """TPC-DS query43 shape (query43.sql): one dimension row per group with
    the fact table pivoted into per-period conditional-sum columns (the
    reference pivots d_day_name; months are the portable equivalent —
    day-name extraction is dialect-split)."""
    return _sql(spark, sf_dir, _DS_Q43)


_DS_Q48 = f"""
    SELECT CAST(ROUND(SUM({_QTY}), 2) AS DOUBLE) AS total_qty,
           COUNT(*) AS n_lines
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    WHERE (c_mktsegment = 'BUILDING'
           AND l_extendedprice BETWEEN 1000 AND 30000
           AND l_discount BETWEEN 0.00 AND 0.04)
       OR (c_mktsegment = 'MACHINERY'
           AND l_extendedprice BETWEEN 20000 AND 60000
           AND l_discount BETWEEN 0.02 AND 0.06)
       OR (c_mktsegment = 'HOUSEHOLD'
           AND l_extendedprice BETWEEN 50000 AND 105000
           AND l_discount BETWEEN 0.05 AND 0.10)
"""


@query("ds_q48_or_range_blocks", oracle=_DS_Q48)
def ds_q48_or_range_blocks(spark, sf_dir):
    """TPC-DS query48 shape (query48.sql): one aggregate whose predicate is
    a DISJUNCTION of (segment x price-range x discount-range) blocks —
    the multi-clause OR pushdown pattern."""
    return _sql(spark, sf_dir, _DS_Q48)


_DS_Q61 = f"""
    SELECT promo.rev AS promotional,
           total.rev AS total,
           promo.rev / total.rev * CAST(100 AS DOUBLE) AS promo_pct
    FROM (SELECT CAST(ROUND(SUM({_REV}), 2) AS DOUBLE) AS rev
          FROM lineitem JOIN part ON l_partkey = p_partkey
          WHERE p_type = 'PROMO'
            AND EXTRACT(YEAR FROM l_shipdate) = 1997) promo,
         (SELECT CAST(ROUND(SUM({_REV}), 2) AS DOUBLE) AS rev
          FROM lineitem
          WHERE EXTRACT(YEAR FROM l_shipdate) = 1997) total
"""


@query("ds_q61_promo_ratio", oracle=_DS_Q61)
def ds_q61_promo_ratio(spark, sf_dir):
    """TPC-DS query61 shape (query61.sql): two single-row scalar aggregates
    (promotional channel revenue vs all revenue) cross-joined into one
    ratio row x100 — the 1-row x 1-row broadcast combine."""
    return _sql(spark, sf_dir, _DS_Q61)


_DS_Q67 = f"""
    SELECT * FROM (
        SELECT p_type, p_brand, yr,
               CAST(ROUND(SUM(price), 2) AS DOUBLE) AS sumsales,
               RANK() OVER (
                   PARTITION BY GROUPING(p_brand), GROUPING(yr),
                                CASE WHEN GROUPING(p_brand) = 0
                                     THEN p_type END
                   ORDER BY SUM(price) DESC, p_brand, yr)
                   AS rk
        FROM (
            SELECT p_type, p_brand,
                   CAST(EXTRACT(YEAR FROM l_shipdate) AS BIGINT) AS yr,
                   {_PRICE} AS price
            FROM lineitem JOIN part ON l_partkey = p_partkey
        ) src
        GROUP BY ROLLUP(p_type, p_brand, yr)
    ) t
    WHERE rk <= 3 AND p_type IS NOT NULL
    ORDER BY p_type, rk, COALESCE(p_brand, 'ALL'), COALESCE(yr, -1)
"""


@query("ds_q67_rollup_rank_topk", oracle=_DS_Q67)
def ds_q67_rollup_rank_topk(spark, sf_dir):
    """TPC-DS query67 shape (query67.sql): ROLLUP over the category
    hierarchy, then rank() within each (grouping level, category)
    partition keeping the top k — rank keys are exact decimal sums with
    name tie-breaks, so both engines agree on the cut."""
    return _sql(spark, sf_dir, _DS_Q67)


def _q75_leg(chan: int) -> str:
    return f"""
        SELECT p_brand AS brand,
               CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS yr,
               COUNT(*) AS cnt,
               SUM({_PRICE}) AS amt
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN part ON l_partkey = p_partkey
        WHERE l_linenumber % 3 = {chan}
        GROUP BY 1, 2
"""


_DS_Q75 = f"""
    WITH all_sales AS (
        SELECT brand, yr, CAST(SUM(cnt) AS BIGINT) AS cnt,
               CAST(ROUND(SUM(amt), 2) AS DOUBLE) AS amt
        FROM ({_q75_leg(0)} UNION ALL {_q75_leg(1)} UNION ALL {_q75_leg(2)})
        GROUP BY brand, yr
    )
    SELECT cur.brand AS brand, prev.yr AS prev_year, cur.yr AS yr,
           prev.cnt AS prev_cnt, cur.cnt AS cur_cnt,
           prev.amt AS prev_amt, cur.amt AS cur_amt
    FROM all_sales cur JOIN all_sales prev
         ON cur.brand = prev.brand AND cur.yr = prev.yr + 1
    WHERE cur.yr = 1997
      AND CAST(cur.cnt AS DOUBLE) / prev.cnt < CAST(0.9 AS DOUBLE)
      AND cur.amt < prev.amt
    ORDER BY brand
    LIMIT 100
"""


@query("ds_q75_yoy_decline", oracle=_DS_Q75)
def ds_q75_yoy_decline(spark, sf_dir):
    """TPC-DS query75 shape (query75.sql): all channels UNION ALL'd into
    one (brand, year) ledger, self-joined on consecutive years, keeping
    brands declining in BOTH unit count (ratio < 0.9) and revenue.

    Single-scan plan (r8, was 3x lineitem/orders/part): channels
    PARTITION every row and the outer ledger re-sums the un-rounded
    per-channel partials, so one (brand, year) aggregation over the
    whole join is exact-identical; the year-over-year self-join then
    runs on the TINY aggregated ledger."""
    from pyspark.sql import functions as F

    from apache_flink_spark.queries._util import dec, dround
    from apache_flink_spark.queries._util import t as _t

    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    part = _t(spark, sf_dir, "part")
    ledger = run_persist(
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.year("o_orderdate").cast("bigint").alias("yr"),
        )
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            dround(F.sum(dec("l_extendedprice"))).alias("amt"),
        ),
        # tiny (brand x year) set — persisted so the consecutive-year
        # self-join reads it once instead of re-scanning the fact per side
        "ds_q75_yoy_decline.ledger",
    )
    cur = ledger.select(
        "brand", "yr",
        F.col("cnt").alias("cur_cnt"), F.col("amt").alias("cur_amt"),
    )
    prev = ledger.select(
        F.col("brand").alias("p_brand_"),
        F.col("yr").alias("prev_year"),
        F.col("cnt").alias("prev_cnt"), F.col("amt").alias("prev_amt"),
    )
    return (
        cur.join(
            prev,
            (F.col("brand") == F.col("p_brand_"))
            & (F.col("yr") == F.col("prev_year") + 1),
        )
        .filter(
            (F.col("yr") == 1997)
            & (
                F.col("cur_cnt").cast("double") / F.col("prev_cnt")
                < F.lit(0.9).cast("double")
            )
            & (F.col("cur_amt") < F.col("prev_amt"))
        )
        .select(
            "brand", "prev_year", "yr",
            "prev_cnt", "cur_cnt", "prev_amt", "cur_amt",
        )
        .orderBy("brand")
        .limit(100)
    )


def _q76_leg(chan: int, col: str) -> str:
    return f"""
        SELECT '{col}' AS channel, l_returnflag AS col_name,
               CAST(EXTRACT(YEAR FROM l_shipdate) AS BIGINT) AS yr,
               {_PRICE} AS sales_price
        FROM lineitem WHERE l_linenumber % 3 = {chan}
          AND l_linestatus = 'O'
"""


_DS_Q76 = f"""
    SELECT channel, col_name, yr, COUNT(*) AS sales_cnt,
           CAST(ROUND(SUM(sales_price), 2) AS DOUBLE) AS sales_amt
    FROM ({_q76_leg(0, "store")}
          UNION ALL {_q76_leg(1, "catalog")}
          UNION ALL {_q76_leg(2, "web")}) foo
    GROUP BY channel, col_name, yr
    ORDER BY channel, col_name, yr
    LIMIT 100
"""


@query("ds_q76_null_channel_union", oracle=_DS_Q76)
def ds_q76_null_channel_union(spark, sf_dir):
    """TPC-DS query76 shape (query76.sql): UNION ALL of per-channel legs
    each tagged with leg constants and a degenerate dimension column,
    counted and summed together by (channel, column, year).

    Single-scan plan (r8, was 3): the leg tag IS the channel expression
    and channels partition every row, so grouping the one filtered scan
    by (channel, col, year) is exact-identical."""
    from pyspark.sql import functions as F

    from apache_flink_spark.queries._util import dec, dround
    from apache_flink_spark.queries._util import t as _t

    li = _t(spark, sf_dir, "lineitem")
    from apache_flink_spark.queries.tpcds_shapes import _CHANNEL as _CH

    return (
        li.filter(F.col("l_linestatus") == "O")
        .groupBy(
            F.expr(_CH).alias("channel"),
            F.col("l_returnflag").alias("col_name"),
            F.year("l_shipdate").cast("bigint").alias("yr"),
        )
        .agg(
            F.count(F.lit(1)).alias("sales_cnt"),
            dround(F.sum(dec("l_extendedprice"))).alias("sales_amt"),
        )
        .orderBy("channel", "col_name", "yr")
        .limit(100)
    )


def _q87_leg(chan: int) -> str:
    return f"""
        SELECT DISTINCT o_custkey,
               CAST(EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS m
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        WHERE l_linenumber % 3 = {chan}
"""


_DS_Q87 = f"""
    SELECT COUNT(*) AS store_only_cust
    FROM (({_q87_leg(0)}) EXCEPT ({_q87_leg(1)}) EXCEPT ({_q87_leg(2)})) t
"""


@query("ds_q87_except_chain", oracle=_DS_Q87)
def ds_q87_except_chain(spark, sf_dir):
    """TPC-DS query87 shape (query87.sql): COUNT over a chained EXCEPT —
    (customer, month) pairs active in the store channel but in NEITHER of
    the other two (q38's INTERSECT mirror).

    Single-scan plan (r8, was 3): one (customer, month) grouping with
    per-channel presence flags — store present AND catalog/web absent."""
    from pyspark.sql import functions as F

    from apache_flink_spark.queries._util import t as _t

    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    chan = F.col("l_linenumber") % 3
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_custkey", F.month("o_orderdate").alias("m"))
        .agg(
            F.max(chan == 0).alias("s"),
            F.max(chan == 1).alias("c"),
            F.max(chan == 2).alias("w"),
        )
        .filter(F.col("s") & ~F.col("c") & ~F.col("w"))
        .agg(F.count(F.lit(1)).alias("store_only_cust"))
    )


_DS_Q90 = """
    SELECT am.cnt AS am_count, pm.cnt AS pm_count,
           CAST(am.cnt AS DOUBLE) / pm.cnt AS am_pm_ratio
    FROM (SELECT COUNT(*) AS cnt FROM events
          WHERE EXTRACT(HOUR FROM ts) BETWEEN 7 AND 9
            AND event_type IN ('click', 'view')) am,
         (SELECT COUNT(*) AS cnt FROM events
          WHERE EXTRACT(HOUR FROM ts) BETWEEN 19 AND 21
            AND event_type IN ('click', 'view')) pm
"""


@query("ds_q90_am_pm_ratio", oracle=_DS_Q90)
def ds_q90_am_pm_ratio(spark, sf_dir):
    """TPC-DS query90 shape (query90.sql): the morning/evening activity
    ratio — two one-row COUNT subqueries over hour bands cross-joined
    into a single ratio row."""
    return _sql(spark, sf_dir, _DS_Q90)
