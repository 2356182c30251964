"""TPC-DS query SHAPES (10): ds_q73..ds_q94 — round-6 port, final batch
(reference: flink-tpcds-test/tpcds-tool/query/query*.sql; same porting +
determinism contract as tpcds_shapes7.py). Completes the 103-query
reference-validated surface (VERDICT r5 item #1).

Distinct topologies: ticket-frequency band with a ratio CASE inside the
dimension filter (q73), two-channel year-over-year growth compare via a
4-way self-join of one UNION ALL CTE with CASE-guarded ratios (q74),
day-of-week ticket baskets (q79), three channel CTEs each LEFT OUTER
joined to returns at fact-row level, || -concatenated ids under
ROLLUP(channel, id) (q80), correlated state-average threshold with
address output (q81), nested IN date-subquery chain over three return
channels with share-of-total ratios (q83), GROUPING() rank on a
geography hierarchy (q86), call-center loss with OR'd demographic pairs
(q91), and multi-warehouse-shipment EXISTS + no-returns NOT EXISTS over
COUNT(DISTINCT) (q94).
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
from apache_flink_spark.queries.tpcds_shapes9 import _DAYS_SINCE

_DS_Q73 = f"""
    SELECT c_name, c_mktsegment, o_orderkey AS ticket, cnt
    FROM (
        SELECT l_orderkey, o_custkey AS ck, o_orderkey, COUNT(*) AS cnt
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE EXTRACT(DAY FROM o_orderdate) BETWEEN 1 AND 2
          AND (c_mktsegment = 'HOUSEHOLD' OR c_mktsegment = 'AUTOMOBILE')
          AND c_acctbal > 0
          AND CASE WHEN c_acctbal > 0
                   THEN CAST(o_totalprice AS DOUBLE)
                        / CAST(c_acctbal AS DOUBLE)
                   ELSE NULL END > CAST(1 AS DOUBLE)
          AND EXTRACT(YEAR FROM o_orderdate) IN (1999, 2000, 2001)
        GROUP BY l_orderkey, o_custkey, o_orderkey
        HAVING COUNT(*) BETWEEN 5 AND 7
    ) dj
    JOIN customer ON ck = c_custkey
    ORDER BY cnt DESC, c_name, ticket
    LIMIT 100
"""


@query("ds_q73_ticket_frequency_band", oracle=_DS_Q73)
def ds_q73_ticket_frequency_band(spark, sf_dir):
    """TPC-DS query73 shape (query73.sql): tickets with a line count in a
    band, gated by an OR'd demographic filter and a NULL-guarded ratio
    CASE inside the WHERE (dep_count/vehicle_count > 1 analog) — the
    HAVING band sits on the pre-join aggregate."""
    return _sql(spark, sf_dir, _DS_Q73)


_DS_Q74 = f"""
    WITH year_total AS (
        SELECT o_custkey AS cid,
               CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS yr,
               SUM({_QTY}) AS total_dec, 's' AS sale_type
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE {_CHANNEL} = 'store'
          AND EXTRACT(YEAR FROM o_orderdate) IN (2000, 2001)
        GROUP BY o_custkey, EXTRACT(YEAR FROM o_orderdate)
        UNION ALL
        SELECT o_custkey,
               CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT),
               SUM({_QTY}), 'w'
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE {_CHANNEL} = 'web'
          AND EXTRACT(YEAR FROM o_orderdate) IN (2000, 2001)
        GROUP BY o_custkey, EXTRACT(YEAR FROM o_orderdate)
    )
    SELECT ts2.cid AS customer_id, c_name AS customer_name
    FROM year_total ts1, year_total ts2, year_total tw1, year_total tw2,
         customer
    WHERE ts2.cid = ts1.cid AND ts1.cid = tw2.cid AND ts1.cid = tw1.cid
      AND ts1.sale_type = 's' AND tw1.sale_type = 'w'
      AND ts2.sale_type = 's' AND tw2.sale_type = 'w'
      AND ts1.yr = 2000 AND ts2.yr = 2001
      AND tw1.yr = 2000 AND tw2.yr = 2001
      AND ts1.total_dec > 0 AND tw1.total_dec > 0
      AND ts1.cid = c_custkey
      AND CASE WHEN tw1.total_dec > 0
               THEN CAST(ROUND(tw2.total_dec, 2) AS DOUBLE)
                    / CAST(ROUND(tw1.total_dec, 2) AS DOUBLE)
               ELSE NULL END
        > CASE WHEN ts1.total_dec > 0
               THEN CAST(ROUND(ts2.total_dec, 2) AS DOUBLE)
                    / CAST(ROUND(ts1.total_dec, 2) AS DOUBLE)
               ELSE NULL END
    ORDER BY customer_id, customer_name
    LIMIT 100
"""


@query("ds_q74_two_channel_growth", oracle=_DS_Q74)
def ds_q74_two_channel_growth(spark, sf_dir):
    """TPC-DS query74 shape (query74.sql): customers whose web quantity
    growth beats their store growth — ONE union CTE self-joined four
    ways (store/web x first/second year) with CASE-guarded ratio
    comparison on exactly-rounded doubles (ds_q11 is the 2-measure
    sibling; q74 adds the CASE guards and quantity measure).

    Single-scan plan (r8, was 4 lineitem+orders scans): four fixed
    (channel, year) conditional DECIMAL sums per customer; the >0 guards
    compare the exact decimals like the oracle, rounding only inside the
    ratio."""
    from pyspark.sql import functions as F

    from apache_flink_spark.queries._util import dec
    from apache_flink_spark.queries._util import t as _t
    from apache_flink_spark.queries.tpcds_shapes import _CHANNEL as _CH

    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    ch = F.expr(_CH)
    yr = F.year("o_orderdate")
    qty = dec("l_quantity")

    def cell(c, y):
        return F.sum(F.when((ch == c) & (yr == y), qty))

    g = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(yr.isin(2000, 2001) & ch.isin("store", "web"))
        .groupBy(F.col("o_custkey").alias("customer_id"))
        .agg(
            cell("store", 2000).alias("ts1"),
            cell("store", 2001).alias("ts2"),
            cell("web", 2000).alias("tw1"),
            cell("web", 2001).alias("tw2"),
        )
    )

    def r(c):
        return F.round(F.col(c), 2).cast("double")

    return (
        g.filter(
            F.col("ts1").isNotNull() & F.col("ts2").isNotNull()
            & F.col("tw1").isNotNull() & F.col("tw2").isNotNull()
            & (F.col("ts1") > 0) & (F.col("tw1") > 0)
            & (r("tw2") / r("tw1") > r("ts2") / r("ts1"))
        )
        .join(
            F.broadcast(customer),
            F.col("customer_id") == F.col("c_custkey"),
        )
        .select("customer_id", F.col("c_name").alias("customer_name"))
        .orderBy("customer_id", "customer_name")
        .limit(100)
    )


_DS_Q79 = f"""
    SELECT c_name, substr(city, 1, 15) AS city, o_orderkey AS ticket,
           amt, profit
    FROM (
        SELECT l_orderkey, o_custkey AS ck, o_orderkey,
               MIN(n_name) AS city,
               CAST(ROUND(SUM({_PRICE}
                   * CAST(l_discount AS DECIMAL(6,4))), 2) AS DOUBLE)
                   AS amt,
               CAST(ROUND(SUM({_REV}), 2) AS DOUBLE) AS profit
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE MOD(CAST(EXTRACT(DAY FROM (o_orderdate
                  - TIMESTAMP '1995-01-02 00:00:00')) AS BIGINT), 7) = 0
          AND EXTRACT(YEAR FROM o_orderdate) IN (1999, 2000, 2001)
          AND s_acctbal BETWEEN 2000 AND 8000
        GROUP BY l_orderkey, o_custkey, o_orderkey
    ) ms
    JOIN customer ON ck = c_custkey
    WHERE c_mktsegment = 'MACHINERY' OR c_acctbal > 5000
    ORDER BY c_name, ticket, profit
    LIMIT 100
"""


@query("ds_q79_monday_baskets", oracle=_DS_Q79)
def ds_q79_monday_baskets(spark, sf_dir):
    """TPC-DS query79 shape (query79.sql): Monday ticket baskets (coupon
    amount + profit per ticket) for mid-size stores, joined to the
    customer with an OR'd demographic filter — the day-of-week comes
    from the portable days-since-Monday mod 7."""
    return _sql(spark, sf_dir, _DS_Q79)


def _q80_channel(ch: str, id_expr: str, extra_join: str) -> str:
    return f"""
        SELECT {id_expr} AS id,
               SUM(s.price) AS sales_dec,
               SUM(COALESCE(r.ret_price, CAST(0 AS DECIMAL(12,4))))
                   AS ret_dec,
               SUM(s.rev - COALESCE(r.ret_price, CAST(0 AS DECIMAL(12,4))))
                   AS profit_dec
        FROM (
            SELECT l_orderkey, l_partkey, l_linenumber, l_suppkey,
                   {_PRICE} AS price, {_REV} AS rev
            FROM lineitem
            WHERE {_CHANNEL} = '{ch}' AND l_returnflag <> 'R'
              AND l_shipdate BETWEEN TIMESTAMP '2000-08-23 00:00:00'
                                 AND TIMESTAMP '2000-09-22 00:00:00'
        ) s
        LEFT OUTER JOIN (
            SELECT l_orderkey, l_partkey, {_PRICE} AS ret_price
            FROM lineitem WHERE l_returnflag = 'R'
        ) r ON s.l_orderkey = r.l_orderkey AND s.l_partkey = r.l_partkey
        {extra_join}
        GROUP BY {id_expr}"""


_DS_Q80 = f"""
    WITH ssr AS ({_q80_channel(
        "store", "s_name",
        "JOIN supplier ON s.l_suppkey = s_suppkey AND s_acctbal > 0")}
    ), csr AS ({_q80_channel(
        "catalog", "p_brand",
        "JOIN part ON s.l_partkey = p_partkey AND p_retailprice > 950")}
    ), wsr AS ({_q80_channel(
        "web", "n_name",
        "JOIN supplier ON s.l_suppkey = s_suppkey "
        "JOIN nation ON s_nationkey = n_nationkey")}
    )
    SELECT channel, id,
           CAST(ROUND(SUM(sales_dec), 2) AS DOUBLE) AS sales,
           CAST(ROUND(SUM(ret_dec), 2) AS DOUBLE) AS returns_amt,
           CAST(ROUND(SUM(profit_dec), 2) AS DOUBLE) AS profit
    FROM (
        SELECT 'store channel' AS channel, 'store' || id AS id,
               sales_dec, ret_dec, profit_dec FROM ssr
        UNION ALL
        SELECT 'catalog channel', 'catalog' || id,
               sales_dec, ret_dec, profit_dec FROM csr
        UNION ALL
        SELECT 'web channel', 'web' || id,
               sales_dec, ret_dec, profit_dec FROM wsr
    ) x
    GROUP BY ROLLUP (channel, id)
    ORDER BY channel NULLS FIRST, id NULLS FIRST
    LIMIT 100
"""


@query("ds_q80_channel_returns_rollup", oracle=_DS_Q80)
def ds_q80_channel_returns_rollup(spark, sf_dir):
    """TPC-DS query80 shape (query80.sql): per-channel sales/returns/
    profit where returns attach by LEFT OUTER join AT FACT-ROW level
    (ds_q77 outer-joins the aggregates), channel ids concatenated with
    || before a ROLLUP(channel, id) summary.

    Two-scan plan (r8, was 6): channels partition the date-windowed sales
    side, so ONE channel-tagged sales scan LEFT-joins the one returns
    scan; the per-channel extra dimension joins (supplier/part/nation)
    become three broadcast joins with a per-channel eligibility CASE and
    a per-channel id CASE. The ROLLUP runs on the tiny aggregated
    intermediate."""
    from pyspark.sql import functions as F

    from apache_flink_spark.queries._util import dec
    from apache_flink_spark.queries._util import t as _t
    from apache_flink_spark.queries.tpcds_shapes import _CHANNEL as _CH

    li = _t(spark, sf_dir, "lineitem")
    supplier = _t(spark, sf_dir, "supplier")
    part = _t(spark, sf_dir, "part")
    nation = _t(spark, sf_dir, "nation")
    price = dec("l_extendedprice")
    rev = price * (
        F.lit(1).cast("decimal(6,4)") - dec("l_discount", "decimal(6,4)")
    )
    sales = (
        li.filter(
            (F.col("l_returnflag") != "R")
            & F.col("l_shipdate").between(
                "2000-08-23 00:00:00", "2000-09-22 00:00:00"
            )
        )
        .select(
            F.expr(_CH).alias("ch"),
            "l_orderkey", "l_partkey", "l_suppkey",
            price.alias("price"), rev.alias("rev"),
        )
    )
    rets = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("r_ok"),
        F.col("l_partkey").alias("r_pk"),
        price.alias("ret_price"),
    )
    ch = F.col("ch")
    joined = (
        sales.join(
            rets,
            (F.col("l_orderkey") == F.col("r_ok"))
            & (F.col("l_partkey") == F.col("r_pk")),
            "left",
        )
        .join(
            F.broadcast(supplier),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .join(
            F.broadcast(part), F.col("l_partkey") == F.col("p_partkey")
        )
        .join(
            F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
        )
        .filter(
            F.when(ch == "store", F.col("s_acctbal") > 0)
            .when(ch == "catalog", F.col("p_retailprice") > 950)
            .otherwise(F.lit(True))
        )
    )
    zero = F.lit(0).cast("decimal(12,4)")
    per = joined.groupBy(
        F.concat(
            ch, F.lit(" channel")
        ).alias("channel"),
        F.concat(
            ch,
            F.when(ch == "store", F.col("s_name"))
            .when(ch == "catalog", F.col("p_brand"))
            .otherwise(F.col("n_name")),
        ).alias("id"),
    ).agg(
        F.sum(F.col("price")).alias("sales_dec"),
        F.sum(F.coalesce(F.col("ret_price"), zero)).alias("ret_dec"),
        F.sum(
            F.col("rev") - F.coalesce(F.col("ret_price"), zero)
        ).alias("profit_dec"),
    )
    return (
        per.rollup("channel", "id")
        .agg(
            F.round(F.sum("sales_dec"), 2).cast("double").alias("sales"),
            F.round(F.sum("ret_dec"), 2).cast("double").alias("returns_amt"),
            F.round(F.sum("profit_dec"), 2).cast("double").alias("profit"),
        )
        .orderBy(
            F.col("channel").asc_nulls_first(),
            F.col("id").asc_nulls_first(),
        )
        .limit(100)
    )


_DS_Q81 = f"""
    WITH ctr AS (
        SELECT o_custkey AS ck, c_nationkey AS nk,
               SUM({_PRICE} * (CAST(1 AS DECIMAL(6,4))
                   + CAST(l_tax AS DECIMAL(6,4)))) AS ret_dec
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE l_returnflag = 'R' AND {_CHANNEL} = 'catalog'
          AND EXTRACT(YEAR FROM l_shipdate) = 2000
        GROUP BY o_custkey, c_nationkey
    )
    SELECT c_name, n_name, r_name,
           CAST(ROUND(ret_dec, 2) AS DOUBLE) AS ctr_total_return
    FROM ctr ctr1
    JOIN customer ON ctr1.ck = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE CAST(ROUND(ctr1.ret_dec, 2) AS DOUBLE) >
          CAST(1.2 AS DOUBLE) * (
              SELECT CAST(ROUND(SUM(ctr2.ret_dec), 2) AS DOUBLE) / COUNT(*)
              FROM ctr ctr2 WHERE ctr2.nk = ctr1.nk)
      AND n_regionkey = 2
    ORDER BY c_name, n_name
    LIMIT 100
"""


@query("ds_q81_catalog_return_outliers", oracle=_DS_Q81)
def ds_q81_catalog_return_outliers(spark, sf_dir):
    """TPC-DS query81 shape (query81.sql): catalog-return totals with the
    tax-inclusive amount, customers above 1.2x their state average
    (correlated subquery like q30) with the ADDRESS hierarchy emitted
    via two extra dimension joins and a region filter.

    Single-derivation plan (r8, was 3 scans of the CTE's join): per-state
    average via a window over the tiny (customer, state) aggregate — the
    ds_q30 fusion plus the address-hierarchy dimension joins."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from apache_flink_spark.queries._util import dec, dround
    from apache_flink_spark.queries._util import t as _t
    from apache_flink_spark.queries.tpcds_shapes import _CHANNEL as _CH

    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    amt = dec("l_extendedprice") * (
        F.lit(1).cast("decimal(6,4)") + dec("l_tax", "decimal(6,4)")
    )
    ctr = (
        li.filter(
            (F.col("l_returnflag") == "R")
            & (F.expr(_CH) == "catalog")
            & (F.year("l_shipdate") == 2000)
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
        .agg(F.sum(amt).alias("ret_dec"))
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
        .join(
            F.broadcast(nation),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(region),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .filter(F.col("n_regionkey") == 2)
        .select(
            "c_name", "n_name", "r_name",
            dround(F.col("ret_dec")).alias("ctr_total_return"),
        )
        .orderBy("c_name", "n_name")
        .limit(100)
    )


_WK = f"CAST(FLOOR({_DAYS_SINCE} / 7.0) AS BIGINT)"


def _q83_channel(ch: str, alias: str) -> str:
    return f"""
        SELECT p_brand AS item_id, SUM({_QTY}) AS {alias}_dec
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_returnflag = 'R' AND {_CHANNEL} = '{ch}'
          AND {_WK} IN (
              SELECT DISTINCT {_WK} FROM lineitem
              WHERE l_shipdate IN (TIMESTAMP '2000-06-30 00:00:00',
                                   TIMESTAMP '2000-09-27 00:00:00',
                                   TIMESTAMP '2000-11-17 00:00:00'))
        GROUP BY p_brand"""


_DS_Q83 = f"""
    WITH sr_items AS ({_q83_channel("store", "sr")}
    ), cr_items AS ({_q83_channel("catalog", "cr")}
    ), wr_items AS ({_q83_channel("web", "wr")}
    )
    SELECT sr_items.item_id,
           CAST(ROUND(sr_dec, 2) AS DOUBLE) AS sr_item_qty,
           CAST(ROUND(sr_dec, 2) AS DOUBLE)
               / (CAST(ROUND(sr_dec + cr_dec + wr_dec, 2) AS DOUBLE)
                  / CAST(3 AS DOUBLE)) * CAST(100 AS DOUBLE) AS sr_dev,
           CAST(ROUND(cr_dec, 2) AS DOUBLE) AS cr_item_qty,
           CAST(ROUND(cr_dec, 2) AS DOUBLE)
               / (CAST(ROUND(sr_dec + cr_dec + wr_dec, 2) AS DOUBLE)
                  / CAST(3 AS DOUBLE)) * CAST(100 AS DOUBLE) AS cr_dev,
           CAST(ROUND(wr_dec, 2) AS DOUBLE) AS wr_item_qty,
           CAST(ROUND(wr_dec, 2) AS DOUBLE)
               / (CAST(ROUND(sr_dec + cr_dec + wr_dec, 2) AS DOUBLE)
                  / CAST(3 AS DOUBLE)) * CAST(100 AS DOUBLE) AS wr_dev,
           CAST(ROUND(sr_dec + cr_dec + wr_dec, 2) AS DOUBLE)
               / CAST(3 AS DOUBLE) AS average
    FROM sr_items
    JOIN cr_items ON sr_items.item_id = cr_items.item_id
    JOIN wr_items ON sr_items.item_id = wr_items.item_id
    ORDER BY sr_items.item_id, sr_item_qty
    LIMIT 100
"""


@query("ds_q83_return_share_by_channel", oracle=_DS_Q83)
def ds_q83_return_share_by_channel(spark, sf_dir):
    """TPC-DS query83 shape (query83.sql): per-item return quantities in
    three channels — each CTE filtered by a NESTED date subquery (weeks
    containing three event dates), equi-joined pairwise on item with
    share-of-average percentage columns from exactly-rounded sums.

    Two-scan plan (r8, was 6): channels partition the returns rows, so
    one scan with three conditional rounded sums per item replaces the
    three legs (the pairwise inner joins become IS NOT NULL guards); the
    week-set subquery is the second scan, evaluated ONCE and semi-joined
    instead of re-run per leg."""
    from pyspark.sql import functions as F

    from apache_flink_spark.queries._util import dec, dround
    from apache_flink_spark.queries._util import t as _t
    from apache_flink_spark.queries.tpcds_shapes import _CHANNEL as _CH

    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    wk = F.expr(_WK)  # the oracle's exact week arithmetic
    weeks = (
        li.filter(
            F.col("l_shipdate").isin(
                "2000-06-30 00:00:00",
                "2000-09-27 00:00:00",
                "2000-11-17 00:00:00",
            )
        )
        .select(wk.alias("wk"))
        .distinct()
    )
    ch = F.expr(_CH)
    qty = dec("l_quantity")

    def cell(c):
        return dround(F.sum(F.when(ch == c, qty)))

    g = (
        li.filter(F.col("l_returnflag") == "R")
        .join(F.broadcast(weeks), wk == F.col("wk"), "semi")
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(F.col("p_brand").alias("item_id"))
        .agg(
            cell("store").alias("sr_item_qty"),
            cell("catalog").alias("cr_item_qty"),
            cell("web").alias("wr_item_qty"),
        )
        .filter(
            F.col("sr_item_qty").isNotNull()
            & F.col("cr_item_qty").isNotNull()
            & F.col("wr_item_qty").isNotNull()
        )
    )
    three = F.lit(3).cast("double")
    avg_ = (
        F.round(
            F.col("sr_item_qty") + F.col("cr_item_qty")
            + F.col("wr_item_qty"), 2
        ).cast("double") / three
    )
    hundred = F.lit(100).cast("double")
    return g.select(
        "item_id",
        "sr_item_qty",
        (F.col("sr_item_qty") / avg_ * hundred).alias("sr_dev"),
        "cr_item_qty",
        (F.col("cr_item_qty") / avg_ * hundred).alias("cr_dev"),
        "wr_item_qty",
        (F.col("wr_item_qty") / avg_ * hundred).alias("wr_dev"),
        avg_.alias("average"),
    ).orderBy("item_id", "sr_item_qty").limit(100)


_DS_Q86 = f"""
    SELECT CAST(ROUND(SUM({_REV}), 2) AS DOUBLE) AS total_sum,
           r_name, n_name,
           GROUPING(r_name) + GROUPING(n_name) AS lochierarchy,
           RANK() OVER (
               PARTITION BY GROUPING(r_name) + GROUPING(n_name),
                            CASE WHEN GROUPING(n_name) = 0
                                 THEN r_name END
               ORDER BY CAST(ROUND(SUM({_REV}), 2) AS DOUBLE) DESC)
               AS rank_within_parent
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE {_CHANNEL} = 'web'
      AND EXTRACT(YEAR FROM l_shipdate) = 2000
    GROUP BY ROLLUP (r_name, n_name)
    ORDER BY lochierarchy DESC,
             CASE WHEN GROUPING(r_name) + GROUPING(n_name) = 0
                  THEN r_name END NULLS FIRST,
             rank_within_parent, r_name NULLS FIRST, n_name NULLS FIRST
    LIMIT 100
"""


@query("ds_q86_geo_rollup_rank", oracle=_DS_Q86)
def ds_q86_geo_rollup_rank(spark, sf_dir):
    """TPC-DS query86 shape (query86.sql): web revenue under a
    GEOGRAPHY rollup with RANK() partitioned by the GROUPING() bits,
    revenue-descending within parent — completes the q36/q70/q86
    GROUPING-rank family (plain sum, DESC, region/nation hierarchy)."""
    return _sql(spark, sf_dir, _DS_Q86)


_DS_Q91 = f"""
    SELECT s_name AS call_center, n_name AS cc_nation,
           c_mktsegment,
           CAST(ROUND(SUM({_PRICE}
               * CAST(l_discount AS DECIMAL(6,4))), 2) AS DOUBLE)
               AS returns_loss
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE l_returnflag = 'R' AND {_CHANNEL} = 'catalog'
      AND EXTRACT(YEAR FROM l_shipdate) = 1998
      AND EXTRACT(MONTH FROM l_shipdate) = 11
      AND ((c_mktsegment = 'BUILDING' AND c_acctbal < 1000)
        OR (c_mktsegment = 'MACHINERY' AND c_acctbal > 5000))
    GROUP BY s_name, n_name, c_mktsegment
    ORDER BY returns_loss DESC, s_name, n_name, c_mktsegment
    LIMIT 100
"""


@query("ds_q91_call_center_loss", oracle=_DS_Q91)
def ds_q91_call_center_loss(spark, sf_dir):
    """TPC-DS query91 shape (query91.sql): call-center return losses for
    two OR'd demographic profiles in one month, loss-descending — a
    7-relation star with the disjunctive demographic pair filter."""
    return _sql(spark, sf_dir, _DS_Q91)


_DS_Q94 = f"""
    SELECT COUNT(DISTINCT ws1.l_orderkey) AS order_count,
           CAST(ROUND(SUM(CAST(ws1.l_extendedprice AS DECIMAL(12,4))
               * CAST(ws1.l_tax AS DECIMAL(6,4))), 2) AS DOUBLE)
               AS total_shipping_cost,
           CAST(ROUND(SUM(CAST(ws1.l_extendedprice AS DECIMAL(12,4))
               * (CAST(1 AS DECIMAL(6,4))
                  - CAST(ws1.l_discount AS DECIMAL(6,4)))), 2) AS DOUBLE)
               AS total_net_profit
    FROM lineitem ws1
    JOIN orders ON ws1.l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE ws1.l_shipdate BETWEEN TIMESTAMP '1999-02-01 00:00:00'
                             AND TIMESTAMP '1999-04-02 00:00:00'
      AND CASE ws1.l_linenumber % 3 WHEN 0 THEN 'store'
               WHEN 1 THEN 'catalog' ELSE 'web' END = 'web'
      AND n_name = 'NATION_2'
      AND o_orderpriority = '2-HIGH'
      AND EXISTS (SELECT 1 FROM lineitem ws2
                  WHERE ws1.l_orderkey = ws2.l_orderkey
                    AND ws1.l_suppkey <> ws2.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem wr1
                      WHERE ws1.l_orderkey = wr1.l_orderkey
                        AND wr1.l_returnflag = 'R')
"""


@query("ds_q94_multi_warehouse_no_returns", oracle=_DS_Q94)
def ds_q94_multi_warehouse_no_returns(spark, sf_dir):
    """TPC-DS query94 shape (query94.sql): web orders shipped from more
    than one warehouse (correlated EXISTS with an INEQUALITY on the
    correlation table) and never returned (NOT EXISTS), reported as
    COUNT(DISTINCT order) plus cost sums — semijoin + antijoin on the
    same key with different predicates.

    Two-scan plan (r8, was 3): both correlated predicates are per-ORDER
    statistics from one aggregation (supplier count > 1, no returned
    line); the filtered outer line scan is the second, semantically
    necessary pass (the outer sums cover only the date/channel-filtered
    lines, not whole orders)."""
    from pyspark.sql import functions as F

    from apache_flink_spark.queries._util import dec, dround
    from apache_flink_spark.queries._util import t as _t
    from apache_flink_spark.queries.tpcds_shapes import _CHANNEL as _CH

    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    per_o = (
        li.groupBy(F.col("l_orderkey").alias("ok"))
        .agg(
            F.countDistinct("l_suppkey").alias("n_supp"),
            F.max(F.col("l_returnflag") == "R").alias("has_r"),
        )
        .filter((F.col("n_supp") > 1) & ~F.col("has_r"))
        .select("ok")
    )
    ship = dec("l_extendedprice") * dec("l_tax", "decimal(6,4)")
    net = dec("l_extendedprice") * (
        F.lit(1).cast("decimal(6,4)") - dec("l_discount", "decimal(6,4)")
    )
    return (
        li.filter(
            F.col("l_shipdate").between(
                "1999-02-01 00:00:00", "1999-04-02 00:00:00"
            )
            & (F.expr(_CH) == "web")
        )
        .join(per_o, F.col("l_orderkey") == F.col("ok"), "semi")
        .join(
            orders.filter(F.col("o_orderpriority") == "2-HIGH"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(customer),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(nation.filter(F.col("n_name") == "NATION_2")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .agg(
            F.countDistinct("l_orderkey").alias("order_count"),
            dround(F.sum(ship)).alias("total_shipping_cost"),
            dround(F.sum(net)).alias("total_net_profit"),
        )
    )
