"""TPC-DS query SHAPES (9): ds_q56..ds_q72 — round-6 port, batch 3
(reference: flink-tpcds-test/tpcds-tool/query/query*.sql; same porting +
determinism contract as tpcds_shapes7.py).

Distinct topologies: three-channel UNION ALL each gated by the same
IN-subquery item list (q56/q60), window-average + rank self-joined to its
own lag and lead rows (q57), per-store weekday pivot self-joined across a
52-week shift (q59 — weekday computed portably as days-since-a-known-
Monday mod 7, never dialect day names), two-dimension ship-latency
histogram (q62), monthly manager deviation (q63), order-basket city
mismatch (q68), EXISTS + two NOT EXISTS (q69), channel-union joined to a
time dimension after the union (q71), and the 9-relation inventory/promo
join with two LEFT OUTER arms (q72).
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

# Portable weekday/week since a fixture-epoch MONDAY (1995-01-02):
# EXTRACT(DAY FROM ts - ts) is the pinned cross-engine day difference.
_DAYS_SINCE = (
    "CAST(EXTRACT(DAY FROM (l_shipdate - TIMESTAMP '1995-01-02 00:00:00'))"
    " AS BIGINT)"
)


def _q56_like(order: str, types: str, moy: int, year: int,
              nations: str) -> str:
    chans = []
    for ch in ("store", "catalog", "web"):
        chans.append(f"""
        SELECT p_brand AS item_id, SUM({_REV}) AS total_dec
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE {_CHANNEL} = '{ch}'
          AND p_type IN (SELECT p_type FROM part WHERE p_size IN ({types}))
          AND EXTRACT(YEAR FROM o_orderdate) = {year}
          AND EXTRACT(MONTH FROM o_orderdate) = {moy}
          AND n_name IN ({nations})
        GROUP BY p_brand""")
    union = "\n        UNION ALL\n".join(chans)
    return f"""
    SELECT item_id,
           CAST(ROUND(SUM(total_dec), 2) AS DOUBLE) AS total_sales
    FROM ({union}
    ) tmp1
    GROUP BY item_id
    ORDER BY {order}
    LIMIT 100
"""


_DS_Q56 = _q56_like("total_sales, item_id", "3, 17, 29", 2, 2001,
                    "'NATION_5', 'NATION_14'")
_DS_Q60 = _q56_like("item_id, total_sales", "8, 23, 42", 9, 1998,
                    "'NATION_1', 'NATION_19'")


def _q56_like_df(spark, sf_dir, order_cols, sizes, moy, year, nations):
    """Single-scan form of the q33/q56/q60 channel-union family (r8): the
    three legs differ only in the channel tag, channels PARTITION every
    row, and the outer GROUP BY re-sums un-rounded decimal partials — so
    one scan grouped by brand is exact-identical at a third of the IO.
    The p_type IN-subquery becomes one broadcast semi-join (the oracle
    text repeats it per branch)."""
    from pyspark.sql import functions as F

    from apache_flink_spark.queries._util import dec, dround
    from apache_flink_spark.queries._util import t as _t

    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    types = part.filter(F.col("p_size").isin(*sizes)).select("p_type").distinct()
    rev = dec("l_extendedprice") * (
        F.lit(1).cast("decimal(6,4)") - dec("l_discount", "decimal(6,4)")
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(types), "p_type", "semi")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(
            (F.year("o_orderdate") == year) & (F.month("o_orderdate") == moy)
        )
        .join(
            F.broadcast(customer),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(nation.filter(F.col("n_name").isin(*nations))),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy(F.col("p_brand").alias("item_id"))
        .agg(dround(F.sum(rev)).alias("total_sales"))
        .orderBy(*order_cols)
        .limit(100)
    )


@query("ds_q56_channel_union_itemlist", oracle=_DS_Q56)
def ds_q56_channel_union_itemlist(spark, sf_dir):
    """TPC-DS query56 shape (query56.sql): per-channel aggregates over an
    item set defined by an IN-subquery (repeated in each channel branch,
    which the planner should evaluate once), UNION ALL'd and re-agged;
    ordered by the measure. Spark side runs the fused single-scan form
    (_q56_like_df); the 3-branch SQL text stays as the oracle."""
    from pyspark.sql import functions as F

    return _q56_like_df(
        spark, sf_dir, [F.col("total_sales"), F.col("item_id")],
        (3, 17, 29), 2, 2001, ("NATION_5", "NATION_14"),
    )


@query("ds_q60_channel_union_by_item", oracle=_DS_Q60)
def ds_q60_channel_union_by_item(spark, sf_dir):
    """TPC-DS query60 shape (query60.sql): the item-ordered member of the
    q33/q56/q60 channel-union family, different item predicate. Fused
    single-scan form; 3-branch SQL stays as the oracle."""
    from pyspark.sql import functions as F

    return _q56_like_df(
        spark, sf_dir, [F.col("item_id"), F.col("total_sales")],
        (8, 23, 42), 9, 1998, ("NATION_1", "NATION_19"),
    )


_DS_Q57 = f"""
    WITH v1 AS (
        SELECT p_brand, n_name,
               CAST(EXTRACT(YEAR FROM l_shipdate) AS BIGINT) AS yr,
               CAST(EXTRACT(MONTH FROM l_shipdate) AS BIGINT) AS moy,
               SUM({_PRICE}) AS sum_dec,
               RANK() OVER (
                   PARTITION BY p_brand, n_name
                   ORDER BY EXTRACT(YEAR FROM l_shipdate),
                            EXTRACT(MONTH FROM l_shipdate)) AS rn
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE {_CHANNEL} = 'catalog'
          AND (EXTRACT(YEAR FROM l_shipdate) = 1999
               OR (EXTRACT(YEAR FROM l_shipdate) = 1998
                   AND EXTRACT(MONTH FROM l_shipdate) = 12)
               OR (EXTRACT(YEAR FROM l_shipdate) = 2000
                   AND EXTRACT(MONTH FROM l_shipdate) = 1))
        GROUP BY p_brand, n_name, EXTRACT(YEAR FROM l_shipdate),
                 EXTRACT(MONTH FROM l_shipdate)
    ), v1x AS (
        SELECT p_brand, n_name, yr, moy, rn,
               CAST(ROUND(sum_dec, 2) AS DOUBLE) AS sum_sales,
               CAST(ROUND(SUM(sum_dec)
                          OVER (PARTITION BY p_brand, n_name, yr), 2)
                    AS DOUBLE)
                   / COUNT(*) OVER (PARTITION BY p_brand, n_name, yr)
                   AS avg_monthly_sales
        FROM v1
    )
    SELECT v.p_brand, v.n_name, v.yr, v.moy, v.avg_monthly_sales,
           v.sum_sales, l.sum_sales AS psum, n.sum_sales AS nsum
    FROM v1x v
    JOIN v1x l ON v.p_brand = l.p_brand AND v.n_name = l.n_name
              AND v.rn = l.rn + 1
    JOIN v1x n ON v.p_brand = n.p_brand AND v.n_name = n.n_name
              AND v.rn = n.rn - 1
    WHERE v.yr = 1999 AND v.avg_monthly_sales > 0
      AND CASE WHEN v.avg_monthly_sales > 0
               THEN ABS(v.sum_sales - v.avg_monthly_sales)
                    / v.avg_monthly_sales
               ELSE NULL END > CAST(0.1 AS DOUBLE)
    ORDER BY v.sum_sales - v.avg_monthly_sales, v.p_brand, v.n_name, v.moy
    LIMIT 100
"""


@query("ds_q57_lag_lead_deviation", oracle=_DS_Q57)
def ds_q57_lag_lead_deviation(spark, sf_dir):
    """TPC-DS query57 shape (query57.sql): monthly series ranked within
    (brand, call-center) then SELF-JOINED to its rn-1 and rn+1 rows to
    emit previous/next month alongside the deviation — the catalog
    sibling of ds_q47, with the lag/lead fetched by join rather than
    window (exactly the original's formulation, kept as the oracle).

    Single-scan plan (r8, was 3): the rn +/- 1 self-joins ARE lag/lead
    over the (brand, nation) month sequence — windows on the TINY monthly
    aggregate, one fact scan."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from apache_flink_spark.queries._util import dec, dround
    from apache_flink_spark.queries._util import t as _t

    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    supplier = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    yr = F.year("l_shipdate")
    moy = F.month("l_shipdate")
    v1 = (
        li.filter(
            (F.expr(_CHANNEL) == "catalog")
            & (
                (yr == 1999)
                | ((yr == 1998) & (moy == 12))
                | ((yr == 2000) & (moy == 1))
            )
        )
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(
            F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey")
        )
        .join(
            F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
        )
        .groupBy(
            "p_brand", "n_name",
            yr.cast("bigint").alias("yr"),
            moy.cast("bigint").alias("moy"),
        )
        .agg(F.sum(dec("l_extendedprice")).alias("sum_dec"))
    )
    w_ord = Window.partitionBy("p_brand", "n_name").orderBy("yr", "moy")
    w_year = Window.partitionBy("p_brand", "n_name", "yr")
    v = (
        v1.withColumn("sum_sales", dround(F.col("sum_dec")))
        .withColumn(
            "avg_monthly_sales",
            F.round(F.sum("sum_dec").over(w_year), 2).cast("double")
            / F.count(F.lit(1)).over(w_year),
        )
        .withColumn("psum", F.lag(dround(F.col("sum_dec"))).over(w_ord))
        .withColumn("nsum", F.lead(dround(F.col("sum_dec"))).over(w_ord))
    )
    avg_ = F.col("avg_monthly_sales")
    return (
        v.filter(
            (F.col("yr") == 1999)
            & F.col("psum").isNotNull() & F.col("nsum").isNotNull()
            & (avg_ > F.lit(0).cast("double"))
            & (
                F.abs(F.col("sum_sales") - avg_) / avg_
                > F.lit(0.1).cast("double")
            )
        )
        .select(
            "p_brand", "n_name", "yr", "moy", "avg_monthly_sales",
            "sum_sales", "psum", "nsum",
        )
        .orderBy(
            F.col("sum_sales") - avg_, "p_brand", "n_name", "moy"
        )
        .limit(100)
    )


_DS_Q59_COLS = ", ".join(
    f"""CAST(ROUND(SUM(CASE WHEN dow = {d} THEN price END), 2)
            AS DOUBLE) AS d{d}_sales""" for d in range(7)
)
_DS_Q59_RATIOS = ", ".join(
    f"y.d{d}_sales / NULLIF(x.d{d}_sales, CAST(0 AS DOUBLE)) AS d{d}_ratio"
    for d in range(7)
)

_DS_Q59 = f"""
    WITH base AS (
        SELECT l_suppkey AS sk,
               CAST(FLOOR({_DAYS_SINCE} / 7.0) AS BIGINT) AS wk,
               MOD({_DAYS_SINCE}, 7) AS dow,
               {_PRICE} AS price
        FROM lineitem
    ), wss AS (
        SELECT sk, wk, {_DS_Q59_COLS}
        FROM base GROUP BY sk, wk
    )
    SELECT s_name, y.wk AS week_seq, {_DS_Q59_RATIOS}
    FROM wss y
    JOIN wss x ON y.sk = x.sk AND y.wk = x.wk - 52
    JOIN supplier ON y.sk = s_suppkey
    WHERE y.wk BETWEEN 52 AND 103
    ORDER BY s_name, week_seq
    LIMIT 100
"""


@query("ds_q59_store_week_over_year", oracle=_DS_Q59)
def ds_q59_store_week_over_year(spark, sf_dir):
    """TPC-DS query59 shape (query59.sql): per-STORE weekday pivot
    self-joined across a 52-week shift with day-by-day ratio columns —
    ds_q2 does the channel variant; this is the store-keyed one. The
    weekday is days-since-a-known-Monday mod 7, identical in both
    engines (day names are dialect-split)."""
    return _sql(spark, sf_dir, _DS_Q59)


_LAT = (
    "CAST(EXTRACT(DAY FROM (l_shipdate - o_orderdate)) AS BIGINT)"
)

_DS_Q62 = f"""
    SELECT substr(n_name, 1, 20) AS warehouse, o_orderpriority AS sm_type,
           COUNT(CASE WHEN {_LAT} <= 30 THEN 1 END) AS d30,
           COUNT(CASE WHEN {_LAT} > 30 AND {_LAT} <= 60 THEN 1 END) AS d60,
           COUNT(CASE WHEN {_LAT} > 60 AND {_LAT} <= 90 THEN 1 END) AS d90,
           COUNT(CASE WHEN {_LAT} > 90 AND {_LAT} <= 120 THEN 1 END)
               AS d120,
           COUNT(CASE WHEN {_LAT} > 120 THEN 1 END) AS dmore
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE {_CHANNEL} = 'web'
      AND EXTRACT(YEAR FROM o_orderdate) = 1999
    GROUP BY substr(n_name, 1, 20), o_orderpriority
    ORDER BY warehouse, sm_type
    LIMIT 100
"""


@query("ds_q62_ship_latency_matrix", oracle=_DS_Q62)
def ds_q62_ship_latency_matrix(spark, sf_dir):
    """TPC-DS query62 shape (query62.sql): web-channel ship latency
    histogram over a (warehouse, ship-mode) matrix — two grouping
    dimensions from different joined tables, vs ds_q99's single-dim
    form."""
    return _sql(spark, sf_dir, _DS_Q62)


_DS_Q63 = f"""
    SELECT mgr, moy, sum_sales, avg_monthly_sales
    FROM (
        SELECT mgr, moy,
               CAST(ROUND(msum, 2) AS DOUBLE) AS sum_sales,
               CAST(ROUND(SUM(msum) OVER (PARTITION BY mgr), 2) AS DOUBLE)
                   / COUNT(*) OVER (PARTITION BY mgr)
                   AS avg_monthly_sales
        FROM (
            SELECT p_size AS mgr,
                   CAST(EXTRACT(MONTH FROM l_shipdate) AS BIGINT) AS moy,
                   SUM({_PRICE}) AS msum
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE EXTRACT(YEAR FROM l_shipdate) = 2000
              AND ((p_type IN ('STANDARD', 'SMALL')
                    AND p_brand IN ('Brand#12', 'Brand#22', 'Brand#32'))
                OR (p_type IN ('MEDIUM', 'PROMO')
                    AND p_brand IN ('Brand#15', 'Brand#25', 'Brand#35')))
            GROUP BY p_size, EXTRACT(MONTH FROM l_shipdate)
        ) m
    ) w
    WHERE CASE WHEN avg_monthly_sales > 0
               THEN ABS(sum_sales - avg_monthly_sales) / avg_monthly_sales
               ELSE NULL END > CAST(0.1 AS DOUBLE)
    ORDER BY mgr, avg_monthly_sales, sum_sales, moy
    LIMIT 100
"""


@query("ds_q63_manager_month_deviation", oracle=_DS_Q63)
def ds_q63_manager_month_deviation(spark, sf_dir):
    """TPC-DS query63 shape (query63.sql): months deviating >10% from the
    manager's average — the manager-keyed member of the q53/q63/q89
    deviation family."""
    return _sql(spark, sf_dir, _DS_Q63)


_DS_Q68 = f"""
    SELECT c_name, cur.n_name AS current_nation, bought_nation,
           o_orderkey AS ticket, extended_price, extended_tax
    FROM (
        SELECT l_orderkey AS ok, o_custkey AS ck, o_orderkey,
               MIN(sn.n_name) AS bought_nation,
               CAST(ROUND(SUM({_PRICE}), 2) AS DOUBLE) AS extended_price,
               CAST(ROUND(SUM({_PRICE}
                   * CAST(l_tax AS DECIMAL(6,4))), 2) AS DOUBLE)
                   AS extended_tax
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation sn ON s_nationkey = sn.n_nationkey
        WHERE EXTRACT(DAY FROM o_orderdate) BETWEEN 1 AND 2
          AND EXTRACT(YEAR FROM o_orderdate) IN (1999, 2000, 2001)
          AND o_orderpriority IN ('1-URGENT', '3-MEDIUM')
        GROUP BY l_orderkey, o_custkey, o_orderkey
    ) dn
    JOIN customer ON ck = c_custkey
    JOIN nation cur ON c_nationkey = cur.n_nationkey
    WHERE cur.n_name <> bought_nation
    ORDER BY c_name, ticket
    LIMIT 100
"""


@query("ds_q68_basket_city_mismatch", oracle=_DS_Q68)
def ds_q68_basket_city_mismatch(spark, sf_dir):
    """TPC-DS query68 shape (query68.sql): ticket-level baskets (price +
    tax sums per order) whose purchase location differs from the
    customer's current location — aggregate-then-join with a non-equi
    name comparison on the outer join's two dimension arms."""
    return _sql(spark, sf_dir, _DS_Q68)


_DS_Q69 = f"""
    SELECT c_mktsegment,
           CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS bal_bucket,
           COUNT(*) AS cnt
    FROM customer c
    JOIN nation ON c_nationkey = n_nationkey
    WHERE n_name IN ('NATION_3', 'NATION_9', 'NATION_16')
      AND EXISTS (
            SELECT 1 FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            WHERE o_custkey = c.c_custkey AND {_CHANNEL} = 'store'
              AND EXTRACT(YEAR FROM l_shipdate) = 2001
              AND EXTRACT(MONTH FROM l_shipdate) BETWEEN 4 AND 6)
      AND NOT EXISTS (
            SELECT 1 FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            WHERE o_custkey = c.c_custkey AND {_CHANNEL} = 'web'
              AND EXTRACT(YEAR FROM l_shipdate) = 2001
              AND EXTRACT(MONTH FROM l_shipdate) BETWEEN 4 AND 6)
      AND NOT EXISTS (
            SELECT 1 FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            WHERE o_custkey = c.c_custkey AND {_CHANNEL} = 'catalog'
              AND EXTRACT(YEAR FROM l_shipdate) = 2001
              AND EXTRACT(MONTH FROM l_shipdate) BETWEEN 4 AND 6)
    GROUP BY c_mktsegment, CAST(FLOOR(c_acctbal / 1000) AS BIGINT)
    ORDER BY c_mktsegment, bal_bucket
    LIMIT 100
"""


@query("ds_q69_store_only_customers", oracle=_DS_Q69)
def ds_q69_store_only_customers(spark, sf_dir):
    """TPC-DS query69 shape (query69.sql): demographics of customers who
    bought in-store but NOT on the web and NOT by catalog in the same
    quarter — one semijoin plus two ANTI-joins on the same correlation
    key (q35 is the disjunctive sibling).

    Single-scan plan (r8, was 3): one per-customer channel-presence
    aggregation; store-and-nothing-else = (s AND NOT w AND NOT cg) — the
    required store flag keeps the semi join existence-exact for the
    NOT EXISTS arms too (a customer with no window activity has no flags
    row AND fails the store requirement)."""
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
            (F.year("l_shipdate") == 2001)
            & F.month("l_shipdate").between(4, 6)
        )
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(
            F.max(ch == "store").alias("s"),
            F.max(ch == "web").alias("w"),
            F.max(ch == "catalog").alias("cg"),
        )
        .filter(F.col("s") & ~F.col("w") & ~F.col("cg"))
        .select("o_custkey")
    )
    bucket = F.floor(F.col("c_acctbal") / 1000).cast("bigint")
    return (
        customer.join(
            F.broadcast(
                nation.filter(
                    F.col("n_name").isin(
                        "NATION_3", "NATION_9", "NATION_16"
                    )
                )
            ),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .join(flags, F.col("c_custkey") == F.col("o_custkey"), "semi")
        .groupBy("c_mktsegment", bucket.alias("bal_bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("c_mktsegment", "bal_bucket")
        .limit(100)
    )


_DS_Q71 = f"""
    SELECT p_brand,
           CAST(EXTRACT(DAY FROM l_shipdate) AS BIGINT) AS dom,
           CAST(ROUND(SUM(price_dec), 2) AS DOUBLE) AS ext_price
    FROM part
    JOIN (
        SELECT l_partkey AS sold_item, l_shipdate, {_PRICE} AS price_dec
        FROM lineitem
        WHERE {_CHANNEL} = 'web'
          AND EXTRACT(MONTH FROM l_shipdate) = 12
          AND EXTRACT(YEAR FROM l_shipdate) = 1998
        UNION ALL
        SELECT l_partkey, l_shipdate, {_PRICE}
        FROM lineitem
        WHERE {_CHANNEL} = 'catalog'
          AND EXTRACT(MONTH FROM l_shipdate) = 12
          AND EXTRACT(YEAR FROM l_shipdate) = 1998
        UNION ALL
        SELECT l_partkey, l_shipdate, {_PRICE}
        FROM lineitem
        WHERE {_CHANNEL} = 'store'
          AND EXTRACT(MONTH FROM l_shipdate) = 12
          AND EXTRACT(YEAR FROM l_shipdate) = 1998
    ) tmp ON sold_item = p_partkey
    WHERE p_size = 15
      AND (EXTRACT(DAY FROM l_shipdate) <= 7
           OR EXTRACT(DAY FROM l_shipdate) >= 21)
    GROUP BY p_brand, EXTRACT(DAY FROM l_shipdate)
    ORDER BY ext_price DESC, p_brand, dom
    LIMIT 100
"""


@query("ds_q71_union_time_slots", oracle=_DS_Q71)
def ds_q71_union_time_slots(spark, sf_dir):
    """TPC-DS query71 shape (query71.sql): three channel branches UNION
    ALL'd FIRST, then joined to the item and time dimensions (breakfast/
    dinner slots -> early/late days of month) — the dim joins sit above
    the union, so pushdown must replicate them into each branch.

    Single-scan form (r8): the three branches differ only in the channel
    tag and channels PARTITION every row, so the union is the plain
    Dec-1998 filter — one scan instead of three."""
    from pyspark.sql import functions as F

    from apache_flink_spark.queries._util import dec, dround
    from apache_flink_spark.queries._util import t as _t

    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    dom = F.dayofmonth("l_shipdate").cast("bigint")
    return (
        li.filter(
            (F.month("l_shipdate") == 12) & (F.year("l_shipdate") == 1998)
        )
        .join(
            F.broadcast(part.filter(F.col("p_size") == 15)),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .filter((dom <= 7) | (dom >= 21))
        .groupBy("p_brand", dom.alias("dom"))
        .agg(dround(F.sum(dec("l_extendedprice"))).alias("ext_price"))
        .orderBy(F.col("ext_price").desc(), "p_brand", "dom")
        .limit(100)
    )


_WEEK_OF = (
    "CAST(FLOOR(CAST(EXTRACT(DAY FROM ({col} - TIMESTAMP "
    "'1995-01-02 00:00:00')) AS BIGINT) / 7.0) AS BIGINT)"
)

_DS_Q72 = f"""
    SELECT p_name, wn.n_name AS warehouse,
           {_WEEK_OF.format(col="o_orderdate")} AS week_seq,
           COUNT(CASE WHEN promo.s_suppkey IS NULL THEN 1 END) AS no_promo,
           COUNT(CASE WHEN promo.s_suppkey IS NOT NULL THEN 1 END)
               AS promo,
           COUNT(*) AS total_cnt
    FROM lineitem cs
    JOIN orders o ON cs.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN lineitem inv ON inv.l_partkey = cs.l_partkey
       AND inv.l_quantity < cs.l_quantity
       AND {_WEEK_OF.format(col="inv.l_shipdate")}
           = {_WEEK_OF.format(col="o.o_orderdate")}
    JOIN supplier ws ON inv.l_suppkey = ws.s_suppkey
    JOIN nation wn ON ws.s_nationkey = wn.n_nationkey
    JOIN part ON cs.l_partkey = p_partkey
    LEFT OUTER JOIN supplier promo
        ON cs.l_suppkey = promo.s_suppkey AND promo.s_acctbal > 5000
    LEFT OUTER JOIN lineitem cr
        ON cr.l_orderkey = cs.l_orderkey AND cr.l_partkey = cs.l_partkey
       AND cr.l_returnflag = 'R' AND cr.l_linenumber <> cs.l_linenumber
    WHERE c.c_mktsegment = 'HOUSEHOLD'
      AND o.o_orderpriority = '1-URGENT'
      AND EXTRACT(YEAR FROM o.o_orderdate) = 1999
      AND EXTRACT(DAY FROM (cs.l_shipdate - o.o_orderdate)) > 5
    GROUP BY p_name, wn.n_name, {_WEEK_OF.format(col="o_orderdate")}
    ORDER BY total_cnt DESC, p_name, warehouse, week_seq
    LIMIT 100
"""


@query("ds_q72_inventory_promo_nine_join", oracle=_DS_Q72)
def ds_q72_inventory_promo_nine_join(spark, sf_dir):
    """TPC-DS query72 shape (query72.sql — the notorious 9-relation
    join): catalog lines joined to same-week inventory with LESS stock
    than ordered (non-equi + computed-week equi), two LEFT OUTER arms
    (promotion, returns) whose null-ness feeds conditional counts, and a
    5-day ship-lag residual. The week equality keeps the fact-fact join
    keyed (partkey + week), never a pure inequality blow-up."""
    return _sql(spark, sf_dir, _DS_Q72)
