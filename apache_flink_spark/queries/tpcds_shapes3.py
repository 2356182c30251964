"""TPC-DS query SHAPES (3 of 3): 13 more structurally distinct ports —
EXISTS chains, scalar-subquery CASE, variance thresholds, monthly pivots,
windowed shares and bucketed latencies (continues tpcds_shapes.py /
tpcds_shapes2.py; see tpcds_shapes.py for the channel mapping and the
determinism contract). Reference: flink-tpcds-test/tpcds-tool/query/.

- ds_q6  (query6.sql):  price above 1.2x category average, HAVING count
- ds_q9  (query9.sql):  CASE on COUNT scalar subqueries choosing between
                        two aggregate scalar subqueries, per bucket
- ds_q10 (query10.sql, family q35/q69): EXISTS a AND (EXISTS b OR
                        EXISTS c) demographic counts
- ds_q16 (query16.sql, family q94): EXISTS other-supplier AND NOT EXISTS
                        returns, distinct-count + line-level sum
- ds_q17 (query17.sql): per-item quantity variance threshold from exact
                        (sum, sum-of-squares, count) — cov > 0.4
- ds_q31 (query31.sql): per-nation quarter-over-quarter web-vs-store
                        growth comparison (4-way CTE self-join)
- ds_q39 (query39.sql): consecutive-month variance pairs per
                        (supplier, item) self-join
- ds_q66 (query66.sql): two channel legs UNION ALL'd, each pivoting
                        months into wide conditional-sum columns
- ds_q77 (query77.sql): per-channel sales FULL OUTER returns, UNION ALL,
                        ROLLUP summary
- ds_q89 (query89.sql): monthly deviation from the windowed yearly
                        average (window AVG, not the q47 join form)
- ds_q92 (query92.sql): correlated scalar AVG subquery threshold
                        (excess-discount revenue)
- ds_q98 (query98.sql): revenue share within category via a nested
                        SUM(SUM()) OVER window
- ds_q99 (query99.sql): order->ship latency histogram via CASE buckets
                        over EXTRACT(DAY FROM ts - ts)
"""

from __future__ import annotations

from apache_flink_spark.queries.registry import query
from apache_flink_spark.queries.tpcds_shapes import _PRICE, _QTY, _REV, _sql

_DS_Q6 = f"""
    WITH cat_avg AS (
        SELECT p_type AS t,
               CAST(ROUND(SUM(CAST(p_retailprice AS DECIMAL(12,4))), 2)
                    AS DOUBLE) AS tot,
               COUNT(*) AS cnt
        FROM part GROUP BY p_type
    )
    SELECT n_name, COUNT(*) AS cnt
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN part ON l_partkey = p_partkey
    JOIN cat_avg ON p_type = cat_avg.t
    WHERE p_retailprice > CAST(1.2 AS DOUBLE) * (tot / cnt)
      AND EXTRACT(YEAR FROM o_orderdate) = 1997
    GROUP BY n_name
    HAVING COUNT(*) >= 10
    ORDER BY cnt, n_name
"""


@query("ds_q6_above_category_avg", oracle=_DS_Q6)
def ds_q6_above_category_avg(spark, sf_dir):
    """TPC-DS query6 shape (query6.sql): items priced above 1.2x their
    category's average price, customer nations counted with a HAVING
    floor. The category average joins in as an aggregate CTE; the
    threshold compares doubles with identical expression trees."""
    return _sql(spark, sf_dir, _DS_Q6)


def _q9_bucket(i: int, lo: int, hi: int) -> str:
    return f"""
        CASE WHEN (SELECT COUNT(*) FROM lineitem
                   WHERE l_quantity BETWEEN {lo} AND {hi}) > 10000
             THEN (SELECT CAST(ROUND(SUM({_PRICE}), 2) AS DOUBLE) / COUNT(*)
                   FROM lineitem WHERE l_quantity BETWEEN {lo} AND {hi})
             ELSE (SELECT CAST(ROUND(SUM(CAST(l_discount AS DECIMAL(6,4))), 2)
                        AS DOUBLE) / COUNT(*)
                   FROM lineitem WHERE l_quantity BETWEEN {lo} AND {hi})
        END AS bucket{i}"""


_DS_Q9 = (
    "    SELECT r_regionkey,\n"
    + ",\n".join(
        _q9_bucket(i, lo, hi)
        for i, (lo, hi) in enumerate(
            [(1, 10), (11, 20), (21, 30), (31, 40), (41, 50)], start=1
        )
    )
    + "\n    FROM region WHERE r_regionkey = 0\n"
)


@query("ds_q9_case_scalar_subqueries", oracle=_DS_Q9)
def ds_q9_case_scalar_subqueries(spark, sf_dir):
    """TPC-DS query9 shape (query9.sql): five CASE expressions, each
    choosing between two aggregate scalar subqueries based on a COUNT
    scalar subquery — 15 uncorrelated scalar subqueries hanging off a
    single-row anchor table.

    Single-scan plan (r8): all 15 subqueries filter the SAME table by
    quantity bucket, so one scan with 15 conditional aggregates (one
    global aggregation row) replaces 15 lineitem scans; the CASE then
    evaluates driver-free on that row, cross-joined to the 1-row anchor."""
    from pyspark.sql import functions as F

    from apache_flink_spark.queries._util import dec, dround
    from apache_flink_spark.queries._util import t as _t

    li = _t(spark, sf_dir, "lineitem")
    region = _t(spark, sf_dir, "region")
    buckets = [(1, 10), (11, 20), (21, 30), (31, 40), (41, 50)]
    aggs = []
    for i, (lo, hi) in enumerate(buckets, start=1):
        c = F.col("l_quantity").between(lo, hi)
        aggs += [
            F.count(F.when(c, F.lit(1))).alias(f"cnt{i}"),
            F.sum(F.when(c, dec("l_extendedprice"))).alias(f"sp{i}"),
            F.sum(
                F.when(c, dec("l_discount", "decimal(6,4)"))
            ).alias(f"sd{i}"),
        ]
    stats = li.filter(F.col("l_quantity").between(1, 50)).agg(*aggs)
    cols = [F.col("r_regionkey")]
    for i in range(1, len(buckets) + 1):
        cols.append(
            F.when(
                F.col(f"cnt{i}") > 10000,
                dround(F.col(f"sp{i}")) / F.col(f"cnt{i}"),
            )
            .otherwise(dround(F.col(f"sd{i}")) / F.col(f"cnt{i}"))
            .alias(f"bucket{i}")
        )
    return (
        region.filter(F.col("r_regionkey") == 0)
        .select("r_regionkey")
        .join(F.broadcast(stats))
        .select(*cols)
    )


def _q10_exists(chan: int) -> str:
    return f"""EXISTS (
        SELECT 1 FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        WHERE o.o_custkey = c.c_custkey AND l.l_linenumber % 3 = {chan})"""


_DS_Q10 = f"""
    SELECT c_mktsegment, COUNT(*) AS cnt,
           CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(12,4))), 2) AS DOUBLE)
               AS total_bal
    FROM customer c
    WHERE {_q10_exists(0)}
      AND ({_q10_exists(1)} OR {_q10_exists(2)})
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
"""


@query("ds_q10_exists_disjunction", oracle=_DS_Q10)
def ds_q10_exists_disjunction(spark, sf_dir):
    """TPC-DS query10 shape (query10.sql, family query35/query69):
    customers active in the store channel AND in at least one of the
    other two — a conjunction containing a DISJUNCTION of correlated
    EXISTS subqueries, the decorrelation case TPC-H never exercises.

    Single-scan plan (r8, was 3 scans of the orders x lineitem join):
    all three EXISTS differ only in the channel tag, so one per-customer
    channel-presence aggregation carries the whole predicate (the
    required store flag makes the inner join existence-exact)."""
    from pyspark.sql import functions as F

    from apache_flink_spark.queries._util import dec, dround
    from apache_flink_spark.queries._util import t as _t

    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    chan = F.col("l_linenumber") % 3
    flags = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(
            F.max(chan == 0).alias("s"),
            F.max(chan == 1).alias("cg"),
            F.max(chan == 2).alias("w"),
        )
        .filter(F.col("s") & (F.col("cg") | F.col("w")))
        .select("o_custkey")
    )
    return (
        customer.join(
            flags, F.col("c_custkey") == F.col("o_custkey"), "semi"
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            dround(F.sum(dec("c_acctbal"))).alias("total_bal"),
        )
        .orderBy("c_mktsegment")
    )


_DS_Q16 = """
    SELECT COUNT(DISTINCT o1.o_orderkey) AS order_count,
           CAST(ROUND(SUM(CAST(l1.l_extendedprice AS DECIMAL(12,4))), 2)
                AS DOUBLE) AS total_price
    FROM lineitem l1 JOIN orders o1 ON o1.o_orderkey = l1.l_orderkey
    WHERE o1.o_orderpriority = '1-URGENT'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = o1.o_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = o1.o_orderkey
                        AND l3.l_returnflag = 'R')
"""


@query("ds_q16_exists_not_exists", oracle=_DS_Q16)
def ds_q16_exists_not_exists(spark, sf_dir):
    """TPC-DS query16 shape (query16.sql, family query94): line-level scan
    gated by a positive EXISTS (another supplier on the same order) and a
    NOT EXISTS (no returned line), reduced to distinct-count + sum.

    Single-scan plan (r8, was 3): both correlated predicates are
    per-ORDER statistics (supplier count > 1, no returned line) and the
    outer SUM is over every line of a qualifying order — so one
    per-order aggregation carries the gates AND the per-order price sum."""
    from pyspark.sql import functions as F

    from apache_flink_spark.queries._util import dec, dround
    from apache_flink_spark.queries._util import t as _t

    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    per_o = li.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.max(F.col("l_returnflag") == "R").alias("has_r"),
        F.sum(dec("l_extendedprice")).alias("psum"),
    )
    return (
        per_o.filter((F.col("n_supp") > 1) & ~F.col("has_r"))
        .join(
            orders.filter(F.col("o_orderpriority") == "1-URGENT"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .agg(
            F.countDistinct("o_orderkey").alias("order_count"),
            dround(F.sum("psum")).alias("total_price"),
        )
    )


_DS_Q17 = f"""
    WITH s AS (
        SELECT l_partkey AS item, COUNT(*) AS cnt,
               CAST(ROUND(SUM({_QTY}), 2) AS DOUBLE) AS qsum,
               CAST(ROUND(SUM({_QTY} * {_QTY}), 2) AS DOUBLE) AS qsq
        FROM lineitem WHERE l_linestatus = 'F'
        GROUP BY l_partkey
    )
    SELECT item, cnt, qsum, qsq
    FROM s
    WHERE cnt >= 3
      AND qsq * cnt > CAST(1.16 AS DOUBLE) * qsum * qsum
    ORDER BY item
    LIMIT 100
"""


@query("ds_q17_quantity_variance", oracle=_DS_Q17)
def ds_q17_quantity_variance(spark, sf_dir):
    """TPC-DS query17 shape (query17.sql): per-item quantity variability
    threshold (cov > 0.4). Exact decimal (sum, sum-of-squares, count)
    round once to doubles; the inequality qsq*n > 1.16*qsum^2 is the
    cross-multiplied cov form — no engine-specific STDDEV in sight."""
    return _sql(spark, sf_dir, _DS_Q17)


_DS_Q31 = f"""
    WITH qs AS (
        SELECT c_nationkey AS nk,
               CAST(EXTRACT(QUARTER FROM o_orderdate) AS BIGINT) AS q,
               l_linestatus AS chan,
               CAST(ROUND(SUM({_REV}), 2) AS DOUBLE) AS tot
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE EXTRACT(YEAR FROM o_orderdate) = 1996
        GROUP BY 1, 2, 3
    )
    SELECT s1.nk AS nation,
           s1.tot AS store_q1, s2.tot AS store_q2,
           w1.tot AS web_q1, w2.tot AS web_q2
    FROM qs s1
    JOIN qs s2 ON s1.nk = s2.nk
    JOIN qs w1 ON s1.nk = w1.nk
    JOIN qs w2 ON s1.nk = w2.nk
    WHERE s1.chan = 'F' AND s1.q = 1 AND s2.chan = 'F' AND s2.q = 2
      AND w1.chan = 'O' AND w1.q = 1 AND w2.chan = 'O' AND w2.q = 2
      AND s1.tot > CAST(0 AS DOUBLE) AND w1.tot > CAST(0 AS DOUBLE)
      AND w2.tot / w1.tot > s2.tot / s1.tot
    ORDER BY nation
"""


@query("ds_q31_quarterly_share_growth", oracle=_DS_Q31)
def ds_q31_quarterly_share_growth(spark, sf_dir):
    """TPC-DS query31 shape (query31.sql): nations whose web revenue grew
    faster than store revenue across consecutive quarters — one
    (nation, quarter, channel) CTE self-joined four ways with a ratio
    comparison on exact rounded doubles.

    Single-scan plan (r8, was 4 scans of the 3-way join): the four CTE
    instances are FIXED (status, quarter) cells of one per-nation
    aggregation — the ds_q4/ds_q11 fusion."""
    from pyspark.sql import functions as F

    from apache_flink_spark.queries._util import dec, dround
    from apache_flink_spark.queries._util import t as _t

    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    rev = dec("l_extendedprice") * (
        F.lit(1).cast("decimal(6,4)") - dec("l_discount", "decimal(6,4)")
    )
    q = F.quarter("o_orderdate")
    st = F.col("l_linestatus")

    def cell(status, qq):
        return dround(F.sum(F.when((st == status) & (q == qq), rev)))

    g = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(customer),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .filter(F.year("o_orderdate") == 1996)
        .groupBy(F.col("c_nationkey").alias("nation"))
        .agg(
            cell("F", 1).alias("store_q1"), cell("F", 2).alias("store_q2"),
            cell("O", 1).alias("web_q1"), cell("O", 2).alias("web_q2"),
        )
    )
    zero = F.lit(0).cast("double")
    return (
        g.filter(
            F.col("store_q1").isNotNull() & F.col("store_q2").isNotNull()
            & F.col("web_q1").isNotNull() & F.col("web_q2").isNotNull()
            & (F.col("store_q1") > zero) & (F.col("web_q1") > zero)
            & (
                F.col("web_q2") / F.col("web_q1")
                > F.col("store_q2") / F.col("store_q1")
            )
        )
        .select("nation", "store_q1", "store_q2", "web_q1", "web_q2")
        .orderBy("nation")
    )


_DS_Q39 = f"""
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
             AND m2.moy = m1.moy + 1
    WHERE m1.cnt > 1 AND m2.cnt > 1
      AND m1.qsq * m1.cnt > CAST(1.5 AS DOUBLE) * m1.qsum * m1.qsum
      AND m2.qsq * m2.cnt > CAST(1.5 AS DOUBLE) * m2.qsum * m2.qsum
    ORDER BY wh, item, moy1
    LIMIT 100
"""


@query("ds_q39_consecutive_variance", oracle=_DS_Q39)
def ds_q39_consecutive_variance(spark, sf_dir):
    """TPC-DS query39 shape (query39.sql): (warehouse, item, month) demand
    stats self-joined on consecutive months, both months kept only when
    volatile (var > 0.5 x mean^2, the cross-multiplied cov form)."""
    return _sql(spark, sf_dir, _DS_Q39)


def _q66_leg(status: str) -> str:
    months = ",\n".join(
        f"               SUM(CASE WHEN EXTRACT(MONTH FROM l_shipdate) = {mo}"
        f" THEN {_PRICE} ELSE CAST(0 AS DECIMAL(12,4)) END) AS m{mo}"
        for mo in range(1, 7)
    )
    return f"""
        SELECT s_name,
{months}
        FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        WHERE l_linestatus = '{status}'
          AND EXTRACT(YEAR FROM l_shipdate) = 1997
        GROUP BY s_name
"""


_DS_Q66 = f"""
    WITH legs AS (
        {_q66_leg("F")}
        UNION ALL
        {_q66_leg("O")}
    )
    SELECT s_name,
{",".join(f'''
           CAST(ROUND(SUM(m{mo}), 2) AS DOUBLE) AS m{mo}_sales'''
           for mo in range(1, 7))}
    FROM legs
    GROUP BY s_name
    ORDER BY s_name
"""


@query("ds_q66_monthly_pivot_union", oracle=_DS_Q66)
def ds_q66_monthly_pivot_union(spark, sf_dir):
    """TPC-DS query66 shape (query66.sql): two channel legs each pivoting
    months into wide conditional-sum columns, UNION ALL'd and re-summed
    per warehouse (supplier) — decimal partials survive the union, one
    round at the end of each column."""
    return _sql(spark, sf_dir, _DS_Q66)


def _q77_channel(chan: int, name: str) -> str:
    return f"""
        SELECT COALESCE(s.grp, r.grp) AS grp, '{name}' AS channel,
               s.sales AS sales, r.rets AS rets
        FROM (SELECT s_nationkey AS grp, SUM({_PRICE}) AS sales
              FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
              WHERE l_linenumber % 3 = {chan} AND l_returnflag <> 'R'
              GROUP BY 1) s
        FULL OUTER JOIN
             (SELECT s_nationkey AS grp, SUM({_PRICE}) AS rets
              FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
              WHERE l_linenumber % 3 = {chan} AND l_returnflag = 'R'
              GROUP BY 1) r
        ON s.grp = r.grp
"""


_DS_Q77 = f"""
    WITH per AS (
        {_q77_channel(0, "store")}
        UNION ALL
        {_q77_channel(1, "catalog")}
        UNION ALL
        {_q77_channel(2, "web")}
    )
    SELECT COALESCE(channel, 'ALL') AS channel,
           COALESCE(CAST(grp AS STRING), 'ALL') AS id,
           CAST(ROUND(SUM(COALESCE(sales, CAST(0 AS DECIMAL(12,4)))), 2)
                AS DOUBLE) AS sales,
           CAST(ROUND(SUM(COALESCE(rets, CAST(0 AS DECIMAL(12,4)))), 2)
                AS DOUBLE) AS returns,
           CAST(ROUND(SUM(COALESCE(sales, CAST(0 AS DECIMAL(12,4))))
                    - SUM(COALESCE(rets, CAST(0 AS DECIMAL(12,4)))), 2)
                AS DOUBLE) AS profit
    FROM per
    GROUP BY ROLLUP(channel, grp)
    ORDER BY channel, id
"""


@query("ds_q77_channel_profit_outer", oracle=_DS_Q77)
def ds_q77_channel_profit_outer(spark, sf_dir):
    """TPC-DS query77 shape (query77.sql): per channel a FULL OUTER join of
    the sales and returns aggregates (a group can have returns but no
    sales), three channels UNION ALL'd under a ROLLUP summary — the outer
    join x rollup combination q5 doesn't exercise.

    Single-scan plan (r8, was 6 lineitem+supplier scans): the FULL OUTER
    join of per-(channel, nation) sales and returns aggregates IS one
    grouped aggregation with two conditional sums (a group exists iff
    either side has rows, and the missing side is NULL — exactly the
    outer join's NULL pattern); the ROLLUP then runs on the TINY
    (channel x nation) intermediate."""
    from pyspark.sql import functions as F

    from apache_flink_spark.queries._util import dec
    from apache_flink_spark.queries._util import t as _t
    from apache_flink_spark.queries.tpcds_shapes import _CHANNEL as _CH

    li = _t(spark, sf_dir, "lineitem")
    supplier = _t(spark, sf_dir, "supplier")
    price = dec("l_extendedprice")
    per = (
        li.join(
            F.broadcast(supplier),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .groupBy(
            F.expr(_CH).alias("channel"),
            F.col("s_nationkey").alias("grp"),
        )
        .agg(
            F.sum(
                F.when(F.col("l_returnflag") != "R", price)
            ).alias("sales"),
            F.sum(
                F.when(F.col("l_returnflag") == "R", price)
            ).alias("rets"),
        )
    )
    zero = F.lit(0).cast("decimal(12,4)")
    return (
        per.rollup("channel", "grp")
        .agg(
            F.round(
                F.sum(F.coalesce(F.col("sales"), zero)), 2
            ).cast("double").alias("sales_r"),
            F.round(
                F.sum(F.coalesce(F.col("rets"), zero)), 2
            ).cast("double").alias("returns"),
            F.round(
                F.sum(F.coalesce(F.col("sales"), zero))
                - F.sum(F.coalesce(F.col("rets"), zero)), 2
            ).cast("double").alias("profit"),
        )
        .select(
            F.coalesce(F.col("channel"), F.lit("ALL")).alias("channel"),
            F.coalesce(
                F.col("grp").cast("string"), F.lit("ALL")
            ).alias("id"),
            F.col("sales_r").alias("sales"),
            "returns",
            "profit",
        )
        .orderBy("channel", "id")
    )


_DS_Q89 = f"""
    WITH mb AS (
        SELECT p_brand, p_type,
               CAST(EXTRACT(MONTH FROM l_shipdate) AS BIGINT) AS moy,
               SUM({_PRICE}) AS msum_dec
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE EXTRACT(YEAR FROM l_shipdate) = 1997
        GROUP BY 1, 2, 3
    ), w AS (
        SELECT p_brand, p_type, moy,
               CAST(ROUND(msum_dec, 2) AS DOUBLE) AS sum_sales,
               CAST(ROUND(SUM(msum_dec) OVER (PARTITION BY p_brand, p_type),
                          2) AS DOUBLE) AS tot,
               COUNT(*) OVER (PARTITION BY p_brand, p_type) AS months
        FROM mb
    )
    SELECT p_brand, p_type, moy, sum_sales,
           tot / months AS avg_monthly_sales
    FROM w
    WHERE ABS(sum_sales - tot / months)
          > CAST(0.1 AS DOUBLE) * (tot / months)
    ORDER BY p_brand, p_type, moy
    LIMIT 100
"""


@query("ds_q89_windowed_avg_deviation", oracle=_DS_Q89)
def ds_q89_windowed_avg_deviation(spark, sf_dir):
    """TPC-DS query89 shape (query89.sql): months deviating >10% from the
    group's average, the average coming from an unordered partition
    window over the EXACT decimal month sums (order-independent), unlike
    q47's rank-self-join formulation."""
    return _sql(spark, sf_dir, _DS_Q89)


_DS_Q92 = """
    SELECT CAST(ROUND(SUM(CAST(l1.l_extendedprice AS DECIMAL(12,4))), 2)
                AS DOUBLE) AS excess_revenue,
           COUNT(*) AS n_lines
    FROM lineitem l1
    WHERE l1.l_discount > CAST(1.3 AS DOUBLE) * (
            SELECT CAST(ROUND(SUM(CAST(l2.l_discount AS DECIMAL(6,4))), 2)
                        AS DOUBLE) / COUNT(*)
            FROM lineitem l2 WHERE l2.l_partkey = l1.l_partkey)
      AND EXTRACT(YEAR FROM l1.l_shipdate) = 1997
"""


@query("ds_q92_excess_discount", oracle=_DS_Q92)
def ds_q92_excess_discount(spark, sf_dir):
    """TPC-DS query92 shape (query92.sql): lines whose discount exceeds
    1.3x their item's all-time average discount — a CORRELATED scalar
    aggregate subquery Catalyst decorrelates into aggregate-then-join
    (never per-row re-execution)."""
    return _sql(spark, sf_dir, _DS_Q92)


_DS_Q98 = f"""
    SELECT p_type, p_brand,
           CAST(ROUND(SUM({_REV}), 2) AS DOUBLE) AS itemrevenue,
           CAST(ROUND(SUM({_REV}), 2) AS DOUBLE) * CAST(100 AS DOUBLE)
               / CAST(ROUND(SUM(SUM({_REV})) OVER (PARTITION BY p_type), 2)
                      AS DOUBLE) AS revenueratio
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE EXTRACT(MONTH FROM l_shipdate) = 5
    GROUP BY p_type, p_brand
    ORDER BY p_type, revenueratio, p_brand
"""


@query("ds_q98_category_share", oracle=_DS_Q98)
def ds_q98_category_share(spark, sf_dir):
    """TPC-DS query98 shape (query98.sql): each brand's revenue share of
    its category via the nested SUM(SUM(..)) OVER (PARTITION BY category)
    window over the aggregate — numerator and denominator both round
    exactly before the double division, so the ratio sorts identically in
    both engines."""
    return _sql(spark, sf_dir, _DS_Q98)


_DS_Q99 = """
    SELECT o_orderpriority,
           COUNT(CASE WHEN d <= 30 THEN 1 END) AS d30,
           COUNT(CASE WHEN d > 30 AND d <= 60 THEN 1 END) AS d60,
           COUNT(CASE WHEN d > 60 AND d <= 90 THEN 1 END) AS d90,
           COUNT(CASE WHEN d > 90 AND d <= 120 THEN 1 END) AS d120,
           COUNT(CASE WHEN d > 120 THEN 1 END) AS dmore
    FROM (
        SELECT o_orderpriority,
               CAST(EXTRACT(DAY FROM (l_shipdate - o_orderdate)) AS BIGINT)
                   AS d
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ) t
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
"""


@query("ds_q99_latency_buckets", oracle=_DS_Q99)
def ds_q99_latency_buckets(spark, sf_dir):
    """TPC-DS query99 shape (query99.sql): order->ship latency histogram —
    CASE bucket counts over the day component of a timestamp difference
    (EXTRACT(DAY FROM ts - ts) parses in both engines; all fixture
    timestamps are midnight so the day count is exact)."""
    return _sql(spark, sf_dir, _DS_Q99)
