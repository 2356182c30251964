"""TPC-DS query SHAPES (1 of 2): ds_q1..ds_q44, adapted to the fixture schema.

The reference validates 103 TPC-DS queries against official answer sets
(flink-end-to-end-tests/test-scripts/test_tpcds.sh:22,102; SQL in
flink-tpcds-test/tpcds-tool/query/query*.sql). The fixtures are TPC-H-ish,
so each entry here ports the STRUCTURE that makes the original query
distinct — the CTE topology, subquery style, set ops, windowing — onto the
star schema, and is hash-verified against DuckDB running the same SQL:

- ds_q1  (query1.sql):  CTE + per-group avg threshold via a second CTE join
- ds_q2  (query2.sql):  UNION ALL channels -> day-name pivot -> self-join on
                        a shifted week sequence, ratio columns
- ds_q3  (query3.sql):  star join -> (year, brand) agg -> ordered top-k
- ds_q5  (query5.sql):  per-channel sales/returns/profit -> ROLLUP summary
- ds_q8  (query8.sql):  IN-subquery over an INTERSECT of two derived sets
- ds_q11 (query11.sql): year-over-year growth ratio compare across channels
                        via a 4-way self-join of one CTE
- ds_q14 (query14a.sql): cross-channel INTERSECT item set feeding a
                        per-channel agg
- ds_q23 (query23a.sql): frequent-item CTE + best-customer CTE gated on a
                        scalar MAX subquery, combined filter agg
- ds_q28 (query28.sql): six bucketed scalar-aggregate subqueries cross-joined
                        into one row
- ds_q33 (query33.sql): three per-channel aggs UNION ALL -> re-agg by brand
- ds_q34 (query34.sql): per-order HAVING-range baskets joined back to
                        customers
- ds_q38 (query38.sql): COUNT over a 3-way INTERSECT of distinct projections
- ds_q44 (query44.sql): best/worst ranking self-join (two ROW_NUMBER orders)

Channel emulation: ``l_linenumber % 3`` -> store/catalog/web (splits every
order across channels, so cross-channel set ops are non-trivial);
``l_linestatus`` ('F'/'O') when exactly two channels are needed; returns are
``l_returnflag = 'R'``.

Determinism contract (queries/_util.py): money aggregates stay DECIMAL until
one ROUND(x, 2) -> DOUBLE at the end; ratio/threshold comparisons happen on
those exact rounded doubles with identical expression trees in both engines
(never on raw decimal SUMs — DuckDB silently falls back to DOUBLE when a
decimal product exceeds width 38, while Spark truncates scale, so cross-engine
decimal ARITHMETIC is the one non-portable spot). Every LIMIT carries a full
tie-break ORDER BY.

Scale notes (100 TB): every shape is scan -> pushed filter -> keyed shuffle
agg/join; dimension sides broadcast. Physical-plan audit at sf0.1
(ds_q25/q47/q70/q95): 4-5 BroadcastHashJoins per query (all dimension
sides), fact-fact and aggregated-intermediate joins SortMergeJoin under
AQE, PushedFilters on every parquet scan, zero nested-loop joins outside
the whitelisted single-row combines (tests/test_plan_lint.py). The self-joins (ds_q2/q11/q44) join
small AGGREGATED intermediates (weeks, customer-years, parts), never raw
fact rows. INTERSECTs shuffle on the projected key. ds_q28's six single-row
aggregates broadcast-combine (whitelisted BNLJ on 1-row sides).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from apache_flink_spark.catalog import load_tables
from apache_flink_spark.queries._util import dec, dround, t
from apache_flink_spark.queries.registry import query
from apache_flink_spark.run_cache import run_persist


def _sql(spark, sf_dir, stmt):
    load_tables(spark, sf_dir)
    return spark.sql(stmt)


# Shared SQL fragments (portable Spark SQL + DuckDB).
_REV = (
    "CAST(l_extendedprice AS DECIMAL(12,4))"
    " * (CAST(1 AS DECIMAL(6,4)) - CAST(l_discount AS DECIMAL(6,4)))"
)
_PRICE = "CAST(l_extendedprice AS DECIMAL(12,4))"
_QTY = "CAST(l_quantity AS DECIMAL(12,4))"
_CHANNEL = (
    "CASE l_linenumber % 3 WHEN 0 THEN 'store' WHEN 1 THEN 'catalog'"
    " ELSE 'web' END"
)


_DS_Q1 = f"""
    WITH ctr AS (
        SELECT o_custkey AS ctr_custkey, SUM({_PRICE}) AS ctr_ret
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_returnflag = 'R'
        GROUP BY o_custkey
    ), ctr2 AS (
        SELECT c_custkey, c_name, c_nationkey, ctr_ret,
               CAST(ROUND(ctr_ret, 2) AS DOUBLE) AS ret
        FROM ctr JOIN customer ON ctr_custkey = c_custkey
    ), nat AS (
        SELECT c_nationkey AS nk,
               CAST(ROUND(SUM(ctr_ret), 2) AS DOUBLE) AS tot,
               COUNT(*) AS cnt
        FROM ctr2 GROUP BY c_nationkey
    )
    SELECT c_custkey, c_name, ret
    FROM ctr2 JOIN nat ON c_nationkey = nk
    WHERE ret > CAST(1.2 AS DOUBLE) * (tot / cnt)
    ORDER BY ret DESC, c_custkey
    LIMIT 100
"""


@query("ds_q1_returns_above_avg", oracle=_DS_Q1)
def ds_q1_returns_above_avg(spark, sf_dir):
    """TPC-DS query1 shape (tpcds-tool/query/query1.sql): customer_total_return
    CTE, then customers whose return total exceeds 1.2x their nation's
    average, via a per-nation aggregate of the same CTE. The avg is compared
    on exact rounded doubles (identical expression both engines)."""
    return _sql(spark, sf_dir, _DS_Q1)


_DAYS = [
    ("Sunday", "sun_sales"),
    ("Monday", "mon_sales"),
    ("Tuesday", "tue_sales"),
    ("Wednesday", "wed_sales"),
    ("Thursday", "thu_sales"),
    ("Friday", "fri_sales"),
    ("Saturday", "sat_sales"),
]

_DS_Q2_ORACLE = (
    """
    WITH base AS (
        SELECT CAST(FLOOR(date_diff('day', DATE '1995-01-01', l_shipdate) / 7.0)
                    AS BIGINT) AS wk,
               strftime(l_shipdate, '%A') AS dn,
               CAST(l_extendedprice AS DECIMAL(12,4)) AS price
        FROM lineitem WHERE l_linestatus = 'F'
        UNION ALL
        SELECT CAST(FLOOR(date_diff('day', DATE '1995-01-01', l_shipdate) / 7.0)
                    AS BIGINT) AS wk,
               strftime(l_shipdate, '%A') AS dn,
               CAST(l_extendedprice AS DECIMAL(12,4)) AS price
        FROM lineitem WHERE l_linestatus = 'O'
    ), wkagg AS (
        SELECT wk,
"""
    + ",\n".join(
        f"               CAST(ROUND(SUM(CASE WHEN dn = '{d}' THEN price END), 2)"
        f" AS DOUBLE) AS {c}"
        for d, c in _DAYS
    )
    + """
        FROM base GROUP BY wk
    )
    SELECT y.wk AS week_seq,
"""
    + ",\n".join(
        f"           y.{c} / NULLIF(z.{c}, CAST(0 AS DOUBLE)) AS {c.split('_')[0]}_ratio"
        for _, c in _DAYS
    )
    + """
    FROM wkagg y JOIN wkagg z ON y.wk + 52 = z.wk
    ORDER BY week_seq
"""
)


@query("ds_q2_week_over_week", oracle=_DS_Q2_ORACLE)
def ds_q2_week_over_week(spark, sf_dir):
    """TPC-DS query2 shape (query2.sql): UNION ALL of two channels, pivot
    week rows into day-name sales columns, then self-join week w against
    week w+52 and emit the day-by-day ratios. Built with DataFrame ops
    because day-name extraction is dialect-split (Spark date_format 'EEEE'
    vs DuckDB strftime '%A'). Ratios are raw double divisions of the exact
    rounded sums, NULLIF-guarded — bit-identical in both engines."""
    li = t(spark, sf_dir, "lineitem")
    week = F.floor(
        F.datediff(F.col("l_shipdate"), F.lit("1995-01-01").cast("date")) / 7
    ).cast("bigint")
    # r8: F/O statuses partition every row, so the UNION ALL is one scan
    # with the status filter; the tiny per-week pivot is persisted so the
    # w vs w+52 self-join reads it once instead of re-scanning the fact.
    base = li.where(F.col("l_linestatus").isin("F", "O")).select(
        week.alias("wk"),
        F.date_format("l_shipdate", "EEEE").alias("dn"),
        dec("l_extendedprice").alias("price"),
    )
    wkagg = run_persist(
        base.groupBy("wk").agg(
            *[
                dround(F.sum(F.when(F.col("dn") == d, F.col("price")))).alias(c)
                for d, c in _DAYS
            ]
        ),
        "ds_q2_week_over_week.wkagg",
    )
    y, z = wkagg.alias("y"), wkagg.alias("z")
    zero = F.lit(0.0)
    return (
        y.join(z, F.col("y.wk") + F.lit(52) == F.col("z.wk"))
        .select(
            F.col("y.wk").alias("week_seq"),
            *[
                (
                    F.col(f"y.{c}")
                    / F.nullif(F.col(f"z.{c}"), zero)
                ).alias(f"{c.split('_')[0]}_ratio")
                for _, c in _DAYS
            ],
        )
        .orderBy("week_seq")
    )


_DS_Q3 = f"""
    SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS d_year,
           p_brand,
           CAST(ROUND(SUM({_REV}), 2) AS DOUBLE) AS sum_agg
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN part ON l_partkey = p_partkey
    WHERE p_type = 'PROMO' AND EXTRACT(MONTH FROM o_orderdate) = 11
    GROUP BY 1, 2
    ORDER BY d_year, sum_agg DESC, p_brand
    LIMIT 100
"""


@query("ds_q3_brand_by_year", oracle=_DS_Q3)
def ds_q3_brand_by_year(spark, sf_dir):
    """TPC-DS query3 shape (query3.sql): item x fact x date star join with a
    category filter, aggregated by (year, brand), ordered top-k."""
    return _sql(spark, sf_dir, _DS_Q3)


_DS_Q5 = f"""
    WITH base AS (
        SELECT {_CHANNEL} AS channel,
               s_nationkey AS id,
               CASE WHEN l_returnflag <> 'R' THEN {_PRICE}
                    ELSE CAST(0 AS DECIMAL(12,4)) END AS sales,
               CASE WHEN l_returnflag = 'R' THEN {_PRICE}
                    ELSE CAST(0 AS DECIMAL(12,4)) END AS rets
        FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
    )
    SELECT COALESCE(channel, 'ALL') AS channel,
           COALESCE(CAST(id AS STRING), 'ALL') AS id,
           CAST(ROUND(SUM(sales), 2) AS DOUBLE) AS sales,
           CAST(ROUND(SUM(rets), 2) AS DOUBLE) AS returns,
           CAST(ROUND(SUM(sales) - SUM(rets), 2) AS DOUBLE) AS profit
    FROM base
    GROUP BY ROLLUP(channel, id)
    ORDER BY channel, id
"""


@query("ds_q5_channel_rollup", oracle=_DS_Q5)
def ds_q5_channel_rollup(spark, sf_dir):
    """TPC-DS query5 shape (query5.sql): per-channel sales/returns/profit
    summary rolled up with GROUP BY ROLLUP(channel, id); subtotal rows are
    made unambiguous via COALESCE before the ordered compare."""
    return _sql(spark, sf_dir, _DS_Q5)


_DS_Q8 = f"""
    SELECT n_name, CAST(ROUND(SUM({_REV}), 2) AS DOUBLE) AS total_sales
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE c_nationkey IN (
        SELECT c_nationkey FROM customer WHERE c_acctbal > 7000
        INTERSECT
        SELECT s_nationkey FROM supplier
        GROUP BY s_nationkey HAVING COUNT(*) >= 4
    )
    GROUP BY n_name
    ORDER BY n_name
"""


@query("ds_q8_intersect_in_filter", oracle=_DS_Q8)
def ds_q8_intersect_in_filter(spark, sf_dir):
    """TPC-DS query8 shape (query8.sql): the outer agg is gated by an IN
    subquery whose body is itself an INTERSECT of two derived sets (rich
    customers' nations x well-supplied nations)."""
    return _sql(spark, sf_dir, _DS_Q8)


_DS_Q11 = f"""
    WITH yt AS (
        SELECT o_custkey AS cust,
               CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS yr,
               l_linestatus AS chan,
               CAST(ROUND(SUM({_REV}), 2) AS DOUBLE) AS tot
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY 1, 2, 3
    )
    SELECT s1.cust AS c_custkey,
           s1.tot AS store_y1, s2.tot AS store_y2,
           w1.tot AS web_y1, w2.tot AS web_y2
    FROM yt s1
    JOIN yt s2 ON s1.cust = s2.cust
    JOIN yt w1 ON s1.cust = w1.cust
    JOIN yt w2 ON s1.cust = w2.cust
    WHERE s1.chan = 'F' AND s1.yr = 1996
      AND s2.chan = 'F' AND s2.yr = 1997
      AND w1.chan = 'O' AND w1.yr = 1996
      AND w2.chan = 'O' AND w2.yr = 1997
      AND s1.tot > CAST(0 AS DOUBLE) AND w1.tot > CAST(0 AS DOUBLE)
      AND w2.tot / w1.tot > s2.tot / s1.tot
    ORDER BY c_custkey
    LIMIT 100
"""


@query("ds_q11_yoy_growth", oracle=_DS_Q11)
def ds_q11_yoy_growth(spark, sf_dir):
    """TPC-DS query11 shape (query11.sql): one customer-year-channel total
    CTE self-joined four ways; keep customers whose web growth ratio beats
    their store growth ratio. Ratio compare on exact rounded doubles.

    Single-scan plan (r8, was 4 lineitem+orders scans): the four CTE
    instances are FIXED (status, year) cells of one customer aggregation
    — four conditional rounded sums; inner-join existence = IS NOT NULL
    (ds_q4's fusion, two cells fewer)."""
    rev = dec("l_extendedprice") * (
        F.lit(1).cast("decimal(6,4)") - dec("l_discount", "decimal(6,4)")
    )
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    yr = F.year("o_orderdate")
    st = F.col("l_linestatus")

    def cell(status, y):
        return dround(F.sum(F.when((st == status) & (yr == y), rev)))

    g = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(yr.isin(1996, 1997))
        .groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(
            cell("F", 1996).alias("store_y1"),
            cell("F", 1997).alias("store_y2"),
            cell("O", 1996).alias("web_y1"),
            cell("O", 1997).alias("web_y2"),
        )
    )
    zero = F.lit(0).cast("double")
    return (
        g.filter(
            F.col("store_y1").isNotNull() & F.col("store_y2").isNotNull()
            & F.col("web_y1").isNotNull() & F.col("web_y2").isNotNull()
            & (F.col("store_y1") > zero) & (F.col("web_y1") > zero)
            & (
                F.col("web_y2") / F.col("web_y1")
                > F.col("store_y2") / F.col("store_y1")
            )
        )
        .select("c_custkey", "store_y1", "store_y2", "web_y1", "web_y2")
        .orderBy("c_custkey")
        .limit(100)
    )


_DS_Q14 = f"""
    WITH cross_items AS (
        SELECT l_partkey FROM lineitem
        WHERE l_linenumber % 3 = 0 AND EXTRACT(YEAR FROM l_shipdate) = 1996
        INTERSECT
        SELECT l_partkey FROM lineitem
        WHERE l_linenumber % 3 = 1 AND EXTRACT(YEAR FROM l_shipdate) = 1996
        INTERSECT
        SELECT l_partkey FROM lineitem
        WHERE l_linenumber % 3 = 2 AND EXTRACT(YEAR FROM l_shipdate) = 1996
    )
    SELECT {_CHANNEL} AS channel, p_brand,
           CAST(ROUND(SUM({_REV}), 2) AS DOUBLE) AS sales,
           COUNT(*) AS number_sales
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_partkey IN (SELECT l_partkey FROM cross_items)
      AND EXTRACT(MONTH FROM l_shipdate) = 12
    GROUP BY 1, 2
    ORDER BY channel, p_brand
    LIMIT 200
"""


@query("ds_q14_cross_channel_items", oracle=_DS_Q14)
def ds_q14_cross_channel_items(spark, sf_dir):
    """TPC-DS query14a shape (query14a.sql): cross_items = items sold in ALL
    three channels (a chained INTERSECT), then the channel aggregate runs
    only over that intersected item set.

    Two-scan plan (r8): the 3-branch INTERSECT is one partkey-grouped
    pass (COUNT(DISTINCT channel) = 3 — channels partition every row, so
    the three branches re-scan the same 1996 rows); the December channel
    aggregate is the second scan, semi-joined on the intersected set."""
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part")
    ch = F.expr(_CHANNEL)
    cross_items = (
        li.filter(F.year("l_shipdate") == 1996)
        .groupBy("l_partkey")
        .agg(F.size(F.collect_set(ch)).alias("nchan"))
        .filter(F.col("nchan") == 3)
        .select(F.col("l_partkey").alias("ci_partkey"))
    )
    rev = dec("l_extendedprice") * (F.lit(1).cast("decimal(6,4)") - dec("l_discount", "decimal(6,4)"))
    return (
        li.filter(F.month("l_shipdate") == 12)
        .join(cross_items, F.col("l_partkey") == F.col("ci_partkey"), "semi")
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(ch.alias("channel"), F.col("p_brand"))
        .agg(
            dround(F.sum(rev)).alias("sales"),
            F.count(F.lit(1)).alias("number_sales"),
        )
        .orderBy("channel", "p_brand")
        .limit(200)
    )


_DS_Q23 = f"""
    WITH frequent_parts AS (
        SELECT l_partkey FROM lineitem
        WHERE EXTRACT(YEAR FROM l_shipdate) IN (1996, 1997)
        GROUP BY l_partkey
        HAVING COUNT(DISTINCT l_orderkey) > 12
    ), cust_totals AS (
        SELECT o_custkey AS cust,
               CAST(ROUND(SUM({_QTY} * {_PRICE}), 2) AS DOUBLE) AS csales
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_custkey
    ), best_customers AS (
        SELECT cust FROM cust_totals
        WHERE csales > CAST(0.5 AS DOUBLE)
                       * (SELECT MAX(csales) FROM cust_totals)
    )
    SELECT CAST(ROUND(SUM({_PRICE}), 2) AS DOUBLE) AS total_sales,
           COUNT(*) AS n_rows
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_partkey IN (SELECT l_partkey FROM frequent_parts)
      AND o_custkey IN (SELECT cust FROM best_customers)
      AND EXTRACT(YEAR FROM o_orderdate) = 1997
"""


@query("ds_q23_frequent_best_customers", oracle=_DS_Q23)
def ds_q23_frequent_best_customers(spark, sf_dir):
    """TPC-DS query23a shape (query23a.sql): frequent-item CTE (HAVING on a
    distinct count) + best-customer CTE gated on a scalar MAX subquery over
    another CTE; final agg filters by both IN-lists. The MAX threshold is
    compared on exact rounded doubles.

    Single-scan plan (r8, was 4 lineitem+orders scans): the three gates
    group by DIFFERENT keys (partkey / custkey / global), so one narrow
    persisted projection of the joined scan feeds all three — the q23b
    common-subgraph-reuse shape."""
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    amt = dec("l_quantity") * dec("l_extendedprice")
    tagged = (
        run_persist(
            li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
            .select(
                "l_partkey", "l_orderkey", "o_custkey",
                F.year("l_shipdate").alias("ship_yr"),
                F.year("o_orderdate").alias("order_yr"),
                amt.alias("amt"),
                dec("l_extendedprice").alias("price"),
            ),
            "ds_q23.tagged",
        )
    )
    freq = (
        tagged.filter(F.col("ship_yr").isin(1996, 1997))
        .groupBy("l_partkey")
        .agg(F.countDistinct("l_orderkey").alias("c"))
        .filter(F.col("c") > 12)
        .select("l_partkey")
    )
    cust = tagged.groupBy("o_custkey").agg(
        dround(F.sum("amt")).alias("csales")
    )
    cmax = cust.agg(F.max("csales").alias("cmax"))
    best = (
        cust.join(F.broadcast(cmax))
        .filter(
            F.col("csales") > F.lit(0.5).cast("double") * F.col("cmax")
        )
        .select(F.col("o_custkey").alias("cust"))
    )
    return (
        tagged.filter(F.col("order_yr") == 1997)
        .join(freq, "l_partkey", "semi")
        .join(
            best, F.col("o_custkey") == F.col("cust"), "semi"
        )
        .agg(
            dround(F.sum("price")).alias("total_sales"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


def _q28_bucket(i: int, lo: int, hi: int, d1: float, d2: float) -> str:
    return f"""
    (SELECT CAST(ROUND(SUM({_PRICE}), 2) AS DOUBLE) / COUNT(*) AS b{i}_avg,
            COUNT(*) AS b{i}_cnt,
            COUNT(DISTINCT l_partkey) AS b{i}_cntd
     FROM lineitem
     WHERE l_quantity BETWEEN {lo} AND {hi}
       AND (l_discount BETWEEN {d1} AND {d1} + 0.02
            OR l_extendedprice BETWEEN 5000 AND 50000
            OR l_tax BETWEEN {d2} AND {d2} + 0.01)) s{i}
"""


_DS_Q28 = (
    "    SELECT * FROM\n"
    + ",".join(
        _q28_bucket(i, lo, hi, d1, d2)
        for i, (lo, hi, d1, d2) in enumerate(
            [
                (1, 8, 0.00, 0.00),
                (9, 16, 0.01, 0.01),
                (17, 24, 0.02, 0.02),
                (25, 32, 0.03, 0.03),
                (33, 40, 0.04, 0.04),
                (41, 50, 0.05, 0.05),
            ],
            start=1,
        )
    )
)


@query("ds_q28_bucket_stats", oracle=_DS_Q28)
def ds_q28_bucket_stats(spark, sf_dir):
    """TPC-DS query28 shape (query28.sql): six single-row aggregate
    subqueries over disjoint quantity buckets (each with the triple-OR
    side predicate), comma-cross-joined into one wide row.

    Single-scan plan (r8, was 6 lineitem scans): quantity buckets are
    DISJOINT, so one scan tags each row with its bucket, applies that
    bucket's side predicate via one CASE, pre-aggregates per
    (bucket, partkey) — which makes COUNT(DISTINCT l_partkey) a plain
    COUNT(*) of the second level, no expand — and pivots the six bucket
    rows into the wide single row with conditional MAXes."""
    buckets = [
        (1, 1, 8, 0.00, 0.00),
        (2, 9, 16, 0.01, 0.01),
        (3, 17, 24, 0.02, 0.02),
        (4, 25, 32, 0.03, 0.03),
        (5, 33, 40, 0.04, 0.04),
        (6, 41, 50, 0.05, 0.05),
    ]
    li = t(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity")
    bucket = None
    for i, lo, hi, d1, d2 in buckets:
        side = (
            F.col("l_discount").between(d1, d1 + 0.02)
            | F.col("l_extendedprice").between(5000, 50000)
            | F.col("l_tax").between(d2, d2 + 0.01)
        )
        cond = qty.between(lo, hi) & side
        bucket = (
            F.when(cond, F.lit(i)) if bucket is None
            else bucket.when(cond, F.lit(i))
        )
    lvl1 = (
        li.select(bucket.alias("b"), "l_partkey", dec("l_extendedprice").alias("p"))
        .filter(F.col("b").isNotNull())
        .groupBy("b", "l_partkey")
        .agg(F.count(F.lit(1)).alias("c"), F.sum("p").alias("sp"))
    )
    lvl2 = lvl1.groupBy("b").agg(
        F.sum("c").alias("cnt"),
        F.sum("sp").alias("sump"),
        F.count(F.lit(1)).alias("cntd"),
    )
    wide = []
    for i, *_ in buckets:
        hit = F.col("b") == i
        wide += [
            (
                F.max(F.when(hit, dround(F.col("sump")))) /
                F.max(F.when(hit, F.col("cnt")))
            ).alias(f"b{i}_avg"),
            # an EMPTY bucket's scalar subquery still yields a row:
            # COUNT(*) = 0, not NULL
            F.coalesce(
                F.max(F.when(hit, F.col("cnt"))), F.lit(0)
            ).alias(f"b{i}_cnt"),
            F.coalesce(
                F.max(F.when(hit, F.col("cntd"))), F.lit(0)
            ).alias(f"b{i}_cntd"),
        ]
    return lvl2.agg(*wide)


def _q33_leg(chan: int) -> str:
    return f"""
        SELECT p_brand AS brand, SUM({_REV}) AS total
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_linenumber % 3 = {chan} AND EXTRACT(MONTH FROM l_shipdate) = 3
        GROUP BY p_brand
"""


_DS_Q33 = f"""
    WITH ss AS ({_q33_leg(0)}),
         cs AS ({_q33_leg(1)}),
         ws AS ({_q33_leg(2)})
    SELECT brand,
           CAST(ROUND(SUM(total), 2) AS DOUBLE) AS total_sales
    FROM (SELECT * FROM ss UNION ALL SELECT * FROM cs
          UNION ALL SELECT * FROM ws) tmp
    GROUP BY brand
    ORDER BY total_sales DESC, brand
    LIMIT 100
"""


@query("ds_q33_channel_union_agg", oracle=_DS_Q33)
def ds_q33_channel_union_agg(spark, sf_dir):
    """TPC-DS query33 shape (query33.sql, same family as query56/query60):
    three per-channel brand aggregates UNION ALL'd, then re-aggregated to a
    single per-brand total. Decimal partials survive the union; one round
    at the end.

    Single-scan plan (r8): the three legs differ only in the channel tag
    and channels PARTITION every row, while the outer GROUP BY re-sums
    the un-rounded decimal partials — so one March scan grouped by brand
    is exact-identical to the 3-branch union, at a third of the IO."""
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part")
    rev = dec("l_extendedprice") * (
        F.lit(1).cast("decimal(6,4)") - dec("l_discount", "decimal(6,4)")
    )
    return (
        li.filter(F.month("l_shipdate") == 3)
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(dround(F.sum(rev)).alias("total_sales"))
        .orderBy(F.col("total_sales").desc(), "brand")
        .limit(100)
    )


_DS_Q34 = f"""
    WITH baskets AS (
        SELECT o_orderkey, o_custkey, SUM({_QTY}) AS qty
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_orderkey, o_custkey
        HAVING SUM({_QTY}) BETWEEN 150 AND 200
    )
    SELECT c_custkey, c_name, o_orderkey,
           CAST(ROUND(qty, 2) AS DOUBLE) AS qty
    FROM baskets JOIN customer ON o_custkey = c_custkey
    WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE')
    ORDER BY c_custkey, o_orderkey
"""


@query("ds_q34_basket_range", oracle=_DS_Q34)
def ds_q34_basket_range(spark, sf_dir):
    """TPC-DS query34 shape (query34.sql, same family as query73): per-order
    basket totals kept by a HAVING range, joined back to a filtered customer
    dimension. The HAVING compares exact decimals against int bounds."""
    return _sql(spark, sf_dir, _DS_Q34)


def _q38_leg(chan: int) -> str:
    return f"""
        SELECT DISTINCT o_custkey,
               CAST(EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS m
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        WHERE l_linenumber % 3 = {chan}
"""


_DS_Q38 = f"""
    SELECT COUNT(*) AS hot_cust
    FROM ({_q38_leg(0)} INTERSECT {_q38_leg(1)} INTERSECT {_q38_leg(2)}) hot
"""


@query("ds_q38_three_channel_intersect", oracle=_DS_Q38)
def ds_q38_three_channel_intersect(spark, sf_dir):
    """TPC-DS query38 shape (query38.sql): COUNT(*) over the 3-way INTERSECT
    of per-channel DISTINCT (customer, month) projections.

    Single-scan plan (r8, was 3): channels partition every row, so the
    intersect is one (customer, month) grouping with
    COUNT(DISTINCT channel) = 3."""
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_custkey", F.month("o_orderdate").alias("m"))
        .agg(F.size(F.collect_set(F.col("l_linenumber") % 3)).alias("nc"))
        .filter(F.col("nc") == 3)
        .agg(F.count(F.lit(1)).alias("hot_cust"))
    )


_DS_Q44 = f"""
    WITH v AS (
        SELECT l_partkey,
               CAST(ROUND(SUM(CASE WHEN l_returnflag = 'R' THEN -{_PRICE}
                                   ELSE {_PRICE} END), 2) AS DOUBLE) AS net
        FROM lineitem GROUP BY l_partkey
    ), best AS (
        SELECT l_partkey, ROW_NUMBER() OVER (ORDER BY net DESC, l_partkey)
               AS rnk
        FROM v
    ), worst AS (
        SELECT l_partkey, ROW_NUMBER() OVER (ORDER BY net ASC, l_partkey)
               AS rnk
        FROM v
    )
    SELECT best.rnk AS rnk, p1.p_name AS best_performing,
           p2.p_name AS worst_performing
    FROM best JOIN worst ON best.rnk = worst.rnk
    JOIN part p1 ON best.l_partkey = p1.p_partkey
    JOIN part p2 ON worst.l_partkey = p2.p_partkey
    WHERE best.rnk <= 10
    ORDER BY rnk
"""


@query("ds_q44_best_worst_rank", oracle=_DS_Q44)
def ds_q44_best_worst_rank(spark, sf_dir):
    """TPC-DS query44 shape (query44.sql): rank the same per-item metric
    ascending and descending, equi-join the two rankings on rank, and emit
    best/worst name pairs. ROW_NUMBER with a key tie-break is deterministic;
    the ranked input is the per-part aggregate (|parts| rows), so the
    unpartitioned window is bounded at any fact-table scale."""
    return _sql(spark, sf_dir, _DS_Q44)
