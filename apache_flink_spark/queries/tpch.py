"""TPC-H-style relational queries on the star schema.

These mirror the reference's e2e SQL validation strategy (SURVEY.md §5: the
reference runs the full TPC-H/TPC-DS sets against answer sets —
flink-end-to-end-tests/flink-tpch-test/.../TpchResultComparator.java); here
each query is a DataFrame program checked hash-exactly against DuckDB.

Scale notes (100 TB): every query below is scan -> pushed-down filter ->
shuffle agg/join -> small result. Dimension joins (region/nation/customer/
supplier/part) are broadcast by Catalyst (all far under the broadcast
threshold at any SF since they grow sub-linearly); fact-fact joins
(orders x lineitem) shuffle on the join key, which AQE re-splits on skew.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from apache_flink_spark.queries._util import FRAC, MONEY, davg, dec, dround, dsum, t
from apache_flink_spark.queries.registry import query


@query(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(12,4))), 2) AS DOUBLE) AS sum_qty,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4))), 2) AS DOUBLE) AS sum_base_price,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4))
                    * (CAST(1 AS DECIMAL(6,4)) - CAST(l_discount AS DECIMAL(6,4)))), 2) AS DOUBLE)
               AS sum_disc_price,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4))
                    * (CAST(1 AS DECIMAL(6,4)) - CAST(l_discount AS DECIMAL(6,4)))
                    * (CAST(1 AS DECIMAL(6,4)) + CAST(l_tax AS DECIMAL(6,4)))), 2) AS DOUBLE)
               AS sum_charge,
           CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(12,4))), 2) AS DOUBLE) / COUNT(*) AS avg_qty,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4))), 2) AS DOUBLE) / COUNT(*) AS avg_price,
           CAST(ROUND(SUM(CAST(l_discount AS DECIMAL(6,4))), 2) AS DOUBLE) / COUNT(*) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark, sf_dir):
    """Flagship: scan -> pushed filter -> hash agg (8 aggregates).

    Reference parity: BatchExecHashAggregate + Calc (SURVEY.md §2.4/§2.2);
    Catalyst plans partial+final HashAggregate with the shipdate predicate and
    7-column pruning pushed into the parquet scan.
    """
    li = t(spark, sf_dir, "lineitem")
    one = F.lit(1).cast(FRAC)
    disc_price = dec("l_extendedprice") * (one - dec("l_discount", FRAC))
    charge = disc_price * (one + dec("l_tax", FRAC))
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dround(F.sum(disc_price)).alias("sum_disc_price"),
            dround(F.sum(charge)).alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount", FRAC).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "q3_shipping_priority",
    oracle="""
    SELECT l_orderkey,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4))
                    * (CAST(1 AS DECIMAL(6,4)) - CAST(l_discount AS DECIMAL(6,4)))), 2) AS DOUBLE)
               AS revenue,
           strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
           o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark, sf_dir):
    """3-way join (broadcast dim + shuffle fact-fact) -> agg -> top-k.

    Reference parity: BatchExecHashJoin + HashAggregate + SortLimit
    (SURVEY.md §2.3/§2.4/§2.8). `customer` broadcasts; orders/lineitem
    shuffle on orderkey. Top-k via TakeOrderedAndProject (no full sort).
    Ties broken on l_orderkey for determinism.
    """
    c = t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp")
    )
    one = F.lit(1).cast(FRAC)
    revenue = dec("l_extendedprice") * (one - dec("l_discount", FRAC))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dround(F.sum(revenue)).alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@query(
    "q5_local_supplier_volume",
    oracle="""
    SELECT n_name,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4))
                    * (CAST(1 AS DECIMAL(6,4)) - CAST(l_discount AS DECIMAL(6,4)))), 2) AS DOUBLE)
               AS revenue
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n_name
    """,
)
def q5_local_supplier_volume(spark, sf_dir):
    """6-way join chain through the full star — reference parity for the
    multi-join reorder path (SURVEY.md §4.2 join_reorder; Catalyst CBO/AQE).
    All dimensions broadcast; the only shuffle is orders x lineitem."""
    tb = {n: t(spark, sf_dir, n) for n in ("customer", "orders", "lineitem", "supplier", "nation", "region")}
    one = F.lit(1).cast(FRAC)
    revenue = dec("l_extendedprice") * (one - dec("l_discount", FRAC))
    return (
        tb["customer"]
        .join(tb["orders"], F.col("c_custkey") == F.col("o_custkey"))
        .join(tb["lineitem"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            tb["supplier"],
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(tb["nation"], F.col("s_nationkey") == F.col("n_nationkey"))
        .join(tb["region"], F.col("n_regionkey") == F.col("r_regionkey"))
        .where(
            (F.col("r_name") == "ASIA")
            & (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .groupBy("n_name")
        .agg(dround(F.sum(revenue)).alias("revenue"))
    )


@query(
    "q6_forecast_revenue",
    oracle="""
    SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4))
                    * CAST(l_discount AS DECIMAL(6,4))), 2) AS DOUBLE) AS revenue,
           COUNT(*) AS n_rows
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark, sf_dir):
    """Pure scan-filter-agg: every predicate reaches the parquet scan
    (PushedFilters), global agg is a single partial+final reduction."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dround(F.sum(dec("l_extendedprice") * dec("l_discount", FRAC))).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


@query(
    "q10_returned_items",
    oracle="""
    SELECT c_custkey, c_name,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4))
                    * (CAST(1 AS DECIMAL(6,4)) - CAST(l_discount AS DECIMAL(6,4)))), 2) AS DOUBLE)
               AS revenue,
           n_name
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark, sf_dir):
    """Join + agg + top-k with deterministic tie-break (c_custkey)."""
    tb = {n: t(spark, sf_dir, n) for n in ("customer", "orders", "lineitem", "nation")}
    one = F.lit(1).cast(FRAC)
    revenue = dec("l_extendedprice") * (one - dec("l_discount", FRAC))
    return (
        tb["customer"]
        .join(tb["orders"], F.col("c_custkey") == F.col("o_custkey"))
        .join(tb["lineitem"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(tb["nation"], F.col("c_nationkey") == F.col("n_nationkey"))
        .where(
            (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_returnflag") == "R")
        )
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(dround(F.sum(revenue)).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )
