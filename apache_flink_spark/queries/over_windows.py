"""OVER / analytic window inventory — frames, offsets, ranking distributions.

Reference parity (SURVEY.md §2.6): BatchExecOverAggregate with frame
implementations in flink-table-runtime .../over/frame/ (RowSlidingOverFrame,
RangeUnboundedPrecedingOverFrame, UnboundedOverWindowFrame, OffsetOverFrame
for lead/lag) and the ranking agg functions (RankAggFunction, NTILEAggFunction,
CumeDistAggFunction, LeadLagAggFunction).

Spark-first: Window.partitionBy().orderBy() with rowsBetween()/rangeBetween()
covers every reference frame; execution is WindowExec after a single shuffle
on the partition key. Running sums use exact DECIMAL accumulation so results
hash-match DuckDB (see queries/_util.py).

Scale note: one shuffle per distinct (partitionBy, orderBy) pair; all frames
over the same spec share one sort. Partition key user_id/orderkey has high
cardinality — no skew; never a global (empty partitionBy) window over big
tables.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from apache_flink_spark.queries._util import dec, t
from apache_flink_spark.queries.registry import query


@query(
    "over_running_sum",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,4)))
                      OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate, o_orderkey
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
                AS DOUBLE) AS running_spend,
           COUNT(*) OVER (PARTITION BY o_custkey
                          ORDER BY o_orderdate, o_orderkey
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS nth_order
    FROM orders
    """,
)
def over_running_sum(spark, sf_dir):
    """ROWS UNBOUNDED PRECEDING frame (RowUnboundedPrecedingOverFrame):
    per-customer running spend."""
    o = t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum(dec("o_totalprice")).over(w), 2)
        .cast("double")
        .alias("running_spend"),
        F.count(F.lit(1)).over(w).alias("nth_order"),
    )


@query(
    "over_sliding_rows",
    oracle="""
    SELECT user_id, event_id,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT))
                    OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
             / (100 * COUNT(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                     ROWS BETWEEN 2 PRECEDING AND CURRENT ROW))
             AS moving_avg3
    FROM events
    """,
)
def over_sliding_rows(spark, sf_dir):
    """ROWS sliding frame (RowSlidingOverFrame): 3-event moving average.
    Exact integer-cents sum over the frame, ONE final int->double division —
    engines' decimal-AVG division semantics differ at rounding boundaries
    (caught at sf0.1: 0.034% of rows off by an ulp with the naive
    AVG(DECIMAL) formulation), so the average is never computed in decimal."""
    e = t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-2, Window.currentRow)
    )
    cents = F.round(F.col("value") * 100).cast("long")
    return e.select(
        "user_id",
        "event_id",
        (
            F.sum(cents).over(w).cast("double")
            / (F.count(F.lit(1)).over(w) * 100)
        ).alias("moving_avg3"),
    )


@query(
    "over_range_frame",
    oracle="""
    SELECT p_brand, p_partkey, p_size,
           COUNT(*) OVER (PARTITION BY p_brand ORDER BY p_size
                          RANGE BETWEEN 5 PRECEDING AND CURRENT ROW) AS n_similar_size
    FROM part
    """,
)
def over_range_frame(spark, sf_dir):
    """RANGE frame (RangeSlidingOverFrame): peers counted by value distance,
    not row position — deterministic regardless of tie order."""
    p = t(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy("p_size").rangeBetween(-5, 0)
    return p.select(
        "p_brand",
        "p_partkey",
        "p_size",
        F.count(F.lit(1)).over(w).alias("n_similar_size"),
    )


@query(
    "over_lead_lag",
    oracle="""
    SELECT user_id, event_id, epoch_us(ts) AS ts_us,
           epoch_us(LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) AS prev_ts_us,
           LEAD(event_type, 1, 'NONE') OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type,
           LAG(event_id, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev2_event
    FROM events
    """,
)
def over_lead_lag(spark, sf_dir):
    """LEAD/LAG offsets (OffsetOverFrame / LeadLagAggFunction) with default
    values and offset 2."""
    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        F.unix_micros(F.lag("ts").over(w)).alias("prev_ts_us"),
        F.lead("event_type", 1, "NONE").over(w).alias("next_type"),
        F.lag("event_id", 2).over(w).alias("prev2_event"),
    )


@query(
    "over_distributions",
    oracle="""
    SELECT c_nationkey, c_custkey,
           NTILE(4) OVER (PARTITION BY c_nationkey
                          ORDER BY c_acctbal, c_custkey) AS quartile,
           CUME_DIST() OVER (PARTITION BY c_nationkey
                             ORDER BY c_acctbal, c_custkey) AS cdist,
           PERCENT_RANK() OVER (PARTITION BY c_nationkey
                                ORDER BY c_acctbal, c_custkey) AS prank
    FROM customer
    """,
)
def over_distributions(spark, sf_dir):
    """NTILE / CUME_DIST / PERCENT_RANK (NTILEAggFunction etc.). The unique
    (c_acctbal, c_custkey) order makes distribution values exact rationals
    computed identically in both engines."""
    c = t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_nationkey",
        "c_custkey",
        F.ntile(4).over(w).alias("quartile"),
        F.cume_dist().over(w).alias("cdist"),
        F.percent_rank().over(w).alias("prank"),
    )


@query(
    "over_first_last_value",
    oracle="""
    SELECT user_id, event_id,
           FIRST_VALUE(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_type,
           LAST_VALUE(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                        ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS final_type
    FROM events
    """,
)
def over_first_last_value(spark, sf_dir):
    """FIRST_VALUE / LAST_VALUE over full-partition frames (reference
    FirstValueAggFunction / LastValueWithRetractAggFunction)."""
    e = t(spark, sf_dir, "events")
    ordered = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_first = ordered.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_last = ordered.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return e.select(
        "user_id",
        "event_id",
        F.first("event_type").over(w_first).alias("first_type"),
        F.last("event_type").over(w_last).alias("final_type"),
    )


@query(
    "over_forward_fill",
    oracle="""
    SELECT user_id, event_id,
           CAST(ROUND(LAST_VALUE(CASE WHEN event_type = 'purchase'
                                      THEN value END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4)
               AS DOUBLE) AS last_purchase_value
    FROM events
    """,
)
def over_forward_fill(spark, sf_dir):
    """Forward fill via LAST_VALUE ... IGNORE NULLS (reference
    LastValueAggFunction's ignoreNulls accumulate path) — the classic
    gap-fill: every event carries the user's most recent purchase value
    (NULL until the first purchase). One shuffle + one in-partition sort,
    the universal over-window plan; rounded at scale 4 because the carried
    double is a raw column value, not an aggregate."""
    e = t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    purchase_val = F.when(F.col("event_type") == "purchase", F.col("value"))
    return e.select(
        "user_id",
        "event_id",
        F.round(F.last(purchase_val, ignorenulls=True).over(w), 4).alias(
            "last_purchase_value"
        ),
    )
