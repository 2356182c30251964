"""Rank / Top-N / deduplication inventory.

Reference parity (SURVEY.md §2.7): StreamExecRank (AppendOnlyTopNFunction,
RetractableTopNFunction), BatchExecRank (RankOperator), RankType
ROW_NUMBER/RANK/DENSE_RANK, and StreamExecDeduplicate keep-first/keep-last
(RowTimeDeduplicateFunction, ProcTimeDeduplicateKeep{First,Last}RowFunction).

Spark-first: the `ROW_NUMBER() ... WHERE rn <= N` pattern is recognized by
Catalyst's InferWindowGroupLimit (Spark 3.5+) and executed as
WindowGroupLimitExec — a partial per-partition top-N before the shuffle, the
same design as the reference's rank-limit pushdown. Every query breaks ties
on a unique key so results are deterministic.

Scale note: top-N per group shuffles once on the partition key with map-side
group-limit pruning; global top-N uses orderBy().limit() ->
TakeOrderedAndProjectExec (per-partition heap + driver merge of N rows, never
a full sort of 100 TB).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from apache_flink_spark.queries._util import t
from apache_flink_spark.queries.registry import query


@query(
    "rank_topn_per_group",
    oracle="""
    SELECT c_nationkey, c_custkey, c_acctbal, rn FROM (
      SELECT c_nationkey, c_custkey, c_acctbal,
             ROW_NUMBER() OVER (PARTITION BY c_nationkey
                                ORDER BY c_acctbal DESC, c_custkey) AS rn
      FROM customer
    ) WHERE rn <= 3
    """,
)
def rank_topn_per_group(spark, sf_dir):
    """Top-3 customers by balance per nation — WindowGroupLimitExec path."""
    c = t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return (
        c.select(
            "c_nationkey", "c_custkey", "c_acctbal", F.row_number().over(w).alias("rn")
        )
        .where(F.col("rn") <= 3)
    )


@query(
    "rank_rank_dense_rank",
    oracle="""
    SELECT p_brand, p_partkey, p_size,
           RANK() OVER (PARTITION BY p_brand ORDER BY p_size DESC) AS rnk,
           DENSE_RANK() OVER (PARTITION BY p_brand ORDER BY p_size DESC) AS drnk
    FROM part
    """,
)
def rank_rank_dense_rank(spark, sf_dir):
    """RANK/DENSE_RANK (reference RankType.RANK/DENSE_RANK) — gap semantics
    on ties are deterministic even without a unique tiebreak."""
    p = t(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(F.col("p_size").desc())
    return p.select(
        "p_brand",
        "p_partkey",
        "p_size",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
    )


@query(
    "rank_global_topk",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20
    """,
)
def rank_global_topk(spark, sf_dir):
    """Global top-K -> TakeOrderedAndProjectExec (heap per partition, merge
    K at the driver — no full sort at any scale)."""
    o = t(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(20)
    )


@query(
    "dedup_keep_first",
    oracle="""
    SELECT user_id, event_type, event_id, ts_us FROM (
      SELECT user_id, event_type, event_id, epoch_us(ts) AS ts_us,
             ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts, event_id) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def dedup_keep_first(spark, sf_dir):
    """Keep-FIRST row per (user_id, event_type) by event time — the batch
    semantics of StreamExecDeduplicate/RowTimeDeduplicateFunction(keep-first);
    streaming equivalent is dropDuplicatesWithinWatermark."""
    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        e.select(
            "user_id",
            "event_type",
            "event_id",
            F.unix_micros("ts").alias("ts_us"),
            F.row_number().over(w).alias("rn"),
        )
        .where(F.col("rn") == 1)
        .drop("rn")
    )


@query(
    "dedup_keep_last",
    oracle="""
    SELECT user_id, event_type, event_id, value FROM (
      SELECT user_id, event_type, event_id, value,
             ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def dedup_keep_last(spark, sf_dir):
    """Keep-LAST row per key (ProcTimeDeduplicateKeepLastRowFunction batch
    semantics): row_number over descending event time."""
    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        e.select(
            "user_id", "event_type", "event_id", "value",
            F.row_number().over(w).alias("rn"),
        )
        .where(F.col("rn") == 1)
        .drop("rn")
    )


@query(
    "dedup_distinct_rows",
    oracle="""
    SELECT DISTINCT c_nationkey, c_mktsegment FROM customer
    """,
)
def dedup_distinct_rows(spark, sf_dir):
    """Exact whole-row dedup -> hash aggregate on all columns."""
    c = t(spark, sf_dir, "customer")
    return c.select("c_nationkey", "c_mktsegment").distinct()


@query(
    "rank_topn_with_ties",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rnk FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             RANK() OVER (PARTITION BY o_custkey
                          ORDER BY o_orderdate) AS rnk
      FROM orders
    ) WHERE rnk <= 2
    """,
)
def rank_topn_with_ties(spark, sf_dir):
    """Top-N WITH TIES — the reference's RankType.RANK Top-N
    (flink-table-runtime .../rank/ RankProcessStrategy: ROW_NUMBER
    truncates at exactly N, RANK keeps every row tied with the Nth):
    each customer's first-two order DATES, where several same-date
    orders all survive. Ranked on the (non-unique) o_orderdate
    deliberately — a unique sort key would make RANK degenerate to
    ROW_NUMBER and test nothing. Same window-group-limit plan shape;
    Catalyst pushes the rank()<=k limit into the sort exactly as for
    row_number."""
    o = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate")
    return (
        o.withColumn("rnk", F.rank().over(w))
        .filter(F.col("rnk") <= 2)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rnk")
    )


@query(
    "dedup_rowtime_changelog",
    oracle="""
    WITH o AS (
      SELECT user_id, event_id, epoch_us(ts) AS ep,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id)
               AS arr
      FROM events
    ), e AS (
      SELECT *, MIN(ep) OVER (
               PARTITION BY user_id ORDER BY arr
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ) AS prev_min
      FROM o
    ), em AS (
      SELECT user_id, event_id, ep,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY arr) AS rn,
             LAG(event_id) OVER (PARTITION BY user_id ORDER BY arr)
               AS p_eid,
             LAG(ep) OVER (PARTITION BY user_id ORDER BY arr) AS p_ep
      FROM e WHERE prev_min IS NULL OR ep < prev_min
    )
    SELECT '+I' AS kind, user_id, event_id, ep FROM em WHERE rn = 1
    UNION ALL
    SELECT '-U' AS kind, user_id, p_eid AS event_id, p_ep AS ep
    FROM em WHERE rn > 1
    UNION ALL
    SELECT '+U' AS kind, user_id, event_id, ep FROM em WHERE rn > 1
    """,
)
def dedup_rowtime_changelog(spark, sf_dir):
    """r13 — rowtime keep-first deduplicate with RETRACTION EMISSION
    (reference RowTimeDeduplicateFunction; DeduplicateITCase.scala:181
    pinned verbatim in tests/test_itcase_dedup.py): events arrive per
    user in event_id order; a strictly-earlier event time replaces the
    current first-row winner, emitting -U(old), +U(new) under the
    __rowkind convention (aliased ``kind`` here). One hash exchange on
    user_id + two window passes — the keyed distribution the
    reference's dedup state requires."""
    from apache_flink_spark.changelog import ROWKIND_COL, dedup_changelog

    e = t(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_micros("ts").alias("ep")
    )
    out = dedup_changelog(
        e, ["user_id"], "ep", "event_id", keep="first"
    )
    return out.select(
        F.col(ROWKIND_COL).alias("kind"), "user_id", "event_id", "ep"
    )
