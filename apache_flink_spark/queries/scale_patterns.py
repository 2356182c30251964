"""Scale-pattern operators — salted skew joins, multi-resolution rollups.

These encode the 100 TB playbook as first-class, oracle-checked operators:

  - Salted join: the manual rewrite for joins whose key distribution is
    pathological (here event_type: 5 values over the whole fact table —
    a plain shuffle join puts 20% of 100 TB in one task). AQE's skew-join
    splitting (enabled in session.py) handles moderate skew; the salt
    rewrite is the guaranteed form: fact side salts by a deterministic
    hash, dim side explodes x SALTS, join key becomes (key, salt) — same
    result set, SALTS-way parallel.
  - Multi-resolution rollup (hypertable-style continuous aggregate): one
    pass producing hourly AND daily aggregates via GROUPING SETS over
    derived time buckets — Catalyst's Expand multiplies rows once before
    the single shuffle (the reference decomposes grouping sets the same
    way: DecomposeGroupingSetsRule -> Expand, SURVEY §2.4).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from apache_flink_spark.catalog import load_tables
from apache_flink_spark.queries._util import dsum, t
from apache_flink_spark.queries.registry import query

_SALTS = 16
HOUR = 3_600_000_000
DAY = 24 * HOUR


@query(
    "join_salted_skew",
    oracle="""
    SELECT e.event_type, COUNT(*) AS n,
           CAST(ROUND(SUM(CAST(e.value AS DECIMAL(12,4))), 2) AS DOUBLE) AS sum_value,
           MIN(d.type_code) AS type_code
    FROM events e
    JOIN (
        SELECT 'click' AS event_type, 1 AS type_code UNION ALL
        SELECT 'view', 2 UNION ALL
        SELECT 'purchase', 3 UNION ALL
        SELECT 'error', 4 UNION ALL
        SELECT 'signup', 5
    ) d ON d.event_type = e.event_type
    GROUP BY e.event_type
    """,
)
def join_salted_skew(spark, sf_dir):
    """Salted skew join: fact salts on hash(event_id) % 16, the 5-row dim
    explodes to 80 (key, salt) rows, and the join key becomes composite —
    every salt bucket shuffles independently. Result-identical to the plain
    join the oracle runs."""
    e = t(spark, sf_dir, "events")
    dim = spark.createDataFrame(
        [("click", 1), ("view", 2), ("purchase", 3), ("error", 4), ("signup", 5)],
        "event_type string, type_code int",
    )
    salted_fact = e.withColumn(
        "salt", (F.abs(F.hash("event_id")) % _SALTS).cast("int")
    )
    salted_dim = dim.withColumn(
        "salt", F.explode(F.array(*[F.lit(s) for s in range(_SALTS)]))
    ).withColumnRenamed("event_type", "d_event_type")
    joined = salted_fact.join(
        salted_dim,
        (F.col("event_type") == F.col("d_event_type"))
        & (salted_fact["salt"] == salted_dim["salt"]),
    )
    return joined.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        dsum("value").alias("sum_value"),
        F.min("type_code").alias("type_code"),
    )


@query(
    "rollup_multi_resolution",
    oracle=f"""
    SELECT bucket_1d,
           CASE WHEN GROUPING(bucket_1h) = 1 THEN -1 ELSE bucket_1h END AS bucket_1h,
           event_type,
           COUNT(*) AS n,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(12,4))), 2) AS DOUBLE) AS sum_value
    FROM (
        SELECT (epoch_us(ts) // {DAY}) * {DAY} AS bucket_1d,
               (epoch_us(ts) // {HOUR}) * {HOUR} AS bucket_1h,
               event_type, value
        FROM events
    )
    GROUP BY GROUPING SETS ((bucket_1d, bucket_1h, event_type),
                            (bucket_1d, event_type))
    """,
)
def rollup_multi_resolution(spark, sf_dir):
    """Hypertable-style continuous aggregate: hourly and daily rollups in
    ONE scan + ONE shuffle via GROUPING SETS (Expand). The coarse level is
    not re-aggregated from the fine level — both materialize together, the
    pattern a timeseries store's rollup maintenance job runs at scale.
    NULL-vs-aggregated disambiguated with GROUPING() -> -1 sentinel."""
    load_tables(spark, sf_dir)
    return spark.sql(
        f"""
        SELECT bucket_1d,
               CASE WHEN GROUPING(bucket_1h) = 1 THEN -1 ELSE bucket_1h END
                   AS bucket_1h,
               event_type,
               COUNT(*) AS n,
               CAST(ROUND(SUM(CAST(value AS DECIMAL(12,4))), 2) AS DOUBLE)
                   AS sum_value
        FROM (
            SELECT (unix_micros(ts) div {DAY}) * {DAY} AS bucket_1d,
                   (unix_micros(ts) div {HOUR}) * {HOUR} AS bucket_1h,
                   event_type, value
            FROM events
        )
        GROUP BY GROUPING SETS ((bucket_1d, bucket_1h, event_type),
                                (bucket_1d, event_type))
        """
    )


@query(
    "ddl_distributed_bucket_join",
    oracle="""
    SELECT o.o_orderpriority,
           COUNT(*) AS n,
           CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(12,4))), 2)
                AS DOUBLE) AS sum_price
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_quantity > 30
    GROUP BY o.o_orderpriority
    """,
)
def ddl_distributed_bucket_join(spark, sf_dir):
    """FLIP-376 ``DISTRIBUTED BY`` DDL wired to the zero-exchange bucket
    lane (reference: flink-sql-parser SqlDistribution.java): two tables
    declared co-bucketed on the join key, populated by INSERT, joined
    WITHOUT re-shuffling either side — at 100 TB the layout decision made
    once at write time replaces a full shuffle of both facts on every
    join. The no-Exchange plan is pinned in tests/test_bucketing.py."""
    from apache_flink_spark.ddl import execute_flink_ddl

    load_tables(spark, sf_dir)
    spark.sql("DROP TABLE IF EXISTS bj_lineitem")
    spark.sql("DROP TABLE IF EXISTS bj_orders")
    execute_flink_ddl(
        spark,
        """
        CREATE TABLE bj_lineitem (
            l_orderkey BIGINT, l_quantity DOUBLE, l_extendedprice DOUBLE
        ) DISTRIBUTED BY HASH(l_orderkey) INTO 8 BUCKETS
        WITH ('connector' = 'filesystem', 'format' = 'parquet')
        """,
    )
    execute_flink_ddl(
        spark,
        """
        CREATE TABLE bj_orders (
            o_orderkey BIGINT, o_orderpriority STRING
        ) DISTRIBUTED BY HASH(o_orderkey) INTO 8 BUCKETS
        WITH ('connector' = 'filesystem', 'format' = 'parquet')
        """,
    )
    # r14 (guide §6 output sizing): align the INSERT's partitioning with
    # the bucket spec — REPARTITION(8, key) uses the same murmur3-pmod
    # hash as the bucket id, so each write task holds exactly one
    # bucket's rows and the table lands as exactly one file per bucket
    # at ANY input scale (without it, a single-split local scan wrote
    # all 8 buckets from one task — a serial write — while a many-split
    # cluster scan would write tasks x buckets files).
    spark.sql(
        "INSERT INTO bj_lineitem "
        "SELECT /*+ REPARTITION(8, l_orderkey) */ "
        "l_orderkey, l_quantity, l_extendedprice FROM lineitem"
    )
    spark.sql(
        "INSERT INTO bj_orders "
        "SELECT /*+ REPARTITION(8, o_orderkey) */ "
        "o_orderkey, o_orderpriority FROM orders"
    )
    return (
        spark.table("bj_lineitem")
        .where(F.col("l_quantity") > 30)
        .hint("merge")
        .join(
            spark.table("bj_orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum("l_extendedprice").alias("sum_price"),
        )
    )
