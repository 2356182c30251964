"""DataStream API inventory — programs written in the reference's second
API vocabulary (flink-runtime DataStream/KeyedStream), executed through
the facade in apache_flink_spark/datastream.py.

These pin that the facade produces the SAME plans (and therefore the same
oracle-checked results) as the DataFrame-native queries: the facade is
sugar over Catalyst, not a second engine.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from apache_flink_spark.datastream import (
    StreamExecutionEnvironment,
    TumblingEventTimeWindows,
)
from apache_flink_spark.queries._util import dsum, t
from apache_flink_spark.queries.registry import query


@query(
    "ds_word_count",
    oracle="""
    SELECT w.word, COUNT(*) AS "count"
    FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents) w
    GROUP BY 1
    """,
)
def ds_word_count(spark, sf_dir):
    """The canonical DataStream program (reference WordCount example shape:
    flatMap -> keyBy -> sum) through the facade. flat_map uses the
    expression fast path (explode of split — JVM, codegen'd), key_by+count
    is a hash aggregate; identical physical plan to the DataFrame twin."""
    env = StreamExecutionEnvironment.get_execution_environment(spark)
    docs = env.from_source(t(spark, sf_dir, "documents"))
    return (
        docs.flat_map(F.split("text", " "))
        .map(F.col("value").alias("word"))
        .key_by("word")
        .count()
        .to_df()
    )


@query(
    "ds_keyed_window_agg",
    oracle=f"""
    SELECT (epoch_us(ts) // {600_000_000}) * {600_000_000} AS win_start,
           event_type,
           COUNT(*) AS n_events,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(12,4))), 2) AS DOUBLE)
               AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def ds_keyed_window_agg(spark, sf_dir):
    """keyBy().window(TumblingEventTimeWindows.of(...)).aggregate(...) —
    the DataStream windowed-aggregation shape (WindowedStream.aggregate)
    over the events fixture; same StreamExecWindowAggregate twin as
    win_tumble_agg, written in DataStream vocabulary."""
    env = StreamExecutionEnvironment.get_execution_environment(spark)
    events = env.from_source(t(spark, sf_dir, "events"))
    win = TumblingEventTimeWindows.of("10 minutes").on("ts").alias("win")
    out = (
        events.key_by("event_type")
        .window(win)
        .aggregate(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value").alias("sum_value"),
        )
        .to_df()
    )
    return out.select(
        F.unix_micros("win.start").alias("win_start"),
        "event_type",
        "n_events",
        "sum_value",
    )


@query(
    "ds_interval_join",
    oracle="""
    SELECT c.user_id,
           c.event_id AS click_id,
           er.event_id AS error_id,
           epoch_us(c.ts) AS click_ts,
           epoch_us(er.ts) AS error_ts
    FROM events c JOIN events er
      ON c.user_id = er.user_id
     AND er.ts >= c.ts - INTERVAL 30 MINUTE
     AND er.ts <= c.ts
    WHERE c.event_type = 'click' AND er.event_type = 'error'
    """,
)
def ds_interval_join(spark, sf_dir):
    """KeyedStream.intervalJoin through the facade (reference
    KeyedStream.intervalJoin:369 / TimeIntervalJoin.java): errors within
    the 30 minutes preceding each click by the same user — the DataStream
    spelling of the registered interval_join query, same oracle, proving
    the facade builds the identical time-bounded join."""
    env = StreamExecutionEnvironment.get_execution_environment(spark)
    e = t(spark, sf_dir, "events")
    clicks = env.from_source(
        e.filter(F.col("event_type") == "click").select(
            "user_id", F.col("event_id").alias("click_id"),
            F.col("ts").alias("c_ts"),
        )
    ).key_by("user_id")
    errors = env.from_source(
        e.filter(F.col("event_type") == "error").select(
            F.col("user_id").alias("e_user"),
            F.col("event_id").alias("error_id"),
            F.col("ts").alias("e_ts"),
        )
    ).key_by("e_user")
    return (
        clicks.interval_join(errors, "c_ts", "e_ts", "-30 minutes", "0 minutes")
        .to_df()
        .select(
            "user_id",
            "click_id",
            "error_id",
            F.unix_micros("c_ts").alias("click_ts"),
            F.unix_micros("e_ts").alias("error_ts"),
        )
    )
