"""Stateful custom streaming operator inventory — the applyInPandasWithState
hard items (streaming Top-N, keep-last dedup) run as real streaming jobs.

Oracle determinism: the fixtures drain in one file-aligned micro-batch, so
the update-mode emissions equal the final per-key state — which is exactly
what the batch SQL oracle computes. Multi-batch behavior is covered by
tests/test_stateful_streaming.py, which feeds the same rows in several
batches and asserts the last emission per key converges to the same answer.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from apache_flink_spark.queries.registry import query
from apache_flink_spark.streaming.sources import run_to_table, stream_table
from apache_flink_spark.streaming.stateful import (
    streaming_custom_sessions,
    streaming_keep_last,
    streaming_topn_by_value,
)


@query(
    "stream_topn_stateful",
    oracle="""
    SELECT user_id, event_id, value, rn
    FROM (
        SELECT user_id, event_id, value,
               CAST(ROW_NUMBER() OVER (PARTITION BY user_id
                                       ORDER BY value DESC, event_id) AS INTEGER) AS rn
        FROM events
    )
    WHERE rn <= 3
    """,
)
def stream_topn_stateful(spark, sf_dir):
    """Streaming Top-N (AppendOnlyTopNFunction parity): top-3 events per
    user by value, maintained in per-key GroupState."""
    e = stream_table(spark, sf_dir, "events")
    out = streaming_topn_by_value(e.select("user_id", "event_id", "value"), 3)
    return run_to_table(out, "update")


@query(
    "stream_keep_last_dedup",
    oracle="""
    SELECT user_id, event_type, event_id, ts_us
    FROM (
        SELECT user_id, event_type, event_id, epoch_us(ts) AS ts_us,
               ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    )
    WHERE rn = 1
    """,
)
def stream_keep_last_dedup(spark, sf_dir):
    """Keep-last streaming deduplicate (ProcTimeDeduplicateKeepLastRow
    parity): the latest event per (user, type) — the variant Spark's
    dropDuplicates cannot express."""
    e = stream_table(spark, sf_dir, "events")
    out = streaming_keep_last(
        e.select("user_id", "event_type", "event_id", F.unix_micros("ts").alias("ts_us"))
    )
    return run_to_table(out, "update")


_MIN30_US = 30 * 60 * 1_000_000


@query(
    "stream_custom_sessions",
    oracle=f"""
    WITH marked AS (
        SELECT user_id, epoch_us(ts) AS ep,
               CASE WHEN epoch_us(ts)
                         - LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts)
                         > {_MIN30_US}
                         OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                    THEN 1 ELSE 0 END AS new_sess
        FROM events
    ), numbered AS (
        SELECT *, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ep
                                      ROWS UNBOUNDED PRECEDING) AS sess_id
        FROM marked
    ), sessions AS (
        SELECT user_id, sess_id,
               MIN(ep) AS sess_start, MAX(ep) AS sess_last,
               COUNT(*) AS n_events,
               MAX(sess_id) OVER (PARTITION BY user_id) AS max_sess
        FROM numbered
        GROUP BY user_id, sess_id
    )
    SELECT user_id, sess_start, sess_last, n_events
    FROM sessions
    WHERE sess_id < max_sess
    """,
)
def stream_custom_sessions(spark, sf_dir):
    """Custom session operator with event-time timers
    (streaming/stateful.py streaming_custom_sessions — reference
    ProcessFunction timer parity). The watermark delay exceeds the fixture's
    time span, so timers cannot fire inside this bounded run (availableNow
    otherwise appends a timer-only batch that also flushes still-open
    sessions — timer firing itself is covered by
    tests/test_event_time_timers.py). The emitted set is therefore every
    session CLOSED BY A GAP: all sessions except each user's final open
    one — exactly the oracle's gaps-and-islands minus the last island."""
    from pyspark.sql import functions as F

    e = stream_table(spark, sf_dir, "events")
    stream = e.withWatermark("ts", "10000 hours").select(
        "user_id", F.unix_micros("ts").alias("ts_us"), "ts"
    )
    out = streaming_custom_sessions(stream, _MIN30_US)
    return run_to_table(out, "append")


@query(
    "stream_temporal_join",
    oracle="""
    WITH wm AS (
        SELECT LEAST(
            (SELECT epoch_ms(MAX(ts)) FROM events WHERE event_type = 'click'),
            (SELECT epoch_ms(MAX(ts)) FROM events WHERE event_type = 'view')
        ) - 3600000 AS wm_ms
    )
    SELECT c.user_id, c.event_id AS click_id, epoch_us(c.ts) AS click_ts,
           v.event_id AS view_event_id
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
      ON c.user_id = v.user_id AND v.ts <= c.ts
    CROSS JOIN wm
    WHERE epoch_ms(c.ts) <= wm.wm_ms
    """,
)
def stream_temporal_join(spark, sf_dir):
    """Streaming stateful temporal join (TemporalRowTimeJoinOperator.java:78
    parity — the last §2.3 'hard item'): clicks probe the versioned view
    stream, each click matched to the latest same-user view at or before
    it, emitted once the global watermark (min over both sources) certifies
    the click. Clicks inside the final 1-hour watermark lag stay buffered —
    the DuckDB ASOF JOIN oracle applies the identical cutoff. Batch twin:
    asof_join_latest_view; arrival-slicing invariance pinned in
    tests/test_stateful_streaming.py."""
    from apache_flink_spark.streaming.stateful import streaming_temporal_join

    e1 = stream_table(spark, sf_dir, "events")
    e2 = stream_table(spark, sf_dir, "events")
    clicks = (
        e1.filter(F.col("event_type") == "click")
        .select("user_id", "event_id", "ts", F.lit(1).alias("side"))
        .withWatermark("ts", "1 hour")
    )
    views = (
        e2.filter(F.col("event_type") == "view")
        .select("user_id", "event_id", "ts", F.lit(0).alias("side"))
        .withWatermark("ts", "1 hour")
    )
    tagged = clicks.unionByName(views).select(
        "user_id", "side", "event_id", F.unix_micros("ts").alias("ts_us"), "ts"
    )
    out = streaming_temporal_join(tagged)
    return run_to_table(out, "append")


@query(
    "stream_temporal_sort",
    oracle="""
    WITH wm AS (SELECT epoch_ms(MAX(ts)) - 3600000 AS wm_ms FROM events)
    SELECT user_id, event_id, epoch_us(ts) AS ts_us,
           ROW_NUMBER() OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS seq
    FROM events, wm
    WHERE epoch_ms(ts) <= wm.wm_ms
    """,
)
def stream_temporal_sort(spark, sf_dir):
    """Streaming temporal sort (reference StreamExecTemporalSort — the §2.8
    row the r1 survey marked unimplemented): per-user events re-emitted in
    event-time order with a continuous seq, gated on the watermark. Rows in
    the final 1-hour watermark lag stay buffered (never certifiable in a
    bounded run); the oracle applies the identical cutoff and the seq
    column pins the emission ORDER, not just the set."""
    from apache_flink_spark.streaming.stateful import streaming_temporal_sort

    e = stream_table(spark, sf_dir, "events")
    stream = e.withWatermark("ts", "1 hour").select(
        "user_id", "event_id", F.unix_micros("ts").alias("ts_us"), "ts"
    )
    out = streaming_temporal_sort(stream)
    return run_to_table(out, "append")


@query(
    "stream_dedup_state_ttl",
    oracle="""
    SELECT user_id, event_id, ep AS ts_us
    FROM (
        SELECT user_id, event_id, epoch_us(ts) AS ep,
               LAG(epoch_us(ts)) OVER (PARTITION BY user_id
                                       ORDER BY epoch_us(ts), event_id)
                   AS prev_ep
        FROM events
    )
    WHERE prev_ep IS NULL OR ep - prev_ep > 1800000000
    """,
)
def stream_dedup_state_ttl(spark, sf_dir):
    """Deduplication with TTL'd keyed state (StateTtlConfig parity): a
    user's event emits only when more than 30 minutes passed since that
    user's previous event — the keep-alive TTL pattern that bounds dedup
    state to the active-key horizon. Oracle: the LAG formulation of the
    same per-key gap rule."""
    from apache_flink_spark.streaming.stateful import streaming_dedup_ttl

    e = stream_table(spark, sf_dir, "events")
    stream = e.withWatermark("ts", "1 hour").select(
        "user_id", "event_id", F.unix_micros("ts").alias("ts_us"), "ts"
    )
    out = streaming_dedup_ttl(stream, 1_800_000_000)
    return run_to_table(out, "append")
