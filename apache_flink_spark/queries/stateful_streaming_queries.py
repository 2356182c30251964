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
