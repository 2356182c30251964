"""Streaming over-window aggregation — the §2.6 streaming hard item.

Reference parity: StreamExecOverAggregate / RowTimeRangeUnboundedPreceding-
Function (flink-table-runtime .../over/RowTimeRangeBoundedPrecedingFunction
.java:56 and unbounded variants): per-key running aggregates in event-time
order, emitted per input row. Structured Streaming has no streaming
over-window — implemented with applyInPandasWithState carrying the running
(count, sum) per key across micro-batches.

Ordering assumption: rows are processed in event-time order per key (the
fixture is globally ts-ordered; the reference makes the same assumption via
watermark-ordered state flushes — out-of-order rows there wait in state
until the watermark passes, which a production version of this operator
would replicate by buffering per key until watermark).

Money determinism: the running sum is kept in integer cents —
round(value*100) is exact for the 2-decimal fixture values, and integer
accumulation is order-independent and engine-exact.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from apache_flink_spark.queries.registry import query
from apache_flink_spark.streaming.sources import run_to_table, stream_table


@query(
    "stream_over_unbounded",
    oracle="""
    SELECT user_id, event_id, epoch_us(ts) AS ts_us,
           COUNT(*) OVER w AS run_cnt,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) OVER w AS BIGINT) AS run_sum_cents
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def stream_over_unbounded(spark, sf_dir):
    """Streaming ROWS UNBOUNDED PRECEDING over-aggregate: per-user running
    count and sum, one output row per input row, state = (count, cents)."""

    out_schema = (
        "user_id long, event_id long, ts_us long, run_cnt long, run_sum_cents long"
    )
    state_schema = "cnt long, cents long"

    def running(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        cnt, cents = state.get if state.exists else (0, 0)
        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch.sort_values(["ts_us", "event_id"], kind="mergesort")
        out_cnt, out_cents = [], []
        for v in batch["value"]:
            cnt += 1
            cents += int(round(float(v) * 100))
            out_cnt.append(cnt)
            out_cents.append(cents)
        state.update((cnt, cents))
        yield pd.DataFrame(
            {
                "user_id": batch["user_id"],
                "event_id": batch["event_id"],
                "ts_us": batch["ts_us"],
                "run_cnt": out_cnt,
                "run_sum_cents": out_cents,
            }
        )

    e = stream_table(spark, sf_dir, "events")
    u = e.select(
        "user_id", "event_id", F.unix_micros("ts").alias("ts_us"), "value"
    )
    out = u.groupBy("user_id").applyInPandasWithState(
        running, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )
    return run_to_table(out, "append")


_WINDOW_ROWS = 3  # current row + 2 preceding


@query(
    "stream_over_rows_bounded",
    oracle=f"""
    SELECT user_id, event_id, epoch_us(ts) AS ts_us,
           COUNT(*) OVER w AS w_cnt,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) OVER w AS BIGINT) AS w_sum_cents
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN {_WINDOW_ROWS - 1} PRECEDING AND CURRENT ROW)
    """,
)
def stream_over_rows_bounded(spark, sf_dir):
    """Streaming ROWS-BOUNDED over-aggregate (reference
    RowTimeRowsBoundedPrecedingFunction.java — the bounded sibling of
    stream_over_unbounded): per-user sliding sum/count over the last 3 rows,
    one output row per input row. Operator lives in
    streaming/stateful.streaming_rows_bounded_over (multi-batch pinned by
    tests/test_stateful_streaming.py)."""
    from apache_flink_spark.streaming.stateful import (
        streaming_rows_bounded_over,
    )

    e = stream_table(spark, sf_dir, "events")
    u = e.select(
        "user_id", "event_id", F.unix_micros("ts").alias("ts_us"), "value"
    )
    return run_to_table(
        streaming_rows_bounded_over(u, _WINDOW_ROWS), "append"
    )


_RANGE_HOURS = 24


@query(
    "stream_over_range_bounded",
    oracle=f"""
    SELECT user_id, event_id, epoch_us(ts) AS ts_us,
           COUNT(*) OVER w AS w_cnt,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) OVER w AS BIGINT) AS w_sum_cents
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL {_RANGE_HOURS} HOUR PRECEDING
                           AND CURRENT ROW)
    """,
)
def stream_over_range_bounded(spark, sf_dir):
    """Streaming RANGE-BOUNDED (event-time interval) over-aggregate
    (reference RowTimeRangeBoundedPrecedingFunction.java:56 — the third
    member of the streaming over-agg family next to unbounded and
    rows-bounded): per-user count/sum over the trailing 24 h of events, one
    output row per input row, equal timestamps sharing one frame (RANGE
    peers). Operator: streaming/stateful.streaming_range_bounded_over."""
    from apache_flink_spark.streaming.stateful import (
        streaming_range_bounded_over,
    )

    e = stream_table(spark, sf_dir, "events")
    u = e.select(
        "user_id", "event_id", F.unix_micros("ts").alias("ts_us"), "value"
    )
    return run_to_table(
        streaming_range_bounded_over(u, _RANGE_HOURS * 3_600_000_000), "append"
    )
