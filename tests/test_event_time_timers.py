"""Event-time timers: the custom session operator must fire on watermark
passage (reference ProcessFunction timer parity), not on data arrival."""

from __future__ import annotations

import os
import tempfile
import time
from datetime import datetime

import pandas as pd
from pyspark.sql import functions as F

from apache_flink_spark.streaming.stateful import streaming_custom_sessions

GAP_US = 30 * 60 * 1_000_000  # 30 minutes


def _write(spark, src, rows, mtime):
    rows = [(datetime.fromisoformat(ts), int(uid)) for ts, uid in rows]
    before = set(os.listdir(src)) if os.path.exists(src) else set()
    spark.createDataFrame(rows, "ts timestamp, user_id long").coalesce(
        1
    ).write.mode("append").parquet(src)
    for f in set(os.listdir(src)) - before:
        os.utime(os.path.join(src, f), (mtime, mtime))


def test_session_closes_on_watermark(spark):
    src = tempfile.mkdtemp(prefix="afs_timer_src_")
    ckpt = tempfile.mkdtemp(prefix="afs_timer_ckpt_")
    now = time.time()

    # Batch 0: user 1 has a 2-event session ending 10:05.
    _write(
        spark,
        src,
        [("2024-01-01 10:00:00", 1), ("2024-01-01 10:05:00", 1)],
        now - 60,
    )
    # Batch 1: user 2 far in the future -> watermark jumps past 10:35.
    _write(spark, src, [("2024-01-01 14:00:00", 2)], now - 30)
    # Batch 2: propagation batch (watermark filter lags one batch).
    _write(spark, src, [("2024-01-01 14:01:00", 2)], now)

    stream = (
        spark.readStream.schema("ts timestamp, user_id long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .withWatermark("ts", "1 minute")
        .select("user_id", F.unix_micros("ts").alias("ts_us"), "ts")
    )
    out = streaming_custom_sessions(stream, GAP_US)

    captured: dict[int, pd.DataFrame] = {}

    def sink(batch_df, batch_id):
        captured[batch_id] = batch_df.toPandas()

    q = (
        out.writeStream.foreachBatch(sink)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    emitted = pd.concat(list(captured.values()), ignore_index=True)
    u1 = emitted[emitted["user_id"] == 1]
    # User 1's session closed by TIMER (no further user-1 data arrived).
    assert len(u1) == 1, emitted
    assert int(u1.iloc[0]["n_events"]) == 2
    start = datetime(2024, 1, 1, 10, 0).timestamp()
    assert int(u1.iloc[0]["sess_start"]) == int(start * 1_000_000)
