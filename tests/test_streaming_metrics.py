"""Metrics recorder (flink-metrics parity surface)."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from apache_flink_spark.streaming.metrics import attach_metrics
from apache_flink_spark.streaming.sources import run_to_table, stream_table


def test_metrics_recorder_captures_progress(spark, sf_dir):
    rec = attach_metrics(spark)
    try:
        e = stream_table(spark, sf_dir, "events")
        agg = (
            e.withWatermark("ts", "1 hour")
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        run_to_table(agg, "update")
        # listener events are delivered asynchronously
        deadline = time.time() + 30
        while time.time() < deadline and not rec.batches():
            time.sleep(0.5)
        t = rec.totals()
        assert t["n_batches"] >= 1
        assert t["num_input_rows"] > 0
        # the stateful agg reports state entries (numRowsTotal)
        assert t["max_state_rows"] > 0
        # watermark gauge is present (ISO timestamp string)
        assert t["last_watermark"] is not None
    finally:
        spark.streams.removeListener(rec)
