"""Offline checkpoint-state reading — State Processor API parity
(reference flink-libraries/flink-state-processing-api SavepointReader).

Run a keyed streaming aggregation to completion, then — with no query
running — read the checkpoint's keyed state back as a DataFrame and prove
it equals the aggregation the stream computed.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from apache_flink_spark.catalog import _normalize_nanos
from apache_flink_spark.streaming.state_processor import (
    read_keyed_state,
    read_state_metadata,
)


def _run_stateful_agg(spark, sf_dir):
    """Stream events into a per-user count/sum-cents aggregate, keeping the
    checkpoint; returns (checkpoint_dir, expected batch aggregate)."""
    from apache_flink_spark.streaming.sources import stream_table

    st = stream_table(spark, sf_dir, "events").select(
        "user_id", F.round(F.col("value") * 100).cast("long").alias("cents")
    )
    agg = st.groupBy("user_id").agg(
        F.count("*").alias("n"), F.sum("cents").alias("s")
    )
    ckpt = tempfile.mkdtemp(prefix="afs_stateproc_ckpt_")
    q = (
        agg.writeStream.format("memory")
        .queryName("state_proc_out")
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    e = _normalize_nanos(spark.read.parquet(f"{sf_dir}/events.parquet"))
    want = (
        e.groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("s"),
        )
        .toPandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    return ckpt, want


def test_read_keyed_state_offline(spark):
    ckpt, want = _run_stateful_agg(spark, "/root/testdata/sf0.001")

    state = read_keyed_state(spark, ckpt)
    # key = grouping key struct, value = aggregation buffer struct
    # (count, sum) — select positionally: buffer field names are internal.
    got = (
        state.select(
            F.col("key").getField(state.schema["key"].dataType.names[0]).alias("user_id"),
            F.col("value").getItem(state.schema["value"].dataType.names[0]).alias("n"),
            F.col("value").getItem(state.schema["value"].dataType.names[1]).alias("s"),
        )
        .toPandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    import pandas as pd

    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_state_metadata_inventory(spark):
    ckpt, _ = _run_stateful_agg(spark, "/root/testdata/sf0.001")
    meta = read_state_metadata(spark, ckpt).collect()
    assert len(meta) >= 1
    row = meta[0]
    assert row.operatorName == "stateStoreSave"
    assert row.numPartitions >= 1
