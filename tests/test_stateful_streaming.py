"""Multi-batch correctness for the applyInPandasWithState operators.

The oracle gate runs them on single-file fixtures (one micro-batch); here the
same rows are re-staged as THREE files -> three micro-batches, and the final
per-key emission must converge to the batch answer — proving the GroupState
merge logic is batching-invariant (the property the reference's keyed-state
operators guarantee by construction).
"""

from __future__ import annotations

import os
import tempfile

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import Window

from apache_flink_spark.streaming.stateful import (
    streaming_keep_last,
    streaming_topn_by_value,
)


def _staged_events(spark, sf_dir, n_files: int) -> str:
    out = tempfile.mkdtemp(prefix="afs_multibatch_")
    (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .repartition(n_files)
        .write.mode("overwrite")
        .parquet(out)
    )
    return out


def _run_batches(spark, stream_df) -> dict[int, pd.DataFrame]:
    """Drain with foreachBatch, keeping each micro-batch's emissions."""
    captured: dict[int, pd.DataFrame] = {}

    def sink(batch_df, batch_id: int) -> None:
        captured[batch_id] = batch_df.toPandas()

    ckpt = tempfile.mkdtemp(prefix="afs_mb_ckpt_")
    q = (
        stream_df.writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return captured


def _final_state(captured: dict[int, pd.DataFrame], key_cols: list[str]) -> pd.DataFrame:
    """Latest emission per key across batches (update-stream collapse)."""
    frames = [captured[b].assign(_b=b) for b in sorted(captured)]
    allb = pd.concat(frames, ignore_index=True)
    latest = allb.sort_values("_b").groupby(key_cols, as_index=False).last()
    return latest.drop(columns=["_b"])


def _stream_events(spark, path):
    from apache_flink_spark.streaming.sources import _batch_schema

    schema = spark.read.parquet(path).schema
    df = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
    if dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("`ts` div 1000")))
    return df


def test_keep_last_converges_across_batches(spark):
    sf_dir = "/root/testdata/sf0.001"
    path = _staged_events(spark, sf_dir, 3)
    assert len(os.listdir(path)) > 2  # really multiple files -> multiple batches

    st = _stream_events(spark, path).select(
        "user_id", "event_type", "event_id", F.unix_micros("ts").alias("ts_us")
    )
    captured = _run_batches(spark, streaming_keep_last(st))
    assert len(captured) >= 3, "expected one micro-batch per file"
    got = (
        _final_state(captured, ["user_id", "event_type"])
        .sort_values(["user_id", "event_type"])
        .reset_index(drop=True)
    )

    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    if dict(e.dtypes).get("ts") == "bigint":
        e = e.withColumn("ts", F.timestamp_micros(F.expr("`ts` div 1000")))
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    want = (
        e.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .select("user_id", "event_type", "event_id", F.unix_micros("ts").alias("ts_us"))
        .toPandas()
        .sort_values(["user_id", "event_type"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_topn_converges_across_batches(spark):
    sf_dir = "/root/testdata/sf0.001"
    path = _staged_events(spark, sf_dir, 3)

    st = _stream_events(spark, path).select("user_id", "event_id", "value")
    captured = _run_batches(spark, streaming_topn_by_value(st, 3))
    assert len(captured) >= 3
    # Per-key latest emission: group at user granularity — each emission is
    # the user's full refreshed top-3, so take the last batch that touched
    # the user and explode its rows.
    frames = [captured[b].assign(_b=b) for b in sorted(captured)]
    allb = pd.concat(frames, ignore_index=True)
    last_touch = allb.groupby("user_id")["_b"].max().rename("_last")
    merged = allb.merge(last_touch, on="user_id")
    got = (
        merged[merged["_b"] == merged["_last"]][
            ["user_id", "event_id", "value", "rn"]
        ]
        .sort_values(["user_id", "rn"])
        .reset_index(drop=True)
    )

    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = Window.partitionBy("user_id").orderBy(F.desc("value"), "event_id")
    want = (
        e.withColumn("rn", F.row_number().over(w))
        .filter("rn <= 3")
        .select("user_id", "event_id", "value", "rn")
        .toPandas()
        .sort_values(["user_id", "rn"])
        .reset_index(drop=True)
    )
    got["rn"] = got["rn"].astype(want["rn"].dtype)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
