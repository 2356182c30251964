"""Checkpoint recovery / exactly-once file sink.

Reference parity (SURVEY.md §2.12 checkpointing + §2.1 generic sink): the
reference gets exactly-once from CheckpointCoordinator barriers + 2PC sinks;
Spark's file sink commits batch manifests to _spark_metadata under the
checkpoint protocol. These tests pin the user-visible guarantees:

  1. restart with an unchanged source re-emits NOTHING (no duplicates);
  2. restart after new data appends ONLY the new rows.
"""

from __future__ import annotations

import os
import tempfile
import time

from pyspark.sql import functions as F


def _write_file(spark, src, ids, mtime):
    before = set(os.listdir(src)) if os.path.exists(src) else set()
    spark.createDataFrame([(i,) for i in ids], "id long").coalesce(1).write.mode(
        "append"
    ).parquet(src)
    for f in set(os.listdir(src)) - before:
        os.utime(os.path.join(src, f), (mtime, mtime))


def _run_sink(spark, src, out, ckpt):
    q = (
        spark.readStream.schema("id long")
        .parquet(src)
        .withColumn("doubled", F.col("id") * 2)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_exactly_once_file_sink_across_restarts(spark):
    src = tempfile.mkdtemp(prefix="afs_eo_src_")
    out = tempfile.mkdtemp(prefix="afs_eo_out_")
    ckpt = tempfile.mkdtemp(prefix="afs_eo_ckpt_")
    now = time.time()

    _write_file(spark, src, range(100), now - 60)
    _run_sink(spark, src, out, ckpt)
    first = spark.read.parquet(out)
    assert first.count() == 100

    # Restart with no new input: the checkpoint says everything is
    # committed — zero duplicate emissions.
    _run_sink(spark, src, out, ckpt)
    assert spark.read.parquet(out).count() == 100

    # New file arrives; restart processes ONLY the delta.
    _write_file(spark, src, range(100, 150), now)
    _run_sink(spark, src, out, ckpt)
    final = spark.read.parquet(out)
    assert final.count() == 150
    assert final.select(F.sum("doubled")).collect()[0][0] == sum(
        2 * i for i in range(150)
    )
