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


def _run_upsert(spark, src, log_dir, ckpt):
    def upsert(batch, batch_id):
        batch.withColumn("__batch_id", F.lit(batch_id)).write.mode(
            "append"
        ).parquet(log_dir)

    q = (
        spark.readStream.schema("id long")
        .parquet(src)
        .groupBy((F.col("id") % 10).alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("id").alias("s"))
        .writeStream.outputMode("update")
        .foreachBatch(upsert)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def _compact(spark, log_dir, keys):
    from pyspark.sql.window import Window

    log = spark.read.parquet(log_dir)
    w = Window.partitionBy(*keys).orderBy(F.desc("__batch_id"))
    return (
        log.withColumn("__rn", F.row_number().over(w))
        .filter("__rn = 1")
        .drop("__rn", "__batch_id")
    )


def test_upsert_log_recovers_across_restart(spark):
    """The upsert-log window-agg sink (run_upsert_to_table pattern) under a
    RESTART with a pinned checkpoint: the resumed run must process only the
    delta, continue batch ids monotonically, and the last-writer-wins
    compaction must equal the batch recomputation over all data — the
    keyed-upsert equivalent of the reference's resumed-from-savepoint
    aggregation."""
    src = tempfile.mkdtemp(prefix="afs_up_src_")
    log_dir = tempfile.mkdtemp(prefix="afs_up_log_") + "/log"
    ckpt = tempfile.mkdtemp(prefix="afs_up_ckpt_")
    now = time.time()

    _write_file(spark, src, range(100), now - 60)
    _run_upsert(spark, src, log_dir, ckpt)
    first = {
        (r.bucket, r.n, r.s)
        for r in _compact(spark, log_dir, ["bucket"]).collect()
    }
    assert first == {
        (b, 10, sum(i for i in range(100) if i % 10 == b)) for b in range(10)
    }

    # restart, no new data: no new log rows, compaction unchanged
    n_log = spark.read.parquet(log_dir).count()
    _run_upsert(spark, src, log_dir, ckpt)
    assert spark.read.parquet(log_dir).count() == n_log

    # delta arrives -> resumed run updates ONLY affected keys; compaction
    # equals the from-scratch batch aggregate over all 150 rows
    _write_file(spark, src, range(100, 150), now)
    _run_upsert(spark, src, log_dir, ckpt)
    final = {
        (r.bucket, r.n, r.s)
        for r in _compact(spark, log_dir, ["bucket"]).collect()
    }
    assert final == {
        (b, 15, sum(i for i in range(150) if i % 10 == b)) for b in range(10)
    }
    # resumed batches continued from the checkpoint (ids strictly grew)
    ids = sorted(
        r[0]
        for r in spark.read.parquet(log_dir).select("__batch_id").distinct().collect()
    )
    assert ids == sorted(set(ids)) and len(ids) >= 2
