"""Write the cross-version checkpoint-restore fixture (reference
flink-table-planner restore-tests analog: a checkpoint written by THIS
build, committed to the repo, that every LATER build must restore).

Runs the engine's TTL-dedup stateful operator over batch 1 of a tiny file
stream with a checkpoint under the FIXED path /tmp/afs_restore_fixture
(file-source offsets store absolute paths, so the test recreates the same
paths), then snapshots the checkpoint + inputs into
tests/fixtures/restore_v1/. tests/test_restore_compat.py restarts the
same query from that snapshot with a new batch and asserts the restored
state suppresses a duplicate only the OLD state knows about.

Key-group pinning: the checkpoint bakes in the key-group count (the
reference's immutable maxParallelism rule) — generator and test both pin
spark.graft.stateful.keyGroups=8.

Usage: python scripts/make_restore_fixture.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FIX = "/tmp/afs_restore_fixture"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEST = os.path.join(REPO, "tests", "fixtures", "restore_v1")

BATCH1 = [
    {"user_id": 1, "event_id": 101, "ts": "2024-01-01 12:00:00"},
    {"user_id": 1, "event_id": 102, "ts": "2024-01-01 12:10:00"},
    {"user_id": 2, "event_id": 201, "ts": "2024-01-01 12:05:00"},
]

TTL_US = 30 * 60 * 1_000_000  # 30 minutes


def run_batch(spark, out_dir: str) -> None:
    from pyspark.sql import functions as F

    from apache_flink_spark.streaming.stateful import (
        pin_key_groups,
        streaming_dedup_ttl,
    )

    pin_key_groups(spark, f"{FIX}/ckpt")

    raw = (
        spark.readStream.schema("user_id long, event_id long, ts timestamp")
        .option("maxFilesPerTrigger", "10")
        .json(f"{FIX}/input")
    )
    stream = raw.withWatermark("ts", "10000 hours").select(
        "user_id", "event_id", F.unix_micros("ts").alias("ts_us"), "ts"
    )
    out = streaming_dedup_ttl(stream, TTL_US)

    def sink(batch, batch_id):
        batch.withColumn("__batch_id", F.lit(batch_id)).write.mode(
            "append"
        ).parquet(out_dir)

    (
        out.writeStream.outputMode("append")
        .foreachBatch(sink)
        .option("checkpointLocation", f"{FIX}/ckpt")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def main() -> int:
    from apache_flink_spark.session import get_spark

    shutil.rmtree(FIX, ignore_errors=True)
    os.makedirs(f"{FIX}/input")
    with open(f"{FIX}/input/b1.json", "w") as f:
        for row in BATCH1:
            f.write(json.dumps(row) + "\n")

    spark = get_spark()
    spark.conf.set("spark.graft.stateful.keyGroups", "8")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    run_batch(spark, f"{FIX}/out1")

    got = sorted(
        (r.user_id, r.event_id)
        for r in spark.read.parquet(f"{FIX}/out1").collect()
    )
    # 102 is within 30min of 101 -> suppressed in batch 1 already
    assert got == [(1, 101), (2, 201)], got

    shutil.rmtree(DEST, ignore_errors=True)
    os.makedirs(DEST)
    shutil.copytree(f"{FIX}/ckpt", f"{DEST}/ckpt")
    shutil.copy(f"{FIX}/input/b1.json", f"{DEST}/b1.json")
    with open(f"{DEST}/META.json", "w") as f:
        json.dump(
            {
                "written_by_round": 5,
                "operator": "streaming_dedup_ttl",
                "ttl_us": TTL_US,
                "key_groups": 8,
                "shuffle_partitions": 4,
                "batch1_output": got,
            },
            f,
            indent=1,
        )
    print("fixture written to", DEST)
    return 0


if __name__ == "__main__":
    sys.exit(main())
