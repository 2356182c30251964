"""Cross-version checkpoint restore (reference restore-tests analog:
flink-table-planner/src/test/resources/restore-tests/ pins that operator
state written by an OLD build restores under the current one).

tests/fixtures/restore_v1/ holds a checkpoint written by the round-5 build
running streaming_dedup_ttl over batch 1 (see scripts/make_restore_fixture
.py). This test restarts the SAME query from that checkpoint with a new
batch and asserts the restored keyed state drives suppression — a code
change that breaks the operator's state schema or key-group layout fails
here loudly instead of silently double-emitting in production."""

from __future__ import annotations

import json
import os
import shutil

import pytest

from pyspark.sql import functions as F

FIX = "/tmp/afs_restore_fixture"
HERE = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(HERE, "fixtures", "restore_v1")

BATCH2 = [
    # within 30min TTL of user 1's batch-1 last event (12:10) -> the
    # RESTORED state must suppress it; a cold start would emit it
    {"user_id": 1, "event_id": 103, "ts": "2024-01-01 12:25:00"},
    # beyond the TTL of user 2's last event (12:05) -> emits
    {"user_id": 2, "event_id": 202, "ts": "2024-01-01 12:50:00"},
    # brand-new key -> emits
    {"user_id": 3, "event_id": 301, "ts": "2024-01-01 12:30:00"},
]


def test_restore_from_committed_checkpoint(spark, tmp_path):
    meta = json.load(open(os.path.join(SRC, "META.json")))
    shutil.rmtree(FIX, ignore_errors=True)
    os.makedirs(f"{FIX}/input")
    # Recreate batch 1's file at the EXACT path the offsets log recorded,
    # then add batch 2.
    shutil.copy(os.path.join(SRC, "b1.json"), f"{FIX}/input/b1.json")
    with open(f"{FIX}/input/b2.json", "w") as f:
        for row in BATCH2:
            f.write(json.dumps(row) + "\n")
    shutil.copytree(os.path.join(SRC, "ckpt"), f"{FIX}/ckpt")

    # Key-group count is checkpoint-immutable (the reference's
    # maxParallelism rule) — pin it to the writer's value.
    spark.conf.set(
        "spark.graft.stateful.keyGroups", str(meta["key_groups"])
    )
    try:
        from apache_flink_spark.streaming.stateful import (
            pin_key_groups,
            streaming_dedup_ttl,
        )

        # Guard: checkpoint reuse validates the key-group count (ADVICE
        # r5 — a mismatched G silently mis-shards restored state).
        pin_key_groups(spark, f"{FIX}/ckpt")

        raw = (
            spark.readStream.schema(
                "user_id long, event_id long, ts timestamp"
            )
            .option("maxFilesPerTrigger", "10")
            .json(f"{FIX}/input")
        )
        stream = raw.withWatermark("ts", "10000 hours").select(
            "user_id", "event_id", F.unix_micros("ts").alias("ts_us"), "ts"
        )
        out = streaming_dedup_ttl(stream, meta["ttl_us"])
        out_dir = str(tmp_path / "out2")

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
        got = sorted(
            (r.user_id, r.event_id)
            for r in spark.read.parquet(out_dir).collect()
        )
    finally:
        spark.conf.unset("spark.graft.stateful.keyGroups")
    # batch 1 is committed in the checkpoint: its rows must NOT re-emit
    # (exactly-once across the restart); 103 suppressed by restored state;
    # 202 emits (TTL passed); 301 emits (new key).
    assert got == [(2, 202), (3, 301)], (
        f"restore-compat break: expected [(2, 202), (3, 301)], got {got} — "
        "the current build no longer restores the committed round-"
        f"{meta['written_by_round']} checkpoint (state schema or key-group "
        "layout changed without a migration)"
    )


def test_key_group_mismatch_fails_loudly(spark, tmp_path):
    """ADVICE r5: reusing a checkpoint under a different key-group count
    must raise, not silently mis-shard restored state."""
    from apache_flink_spark.streaming.stateful import pin_key_groups

    ckpt = str(tmp_path / "ckpt")
    spark.conf.set("spark.graft.stateful.keyGroups", "32")
    try:
        assert pin_key_groups(spark, ckpt) == 32
        # same count: idempotent
        assert pin_key_groups(spark, ckpt) == 32
        spark.conf.set("spark.graft.stateful.keyGroups", "128")
        with pytest.raises(RuntimeError, match="key-group mismatch"):
            pin_key_groups(spark, ckpt)
    finally:
        spark.conf.unset("spark.graft.stateful.keyGroups")


@pytest.mark.parametrize(
    "op",
    [
        "topn", "temporal", "session", "over", "match",
        "keeplast", "tsort", "rover", "ceptimeout", "csession",
        # r7: cross-variable bind + PREV navigation streaming MR
        "matchx",
        # r9: MATCH_NUMBER sentinel counter + relaxed-loop NFA buffer
        "matchmn", "matchrl",
    ],
)
def test_restore_r6_operator_fixtures(spark, tmp_path, op):
    """Round-6 restore suite (reference restore-tests analog, one per
    custom stateful operator): the committed checkpoint in
    tests/fixtures/restore_<op>_v1 must restore under the current build,
    and batch 2's output must prove the batch-1 state survived (see
    tests/restore_ops.py for each op's cold-start-detecting assertion)."""
    from tests.restore_ops import OPS, run_from

    src = os.path.join(HERE, "fixtures", f"restore_{op}_v1")
    meta = json.load(open(os.path.join(src, "META.json")))
    fix = f"/tmp/afs_restore_{op}"
    shutil.rmtree(fix, ignore_errors=True)
    os.makedirs(f"{fix}/input")
    shutil.copy(os.path.join(src, "b1.json"), f"{fix}/input/b1.json")
    with open(f"{fix}/input/b2.json", "w") as f:
        for row in OPS[op]["batch2"]:
            f.write(json.dumps(row) + "\n")
    shutil.copytree(os.path.join(src, "ckpt"), f"{fix}/ckpt")

    spark.conf.set(
        "spark.graft.stateful.keyGroups", str(meta["key_groups"])
    )
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set(
        "spark.sql.shuffle.partitions", str(meta["shuffle_partitions"])
    )
    out_dir = str(tmp_path / f"out_{op}")
    try:
        run_from(spark, op, fix, out_dir)
        rows = spark.read.parquet(out_dir).collect()
    finally:
        spark.conf.unset("spark.graft.stateful.keyGroups")
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    OPS[op]["expect_restored"](rows)
