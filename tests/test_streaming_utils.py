"""Side outputs, stream-static joins, watermark introspection, late-data
semantics — the §2.12 machinery beyond the oracle-gated queries."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from apache_flink_spark.catalog import _normalize_nanos
from apache_flink_spark.streaming.sources import run_to_table, stream_table
from apache_flink_spark.streaming.utils import (
    broadcast_control_join,
    current_watermark,
    late_data_side_channel,
    split_to_sinks,
)


def test_side_outputs_split(spark, sf_dir):
    e = stream_table(spark, sf_dir, "events")
    q, paths = split_to_sinks(
        e,
        {
            "errors": ("event_type = 'error'", lambda d: d.select("event_id")),
            "purchases": (
                "event_type = 'purchase'",
                lambda d: d.select("event_id", "value"),
            ),
        },
    )
    q.awaitTermination()
    batch = _normalize_nanos(spark.read.parquet(f"{sf_dir}/events.parquet"))
    n_err = spark.read.parquet(paths["errors"]).count()
    n_pur = spark.read.parquet(paths["purchases"]).count()
    assert n_err == batch.filter("event_type = 'error'").count()
    assert n_pur == batch.filter("event_type = 'purchase'").count()


def test_stream_static_broadcast_join(spark, sf_dir):
    """Stream-static join (broadcast state pattern, SURVEY §2.12): the
    static dim joins each micro-batch without streaming state."""
    e = stream_table(spark, sf_dir, "events")
    dim = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_mktsegment"
    )
    joined = e.join(
        F.broadcast(dim), dim.c_custkey == e.user_id + 1, "left"
    ).select("event_id", "c_mktsegment")
    got = run_to_table(joined, "append")
    want = (
        _normalize_nanos(spark.read.parquet(f"{sf_dir}/events.parquet"))
        .join(
            F.broadcast(dim),
            dim.c_custkey == F.col("user_id") + 1,
            "left",
        )
        .select("event_id", "c_mktsegment")
    )
    assert got.count() == want.count()
    assert got.filter("c_mktsegment IS NOT NULL").count() == want.filter(
        "c_mktsegment IS NOT NULL"
    ).count()


def test_broadcast_control_join_sees_updates(spark):
    """Broadcast-state parity: a control-table update between micro-batches
    must affect the NEXT batch's enrichment (a plan-time stream-static join
    would keep serving the stale snapshot)."""
    import os
    import time

    src = tempfile.mkdtemp(prefix="afs_ctl_src_")
    control = tempfile.mkdtemp(prefix="afs_ctl_tbl_") + "/control"

    def write_batch(rows, mtime: float):
        before = set(os.listdir(src))
        spark.createDataFrame(rows, "k string, v long").coalesce(1).write.mode(
            "append"
        ).parquet(src)
        for f in set(os.listdir(src)) - before:
            os.utime(os.path.join(src, f), (mtime, mtime))

    # Batch 0 joins control v1; then the control flips before batch 1.
    spark.createDataFrame([("a", "v1")], "k string, tag string").write.mode(
        "overwrite"
    ).parquet(control)
    now = time.time()
    write_batch([("a", 1)], now - 60)
    write_batch([("a", 2)], now)

    stream = (
        spark.readStream.schema("k string, v long")
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(src)
    )

    seen = []

    def join_fn(batch, ctl):
        # Materialize the enrichment BEFORE mutating the control table —
        # Spark reads are lazy, and the point is to flip the control only
        # between batch 0 and batch 1 (foreachBatch runs sequentially).
        out = batch.join(ctl, "k").localCheckpoint(eager=True)
        if not seen:
            seen.append(True)
            batch.sparkSession.createDataFrame(
                [("a", "v2")], "k string, tag string"
            ).write.mode("overwrite").parquet(control)
        return out

    q, out_path = broadcast_control_join(stream, control, join_fn)
    q.awaitTermination()
    out = {(r.v, r.tag) for r in spark.read.parquet(out_path).collect()}
    assert out == {(1, "v1"), (2, "v2")}


def test_current_watermark_progress(spark, sf_dir):
    """CURRENT_WATERMARK analog: after a watermarked agg drains, the query
    progress reports the advanced event-time watermark."""
    e = stream_table(spark, sf_dir, "events")
    agg = (
        e.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour"))
        .count()
    )
    import tempfile as tf

    ckpt = tf.mkdtemp(prefix="afs_wm_")
    q = (
        agg.writeStream.format("memory")
        .queryName("wm_probe")
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    wm = current_watermark(q)
    assert wm is not None and wm.startswith("20"), wm


def test_late_data_side_channel_routes_both_outputs(spark):
    """sideOutputLateData parity: the splitter must deliver on-time rows to
    the main sink and watermark-late rows to the side sink — nothing
    silently dropped."""
    import os
    import time
    from datetime import datetime

    src = tempfile.mkdtemp(prefix="afs_latechan_src_")

    def write_batch(rows, mtime: float):
        rows = [(datetime.fromisoformat(ts), k) for ts, k in rows]
        before = set(os.listdir(src))
        spark.createDataFrame(rows, "ts timestamp, k string").coalesce(
            1
        ).write.mode("append").parquet(src)
        for f in set(os.listdir(src)) - before:
            os.utime(os.path.join(src, f), (mtime, mtime))

    now = time.time()
    write_batch(
        [("2024-01-01 10:00:00", "a"), ("2024-01-01 12:00:00", "b")], now - 60
    )
    # After batch 0 the watermark is 11:50; 09:00 is late, 12:01 on time.
    write_batch(
        [("2024-01-01 12:01:00", "c"), ("2024-01-01 09:00:00", "late")], now
    )

    stream = (
        spark.readStream.schema("ts timestamp, k string")
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(src)
    )
    q, main_path, late_path = late_data_side_channel(stream, "ts", "10 MINUTES")
    q.awaitTermination()

    main_keys = {r.k for r in spark.read.parquet(main_path).collect()}
    late_keys = {r.k for r in spark.read.parquet(late_path).collect()}
    assert main_keys == {"a", "b", "c"}
    assert late_keys == {"late"}


def test_late_data_dropped_after_watermark(spark):
    """SS drops rows older than the watermark (no allowed-lateness re-fire —
    documented divergence, SURVEY §2.12 'Late data'): a second batch row
    whose event time is far behind the advanced watermark must not create
    or update a window in append mode."""
    import os

    src = tempfile.mkdtemp(prefix="afs_late_src_")
    ckpt = tempfile.mkdtemp(prefix="afs_late_ckpt_")

    import os
    import time
    from datetime import datetime

    def write_batch(rows, mtime: float):
        rows = [(datetime.fromisoformat(ts), k) for ts, k in rows]
        before = set(os.listdir(src))
        spark.createDataFrame(rows, "ts timestamp, k string").coalesce(
            1
        ).write.mode("append").parquet(src)
        for f in set(os.listdir(src)) - before:
            os.utime(os.path.join(src, f), (mtime, mtime))

    # The file source orders batches by modification time. Watermark
    # propagation lags one batch behind the progress report (a batch's
    # input filter uses the watermark committed before the PREVIOUS batch),
    # so: batch 0 carries the 12:00 row, batch 1 propagates the 11:50
    # watermark, batch 2's 09:00 row is then genuinely late and dropped.
    now = time.time()
    write_batch(
        [("2024-01-01 10:00:00", "a"), ("2024-01-01 12:00:00", "a")], now - 60
    )
    write_batch([("2024-01-01 12:01:00", "b")], now - 30)
    write_batch([("2024-01-01 09:00:00", "late")], now)

    stream = (
        spark.readStream.schema("ts timestamp, k string")
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(src)
    )
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour"), "k")
        .count()
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("late_probe")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    result = spark.table("late_probe")
    assert result.filter("k = 'late'").count() == 0, (
        "late row should be dropped past the watermark"
    )
    # The 10:00 window closed when the watermark passed it.
    assert result.filter("k = 'a'").count() >= 1


def test_idle_source_stalls_min_policy_not_max(spark, sf_dir):
    """with_idleness (WatermarkStrategy.withIdleness parity): a source that
    goes idle after day 1 pins a two-source union's watermark under the
    default min policy, so windows after day 1 never close; under the max
    policy (the idleness shim) the active source drives the watermark and
    the full range of windows emits."""
    import os

    from apache_flink_spark.streaming.utils import with_idleness

    e = _normalize_nanos(spark.read.parquet(f"{sf_dir}/events.parquet"))
    cutoff = e.agg(
        (F.min(F.unix_micros("ts")) + 86_400_000_000).alias("c")
    ).collect()[0][0]

    active_dir = tempfile.mkdtemp(prefix="afs_idle_active_")
    idle_dir = tempfile.mkdtemp(prefix="afs_idle_idle_")
    e.coalesce(1).write.mode("overwrite").parquet(active_dir)
    # the idle source delivered day 1 only, then went silent
    e.filter(F.unix_micros("ts") < cutoff).coalesce(1).write.mode(
        "overwrite"
    ).parquet(idle_dir)

    def run_union():
        schema = spark.read.parquet(active_dir).schema

        def src(path):
            df = spark.readStream.schema(schema).parquet(path)
            return _normalize_nanos(df).withWatermark("ts", "1 hour").select(
                "ts", "event_id"
            )

        agg = (
            src(active_dir)
            .unionByName(src(idle_dir))
            .groupBy(F.window("ts", "1 day").alias("win"))
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.unix_micros("win.start").alias("ws"), "n")
        )
        return run_to_table(agg, "append").count()

    prev = spark.conf.get("spark.sql.streaming.multipleWatermarkPolicy", "min")
    try:
        with_idleness(spark, False)  # strict min: idle source stalls
        stalled = run_union()
        with_idleness(spark, True)  # idleness shim: fastest source drives
        flowing = run_union()
    finally:
        spark.conf.set("spark.sql.streaming.multipleWatermarkPolicy", prev)

    # ~30 daily windows in the fixture; min policy closes at most day 1.
    assert stalled <= 1
    assert flowing > stalled + 20
    assert os.path.isdir(active_dir)
