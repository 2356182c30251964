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

from apache_flink_spark.catalog import _normalize_nanos
from apache_flink_spark.streaming.stateful import (
    streaming_keep_last,
    streaming_topn_by_value,
)


def _staged_events(spark, sf_dir, n_files: int) -> str:
    out = tempfile.mkdtemp(prefix="afs_multibatch_")
    (
        _normalize_nanos(spark.read.parquet(f"{sf_dir}/events.parquet"))
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
    schema = spark.read.parquet(path).schema
    df = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
    return _normalize_nanos(df)


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

    e = _normalize_nanos((spark.read.parquet(f"{sf_dir}/events.parquet")))
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

    e = _normalize_nanos(spark.read.parquet(f"{sf_dir}/events.parquet"))
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


def _staged_time_slices(spark, sf_dir, n_slices: int) -> str:
    """Stage events as n CONTIGUOUS TIME RANGES with increasing file mtimes:
    micro-batches then arrive in event-time order (the documented ordering
    assumption of the over-agg/temporal-sort operators — the reference's
    watermark-ordered state flushes give the same guarantee)."""
    import time

    out = tempfile.mkdtemp(prefix="afs_timeslice_")
    e = _normalize_nanos(spark.read.parquet(f"{sf_dir}/events.parquet")).orderBy("ts", "event_id")
    n = e.count()
    rows_per = (n + n_slices - 1) // n_slices
    pdf = e.toPandas()
    now = time.time()
    for i in range(n_slices):
        chunk = pdf.iloc[i * rows_per : (i + 1) * rows_per]
        sub = os.path.join(out, f"slice_{i}")
        spark.createDataFrame(chunk, e.schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(sub)
        files = [f for f in os.listdir(sub) if f.endswith(".parquet")]
        for f in files:
            src = os.path.join(sub, f)
            dst = os.path.join(out, f"{i:03d}_{f}")
            os.rename(src, dst)
            os.utime(dst, (now - 60 + i, now - 60 + i))
    return out


def _run_append_batches(spark, stream_df) -> dict[int, pd.DataFrame]:
    captured: dict[int, pd.DataFrame] = {}

    def sink(batch_df, batch_id: int) -> None:
        captured[batch_id] = batch_df.toPandas()

    ckpt = tempfile.mkdtemp(prefix="afs_mb_ckpt_")
    q = (
        stream_df.writeStream.foreachBatch(sink)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return captured


def test_over_rows_bounded_converges_across_batches(spark):
    """The bounded-deque state must carry the last N-1 values across batch
    boundaries: emissions from 3 time-ordered micro-batches must equal the
    batch ROWS 2 PRECEDING window."""
    from apache_flink_spark.queries.stream_over_agg import _WINDOW_ROWS  # noqa: F401

    sf_dir = "/root/testdata/sf0.001"
    path = _staged_time_slices(spark, sf_dir, 3)

    st = _stream_events(spark, path).select(
        "user_id", "event_id", F.unix_micros("ts").alias("ts_us"), "value"
    )
    from apache_flink_spark.queries import stream_over_agg as soa
    from apache_flink_spark.streaming.stateful import streaming_rows_bounded_over

    captured = _run_append_batches(
        spark, streaming_rows_bounded_over(st, soa._WINDOW_ROWS)
    )
    assert len(captured) >= 3
    got = (
        pd.concat([captured[b] for b in sorted(captured)], ignore_index=True)
        .sort_values(["user_id", "ts_us", "event_id"])
        .reset_index(drop=True)
    )

    e = _normalize_nanos((spark.read.parquet(f"{sf_dir}/events.parquet")))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-(soa._WINDOW_ROWS - 1), Window.currentRow)
    )
    cents = F.round(F.col("value") * 100).cast("long")
    want = (
        e.select(
            "user_id",
            "event_id",
            F.unix_micros("ts").alias("ts_us"),
            F.count(F.lit(1)).over(w).alias("w_cnt"),
            F.sum(cents).over(w).alias("w_sum_cents"),
        )
        .toPandas()
        .sort_values(["user_id", "ts_us", "event_id"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_temporal_sort_emits_in_order_across_batches(spark):
    """Ordered emission must survive multi-batch arrival: concatenated
    append emissions = watermark-eligible rows, per-key sorted, with a
    CONTINUOUS seq across batches."""
    from apache_flink_spark.streaming.stateful import streaming_temporal_sort

    sf_dir = "/root/testdata/sf0.001"
    path = _staged_time_slices(spark, sf_dir, 3)

    st = _stream_events(spark, path)
    stream = st.withWatermark("ts", "1 hour").select(
        "user_id", "event_id", F.unix_micros("ts").alias("ts_us"), "ts"
    )
    captured = _run_append_batches(spark, streaming_temporal_sort(stream))
    got = (
        pd.concat([captured[b] for b in sorted(captured)], ignore_index=True)
        .sort_values(["user_id", "seq"])
        .reset_index(drop=True)
    )

    e = _normalize_nanos((spark.read.parquet(f"{sf_dir}/events.parquet")))
    wm_ms = (
        e.agg(F.max(F.unix_micros("ts"))).first()[0] // 1000 - 3_600_000
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    want = (
        e.select("user_id", "event_id", F.unix_micros("ts").alias("ts_us"))
        .filter((F.col("ts_us") / 1000).cast("long") <= wm_ms)
        .withColumn("seq", F.row_number().over(w).cast("long"))
        .toPandas()
        .sort_values(["user_id", "seq"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # Emission really was incremental: more than one batch carried rows.
    batches_with_rows = [b for b in captured if len(captured[b])]
    assert len(batches_with_rows) >= 2, batches_with_rows


def test_keep_last_under_rocksdb_state_store(spark):
    """Pin the RocksDB state-store provider path (SURVEY §2.12).

    The reference's large-keyspace state backend is RocksDB
    (flink-state-backends/flink-statebackend-rocksdb/.../EmbeddedRocksDBStateBackend.java);
    Spark's analog is RocksDBStateStoreProvider, a runtime-settable conf read
    at query start. Run keep-last dedup across 3 micro-batches under it,
    assert (a) state converges identically and (b) the checkpoint holds
    RocksDB snapshot artifacts (.zip/.changelog), NOT the default HDFS
    provider's .delta files — proving the provider was actually engaged.
    """
    sf_dir = "/root/testdata/sf0.001"
    path = _staged_events(spark, sf_dir, 3)

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        st = _stream_events(spark, path).select(
            "user_id", "event_type", "event_id", F.unix_micros("ts").alias("ts_us")
        )
        captured: dict[int, pd.DataFrame] = {}

        def sink(batch_df, batch_id: int) -> None:
            captured[batch_id] = batch_df.toPandas()

        ckpt = tempfile.mkdtemp(prefix="afs_rocksdb_ckpt_")
        q = (
            streaming_keep_last(st)
            .writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)

    assert len(captured) >= 3, "expected one micro-batch per file"
    got = (
        _final_state(captured, ["user_id", "event_type"])
        .sort_values(["user_id", "event_type"])
        .reset_index(drop=True)
    )

    e = _normalize_nanos((spark.read.parquet(f"{sf_dir}/events.parquet")))
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

    # Provider engagement: RocksDB checkpoints upload .zip/.changelog
    # snapshots; the HDFS provider writes .delta/.snapshot files.
    state_files = []
    for root, _dirs, files in os.walk(os.path.join(ckpt, "state")):
        state_files.extend(files)
    assert state_files, "state checkpoint is empty"
    assert not any(f.endswith(".delta") for f in state_files), (
        "HDFS-provider .delta files found - RocksDB provider not engaged: "
        f"{state_files[:8]}"
    )
    assert any(f.endswith((".zip", ".changelog")) for f in state_files), (
        f"no RocksDB snapshot artifacts in {state_files[:8]}"
    )


def test_over_range_bounded_converges_across_batches(spark):
    """The trailing (ts, cents) frame buffer must carry across batch
    boundaries and evict as the frame slides: emissions from 3 time-ordered
    micro-batches must equal the batch RANGE 24h PRECEDING window."""
    sf_dir = "/root/testdata/sf0.001"
    path = _staged_time_slices(spark, sf_dir, 3)

    st = _stream_events(spark, path).select(
        "user_id", "event_id", F.unix_micros("ts").alias("ts_us"), "value"
    )
    from apache_flink_spark.queries import stream_over_agg as soa
    from apache_flink_spark.streaming.stateful import streaming_range_bounded_over

    range_us = soa._RANGE_HOURS * 3_600_000_000
    captured = _run_append_batches(
        spark, streaming_range_bounded_over(st, range_us)
    )
    assert len(captured) >= 3
    got = (
        pd.concat([captured[b] for b in sorted(captured)], ignore_index=True)
        .sort_values(["user_id", "ts_us", "event_id"])
        .reset_index(drop=True)
    )

    e = _normalize_nanos((spark.read.parquet(f"{sf_dir}/events.parquet")))
    # RANGE frame on the micros value — same as the operator's definition.
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-range_us, Window.currentRow)
    )
    cents = F.round(F.col("value") * 100).cast("long")
    want = (
        e.select(
            "user_id",
            "event_id",
            F.unix_micros("ts").alias("ts_us"),
            F.count(F.lit(1)).over(w).alias("w_cnt"),
            F.sum(cents).over(w).alias("w_sum_cents"),
        )
        .toPandas()
        .sort_values(["user_id", "ts_us", "event_id"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_rocksdb_changelog_checkpointing(spark):
    """Changelog checkpointing under RocksDB (SURVEY §2.12; reference
    flink-dstl — the durable short-term log that makes checkpoints
    incremental): per-batch .changelog files are uploaded instead of full
    snapshots every commit. Pin that the conf engages and state converges."""
    sf_dir = "/root/testdata/sf0.001"
    path = _staged_events(spark, sf_dir, 3)

    confs = {
        "spark.sql.streaming.stateStore.providerClass":
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled":
            "true",
    }
    prev = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        st = _stream_events(spark, path).select(
            "user_id", "event_type", "event_id", F.unix_micros("ts").alias("ts_us")
        )
        captured: dict[int, pd.DataFrame] = {}

        def sink(batch_df, batch_id: int) -> None:
            captured[batch_id] = batch_df.toPandas()

        ckpt = tempfile.mkdtemp(prefix="afs_rocksdb_cl_ckpt_")
        q = (
            streaming_keep_last(st)
            .writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)

    assert len(captured) >= 3
    state_files = []
    for _root, _dirs, files in os.walk(os.path.join(ckpt, "state")):
        state_files.extend(files)
    assert any(f.endswith(".changelog") for f in state_files), (
        f"no .changelog files - changelog checkpointing not engaged: "
        f"{sorted(set(f.rsplit('.',1)[-1] for f in state_files))}"
    )
    # Converged state still equals the batch answer.
    got = (
        _final_state(captured, ["user_id", "event_type"])
        .sort_values(["user_id", "event_type"])
        .reset_index(drop=True)
    )
    e = _normalize_nanos((spark.read.parquet(f"{sf_dir}/events.parquet")))
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


def test_left_outer_join_converges_across_batches(spark):
    """Stream-stream LEFT OUTER join across 3 time-ordered micro-batches:
    matches spanning batch boundaries must still pair up (left state outlives
    its batch), null-padding must emit exactly once per unmatched click whose
    window closed under the FINAL global watermark, and the accumulated
    append output must equal the single-pass answer."""
    sf_dir = "/root/testdata/sf0.001"
    path = _staged_time_slices(spark, sf_dir, 3)

    def sides(src):
        clicks = (
            src.filter(F.col("event_type") == "click")
            .select(
                F.col("event_id").alias("click_id"),
                "user_id",
                F.col("ts").alias("c_ts"),
            )
            .withWatermark("c_ts", "1 hour")
        )
        purchases = (
            src.filter(F.col("event_type") == "purchase")
            .select(
                F.col("event_id").alias("purchase_id"),
                F.col("user_id").alias("p_user"),
                F.col("ts").alias("p_ts"),
            )
            .withWatermark("p_ts", "1 hour")
        )
        cond = (
            (F.col("user_id") == F.col("p_user"))
            & (F.col("p_ts") >= F.col("c_ts"))
            & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 30 MINUTES"))
        )
        return clicks, purchases, cond

    # The file stream is re-read per side; both sides see the same 3 slices.
    s1 = _stream_events(spark, path)
    s2 = _stream_events(spark, path)
    clicks, purchases, cond = sides(s1)
    clicks2, purchases2, cond2 = sides(s2)
    del purchases, clicks2  # one side from each read
    joined = clicks.join(purchases2, cond2, "left_outer").select(
        "click_id", "purchase_id", F.unix_micros("c_ts").alias("click_ts")
    )
    captured = _run_append_batches(spark, joined)
    assert len(captured) >= 3
    got = pd.concat(
        [captured[b] for b in sorted(captured)], ignore_index=True
    ).sort_values(["click_id", "purchase_id"]).reset_index(drop=True)

    # Null-padded rows must be unique per click (emitted exactly once).
    nulls = got[got["purchase_id"].isna()]
    assert nulls["click_id"].is_unique

    e = _normalize_nanos(spark.read.parquet(f"{sf_dir}/events.parquet"))
    c = e.filter("event_type = 'click'").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.unix_micros("ts").alias("c_us"),
    )
    p = e.filter("event_type = 'purchase'").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.unix_micros("ts").alias("p_us"),
    )
    # Max event time is computed as epoch-micros INSIDE Spark: collecting a
    # naive datetime and calling .timestamp() would interpret it in the
    # Python process's local timezone — correct only under TZ=UTC.
    wm_us = (
        min(
            e.filter("event_type = 'click'")
            .agg(F.max(F.unix_micros("ts")))
            .collect()[0][0],
            e.filter("event_type = 'purchase'")
            .agg(F.max(F.unix_micros("ts")))
            .collect()[0][0],
        )
        - 3_600_000_000
    )
    MIN30_US = 1_800_000_000
    want = (
        c.join(
            p,
            (F.col("user_id") == F.col("p_user"))
            & (F.col("p_us") >= F.col("c_us"))
            & (F.col("p_us") <= F.col("c_us") + MIN30_US),
            "left_outer",
        )
        .filter(
            F.col("purchase_id").isNotNull()
            | (F.col("c_us") + MIN30_US < F.lit(int(wm_us)))
        )
        .select("click_id", "purchase_id", F.col("c_us").alias("click_ts"))
        .toPandas()
        .sort_values(["click_id", "purchase_id"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_window_agg_state_bounded_by_watermark(spark):
    """Update-mode tumble agg must EVICT window state as the watermark
    advances (the reference's WindowAggOperator purges each window on
    watermark passage); complete mode — the round-3 shape — would retain
    every window ever opened forever. Pins both halves of the round-4 fix:
    (a) state rows shrink once the final watermark closes old windows,
    never approaching the full window history, and (b) last-writer-wins
    compaction of the update-mode emissions equals the batch aggregate."""
    import json

    sf_dir = "/root/testdata/sf0.001"
    path = _staged_time_slices(spark, sf_dir, 4)

    st = _stream_events(spark, path)
    agg = (
        st.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "10 minutes").alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.unix_micros("win.start").alias("win_start"),
            "event_type",
            "n_events",
        )
    )
    captured: dict[int, pd.DataFrame] = {}

    def sink(batch_df, batch_id: int) -> None:
        captured[batch_id] = batch_df.toPandas()

    ckpt = tempfile.mkdtemp(prefix="afs_wmstate_")
    q = (
        agg.writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    state_rows = []
    for p in q.recentProgress:
        pj = p if isinstance(p, dict) else json.loads(p.json)
        ops = pj.get("stateOperators") or []
        if ops:
            state_rows.append(ops[0]["numRowsTotal"])

    e = _normalize_nanos(spark.read.parquet(f"{sf_dir}/events.parquet"))
    total_windows = (
        e.select(
            (F.unix_micros("ts") / 600_000_000).cast("long").alias("w"),
            "event_type",
        )
        .distinct()
        .count()
    )
    assert len(state_rows) >= 4, f"expected >=4 micro-batches, got {state_rows}"
    # Never holds the full window history...
    assert max(state_rows) < total_windows
    # ...and the final no-data commit batch applies the end-of-stream
    # watermark, evicting everything but the last open hour of windows.
    assert state_rows[-1] < total_windows * 0.2, (
        f"state not evicted: final={state_rows[-1]} total={total_windows}"
    )
    assert state_rows[-1] < max(state_rows)

    frames = [
        captured[b].assign(_b=b) for b in sorted(captured) if len(captured[b])
    ]
    allb = pd.concat(frames, ignore_index=True)
    got = (
        allb.sort_values("_b")
        .groupby(["win_start", "event_type"], as_index=False)
        .last()
        .drop(columns=["_b"])
        .sort_values(["win_start", "event_type"])
        .reset_index(drop=True)
    )
    want = (
        e.groupBy(F.window("ts", "10 minutes").alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.unix_micros("win.start").alias("win_start"),
            "event_type",
            "n_events",
        )
        .toPandas()
        .sort_values(["win_start", "event_type"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_temporal_join_converges_across_batches(spark):
    """The versioned-state + probe-buffer logic must be arrival-slicing
    invariant: 3 time-ordered micro-batches (both sides re-read the same
    slices) must emit exactly the batch as-of join of the watermark-
    certified clicks."""
    from apache_flink_spark.streaming.stateful import streaming_temporal_join

    sf_dir = "/root/testdata/sf0.001"
    path = _staged_time_slices(spark, sf_dir, 3)

    def side(df, etype, tag):
        return (
            df.filter(F.col("event_type") == etype)
            .select("user_id", "event_id", "ts", F.lit(tag).alias("side"))
            .withWatermark("ts", "1 hour")
        )

    tagged = (
        side(_stream_events(spark, path), "click", 1)
        .unionByName(side(_stream_events(spark, path), "view", 0))
        .select(
            "user_id", "side", "event_id",
            F.unix_micros("ts").alias("ts_us"), "ts",
        )
    )
    captured = _run_append_batches(spark, streaming_temporal_join(tagged))
    assert len(captured) >= 3
    got = (
        pd.concat([captured[b] for b in sorted(captured)], ignore_index=True)
        .sort_values(["user_id", "click_id"])
        .reset_index(drop=True)
    )
    # a click emits exactly once
    assert got["click_id"].is_unique

    e = _normalize_nanos(spark.read.parquet(f"{sf_dir}/events.parquet"))
    wm_ms = (
        min(
            e.filter("event_type = 'click'")
            .agg(F.max(F.unix_millis("ts")))
            .collect()[0][0],
            e.filter("event_type = 'view'")
            .agg(F.max(F.unix_millis("ts")))
            .collect()[0][0],
        )
        - 3_600_000
    )
    from apache_flink_spark.queries.temporal_joins import asof_join

    clicks = e.filter("event_type = 'click'").select(
        "user_id", F.unix_micros("ts").alias("ep"), "event_id"
    )
    views = e.filter("event_type = 'view'").select(
        "user_id",
        F.unix_micros("ts").alias("ep"),
        "event_id",
        F.col("event_id").alias("view_event_id"),
    )
    want = (
        asof_join(
            clicks, views, key="user_id", ts="ep", carry="view_event_id",
            tiebreak="event_id",
        )
        .filter((F.col("ep") / 1000).cast("long") <= F.lit(int(wm_ms)))
        .select(
            "user_id",
            F.col("event_id").alias("click_id"),
            F.col("ep").alias("click_ts"),
            "view_event_id",
        )
        .toPandas()
        .sort_values(["user_id", "click_id"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_run_upsert_to_table_compacts_across_batches(spark):
    """The upsert-log sink behind the streaming window aggs must be
    batching-invariant: over 3 time-sliced micro-batches, superseded
    emissions are compacted away (last writer wins per key) and the final
    table equals the batch aggregate."""
    from apache_flink_spark.streaming.sources import run_upsert_to_table

    sf_dir = "/root/testdata/sf0.001"
    path = _staged_time_slices(spark, sf_dir, 3)

    st = _stream_events(spark, path)
    agg = (
        st.withWatermark("ts", "1 hour")
        .groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    got = (
        run_upsert_to_table(agg, ["user_id", "event_type"])
        .toPandas()
        .sort_values(["user_id", "event_type"])
        .reset_index(drop=True)
    )
    e = _normalize_nanos(spark.read.parquet(f"{sf_dir}/events.parquet"))
    want = (
        e.groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .toPandas()
        .sort_values(["user_id", "event_type"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # keys spanning several slices really were emitted more than once —
    # i.e. the compaction had something to do.
    assert len(got) < e.count()


def test_dedup_ttl_converges_across_batches(spark):
    """TTL'd-state dedup must carry each key's last-seen timestamp across
    batch boundaries: 3 time-ordered micro-batches must emit exactly the
    batch LAG-gap formulation (first event per key, or gap > TTL)."""
    from apache_flink_spark.streaming.stateful import streaming_dedup_ttl

    sf_dir = "/root/testdata/sf0.001"
    path = _staged_time_slices(spark, sf_dir, 3)
    ttl_us = 1_800_000_000

    st = (
        _stream_events(spark, path)
        .withWatermark("ts", "1 hour")
        .select(
            "user_id", "event_id", F.unix_micros("ts").alias("ts_us"), "ts"
        )
    )
    captured = _run_append_batches(spark, streaming_dedup_ttl(st, ttl_us))
    assert len(captured) >= 3
    got = (
        pd.concat([captured[b] for b in sorted(captured)], ignore_index=True)
        .sort_values(["user_id", "event_id"])
        .reset_index(drop=True)
    )

    e = _normalize_nanos(spark.read.parquet(f"{sf_dir}/events.parquet"))
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    want = (
        e.select(
            "user_id", "event_id", F.unix_micros("ts").alias("ts_us")
        )
        .withColumn("prev", F.lag("ts_us").over(w))
        .filter(F.col("prev").isNull() | (F.col("ts_us") - F.col("prev") > ttl_us))
        .drop("prev")
        .toPandas()
        .sort_values(["user_id", "event_id"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
