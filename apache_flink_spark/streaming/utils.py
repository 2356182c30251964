"""Streaming machinery helpers — side outputs, watermark introspection.

Reference parity (SURVEY.md §2.12):
  - Side outputs (SideOutputDataStream.java / sideOutputLateData) ->
    foreachBatch fanning one micro-batch into multiple sinks.
  - CURRENT_WATERMARK (BuiltInFunctionDefinitions) -> Spark exposes the
    watermark only via StreamingQueryProgress, not as an expression; the
    helper reads it from the query's last progress.
"""

from __future__ import annotations

import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame


def split_to_sinks(
    df: DataFrame,
    routes: dict[str, tuple[str, Callable[[DataFrame], DataFrame]]],
    base_dir: str | None = None,
):
    """Side-output fan-out (OutputTag parity): one streaming source, N
    filtered parquet sinks, single source read per micro-batch (the shared
    batch is persisted while each route filters it).

    ``routes`` maps route-name -> (filter predicate SQL, transform). Each
    route appends to ``<base_dir>/<route>``. Returns (query, route->path).
    Exactly-once per sink comes from append-mode parquet + the streaming
    checkpoint (reference needs its 2PC sink machinery for the same).
    """
    base_dir = base_dir or tempfile.mkdtemp(prefix="afs_sideout_")
    paths = {name: f"{base_dir}/{name}" for name in routes}

    def fan_out(batch: DataFrame, batch_id: int) -> None:
        batch.persist()
        try:
            for name, (predicate, transform) in routes.items():
                transform(batch.filter(predicate)).write.mode("append").parquet(
                    paths[name]
                )
        finally:
            batch.unpersist()

    ckpt = tempfile.mkdtemp(prefix="afs_sideout_ckpt_")
    q = (
        df.writeStream.foreachBatch(fan_out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    return q, paths


def late_data_side_channel(
    df: DataFrame,
    ts_col: str,
    delay: str,
    base_dir: str | None = None,
):
    """Late-data side output (reference WindowedStream.sideOutputLateData:125
    / allowedLateness:109): rows older than the watermark are ROUTED to a
    side table instead of silently dropped.

    Spark drops late rows inside its stateful operators with no side
    channel; this foreachBatch splitter reproduces the reference's semantics
    upstream of them: the watermark (max event time seen in PREVIOUS
    batches minus ``delay`` — exactly Spark's one-batch-lagged watermark
    rule) classifies each micro-batch, on-time rows append to ``main``,
    late rows to ``late``. Downstream jobs read ``main`` for the windowed
    aggregate and ``late`` for reconciliation/backfill — the two-stream
    shape of the reference's OutputTag.

    The running watermark lives in driver memory; a production deployment
    derives it from the checkpointed max event time instead (same contract,
    one more read at restart). Returns (query, main_path, late_path).
    """
    from pyspark.sql import functions as F

    base_dir = base_dir or tempfile.mkdtemp(prefix="afs_late_split_")
    main_path, late_path = f"{base_dir}/main", f"{base_dir}/late"
    delay_expr = f"INTERVAL {delay}"
    state: dict[str, object] = {"wm": None}

    def split(batch: DataFrame, batch_id: int) -> None:
        batch.persist()
        try:
            wm = state["wm"]
            if wm is None:
                ontime, late = batch, batch.limit(0)
            else:
                ontime = batch.filter(F.col(ts_col) >= F.lit(wm))
                late = batch.filter(F.col(ts_col) < F.lit(wm))
            ontime.write.mode("append").parquet(main_path)
            late.write.mode("append").parquet(late_path)
            row = batch.agg(
                F.max(F.col(ts_col) - F.expr(delay_expr)).alias("wm")
            ).first()
            if row and row.wm is not None and (wm is None or row.wm > wm):
                state["wm"] = row.wm
        finally:
            batch.unpersist()

    ckpt = tempfile.mkdtemp(prefix="afs_late_split_ckpt_")
    q = (
        df.writeStream.foreachBatch(split)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    return q, main_path, late_path


def broadcast_control_join(
    df: DataFrame,
    control_path: str,
    join_fn: Callable[[DataFrame, DataFrame], DataFrame],
    out_path: str | None = None,
):
    """Broadcast-state pattern (reference DataStream.broadcast:337 /
    BroadcastProcessFunction): every micro-batch joins against the CURRENT
    contents of a slowly-changing control table, re-read and broadcast at
    batch time — control updates land between batches without restarting
    the stream (a plain stream-static join snapshots the dim at plan time
    and never sees updates).

    ``join_fn(batch, broadcast_control)`` builds the enriched output; it
    appends to ``out_path`` parquet. Returns (query, out_path).
    """
    from pyspark.sql import functions as F

    out_path = out_path or tempfile.mkdtemp(prefix="afs_ctl_out_") + "/out"

    def apply(batch: DataFrame, batch_id: int) -> None:
        control = batch.sparkSession.read.parquet(control_path)
        join_fn(batch, F.broadcast(control)).write.mode("append").parquet(
            out_path
        )

    ckpt = tempfile.mkdtemp(prefix="afs_ctl_ckpt_")
    q = (
        df.writeStream.foreachBatch(apply)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    return q, out_path


def with_idleness(spark, enable: bool = True) -> None:
    """Watermark idleness shim (reference WatermarkStrategy.withIdleness:147).

    In the reference, a source marked idle after a timeout STOPS
    contributing to the combined watermark, so a stalled partition cannot
    freeze event time for the whole pipeline. Spark's multi-source
    watermark is a session policy, not per-source: with the default
    ``min`` policy a union's watermark is the minimum over sources — an
    idle source pins it forever (the exact failure withIdleness exists
    for). Setting ``spark.sql.streaming.multipleWatermarkPolicy`` to
    ``max`` is the micro-batch equivalent of declaring every source
    idle-tolerant: the global watermark follows the FASTEST source, and
    slow-but-not-idle sources' late rows are then subject to drop —
    the same correctness trade the reference documents for idleness.

    Session-scoped (affects every query started afterwards); call
    ``with_idleness(spark, False)`` to restore strict min semantics.
    Pinned by tests/test_streaming_utils.py (idle source no longer stalls
    a two-source union's windows).

    Watermark ALIGNMENT (withWatermarkAlignment:168) needs no shim in
    micro-batch execution: sources advance in lockstep one micro-batch at
    a time and every stateful operator evaluates against the same global
    watermark per batch, which is precisely the alignment contract the
    reference enforces by pausing fast splits.
    """
    spark.conf.set(
        "spark.sql.streaming.multipleWatermarkPolicy",
        "max" if enable else "min",
    )


def current_watermark(query) -> str | None:
    """CURRENT_WATERMARK analog: the event-time watermark of the last
    completed micro-batch (None before the first stateful batch)."""
    progress = query.lastProgress
    if not progress:
        return None
    return (progress.get("eventTime") or {}).get("watermark")
