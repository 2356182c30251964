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


def current_watermark(query) -> str | None:
    """CURRENT_WATERMARK analog: the event-time watermark of the last
    completed micro-batch (None before the first stateful batch)."""
    progress = query.lastProgress
    if not progress:
        return None
    return (progress.get("eventTime") or {}).get("watermark")
