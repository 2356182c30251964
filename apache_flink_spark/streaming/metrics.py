"""Operator metrics — reference flink-metrics / numRecordsIn-style
counters re-expressed over Spark's StreamingQueryListener.

Reference parity: the reference's operators register counters and gauges
(numRecordsIn/Out, currentWatermark, state size) on a MetricGroup
(flink-metrics-core .../MetricGroup.java; operators via
OperatorMetricGroup). Spark publishes the same figures per micro-batch in
``StreamingQueryProgress``; this module collects them into a queryable,
thread-safe recorder so engine users get the reference's observability
without scraping logs.

Scale note: listeners run on the driver and receive one progress object
per micro-batch — O(batches), never O(rows); safe at any scale.
"""

from __future__ import annotations

import threading

from pyspark.sql.streaming import StreamingQueryListener


class MetricsRecorder(StreamingQueryListener):
    """Collects per-batch streaming metrics (flink-metrics parity map):

    =====================  =====================================
    reference metric        recorded field
    =====================  =====================================
    numRecordsIn            ``num_input_rows``
    numRecordsInPerSecond   ``input_rows_per_second``
    currentWatermark        ``watermark``
    state size / entries    ``state_rows`` (sum over stateful ops)
    =====================  =====================================
    """

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self._progress: list[dict] = []

    # -- listener callbacks (driver-side, one per lifecycle event) --
    def onQueryStarted(self, event) -> None:  # noqa: N802
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        rec = {
            "query_id": str(p.id),
            "batch_id": p.batchId,
            "num_input_rows": p.numInputRows,
            "input_rows_per_second": p.inputRowsPerSecond,
            "watermark": p.eventTime.get("watermark"),
            "state_rows": sum(
                s.numRowsTotal for s in (p.stateOperators or [])
            ),
        }
        with self._lock:
            self._progress.append(rec)

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    # -- accessors --
    def batches(self, query_id: str | None = None) -> list[dict]:
        with self._lock:
            out = list(self._progress)
        if query_id is not None:
            out = [r for r in out if r["query_id"] == query_id]
        return out

    def totals(self, query_id: str | None = None) -> dict:
        """Aggregated metrics; pass ``query_id`` when more than one
        streaming query ran while attached — the listener is
        session-global, so an unfiltered total mixes queries."""
        rows = self.batches(query_id)
        return {
            "n_batches": len(rows),
            "num_input_rows": sum(r["num_input_rows"] for r in rows),
            "last_watermark": rows[-1]["watermark"] if rows else None,
            "max_state_rows": max(
                (r["state_rows"] for r in rows), default=0
            ),
        }


def attach_metrics(spark) -> MetricsRecorder:
    """Register a fresh recorder on the session; returns it. Detach with
    ``spark.streams.removeListener(recorder)``."""
    rec = MetricsRecorder()
    spark.streams.addListener(rec)
    return rec
