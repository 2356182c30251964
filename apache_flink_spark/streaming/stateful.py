"""Custom stateful streaming operators — streaming Top-N and keep-last
deduplicate via applyInPandasWithState.

Reference parity (SURVEY.md §2.7, the streaming "hard items" of §7 step 4):
  - StreamExecRank / AppendOnlyTopNFunction (flink-table-runtime
    .../rank/AppendOnlyTopNFunction.java:52): per-key top-N maintained in
    keyed state, updates emitted as new records arrive.
  - StreamExecDeduplicate keep-LAST (RowTimeDeduplicateFunction +
    ProcTimeDeduplicateKeepLastRowFunction): latest row per key by event
    time. Spark's dropDuplicates only keeps FIRST — keep-last needs custom
    state.

Structured Streaming has no built-in streaming rank/keep-last, so both are
implemented with ``applyInPandasWithState``: per-key GroupState holds the
current top-N (resp. latest row) as array columns; each micro-batch merges
its rows into state and emits the key's refreshed result (update
semantics — the reference's retract stream collapses to
latest-value-per-key here, SURVEY §1.1 changelog note).

Scale: state is O(N) per key (Top-N) or O(1) (keep-last); the only shuffle
is the groupBy on the key, and the state store (RocksDB provider for large
keyspaces) persists it across micro-batches.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def streaming_topn_by_value(events: DataFrame, n: int = 3) -> DataFrame:
    """Streaming Top-N: per user, the top-``n`` events by (value desc,
    event_id asc), maintained in GroupState across micro-batches."""

    out_schema = "user_id long, event_id long, value double, rn int"
    state_schema = "event_ids array<long>, vals array<double>"

    def topn(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            ids, vals = state.get
            ids, vals = list(ids), list(vals)
        else:
            ids, vals = [], []
        for pdf in pdfs:
            ids.extend(int(x) for x in pdf["event_id"])
            vals.extend(float(x) for x in pdf["value"])
        # (value desc, event_id asc) — the reference's TopN comparator with
        # a deterministic tiebreak.
        order = sorted(range(len(ids)), key=lambda i: (-vals[i], ids[i]))[:n]
        ids = [ids[i] for i in order]
        vals = [vals[i] for i in order]
        state.update((ids, vals))
        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(ids),
                "event_id": ids,
                "value": vals,
                "rn": range(1, len(ids) + 1),
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        topn, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def streaming_custom_sessions(events: DataFrame, gap_us: int) -> DataFrame:
    """Custom session-window operator with EVENT-TIME TIMERS (reference
    ProcessFunction timers, SURVEY §2.12: KeyedStream.process + timer
    services): sessions close when the event-time watermark passes
    last_event + gap — exactly how the reference's session assigner fires.

    Demonstrates the timeout half of the GroupState API that the built-in
    ``session_window`` hides: state carries (start, last, count); each batch
    extends or rolls sessions and re-arms the timeout; when Spark calls the
    function with ``state.hasTimedOut`` the session is emitted and state
    cleared. Input must be watermarked (``withWatermark``) for event-time
    timeouts to fire."""

    out_schema = "user_id long, sess_start long, sess_last long, n_events long"
    state_schema = "start long, last long, cnt long"

    def sessionize(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        closed: list[tuple] = []
        if state.hasTimedOut:
            start, last, cnt = state.get
            closed.append((user_id, start, last, cnt))
            state.remove()
        else:
            cur = state.get if state.exists else None
            rows = pd.concat(list(pdfs), ignore_index=True)
            rows = rows.sort_values("ts_us", kind="mergesort")
            for ts in rows["ts_us"]:
                ts = int(ts)
                if cur is None:
                    cur = (ts, ts, 1)
                elif ts - cur[1] > gap_us:
                    closed.append((user_id, *cur))
                    cur = (ts, ts, 1)
                else:
                    cur = (cur[0], ts, cur[2] + 1)
            if cur is not None:
                state.update(cur)
                # Arm the event-time timer: fire when the watermark passes
                # session end + gap (timestamps are micros; the API takes ms).
                state.setTimeoutTimestamp((cur[1] + gap_us) // 1000)
        yield pd.DataFrame(
            closed, columns=["user_id", "sess_start", "sess_last", "n_events"]
        )

    return events.groupBy("user_id").applyInPandasWithState(
        sessionize,
        out_schema,
        state_schema,
        "append",
        GroupStateTimeout.EventTimeTimeout,
    )


def streaming_keep_last(events: DataFrame) -> DataFrame:
    """Keep-last deduplicate: latest event per (user_id, event_type) by
    (ts desc, event_id desc) — O(1) state per key."""

    out_schema = "user_id long, event_type string, event_id long, ts_us long"
    state_schema = "event_id long, ts_us long"

    def keep_last(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        user_id, event_type = key
        best = state.get if state.exists else None
        for pdf in pdfs:
            for eid, ts in zip(pdf["event_id"], pdf["ts_us"]):
                cand = (int(eid), int(ts))
                if best is None or (cand[1], cand[0]) > (best[1], best[0]):
                    best = cand
        state.update(best)
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "event_type": [event_type],
                "event_id": [best[0]],
                "ts_us": [best[1]],
            }
        )

    return events.groupBy("user_id", "event_type").applyInPandasWithState(
        keep_last, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def streaming_temporal_sort(events: DataFrame) -> DataFrame:
    """Event-time SORTED emission (reference StreamExecTemporalSort /
    RowTimeSortOperator: buffer rows per key, release them in row-time order
    as the watermark passes — the streaming analog of ORDER BY ts).

    State = the per-key buffer of not-yet-releasable rows. Each data batch
    appends to the buffer; an event-time timer armed at the earliest
    buffered row fires when the watermark passes it, emitting every buffered
    row at or below the watermark in (ts, event_id) order with a continuous
    per-key sequence number (the proof of sortedness). Rows above the final
    watermark stay buffered — identical horizon semantics to the
    reference's row-time sorter, which also cannot release rows the
    watermark has not certified."""

    out_schema = "user_id long, event_id long, ts_us long, seq long"
    state_schema = "eids array<long>, tss array<long>, seq long"

    def sorter(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        eids, tss, seq = state.get if state.exists else ([], [], 0)
        eids, tss = list(eids), list(tss)
        if not state.hasTimedOut:
            rows = pd.concat(list(pdfs), ignore_index=True)
            eids += [int(x) for x in rows["event_id"]]
            tss += [int(x) for x in rows["ts_us"]]
        wm_ms = state.getCurrentWatermarkMs()
        order = sorted(range(len(tss)), key=lambda i: (tss[i], eids[i]))
        eids = [eids[i] for i in order]
        tss = [tss[i] for i in order]
        emit_n = 0
        while emit_n < len(tss) and tss[emit_n] // 1000 <= wm_ms:
            emit_n += 1
        out = [
            (user_id, eids[i], tss[i], seq + i + 1) for i in range(emit_n)
        ]
        rest_e, rest_t = eids[emit_n:], tss[emit_n:]
        if rest_e:
            state.update((rest_e, rest_t, seq + emit_n))
            # Re-arm at the earliest unreleased row (must exceed the
            # current watermark — guaranteed since it was not emitted).
            state.setTimeoutTimestamp(max(rest_t[0] // 1000, wm_ms + 1))
        elif state.exists:
            state.remove()
        yield pd.DataFrame(out, columns=["user_id", "event_id", "ts_us", "seq"])

    return events.groupBy("user_id").applyInPandasWithState(
        sorter,
        out_schema,
        state_schema,
        "append",
        GroupStateTimeout.EventTimeTimeout,
    )


def streaming_rows_bounded_over(events: DataFrame, window_rows: int) -> DataFrame:
    """ROWS-BOUNDED streaming over-aggregate (reference
    RowTimeRowsBoundedPrecedingFunction.java): per-key sliding sum/count
    over the last ``window_rows`` rows, one output row per input row.
    State = the bounded deque of the last N-1 integer-cents values (the
    reference keeps the same bounded row buffer per key and retracts the
    expiring row from its accumulator — here the window re-sums N ints,
    cheaper than maintaining retractions). O(N) state per key regardless of
    stream length; rows are assumed to arrive per-key in event-time order
    across batches (see module docstring)."""

    out_schema = (
        "user_id long, event_id long, ts_us long, w_cnt long, w_sum_cents long"
    )
    state_schema = "hist array<long>"

    def running(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        hist: list[int] = list(state.get[0]) if state.exists else []
        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch.sort_values(["ts_us", "event_id"], kind="mergesort")
        out_cnt, out_sum = [], []
        for v in batch["value"]:
            hist.append(int(round(float(v) * 100)))
            win = hist[-window_rows:]
            out_cnt.append(len(win))
            out_sum.append(sum(win))
        state.update((hist[-(window_rows - 1):],))
        yield pd.DataFrame(
            {
                "user_id": batch["user_id"],
                "event_id": batch["event_id"],
                "ts_us": batch["ts_us"],
                "w_cnt": out_cnt,
                "w_sum_cents": out_sum,
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        running, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def streaming_range_bounded_over(events: DataFrame, range_us: int) -> DataFrame:
    """RANGE-BOUNDED (event-time interval) streaming over-aggregate
    (reference RowTimeRangeBoundedPrecedingFunction.java:56): per-key
    count/sum over rows whose timestamp lies in
    ``[cur_ts - range_us, cur_ts]``, one output row per input row.

    RANGE frames include ALL peers of the current timestamp (SQL-standard
    "CURRENT ROW" in RANGE mode) — the reference gets this by buffering rows
    per timestamp and firing an event-time timer once per distinct ts; here
    each micro-batch processes rows grouped by distinct ts so equal-ts rows
    see the identical frame. State = the trailing buffer of (ts, cents)
    pairs inside the range window — O(rows-in-range) per key, exactly the
    reference's ``Map<Long, List<RowData>>`` retained window, evicted as the
    frame slides. Rows are assumed to arrive per-key in event-time order
    across batches (module docstring)."""

    out_schema = (
        "user_id long, event_id long, ts_us long, w_cnt long, w_sum_cents long"
    )
    state_schema = "ts_hist array<long>, cents_hist array<long>"

    def running(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            ts_hist, cents_hist = (list(a) for a in state.get)
        else:
            ts_hist, cents_hist = [], []
        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch.sort_values(["ts_us", "event_id"], kind="mergesort")
        out_cnt, out_sum = [], []
        # Process per distinct ts so same-ts peers share one frame.
        for ts, grp in batch.groupby("ts_us", sort=True):
            for v in grp["value"]:
                ts_hist.append(int(ts))
                cents_hist.append(int(round(float(v) * 100)))
            lo = int(ts) - range_us
            # Evict expired frame entries (ordered arrival -> prefix drop).
            drop = 0
            while drop < len(ts_hist) and ts_hist[drop] < lo:
                drop += 1
            if drop:
                ts_hist = ts_hist[drop:]
                cents_hist = cents_hist[drop:]
            cnt, s = len(cents_hist), sum(cents_hist)
            out_cnt.extend([cnt] * len(grp))
            out_sum.extend([s] * len(grp))
        state.update((ts_hist, cents_hist))
        yield pd.DataFrame(
            {
                "user_id": batch["user_id"],
                "event_id": batch["event_id"],
                "ts_us": batch["ts_us"],
                "w_cnt": out_cnt,
                "w_sum_cents": out_sum,
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        running, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )
