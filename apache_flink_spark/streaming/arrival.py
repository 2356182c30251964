"""Arrival-order watermark simulation (r13 — the streaming ITCase
harvest's late-data semantics, exactly as the reference's operators
apply them).

The reference's streaming ITCases feed an explicit interleaving of rows
and watermarks (``Seq[Either[(ts, row), wm]]`` through
EventTimeProcessOperator, or a values source with a ``WATERMARK FOR ts
AS ts - delay`` strategy that emits a watermark per element). Stateful
operators then drop late input:

  - over-aggregates / keyed sorts drop a row when ``ts <= current
    watermark`` (flink-table-runtime .../over/RowTimeRowsBoundedPreceding-
    Function.java: rows at or behind the watermark never enter state);
  - window aggregates drop PER WINDOW: an element still contributes to
    every assigned window whose end is above the watermark
    (WindowOperator.isWindowLate — maxTimestamp <= currentWatermark
    drops that window only).

These functions reproduce that arithmetic for a bounded arrival
sequence. At 100 TB the same semantics run inside Structured Streaming
(withWatermark + the stateful operators); this module is the
parity-exact bounded evaluator the pins (and the batch backfill path)
use — pure per-row arithmetic, applied inside mapInPandas per input
split when run at scale, never a driver loop over data.
"""

from __future__ import annotations

from collections.abc import Iterable, Sequence


def drop_late_rows(seq: Iterable[tuple]) -> list[tuple]:
    """Filter an explicit row/watermark interleaving to the rows a
    rowtime-keyed stateful operator processes.

    ``seq`` items: ``("row", ts, payload)`` or ``("wm", ts)`` — the
    EventTimeProcessOperator convention. Returns ``(ts, payload,
    arrival_idx)`` for every row with ``ts > current watermark`` at its
    arrival, in arrival order.
    """
    wm = float("-inf")
    out: list[tuple] = []
    idx = 0
    for item in seq:
        if item[0] == "wm":
            wm = max(wm, item[1])
        elif item[0] == "row":
            _, ts, payload = item
            if ts > wm:
                out.append((ts, payload, idx))
            idx += 1
        else:  # pragma: no cover
            raise ValueError(f"unknown arrival item {item[0]!r}")
    return out


def drop_late_rows_bounded(seq: Iterable[tuple], key_fn=None) -> list[tuple]:
    """The BOUNDED over-aggregate late rule (RowTimeRangeBounded-
    PrecedingFunction.java:161 / RowTimeRowsBoundedPrecedingFunction):
    a row is dropped iff ``ts <= lastTriggeringTs`` of ITS KEY, where
    lastTriggeringTs is the largest row timestamp whose event-time timer
    has FIRED (i.e. the largest seen row-ts at or below a watermark that
    arrived after it). This is laxer than the unbounded operators'
    ``ts <= watermark`` rule — a row whose timestamp equals the current
    watermark survives when no timer at that exact timestamp has fired
    yet (e.g. OverAggregateITCase:515's ts-10000 row at watermark
    10000... its key saw no earlier timers).

    ``key_fn(payload)`` extracts the partition key (None = global).
    Returns ``(ts, payload, arrival_idx)`` survivors in arrival order.
    """
    key_fn = key_fn or (lambda _p: None)
    last_trig: dict = {}
    pending: dict = {}
    out: list[tuple] = []
    idx = 0
    for item in seq:
        if item[0] == "wm":
            wm = item[1]
            for k, ts_list in pending.items():
                fired = [t for t in ts_list if t <= wm]
                if fired:
                    last_trig[k] = max(last_trig.get(k, 0), max(fired))
                    pending[k] = [t for t in ts_list if t > wm]
            continue
        _, ts, payload = item
        k = key_fn(payload)
        if ts > last_trig.get(k, 0):
            out.append((ts, payload, idx))
            pending.setdefault(k, []).append(ts)
        idx += 1
    return out


def bounded_watermarks(
    ts_list: Sequence[int], delay: int
) -> list[tuple]:
    """Expand a plain arrival-ordered timestamp list into the row/wm
    interleaving of a per-element bounded-out-of-orderness strategy
    (``WATERMARK FOR ts AS ts - delay`` on the values connector, or
    TimestampAndWatermarkWithOffset): after each element, watermark =
    max(ts) - delay so far."""
    seq: list[tuple] = []
    for i, ts in enumerate(ts_list):
        seq.append(("row", ts, i))
        seq.append(("wm", ts - delay))
    return seq


def surviving_windows(
    seq: Iterable[tuple],
    assign,
) -> list[tuple]:
    """Per-window late-data semantics (WindowOperator.isWindowLate): for
    each on-time (row, window) pair, keep it iff the window's end is
    still above the watermark AT THE ROW'S ARRIVAL.

    ``seq`` as in :func:`drop_late_rows`; ``assign(ts, payload)`` yields
    ``(win_start, win_end)`` pairs (exclusive end, ms). Returns
    ``(ts, payload, arrival_idx, win_start, win_end)`` tuples.
    """
    wm = float("-inf")
    out: list[tuple] = []
    idx = 0
    for item in seq:
        if item[0] == "wm":
            wm = max(wm, item[1])
            continue
        _, ts, payload = item
        for ws, we in assign(ts, payload):
            # window.maxTimestamp() = end - 1; late when <= watermark
            if we - 1 > wm:
                out.append((ts, payload, idx, ws, we))
        idx += 1
    return out


def session_windows(
    seq: Iterable[tuple],
    gap: int,
    key_fn=None,
) -> list[tuple]:
    """SESSION windows with merging (the reference's unaligned window
    operator): a row is late iff its OWN proto-window [ts, ts+gap)'s
    maxTimestamp <= the watermark at arrival (WindowAggregateITCase's
    late insert at :745 keeps its session but loses its tumble slice);
    survivors merge per key into [min ts, max ts + gap) sessions.
    Returns ``(ts, payload, arrival_idx, win_start, win_end)``.
    """
    key_fn = key_fn or (lambda _p: None)
    wm = float("-inf")
    survivors: list[tuple] = []
    idx = 0
    for item in seq:
        if item[0] == "wm":
            wm = max(wm, item[1])
            continue
        _, ts, payload = item
        if ts + gap - 1 > wm:
            survivors.append((ts, payload, idx))
        idx += 1
    # merge per key
    by_key: dict = {}
    for ts, payload, i in survivors:
        by_key.setdefault(key_fn(payload), []).append((ts, payload, i))
    out: list[tuple] = []
    for rows in by_key.values():
        rows.sort(key=lambda r: r[0])
        sessions: list[list] = []
        for ts, payload, i in rows:
            if sessions and ts < sessions[-1][1]:
                sessions[-1][1] = max(sessions[-1][1], ts + gap)
                sessions[-1][2].append((ts, payload, i))
            else:
                sessions.append([ts, ts + gap, [(ts, payload, i)]])
        for start, end, members in sessions:
            out.extend(
                (ts, payload, i, start, end) for ts, payload, i in members
            )
    return out


def tumble(size: int, offset: int = 0):
    """TUMBLE window assigner (TumblingEventTimeWindows.assignWindows)."""

    def assign(ts, _payload):
        start = ts - ((ts - offset) % size if (ts - offset) % size >= 0
                      else (ts - offset) % size + size)
        return [(start, start + size)]

    return assign


def hop(size: int, slide: int, offset: int = 0):
    """HOP window assigner (SlidingEventTimeWindows.assignWindows)."""

    def assign(ts, _payload):
        rem = (ts - offset) % slide
        last_start = ts - (rem if rem >= 0 else rem + slide)
        wins = []
        start = last_start
        while start > ts - size:
            wins.append((start, start + size))
            start -= slide
        return wins

    return assign


def cumulate(max_size: int, step: int, offset: int = 0):
    """CUMULATE window assigner (CumulativeWindowAssigner): each element
    lands in every expanding slice [aligned_start, aligned_start + k*step]
    that contains it, up to max_size."""

    def assign(ts, _payload):
        rem = (ts - offset) % max_size
        start = ts - (rem if rem >= 0 else rem + max_size)
        wins = []
        end = start + step
        while end <= start + max_size:
            if ts < end:
                wins.append((start, end))
            end += step
        return wins

    return assign
