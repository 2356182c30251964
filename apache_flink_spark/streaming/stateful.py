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
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

# Multi-user state buckets (the reference's KeyGroupRangeAssignment
# maxParallelism analog): state shards by pmod(xxhash64(key),
# key_groups(spark)), so Python-crossing cost scales with groups, not
# distinct keys, while rescale granularity stays bounded.


#: Default key-group count when the conf is unset — the reference's own
#: default maxParallelism (KeyGroupRangeAssignment: 128). Deliberately a
#: CONSTANT, never derived from the machine: the group count is baked into
#: every checkpoint's state layout, so a machine-derived default would
#: silently mis-shard restored state on a host with a different core count
#: (keys hash to pmod(h, G') while saved GroupState lives under pmod(h, G)).
KEY_GROUPS_DEFAULT = 128


def key_groups(spark) -> int:
    """Key-group count for sharded custom stateful operators.

    Sizing (SCALE.md "Stateful key groups"): per-group buffered state is
    roughly watermark_lag x input_rate / groups and must fit one worker.
    Default is the CHECKPOINT-STABLE constant 128 (the reference's default
    maxParallelism) — machine-independent so an unpinned restart on
    different hardware still finds its state; set
    ``spark.graft.stateful.keyGroups`` (the pipeline.max-parallelism knob)
    to scale beyond 128-way stateful parallelism, and keep it pinned for
    the checkpoint's lifetime. More groups = more parallelism + smaller
    per-group buffers, at the cost of one extra Python crossing per group
    per micro-batch."""
    v = spark.conf.get("spark.graft.stateful.keyGroups", None)
    if v is not None:
        g = int(v)
        if g <= 0:
            raise ValueError(
                f"spark.graft.stateful.keyGroups must be positive, got {g}"
            )
        return g
    return KEY_GROUPS_DEFAULT


def pin_key_groups(spark, checkpoint_dir: str) -> int:
    """Record/validate the key-group count against a REUSED checkpoint.

    The group count is baked into a checkpoint's state layout (keys live
    under pmod(xxhash64(key), G)); restarting with a different G silently
    mis-shards restored state — stale state lingers under old group ids
    and dedup/join state is silently lost (ADVICE r5). Call this before
    starting any key-grouped stateful query whose checkpointLocation can
    outlive the process: first use writes ``_graft_key_groups.json`` into
    the checkpoint dir; any later start with a different effective count
    fails loudly instead.

    Migration note: builds before round 6 defaulted to G=32 (the old
    KEY_GROUPS constant); the default is now 128 (the reference's default
    maxParallelism). A pre-r6 checkpoint written with the conf unset MUST
    pin ``spark.graft.stateful.keyGroups=32`` on restore.

    Returns the effective group count.
    """
    import json as _json
    import os as _os

    g = key_groups(spark)
    marker = _os.path.join(checkpoint_dir, "_graft_key_groups.json")
    if _os.path.exists(marker):
        with open(marker) as f:
            recorded = _json.load(f)["key_groups"]
        if recorded != g:
            raise RuntimeError(
                f"key-group mismatch on checkpoint reuse: {checkpoint_dir} "
                f"was written with keyGroups={recorded} but this session "
                f"resolves to {g}. Restored state would silently mis-shard "
                f"(keys rehash to pmod(h,{g}) while saved GroupState lives "
                f"under pmod(h,{recorded})). Pin spark.graft.stateful."
                f"keyGroups={recorded}, or start a fresh checkpoint."
            )
    else:
        _os.makedirs(checkpoint_dir, exist_ok=True)
        with open(marker, "w") as f:
            _json.dump({"key_groups": g}, f)
    return g


def max_group_rows(spark) -> int:
    """Loud per-key-group state budget (rows buffered in one GroupState
    value). Exceeding it means the watermark lag x rate outgrew the shard
    layout — the fix is more key groups or a shorter lag, not silent
    spill-to-heap. Override via ``spark.graft.stateful.maxGroupRows``."""
    return int(spark.conf.get("spark.graft.stateful.maxGroupRows", "2000000"))


def _check_group_budget(n_rows: int, budget: int, op: str) -> None:
    if n_rows > budget:
        raise RuntimeError(
            f"{op}: key-group state buffer holds {n_rows} rows, over the "
            f"budget of {budget} (spark.graft.stateful.maxGroupRows). "
            "Per-group state ~= watermark_lag x rate / key_groups — raise "
            "spark.graft.stateful.keyGroups (more, smaller shards) or "
            "shorten the watermark lag (see SCALE.md)."
        )


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


def streaming_temporal_join(tagged: DataFrame) -> DataFrame:
    """Streaming stateful temporal (as-of) join — the reference's
    TemporalRowTimeJoinOperator.java:78: a probe stream joined per key to a
    VERSIONED build stream, each probe row matched to the latest build
    version with ``version.ts <= probe.ts``, emission gated on the
    watermark.

    Input is the two streams unioned with a ``side`` tag (0 = versioned
    build, 1 = probe), both watermarked before the union (Spark's global
    watermark = min over sources — the reference's combined left/right
    watermark, TemporalRowTimeJoinOperator's
    ``combinedWatermark``). State holds BOTH sides' buffers, mirroring the
    operator's two keyed states:

      - versions: the build rows seen so far (``rightState``);
      - probes: left rows not yet certified by the watermark
        (``leftState``).

    KEY GROUPS: state is partitioned by ``pmod(xxhash64(user_id), G)`` —
    the reference's key-group model (KeyGroupRangeAssignment.java) — not
    by raw user_id. applyInPandasWithState pays a Python crossing per
    GROUP per batch, so grouping by user made the operator's local cost
    ~one call per user (1500 calls/batch at sf0.1); G = key_groups(spark)
    groups (checkpoint-stable default 128) cut that ~50x while every per-group computation stays vectorized ACROSS users
    (lexsort + one C-speed merge_asof(by=user)). On a real cluster the
    same layout holds: key-group count bounds rebalance granularity, and
    per-group state is the sum of its users' bounded buffers.

    On each invocation (data batch or event-time timer): probes with
    ``ts <= watermark`` are emitted with the latest version at-or-before
    their timestamp (left-outer: NULL when none) — at that point no
    earlier version can still arrive, which is exactly why the reference
    waits for the watermark. Emitted probes leave state; per user,
    versions below that user's newest watermark-covered version are
    pruned (the reference's ``cleanupState`` keeps one version
    at-or-below the watermark as the still-joinable image). A timer armed
    at the group's earliest buffered probe guarantees emission when the
    watermark advances without new data. State per key group =
    O(its users' unexpired probes + retained versions) — bounded by the
    watermark lag, never the stream length.
    """

    out_schema = "user_id long, click_id long, click_ts long, view_event_id long"
    state_schema = (
        "v_user array<long>, v_ts array<long>, v_ids array<long>, "
        "p_user array<long>, p_ts array<long>, p_ids array<long>"
    )
    budget = max_group_rows(tagged.sparkSession)

    def joiner(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import numpy as np

        if state.exists:
            sv_u, sv_ts, sv_ids, sp_u, sp_ts, sp_ids = state.get
        else:
            sv_u, sv_ts, sv_ids, sp_u, sp_ts, sp_ids = (), (), (), (), (), ()
        v_u = np.asarray(sv_u, dtype=np.int64)
        v_ts = np.asarray(sv_ts, dtype=np.int64)
        v_ids = np.asarray(sv_ids, dtype=np.int64)
        p_u = np.asarray(sp_u, dtype=np.int64)
        p_ts = np.asarray(sp_ts, dtype=np.int64)
        p_ids = np.asarray(sp_ids, dtype=np.int64)
        if not state.hasTimedOut:
            rows = pd.concat(list(pdfs), ignore_index=True)
            side_arr = rows["side"].to_numpy()
            u_arr = rows["user_id"].to_numpy(dtype=np.int64)
            ts_arr = rows["ts_us"].to_numpy(dtype=np.int64)
            id_arr = rows["event_id"].to_numpy(dtype=np.int64)
            build = side_arr == 0
            v_u = np.concatenate([v_u, u_arr[build]])
            v_ts = np.concatenate([v_ts, ts_arr[build]])
            v_ids = np.concatenate([v_ids, id_arr[build]])
            p_u = np.concatenate([p_u, u_arr[~build]])
            p_ts = np.concatenate([p_ts, ts_arr[~build]])
            p_ids = np.concatenate([p_ids, id_arr[~build]])
        wm_ms = state.getCurrentWatermarkMs()

        # Probes certified by the watermark (any user in the group).
        emit = (p_ts // 1000) <= wm_ms
        emit_u, emit_ts, emit_ids = p_u[emit], p_ts[emit], p_ids[emit]
        if len(emit_u):
            # As-of match, vectorized across users: both frames sorted by
            # ts (then id, so the last eligible same-(user, ts) version —
            # largest id — wins), merged with C-speed merge_asof(by=user).
            vo = np.lexsort((v_ids, v_ts))
            left = pd.DataFrame(
                {"user_id": emit_u, "click_id": emit_ids, "click_ts": emit_ts}
            ).sort_values("click_ts", kind="mergesort")
            right = pd.DataFrame(
                {
                    "user_id": v_u[vo],
                    "view_event_id": v_ids[vo],
                    "click_ts": v_ts[vo],
                }
            )
            out = pd.merge_asof(
                left,
                right,
                on="click_ts",
                by="user_id",
                direction="backward",
                allow_exact_matches=True,
            )
            out["view_event_id"] = out["view_event_id"].astype("Int64")
        else:
            out = pd.DataFrame(
                {
                    "user_id": np.zeros(0, np.int64),
                    "click_id": np.zeros(0, np.int64),
                    "click_ts": np.zeros(0, np.int64),
                    "view_event_id": pd.array([], dtype="Int64"),
                }
            )
        p_u, p_ts, p_ids = p_u[~emit], p_ts[~emit], p_ids[~emit]

        # Per-user version cleanup: within each user's (ts, id)-sorted
        # segment the watermark-covered rows form a prefix; keep from the
        # NEWEST covered version on (it is the still-joinable image).
        if len(v_u):
            vo = np.lexsort((v_ids, v_ts, v_u))
            v_u, v_ts, v_ids = v_u[vo], v_ts[vo], v_ids[vo]
            starts = np.flatnonzero(
                np.concatenate(([True], v_u[1:] != v_u[:-1]))
            )
            covered = (v_ts // 1000) <= wm_ms
            n_cov = np.add.reduceat(covered, starts)
            keep_from = starts + np.maximum(n_cov.astype(np.int64) - 1, 0)
            seg = np.zeros(len(v_u), dtype=np.int64)
            seg[starts[1:]] = 1
            seg = np.cumsum(seg)
            keep = np.arange(len(v_u)) >= keep_from[seg]
            v_u, v_ts, v_ids = v_u[keep], v_ts[keep], v_ids[keep]

        if len(p_ts) or len(v_ts):
            _check_group_budget(
                len(v_ts) + len(p_ts), budget, "streaming_temporal_join"
            )
            state.update(
                (
                    v_u.tolist(),
                    v_ts.tolist(),
                    v_ids.tolist(),
                    p_u.tolist(),
                    p_ts.tolist(),
                    p_ids.tolist(),
                )
            )
            if len(p_ts):
                state.setTimeoutTimestamp(
                    max(int(p_ts.min()) // 1000, wm_ms + 1)
                )
        elif state.exists:
            state.remove()
        yield out

    grouped = tagged.withColumn(
        "__kg",
        F.pmod(F.xxhash64("user_id"), F.lit(key_groups(tagged.sparkSession))),
    )
    return grouped.groupBy("__kg").applyInPandasWithState(
        joiner,
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


def streaming_cep_timeout(stream: DataFrame, window_us: int) -> DataFrame:
    """CEP timed-out partial matches — the reference's
    TimedOutPartialMatchHandler / PatternStream timeout side output
    (flink-cep .../PatternProcessFunction.java, CepOperator's
    processTimedOutSequences): pattern click -> purchase WITHIN
    ``window_us``; a click whose window expires under the watermark with
    NO strictly-later same-user purchase inside it is emitted on the
    timeout channel (the MATCHED sequences are the main output — covered
    by match_cep_stateful; this operator is the other half).

    Per-key GroupState = the pending (unmatched, unexpired) clicks — the
    NFA's partial-match buffer. Each invocation is vectorized: one
    searchsorted finds each click's first strictly-later purchase, one
    mask splits consumed / expired / still-pending. An event-time timer
    at the earliest pending deadline guarantees emission when the
    watermark advances without new per-key data. State per key =
    O(pending clicks + retained purchases inside the window), bounded by
    the watermark lag. Purchases buffer in the SAME keyed state as clicks
    (the reference buffers out-of-order rows in keyed state before its NFA
    sees them), so consumption is ARRIVAL-order independent: a purchase
    arriving in an earlier micro-batch than its event-time-earlier click
    still consumes it; retained purchases prune once the watermark
    guarantees no still-live click can precede them."""

    out_schema = "user_id long, click_id long, click_ts long, deadline long"
    state_schema = "c_ids array<long>, c_eps array<long>, p_eps array<long>"

    def handler(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import numpy as np

        (user_id,) = key
        s_ids, s_eps, s_pe = state.get if state.exists else ((), (), ())
        c_ids = np.asarray(s_ids, dtype=np.int64)
        c_eps = np.asarray(s_eps, dtype=np.int64)
        pe = np.asarray(s_pe, dtype=np.int64)
        if not state.hasTimedOut:
            rows = pd.concat(list(pdfs), ignore_index=True)
            rows = rows.sort_values(["ep", "event_id"], kind="mergesort")
            is_click = (rows["event_type"] == "click").to_numpy()
            eps = rows["ep"].to_numpy(dtype=np.int64)
            ids = rows["event_id"].to_numpy(dtype=np.int64)
            c_ids = np.concatenate([c_ids, ids[is_click]])
            c_eps = np.concatenate([c_eps, eps[is_click]])
            pe = np.sort(np.concatenate([pe, eps[~is_click]]))
        # Consume: first purchase strictly after the click, inside window
        # (stored + new purchases together — arrival order irrelevant).
        if len(pe) and len(c_eps):
            nxt = np.searchsorted(pe, c_eps, side="right")
            hit = np.full(len(c_eps), False)
            in_range = nxt < len(pe)
            # strictly INSIDE the window (r12 — NFA.isStateTimedOut at
            # >= deadline: a purchase exactly AT click + window loses to
            # the timeout and does not kill)
            hit[in_range] = (
                pe[nxt[in_range]] < c_eps[in_range] + window_us
            )
            c_ids, c_eps = c_ids[~hit], c_eps[~hit]
        wm_us = state.getCurrentWatermarkMs() * 1000
        # r12: wm >= deadline times out (NFA.isStateTimedOut at >=)
        expired = c_eps + window_us <= wm_us
        out = pd.DataFrame(
            {
                "user_id": np.full(
                    int(expired.sum()), user_id, dtype=np.int64
                ),
                "click_id": c_ids[expired],
                "click_ts": c_eps[expired],
                "deadline": c_eps[expired] + window_us,
            }
        )
        c_ids, c_eps = c_ids[~expired], c_eps[~expired]
        # Retained purchases: only useful to an unexpired click with
        # c_ep < p_ep, and unexpired means c_ep + window >= wm — so any
        # purchase at or below wm - window can never consume again.
        pe = pe[pe > wm_us - window_us]
        if len(c_eps) or len(pe):
            state.update((c_ids.tolist(), c_eps.tolist(), pe.tolist()))
            candidates = [int(c_eps.min())] if len(c_eps) else []
            if len(pe):
                candidates.append(int(pe.min()))
            # fire at the first wm >= deadline (Spark fires at wm > timer)
            deadline_ms = int((min(candidates) + window_us + 999) // 1000) - 1
            state.setTimeoutTimestamp(
                max(deadline_ms, state.getCurrentWatermarkMs() + 1)
            )
        elif state.exists:
            state.remove()
        yield out

    return stream.groupBy("user_id").applyInPandasWithState(
        handler,
        out_schema,
        state_schema,
        "append",
        GroupStateTimeout.EventTimeTimeout,
    )


def streaming_session_changelog(events: DataFrame, gap_us: int) -> DataFrame:
    """Session windows as a CHANGELOG stream with retractions — the
    reference's merging-window behavior (flink-table-runtime
    UnalignedWindowTableFunctionOperator; MergingWindowSet.java's
    mergePartialWindows): every micro-batch emits, per affected session,
    an upsert row ('U': user, sess_start, sess_end, n_events) and — when a
    merge RETIRES a previously-emitted session key (a bridging or earlier
    event changed its start) — a delete row ('D') for the dead key. The
    companion sink (sources.run_changelog_upsert_to_table) compacts the
    log honoring the deletes, which is exactly what Spark's built-in
    session_window cannot express (update mode on merging windows is
    rejected because it would need these retractions).

    State: per key group, the OPEN sessions of its users as parallel
    arrays. Each batch is fully vectorized across users: state sessions
    (weight = n_events) and new events (weight = 1) merge in one lexsort +
    per-user gap scan (reset-aware running max via the dense-code offset
    trick); sessions whose end + gap passed the watermark leave state
    (their last 'U' is already final in the log) — an event-time timer at
    the group's earliest expiry evicts idle groups too. At most ONE
    changelog row per (user, sess_start) key per batch, which the sink's
    per-key last-batch-wins compaction requires. State per group =
    O(open + unexpired sessions of its users), bounded by the watermark
    lag. Arrival order across batches is immaterial: an out-of-order
    earlier event triggers the backward merge + retraction path."""

    out_schema = (
        "op string, user_id long, sess_start long, sess_end long, "
        "n_events long"
    )
    state_schema = (
        "su array<long>, ss array<long>, se array<long>, sc array<long>"
    )
    budget = max_group_rows(events.sparkSession)

    def handler(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import numpy as np

        s_u, s_s, s_e, s_c = state.get if state.exists else ((), (), (), ())
        su = np.asarray(s_u, dtype=np.int64)
        ss = np.asarray(s_s, dtype=np.int64)
        se = np.asarray(s_e, dtype=np.int64)
        sc = np.asarray(s_c, dtype=np.int64)
        wm_ms = state.getCurrentWatermarkMs()
        wm_us = wm_ms * 1000

        def empty_out():
            return pd.DataFrame(
                {
                    "op": pd.Series([], dtype=str),
                    "user_id": pd.Series([], dtype=np.int64),
                    "sess_start": pd.Series([], dtype=np.int64),
                    "sess_end": pd.Series([], dtype=np.int64),
                    "n_events": pd.Series([], dtype=np.int64),
                }
            )

        def rearm(ends):
            state.setTimeoutTimestamp(
                max(int((int(ends.min()) + gap_us) // 1000) + 1, wm_ms + 1)
            )

        if state.hasTimedOut:
            live = se + gap_us >= wm_us
            if live.any():
                state.update(
                    (
                        su[live].tolist(),
                        ss[live].tolist(),
                        se[live].tolist(),
                        sc[live].tolist(),
                    )
                )
                rearm(se[live])
            else:
                state.remove()
            yield empty_out()
            return

        rows = pd.concat(list(pdfs), ignore_index=True)
        eu = rows["user_id"].to_numpy(dtype=np.int64)
        ets = rows["ts_us"].to_numpy(dtype=np.int64)

        # Merge state sessions (as weighted intervals) with new events.
        mu = np.concatenate([su, eu])
        mst = np.concatenate([ss, ets])
        men = np.concatenate([se, ets])
        mct = np.concatenate([sc, np.ones(len(eu), dtype=np.int64)])
        order = np.lexsort((men, mst, mu))
        mu, mst, men, mct = mu[order], mst[order], men[order], mct[order]

        # Per-user running max of interval ends with resets. Fast path:
        # dense-code offsets (one accumulate); when codes.max x span could
        # overflow int64 (huge key-group user counts x wide time ranges at
        # scale), fall back to per-segment accumulates — same result,
        # O(users-in-group) segment slices.
        codes = np.unique(mu, return_inverse=True)[1].astype(np.int64)
        base = int(min(mst.min(), men.min()))
        span = int(men.max()) - base + gap_us + 2
        if (int(codes[-1]) + 1) * span < (1 << 62):
            runmax = (
                np.maximum.accumulate(men - base + codes * span)
                - codes * span
                + base
            )
        else:
            runmax = men.copy()
            seg = np.flatnonzero(
                np.concatenate(([True], mu[1:] != mu[:-1]))
            )
            bounds = np.append(seg, len(mu))
            for s0, s1 in zip(bounds[:-1], bounds[1:]):
                runmax[s0:s1] = np.maximum.accumulate(men[s0:s1])
        new_sess = np.ones(len(mu), dtype=bool)
        if len(mu) > 1:
            new_sess[1:] = (mu[1:] != mu[:-1]) | (
                mst[1:] - runmax[:-1] > gap_us
            )
        sess_id = np.cumsum(new_sess) - 1
        starts_idx = np.flatnonzero(new_sess)
        nu = mu[starts_idx]
        nst = mst[starts_idx]
        nen = np.maximum.reduceat(men, starts_idx)
        nct = np.add.reduceat(mct, starts_idx)

        # Changelog: for users with batch activity, every current session
        # is an upsert; every retired old key (same user, start no longer a
        # session start) is a delete.
        active = np.unique(eu)

        def keyof(users, starts):
            k = np.empty(len(users), dtype=[("u", np.int64), ("s", np.int64)])
            k["u"] = users
            k["s"] = starts
            return k

        n_active = np.isin(nu, active)
        u_rows = (nu[n_active], nst[n_active], nen[n_active], nct[n_active])
        o_active = np.isin(su, active)
        dead = ~np.isin(keyof(su[o_active], ss[o_active]), keyof(nu, nst))
        d_rows = (
            su[o_active][dead],
            ss[o_active][dead],
            se[o_active][dead],
            sc[o_active][dead],
        )
        out = pd.DataFrame(
            {
                "op": ["U"] * len(u_rows[0]) + ["D"] * len(d_rows[0]),
                "user_id": np.concatenate([u_rows[0], d_rows[0]]),
                "sess_start": np.concatenate([u_rows[1], d_rows[1]]),
                "sess_end": np.concatenate([u_rows[2], d_rows[2]]),
                "n_events": np.concatenate([u_rows[3], d_rows[3]]),
            }
        )

        # Evict finalized sessions (their latest U is already in the log).
        live = nen + gap_us >= wm_us
        if live.any():
            _check_group_budget(
                int(live.sum()), budget, "streaming_session_changelog"
            )
            state.update(
                (
                    nu[live].tolist(),
                    nst[live].tolist(),
                    nen[live].tolist(),
                    nct[live].tolist(),
                )
            )
            rearm(nen[live])
        elif state.exists:
            state.remove()
        yield out

    grouped = events.withColumn(
        "__kg",
        F.pmod(F.xxhash64("user_id"), F.lit(key_groups(events.sparkSession))),
    )
    return grouped.groupBy("__kg").applyInPandasWithState(
        handler,
        out_schema,
        state_schema,
        "append",
        GroupStateTimeout.EventTimeTimeout,
    )


def streaming_dedup_ttl(stream: DataFrame, ttl_us: int) -> DataFrame:
    """Keyed deduplication with TTL'd state — the reference's
    StateTtlConfig pattern (flink-runtime .../state/ttl/TtlStateFactory,
    and the dedup-with-TTL idiom its docs recommend to bound dedup state):
    a key's first event emits; subsequent events inside ``ttl_us`` of the
    key's LAST event are duplicates (the keep-alive refreshes the TTL —
    OnReadAndWrite update type); once a key goes quiet for longer than the
    TTL its state expires and the next event emits again. An event-time
    timer armed at the group's earliest expiry prunes even fully idle
    groups (StateTtlConfig background-cleanup parity).

    State shards by key group (key_groups(spark), as in streaming_temporal_join)
    holding (user, last_ts) pairs — O(active keys in the TTL horizon), the
    bound the TTL exists to enforce. Per group the batch is one lexsort +
    one vectorized per-segment gap scan; emission is immediate (append —
    the verdict depends only on the key's PREVIOUS event, which in-order
    arrival already delivered; the reference's TTL dedup emits on arrival
    too). Rows are assumed to arrive per-key in event-time order across
    batches (single-replay fixture batches are)."""

    out_schema = "user_id long, event_id long, ts_us long"
    state_schema = "u array<long>, last_ts array<long>"
    budget = max_group_rows(stream.sparkSession)

    def _rearm(state, bts, ttl_us: int, wm_ms: int) -> None:
        # Event-time timer at the group's EARLIEST possible expiry so fully
        # idle groups still get pruned (StateTtlConfig cleanup parity) —
        # without it, expired state would linger until the group next
        # receives data.
        state.setTimeoutTimestamp(
            max(int((int(bts.min()) + ttl_us) // 1000) + 1, wm_ms + 1)
        )

    def handler(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import numpy as np

        s_u, s_ts = state.get if state.exists else ((), ())
        su = np.asarray(s_u, dtype=np.int64)
        sts = np.asarray(s_ts, dtype=np.int64)
        if state.hasTimedOut:
            # Timer fired: drop keys whose TTL horizon has passed; keep the
            # rest and re-arm for the next-earliest expiry.
            wm_ms = state.getCurrentWatermarkMs()
            live = sts + ttl_us >= wm_ms * 1000
            if live.any():
                state.update((su[live].tolist(), sts[live].tolist()))
                _rearm(state, sts[live], ttl_us, wm_ms)
            else:
                state.remove()
            yield pd.DataFrame(
                {
                    "user_id": np.zeros(0, np.int64),
                    "event_id": np.zeros(0, np.int64),
                    "ts_us": np.zeros(0, np.int64),
                }
            )
            return
        rows = pd.concat(list(pdfs), ignore_index=True)
        u = rows["user_id"].to_numpy(dtype=np.int64)
        ts = rows["ts_us"].to_numpy(dtype=np.int64)
        ids = rows["event_id"].to_numpy(dtype=np.int64)
        o = np.lexsort((ids, ts, u))
        u, ts, ids = u[o], ts[o], ids[o]
        # Previous same-key timestamp: within-batch predecessor, else the
        # state's last_ts for that key, else none.
        prev = np.full(len(u), -1, dtype=np.int64)
        same = np.concatenate(([False], u[1:] == u[:-1]))
        prev[same] = ts[np.flatnonzero(same) - 1]
        firsts = ~same
        if len(su):
            pos = np.searchsorted(su, u[firsts])
            pos_ok = (pos < len(su)) & (su[np.clip(pos, 0, len(su) - 1)] == u[firsts])
            fprev = np.full(int(firsts.sum()), -1, dtype=np.int64)
            fprev[pos_ok] = sts[pos[pos_ok]]
            prev[firsts] = fprev
        emit = (prev < 0) | (ts - prev > ttl_us)
        out = pd.DataFrame(
            {"user_id": u[emit], "event_id": ids[emit], "ts_us": ts[emit]}
        )
        # New state: per key the max ts (keep-alive refresh), merged over
        # state keys that saw no rows this batch.
        starts = np.flatnonzero(np.concatenate(([True], u[1:] != u[:-1])))
        bu = u[starts]
        bts = np.maximum.reduceat(ts, starts) if len(u) else ts
        if len(su):
            untouched = ~np.isin(su, bu)
            bu = np.concatenate([su[untouched], bu])
            bts = np.concatenate([sts[untouched], bts])
            o2 = np.argsort(bu)
            bu, bts = bu[o2], bts[o2]
        # TTL expiry under the watermark: keys whose last event is more
        # than the TTL below the watermark can never suppress again — drop
        # them (the state-size bound TTL exists for).
        wm_ms = state.getCurrentWatermarkMs()
        live = bts + ttl_us >= wm_ms * 1000
        bu, bts = bu[live], bts[live]
        if len(bu):
            _check_group_budget(len(bu), budget, "streaming_dedup_ttl")
            state.update((bu.tolist(), bts.tolist()))
            _rearm(state, bts, ttl_us, wm_ms)
        elif state.exists:
            state.remove()
        yield out

    grouped = stream.withColumn(
        "__kg",
        F.pmod(F.xxhash64("user_id"), F.lit(key_groups(stream.sparkSession))),
    )
    return grouped.groupBy("__kg").applyInPandasWithState(
        handler,
        out_schema,
        state_schema,
        "append",
        GroupStateTimeout.EventTimeTimeout,
    )


def streaming_absence_timeout(stream: DataFrame, window_us: int) -> DataFrame:
    """KEY-GROUP-SHARDED absence-until-horizon — the r9 successor to
    ``streaming_cep_timeout`` for NEW queries (the original stays
    untouched: its committed restore fixture pins the per-user grouping,
    and a checkpoint's grouping column is immutable, the same rule as the
    reference's maxParallelism).

    Same semantics: a 'click' row with NO strictly-later same-user
    'purchase' inside ``window_us`` is emitted once the watermark passes
    its deadline. The difference is the SHARDING: state groups by
    hash(user) % key_groups instead of by raw user, so a micro-batch
    costs O(key_groups) Arrow crossings instead of O(distinct users) —
    the same fix match_stream/stateful ops got in r5 (SCALE.md "Stateful
    key groups"; ~3ms per applyInPandas group measured there, fatal at
    1M users per batch)."""
    import numpy as np

    spark = stream.sparkSession
    g = key_groups(spark)
    budget = max_group_rows(spark)

    out_schema = "user_id long, click_id long, click_ts long, deadline long"
    # parallel arrays over BOTH kinds of pending rows: kind 0 = click
    # (awaiting completion/expiry), kind 1 = retained purchase
    state_schema = (
        "u array<long>, k array<long>, ids array<long>, eps array<long>"
    )

    ts_cols = [
        f.name for f in stream.schema.fields
        if f.dataType.simpleString() == "timestamp"
    ]
    if not ts_cols:
        raise ValueError(
            "streaming_absence_timeout: the input must carry its "
            "watermarked TIMESTAMP column (event-time timers need it)"
        )
    work = stream.select(
        F.pmod(F.xxhash64(F.col("user_id")), F.lit(g)).alias("__grp"),
        "user_id", "event_id", "ep", "event_type", ts_cols[0],
    )

    def handler(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            s_u, s_k, s_ids, s_eps = state.get
            u = np.asarray(s_u, dtype=np.int64)
            kind = np.asarray(s_k, dtype=np.int64)
            ids = np.asarray(s_ids, dtype=np.int64)
            eps = np.asarray(s_eps, dtype=np.int64)
        else:
            u = kind = ids = eps = np.empty(0, dtype=np.int64)
        if not state.hasTimedOut:
            rows = pd.concat(list(pdfs), ignore_index=True)
            if len(rows):
                u = np.concatenate(
                    [u, rows["user_id"].to_numpy(dtype=np.int64)]
                )
                kind = np.concatenate([
                    kind,
                    (rows["event_type"] == "purchase")
                    .to_numpy()
                    .astype(np.int64),
                ])
                ids = np.concatenate(
                    [ids, rows["event_id"].to_numpy(dtype=np.int64)]
                )
                eps = np.concatenate(
                    [eps, rows["ep"].to_numpy(dtype=np.int64)]
                )
        _check_group_budget(len(u), budget, "streaming_absence_timeout")
        wm_us = state.getCurrentWatermarkMs() * 1000

        # one lexsort over the whole shard (primary key LAST in numpy):
        # (user, kind, ep) — each user's clicks ep-ascending, then its
        # purchases ep-ascending, so the per-segment searchsorted below
        # sees sorted purchase times
        order = np.lexsort((eps, kind, u))
        u, kind, ids, eps = u[order], kind[order], ids[order], eps[order]

        out_u, out_id, out_ts = [], [], []
        keep_mask = np.zeros(len(u), dtype=bool)
        deadlines: list[int] = []
        i = 0
        n = len(u)
        while i < n:
            j = i
            while j < n and u[j] == u[i]:
                j += 1
            seg_kind = kind[i:j]
            c_sel = np.flatnonzero(seg_kind == 0) + i
            p_sel = np.flatnonzero(seg_kind == 1) + i
            c_eps, p_eps = eps[c_sel], eps[p_sel]
            # consume: first purchase strictly after the click in window
            live = np.ones(len(c_sel), dtype=bool)
            if len(p_eps) and len(c_eps):
                nxt = np.searchsorted(p_eps, c_eps, side="right")
                in_r = nxt < len(p_eps)
                hit = np.zeros(len(c_eps), dtype=bool)
                # strictly INSIDE the window (r12 — see
                # streaming_cep_timeout: at-deadline loses to timeout)
                hit[in_r] = p_eps[nxt[in_r]] < c_eps[in_r] + window_us
                live = ~hit
            # r12: wm >= deadline times out (NFA.isStateTimedOut at >=)
            expired = live & (c_eps + window_us <= wm_us)
            for ci in np.flatnonzero(expired):
                out_u.append(int(u[i]))
                out_id.append(int(ids[c_sel[ci]]))
                out_ts.append(int(c_eps[ci]))
            pend = live & ~expired
            keep_mask[c_sel[pend]] = True
            # retained purchases: only consumable by an unexpired click
            keep_mask[p_sel[p_eps > wm_us - window_us]] = True
            if pend.any():
                deadlines.append(int(c_eps[pend].min()) + window_us)
            if (p_eps > wm_us - window_us).any():
                deadlines.append(
                    int(p_eps[p_eps > wm_us - window_us].min()) + window_us
                )
            i = j
        if keep_mask.any():
            state.update((
                u[keep_mask].tolist(), kind[keep_mask].tolist(),
                ids[keep_mask].tolist(), eps[keep_mask].tolist(),
            ))
            if deadlines:
                state.setTimeoutTimestamp(max(
                    (min(deadlines) + 999) // 1000 - 1,  # fire at wm >= deadline
                    state.getCurrentWatermarkMs() + 1,
                ))
        elif state.exists:
            state.remove()
        yield pd.DataFrame({
            "user_id": pd.array(out_u, dtype="int64"),
            "click_id": pd.array(out_id, dtype="int64"),
            "click_ts": pd.array(out_ts, dtype="int64"),
            "deadline": pd.array(
                [t + window_us for t in out_ts], dtype="int64"
            ),
        })

    return work.groupBy("__grp").applyInPandasWithState(
        handler,
        out_schema,
        state_schema,
        "append",
        GroupStateTimeout.EventTimeTimeout,
    )
