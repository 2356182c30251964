"""Shared driving code for the cross-version checkpoint-restore fixtures
(reference restore-tests analog, VERDICT r5 item #3: one committed
checkpoint per custom stateful operator, restored by every later build).

Each op entry defines:
  - ``schema``: the JSON file-source schema;
  - ``build(raw)``: wraps the file-source DataFrame into the operator's
    streaming output (the SAME wiring the registered query uses);
  - ``batch1`` / ``batch2``: input rows (batch1 is committed into the
    fixture checkpoint; batch2 runs on restore);
  - ``expect_restored(rows)``: asserts batch-2 output that only the
    RESTORED batch-1 state can produce (a cold start fails it).

Used by scripts/make_restore_fixtures_r6.py (generation) and
tests/test_restore_compat.py (the restore gate).
"""

from __future__ import annotations

from pyspark.sql import functions as F

GAP_US = 30 * 60 * 1_000_000  # session gap: 30 minutes
WINDOW_ROWS = 3


def _topn_build(raw):
    from apache_flink_spark.streaming.stateful import streaming_topn_by_value

    return streaming_topn_by_value(
        raw.select("user_id", "event_id", "value"), 3
    ), "update"


def _topn_expect(rows):
    got = sorted((r.user_id, r.event_id, r.rn) for r in rows)
    # Restored state holds 101/102/103 (values 10/9/8); batch-2's 104
    # (value 1.0) must NOT displace them. A cold start would emit 104 as
    # rank 1 and know nothing of 101-103.
    assert got == [(1, 101, 1), (1, 102, 2), (1, 103, 3)], got


def _temporal_build(raw):
    from apache_flink_spark.streaming.stateful import streaming_temporal_join

    views = (
        raw.filter(F.col("side") == 0)
        .select("user_id", "event_id", "ts", "side")
        .withWatermark("ts", "1 hour")
    )
    clicks = (
        raw.filter(F.col("side") == 1)
        .select("user_id", "event_id", "ts", "side")
        .withWatermark("ts", "1 hour")
    )
    tagged = views.unionByName(clicks).select(
        "user_id", "side", "event_id",
        F.unix_micros("ts").alias("ts_us"), "ts",
    )
    return streaming_temporal_join(tagged), "append"


def _temporal_expect(rows):
    got = {(r.user_id, r.click_id): r.view_event_id for r in rows}
    # Click 900 (user 1, 10:30) must join to version 500 (10:00) that
    # ONLY the restored build-side state contains; cold start -> NULL.
    assert got.get((1, 900)) == 500, got


def _session_build(raw):
    from apache_flink_spark.streaming.stateful import (
        streaming_session_changelog,
    )

    stream = raw.withWatermark("ts", "1 hour").select(
        "user_id", F.unix_micros("ts").alias("ts_us"), "ts"
    )
    return streaming_session_changelog(stream, GAP_US), "append"


_NOON_US = None  # filled lazily from the fixture rows


def _session_expect(rows):
    import datetime

    noon = int(
        datetime.datetime(
            2024, 1, 1, 12, 0, tzinfo=datetime.timezone.utc
        ).timestamp() * 1_000_000
    )
    got = {
        (r.user_id, r.op): (r.sess_start, r.n_events)
        for r in rows
        if r.user_id == 1
    }
    # Batch-2's 12:15 event bridges into the RESTORED open session
    # [12:00, 12:10] -> the upsert must carry sess_start=12:00, n=3.
    # Cold start would open a fresh session at 12:15 with n=1.
    assert got.get((1, "U")) == (noon, 3), got


def _over_build(raw):
    from apache_flink_spark.streaming.stateful import (
        streaming_rows_bounded_over,
    )

    u = raw.select(
        "user_id", "event_id", F.unix_micros("ts").alias("ts_us"), "value"
    )
    return streaming_rows_bounded_over(u, WINDOW_ROWS), "append"


def _over_expect(rows):
    got = {(r.user_id, r.event_id): (r.w_cnt, r.w_sum_cents) for r in rows}
    # Event 204's 3-row window spans the RESTORED deque (values 2.0, 3.0)
    # plus itself (4.0) -> cnt=3, sum=900 cents. Cold start: cnt=1.
    assert got.get((1, 204)) == (3, 900), got


def _keeplast_build(raw):
    from apache_flink_spark.streaming.stateful import streaming_keep_last

    return streaming_keep_last(
        raw.select(
            "user_id", "event_type", "event_id",
            F.unix_micros("ts").alias("ts_us"),
        )
    ), "update"


def _keeplast_expect(rows):
    import datetime

    ten = int(
        datetime.datetime(
            2024, 1, 1, 10, 0, tzinfo=datetime.timezone.utc
        ).timestamp() * 1_000_000
    )
    got = {(r.user_id, r.event_type): (r.event_id, r.ts_us) for r in rows}
    # Batch-2's event 90 is OLDER (09:00) than the restored best (101 at
    # 10:00) — keep-last must re-emit 101. A cold start knows only 90.
    assert got.get((1, "click")) == (101, ten), got


def _tsort_build(raw):
    from apache_flink_spark.streaming.stateful import streaming_temporal_sort

    stream = raw.withWatermark("ts", "1 hour").select(
        "user_id", "event_id", F.unix_micros("ts").alias("ts_us"), "ts"
    )
    return streaming_temporal_sort(stream), "append"


def _tsort_expect(rows):
    got = sorted(
        (r.seq, r.event_id) for r in rows if r.user_id == 1
    )
    # Batch-2's far-future row advances the watermark past user 1's
    # RESTORED buffer (302@10:00, 301@10:05, arrival-reversed) -> the
    # event-time timer releases them in ts order with seq 1,2. A cold
    # start has no user-1 rows at all.
    assert got == [(1, 302), (2, 301)], got


def _rover_build(raw):
    from apache_flink_spark.streaming.stateful import (
        streaming_range_bounded_over,
    )

    u = raw.select(
        "user_id", "event_id", F.unix_micros("ts").alias("ts_us"), "value"
    )
    return streaming_range_bounded_over(u, 3_600_000_000), "append"


def _rover_expect(rows):
    got = {(r.user_id, r.event_id): (r.w_cnt, r.w_sum_cents) for r in rows}
    # Event 403's 1-hour RANGE frame [10:00, 11:00] spans the RESTORED
    # trailing buffer (100 + 200 cents) plus itself (400) -> cnt=3,
    # sum=700. Cold start: cnt=1, sum=400.
    assert got.get((1, 403)) == (3, 700), got


def _ceptimeout_build(raw):
    from apache_flink_spark.streaming.stateful import streaming_cep_timeout

    u = (
        raw.filter(F.col("event_type").isin("click", "purchase"))
        .withWatermark("ts", "1 hour")
        .select(
            "user_id", F.unix_micros("ts").alias("ep"),
            "event_id", "event_type", "ts",
        )
    )
    return streaming_cep_timeout(u, 30 * 60 * 1_000_000), "append"


def _ceptimeout_expect(rows):
    got = {r.user_id: (r.click_id, r.deadline - r.click_ts) for r in rows}
    # Batch-2's watermark advancer expires the RESTORED pending click 601
    # (10:00, never purchased) -> timeout row with the 30-min deadline.
    # A cold start has no pending click to expire.
    assert got.get(1) == (601, 30 * 60 * 1_000_000), got


def _csession_build(raw):
    from apache_flink_spark.streaming.stateful import (
        streaming_custom_sessions,
    )

    # Same wiring as the registered stream_custom_sessions query: the
    # watermark delay exceeds the data span, so sessions close by GAP
    # (a later same-user event), not by timer.
    stream = raw.withWatermark("ts", "10000 hours").select(
        "user_id", F.unix_micros("ts").alias("ts_us"), "ts"
    )
    return streaming_custom_sessions(stream, GAP_US), "append"


def _csession_expect(rows):
    import datetime

    noon = int(
        datetime.datetime(
            2024, 1, 1, 12, 0, tzinfo=datetime.timezone.utc
        ).timestamp() * 1_000_000
    )
    got = {r.user_id: (r.sess_start, r.n_events) for r in rows}
    # Batch-2's 12:15 event extends the RESTORED open session [12:00,
    # 12:10]; the 14:00 event then closes it by gap -> (start=12:00, n=3).
    # Cold start: the closed session would be (12:15, n=1).
    assert got.get(1) == (noon, 3), got


def _match_build(raw):
    from apache_flink_spark.streaming.match_stream import (
        streaming_match_recognize,
    )

    s = raw.withWatermark("ts", "1 hour").select(
        "user_id", "event_id", "kind",
        F.unix_micros("ts").alias("ep"), "ts",
    )
    out = streaming_match_recognize(
        s,
        """
        PARTITION BY user_id
        ORDER BY ep, event_id
        MEASURES A.event_id AS a_id, B.event_id AS b_id
        ONE ROW PER MATCH
        AFTER MATCH SKIP PAST LAST ROW
        PATTERN (A B)
        DEFINE A AS A.kind = 'a',
               B AS B.kind = 'b'
        """,
    )
    return out, "append"


def _match_expect(rows):
    got = {(r.user_id): (r.a_id, r.b_id) for r in rows if r.user_id == 1}
    # Batch-2's B row (12) completes the pattern with the A row (11) that
    # ONLY the restored NFA buffer contains — a cold start sees a lone B
    # and emits nothing for user 1.
    assert got.get(1) == (11, 12), got


def _matchx_build(raw):
    """r7: cross-variable bind + PREV navigation in the streaming NFA —
    the restored state must carry the bound A row for LAST(A.v) AND the
    physical predecessor for PREV(B.v)."""
    from apache_flink_spark.streaming.match_stream import (
        streaming_match_recognize,
    )

    s = raw.withWatermark("ts", "1 hour").select(
        "user_id", "event_id", "kind", "v",
        F.unix_micros("ts").alias("ep"), "ts",
    )
    out = streaming_match_recognize(
        s,
        """
        PARTITION BY user_id
        ORDER BY ep, event_id
        MEASURES A.event_id AS a_id, B.event_id AS b_id,
                 LAST(A.v) AS a_val
        ONE ROW PER MATCH
        AFTER MATCH SKIP PAST LAST ROW
        PATTERN (A B)
        DEFINE A AS A.kind = 1,
               B AS B.v > LAST(A.v) AND B.v > PREV(B.v)
        """,
    )
    return out, "append"


def _matchx_expect(rows):
    got = {(r.user_id): (r.a_id, r.b_id, r.a_val) for r in rows
           if r.user_id == 1}
    # Batch-2's B row (v=15) must see LAST(A.v)=10 from the RESTORED
    # buffer (and PREV(B.v) = the same physical A row); a cold start has
    # neither and emits nothing for user 1.
    assert got.get(1) == (11, 12, 10), got



def _matchmn_build(raw):
    """r9: streaming MATCH_NUMBER — the per-key counter persists as a
    sentinel row in the existing state arrays (match_stream._MN_BIT); a
    restored build must continue numbering where the fixture stopped."""
    from apache_flink_spark.streaming.match_stream import (
        streaming_match_recognize,
    )

    s = raw.withWatermark("ts", "1 hour").select(
        "user_id", "event_id", "kind",
        F.unix_micros("ts").alias("ep"), "ts",
    )
    out = streaming_match_recognize(
        s,
        """
        PARTITION BY user_id
        ORDER BY ep, event_id
        MEASURES A.event_id AS a_id, B.event_id AS b_id,
                 MATCH_NUMBER() AS mno
        ONE ROW PER MATCH
        AFTER MATCH SKIP PAST LAST ROW
        PATTERN (A B)
        DEFINE A AS A.kind = 'a',
               B AS B.kind = 'b'
        """,
    )
    return out, "append"


def _matchmn_expect(rows):
    got = {r.user_id: (r.a_id, r.b_id, r.mno) for r in rows
           if r.user_id == 1}
    # The fixture checkpoint already numbered user 1's first match (the
    # sentinel-row counter holds 1); batch-2's match must be NUMBER 2.
    # A cold start would number it 1.
    assert got.get(1) == (13, 14, 2), got


def _matchrl_build(raw):
    """r9: streaming relaxed loop (CEP Pattern API default — the
    gap-interleaved X (G*? X)* compile with multi-match prefix
    emission); the restored NFA buffer must carry the in-flight loop
    start."""
    from apache_flink_spark.cep import Pattern, cep_select_stream

    s = raw.withWatermark("ts", "1 hour").select(
        "user_id", "event_id",
        F.when(F.col("kind") == "a", F.lit(1))
        .otherwise(F.lit(0)).cast("bigint").alias("is_a"),
        F.when(F.col("kind") == "b", F.lit(1))
        .otherwise(F.lit(0)).cast("bigint").alias("is_b"),
        F.unix_micros("ts").alias("ep"), "ts",
    )
    p = (
        Pattern.begin("A").where("is_a = 1").one_or_more()
        .followed_by("B").where("is_b = 1")
        .within(1, "hours")
    )
    out = cep_select_stream(
        s, p, "user_id", "ep, event_id",
        {
            "n_a": "COUNT(A.*)",
            "first_a": "FIRST(A.event_id)",
            "b_id": "LAST(B.event_id)",
        },
    )
    return out, "append"


def _matchrl_expect(rows):
    got = sorted(
        (r.n_a, r.first_a, r.b_id) for r in rows if r.user_id == 1
    )
    # Prefix family anchored at the RESTORED row 11: [11]+b and
    # [11,12]+b exist only if the fixture's buffered loop start
    # survived; a cold start sees only start 12.
    assert got == [(1, 11, 13), (1, 12, 13), (2, 11, 13)], got


OPS = {
    "topn": {
        "schema": "user_id long, event_id long, value double",
        "build": _topn_build,
        "batch1": [
            {"user_id": 1, "event_id": 101, "value": 10.0},
            {"user_id": 1, "event_id": 102, "value": 9.0},
            {"user_id": 1, "event_id": 103, "value": 8.0},
        ],
        "batch2": [{"user_id": 1, "event_id": 104, "value": 1.0}],
        "expect_restored": _topn_expect,
    },
    "temporal": {
        "schema": "user_id long, event_id long, ts timestamp, side int",
        "build": _temporal_build,
        # batch 1: the versioned build row only — pure state, no output.
        "batch1": [
            {"user_id": 1, "event_id": 500,
             "ts": "2024-01-01 10:00:00", "side": 0},
        ],
        # batch 2: the probe + watermark advancers on BOTH sides (the
        # global watermark is the min over sources).
        "batch2": [
            {"user_id": 1, "event_id": 900,
             "ts": "2024-01-01 10:30:00", "side": 1},
            {"user_id": 99, "event_id": 501,
             "ts": "2024-01-02 23:00:00", "side": 0},
            {"user_id": 99, "event_id": 901,
             "ts": "2024-01-02 23:00:00", "side": 1},
        ],
        "expect_restored": _temporal_expect,
    },
    "session": {
        "schema": "user_id long, ts timestamp",
        "build": _session_build,
        "batch1": [
            {"user_id": 1, "ts": "2024-01-01 12:00:00"},
            {"user_id": 1, "ts": "2024-01-01 12:10:00"},
        ],
        "batch2": [
            {"user_id": 1, "ts": "2024-01-01 12:15:00"},
            {"user_id": 99, "ts": "2024-01-02 23:00:00"},
        ],
        "expect_restored": _session_expect,
    },
    "over": {
        "schema": "user_id long, event_id long, ts timestamp, value double",
        "build": _over_build,
        "batch1": [
            {"user_id": 1, "event_id": 201,
             "ts": "2024-01-01 10:00:00", "value": 1.0},
            {"user_id": 1, "event_id": 202,
             "ts": "2024-01-01 10:05:00", "value": 2.0},
            {"user_id": 1, "event_id": 203,
             "ts": "2024-01-01 10:10:00", "value": 3.0},
        ],
        "batch2": [
            {"user_id": 1, "event_id": 204,
             "ts": "2024-01-01 10:15:00", "value": 4.0},
        ],
        "expect_restored": _over_expect,
    },
    "keeplast": {
        "schema": (
            "user_id long, event_type string, event_id long, ts timestamp"
        ),
        "build": _keeplast_build,
        "batch1": [
            {"user_id": 1, "event_type": "click", "event_id": 101,
             "ts": "2024-01-01 10:00:00"},
        ],
        "batch2": [
            {"user_id": 1, "event_type": "click", "event_id": 90,
             "ts": "2024-01-01 09:00:00"},
        ],
        "expect_restored": _keeplast_expect,
    },
    "tsort": {
        "schema": "user_id long, event_id long, ts timestamp",
        "build": _tsort_build,
        # batch 1: two out-of-order user-1 rows, watermark behind both —
        # pure buffer state, no output.
        "batch1": [
            {"user_id": 1, "event_id": 301, "ts": "2024-01-01 10:05:00"},
            {"user_id": 1, "event_id": 302, "ts": "2024-01-01 10:00:00"},
        ],
        # batch 2: a far-future watermark advancer on another key.
        "batch2": [
            {"user_id": 99, "event_id": 999, "ts": "2024-01-02 23:00:00"},
        ],
        "expect_restored": _tsort_expect,
    },
    "rover": {
        "schema": "user_id long, event_id long, ts timestamp, value double",
        "build": _rover_build,
        "batch1": [
            {"user_id": 1, "event_id": 401,
             "ts": "2024-01-01 10:00:00", "value": 1.0},
            {"user_id": 1, "event_id": 402,
             "ts": "2024-01-01 10:30:00", "value": 2.0},
        ],
        "batch2": [
            {"user_id": 1, "event_id": 403,
             "ts": "2024-01-01 11:00:00", "value": 4.0},
        ],
        "expect_restored": _rover_expect,
    },
    "ceptimeout": {
        "schema": (
            "user_id long, event_id long, event_type string, ts timestamp"
        ),
        "build": _ceptimeout_build,
        # batch 1: a lone click — a pending partial match, no output.
        "batch1": [
            {"user_id": 1, "event_id": 601, "event_type": "click",
             "ts": "2024-01-01 10:00:00"},
        ],
        # batch 2: a far-future click on another key advances the
        # watermark past click 601's 30-min window.
        "batch2": [
            {"user_id": 99, "event_id": 998, "event_type": "click",
             "ts": "2024-01-02 23:00:00"},
        ],
        "expect_restored": _ceptimeout_expect,
    },
    "csession": {
        "schema": "user_id long, ts timestamp",
        "build": _csession_build,
        "batch1": [
            {"user_id": 1, "ts": "2024-01-01 12:00:00"},
            {"user_id": 1, "ts": "2024-01-01 12:10:00"},
        ],
        "batch2": [
            {"user_id": 1, "ts": "2024-01-01 12:15:00"},
            {"user_id": 1, "ts": "2024-01-01 14:00:00"},
        ],
        "expect_restored": _csession_expect,
    },
    "match": {
        "schema": "user_id long, event_id long, kind string, ts timestamp",
        "build": _match_build,
        # batch 1: the A row alone — uncertified (watermark behind it),
        # pure NFA-buffer state, no output.
        "batch1": [
            {"user_id": 1, "event_id": 11, "kind": "a",
             "ts": "2024-01-01 10:00:00"},
        ],
        # batch 2: the completing B row + a far-future watermark advancer
        # that certifies user 1's prefix.
        "batch2": [
            {"user_id": 1, "event_id": 12, "kind": "b",
             "ts": "2024-01-01 10:05:00"},
            {"user_id": 99, "event_id": 98, "kind": "a",
             "ts": "2024-01-02 23:00:00"},
        ],
        "expect_restored": _match_expect,
    },
    "matchx": {
        "schema": (
            "user_id long, event_id long, kind long, v long, ts timestamp"
        ),
        "build": _matchx_build,
        # batch 1: the A row alone (uncertified partial match).
        "batch1": [
            {"user_id": 1, "event_id": 11, "kind": 1, "v": 10,
             "ts": "2024-01-01 10:00:00"},
        ],
        # batch 2: the completing B row (v>LAST(A.v) and v>PREV) + a
        # far-future watermark advancer certifying user 1's prefix.
        "batch2": [
            {"user_id": 1, "event_id": 12, "kind": 0, "v": 15,
             "ts": "2024-01-01 10:05:00"},
            {"user_id": 99, "event_id": 98, "kind": 1, "v": 1,
             "ts": "2024-01-02 23:00:00"},
        ],
        "expect_restored": _matchx_expect,
    },
    "matchmn": {
        "schema": "user_id long, event_id long, kind string, ts timestamp",
        "build": _matchmn_build,
        # batch 1: one COMPLETE match (a, b) + a watermark advancer that
        # certifies and decides it — the checkpoint persists the
        # MATCH_NUMBER sentinel at 1.
        "batch1": [
            {"user_id": 1, "event_id": 11, "kind": "a",
             "ts": "2024-01-01 10:00:00"},
            {"user_id": 1, "event_id": 12, "kind": "b",
             "ts": "2024-01-01 10:05:00"},
            {"user_id": 99, "event_id": 98, "kind": "a",
             "ts": "2024-01-01 13:00:00"},
        ],
        # batch 2: a second complete match + a far advancer.
        "batch2": [
            {"user_id": 1, "event_id": 13, "kind": "a",
             "ts": "2024-01-01 14:00:00"},
            {"user_id": 1, "event_id": 14, "kind": "b",
             "ts": "2024-01-01 14:05:00"},
            {"user_id": 99, "event_id": 97, "kind": "a",
             "ts": "2024-01-02 23:00:00"},
        ],
        "expect_restored": _matchmn_expect,
    },
    "matchrl": {
        "schema": "user_id long, event_id long, kind string, ts timestamp",
        "build": _matchrl_build,
        # batch 1: a lone loop start (uncertified) — pure NFA buffer.
        "batch1": [
            {"user_id": 1, "event_id": 11, "kind": "a",
             "ts": "2024-01-01 10:00:00"},
        ],
        # batch 2: a second loop row + the completing b inside row 11's
        # 1-hour horizon, + an advancer pushing the watermark past it.
        "batch2": [
            {"user_id": 1, "event_id": 12, "kind": "a",
             "ts": "2024-01-01 10:10:00"},
            {"user_id": 1, "event_id": 13, "kind": "b",
             "ts": "2024-01-01 10:20:00"},
            {"user_id": 99, "event_id": 98, "kind": "a",
             "ts": "2024-01-02 23:00:00"},
        ],
        "expect_restored": _matchrl_expect,
    },
}


def run_from(spark, op: str, fix_dir: str, out_dir: str) -> None:
    """Run the op's streaming query over <fix_dir>/input with the
    checkpoint at <fix_dir>/ckpt, logging emissions to out_dir parquet."""
    from apache_flink_spark.streaming.stateful import pin_key_groups

    spec = OPS[op]
    pin_key_groups(spark, f"{fix_dir}/ckpt")
    raw = (
        spark.readStream.schema(spec["schema"])
        .option("maxFilesPerTrigger", "10")
        .json(f"{fix_dir}/input")
    )
    out, mode = spec["build"](raw)

    def sink(batch, batch_id):
        batch.withColumn("__batch_id", F.lit(batch_id)).write.mode(
            "append"
        ).parquet(out_dir)

    (
        out.writeStream.outputMode(mode)
        .foreachBatch(sink)
        .option("checkpointLocation", f"{fix_dir}/ckpt")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
