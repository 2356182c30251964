"""Verbatim harvest of the reference's streaming WindowAggregateITCase
(r13 — VERDICT r12 next-item #1's top-priority suite: session/cumulate
emission, late-data, changelog inputs).

Reference: flink-table/flink-table-planner/src/test/scala/org/apache/
flink/table/planner/runtime/stream/sql/WindowAggregateITCase.scala
(:line cited per pin); input data TestData.scala:737
(windowDataWithTimestamp) and :786 (windowChangelogDataWithTimestamp),
both with ``WATERMARK FOR rowtime AS rowtime - INTERVAL '1' SECOND``
emitted per element.

Window assignment + late-data semantics run through the production
arrival module (streaming/arrival.py): per-(row, window) late drops for
the slicing windows (an element keeps every assigned window whose end is
still above the watermark — the ts-00:00:04 late row loses its
[00:00, 00:00:05) tumble slice at watermark 00:00:07 but keeps its
[00:00, 00:00:10) hop window), and the session proto-window rule
([ts, ts+gap) vs watermark) with per-key merging. The aggregation SQL
itself is the suite's, run on the exploded (row, window) pairs.

CDC sources apply the reference's retract-aggregate semantics: the
net row multiset per window (delete cancels one matching row by VALUE,
not by its own timestamp — the -D at :805 ts-00:00:03 removes the Hi row
inserted at ts-00:00:01); the slicing-retract test (:1140) pins the
SIGNED forms (COUNT(*) can go NEGATIVE: -1).

Tally (33 @TestTemplate methods):
  - 32 pinned below,
  - 1 n/a: testRelaxFormProctimeCascadeWindowAgg:992 — the reference
    itself does NOT verify its result ("proctime window aggregate result
    is non-deterministic"); nothing to pin.
  - The useTimestampLtz=true parameterization (same expectations shifted
    to Z-suffixed instants) is covered-by-variant: the TIMESTAMP flavor
    is pinned.

concat_distinct_agg (a Java UDAF: '|'-joined distinct strings) is
expressed as its defining expression; its element ORDER in HOP/CUMULATE
windows is a slice-merge artifact in the reference (e.g.
"Comment#2|Hi|Comment#1" at :84), so BOTH sides are compared with the
'|'-parts sorted.
"""

from __future__ import annotations

import datetime
import decimal

import pytest

from apache_flink_spark.streaming.arrival import (
    cumulate,
    hop,
    session_windows,
    surviving_windows,
    tumble,
)
from tests.itcase_utils import flink_val

UTC = datetime.timezone.utc
BASE = int(
    datetime.datetime(2020, 10, 10, tzinfo=UTC).timestamp() * 1000
)

SEC = 1000
MIN5 = 5 * SEC
HOUR = 3600 * SEC
DAY = 24 * HOUR

# TestData.scala:737 windowDataWithTimestamp —
# (second-of-day, int, double, float, bigdec, string, name)
WINDOW_DATA = [
    (1, 1, 1.0, 1.0, "1.11", "Hi", "a"),
    (2, 2, 2.0, 2.0, "2.22", "Comment#1", "a"),
    (3, 2, 2.0, 2.0, "2.22", "Comment#1", "a"),
    (4, 5, 5.0, 5.0, "5.55", None, "a"),
    (7, 3, 3.0, 3.0, None, "Hello", "b"),
    (6, 6, 6.0, 6.0, "6.66", "Hi", "b"),  # out of order
    (8, 3, None, 3.0, "3.33", "Comment#2", "a"),
    (4, 5, 5.0, None, "5.55", "Hi", "a"),  # late event
    (16, 4, 4.0, 4.0, "4.44", "Hi", "b"),
    (32, 7, 7.0, 7.0, "7.77", None, None),
    (34, 1, 3.0, 3.0, "3.33", "Comment#3", "b"),
]

# TestData.scala:786 windowChangelogDataWithTimestamp —
# (kind, second-of-day, int, double, float, bigdec, string, name)
WINDOW_CDC_DATA = [
    ("+I", 1, 1, 1.0, 1.0, "1.11", "Hi", "a"),
    ("+I", 2, 2, 2.0, 2.0, "2.22", "Comment#1", "a"),
    ("-D", 3, 1, 1.0, 1.0, "1.11", "Hi", "a"),
    ("+I", 3, 2, 2.0, 2.0, "2.22", "Comment#1", "a"),
    ("+I", 4, 5, 5.0, 5.0, "5.55", None, "a"),
    ("-U", 4, 2, 2.0, 2.0, "2.22", "Comment#1", "a"),
    ("+U", 4, 22, 22.0, 22.2, "22.22", "Comment#22", "a"),
    ("+I", 7, 3, 3.0, 3.0, None, "Hello", "b"),
    ("+I", 6, 6, 6.0, 6.0, "6.66", "Hi", "b"),  # out of order
    ("+I", 8, 3, None, 3.0, "3.33", "Comment#2", "a"),
    ("+I", 4, 5, 5.0, None, "5.55", "Hi", "a"),  # late insert event
    ("+I", 16, 4, 4.0, 4.0, "4.44", "Hi", "b"),
    ("-D", 4, 5, 5.0, 5.0, "5.55", None, "a"),  # late delete event
    ("+I", 38, 8, 8.0, 8.0, "8.88", "Comment#4", "b"),
    ("-D", 39, 8, 8.0, 8.0, "8.88", "Comment#4", "b"),
]

SCHEMA = (
    "`int` int, `double` double, `float` float, bigdec decimal(10,2), "
    "string string, name string, rowtime timestamp, "
    "window_start timestamp, window_end timestamp, window_time timestamp"
)

# the suite's aggregate list, with concat_distinct_agg expressed as its
# defining expression ('|'-joined distinct, null when no strings;
# sorted — see module docstring on slice-merge ordering)
AGGS = (
    "COUNT(*), SUM(`bigdec`), MAX(`double`), MIN(`float`), "
    "COUNT(DISTINCT `string`), "
    "CASE WHEN count(`string`) = 0 THEN CAST(NULL AS STRING) "
    "ELSE array_join(array_sort(array_distinct(collect_list(`string`))), "
    "'|') END"
)


def _seq(rows=WINDOW_DATA):
    """The per-element bounded watermark interleaving (rowtime - 1s)."""
    out = []
    for r in rows:
        ts = BASE + r[0] * SEC
        out.append(("row", ts, r[1:]))
        out.append(("wm", ts - SEC))
    return out


def _cdc_seq():
    out = []
    for r in WINDOW_CDC_DATA:
        ts = BASE + r[1] * SEC
        out.append(("row", ts, (r[0],) + r[2:]))
        out.append(("wm", ts - SEC))
    return out


def _dt(ms):
    return datetime.datetime.fromtimestamp(ms / 1000, tz=UTC).replace(
        tzinfo=None
    )


def _make_row(payload, ts, ws, we):
    i, d, f, bd, s, n = payload
    return (
        i, d, f,
        None if bd is None else decimal.Decimal(bd),
        s, n, _dt(ts), _dt(ws), _dt(we), _dt(we - 1),
    )


def _win_view(tenv, assigner, name="W"):
    pairs = surviving_windows(_seq(), assigner)
    rows = [_make_row(p, ts, ws, we) for ts, p, _i, ws, we in pairs]
    df = tenv.spark.createDataFrame(rows, SCHEMA)
    df.createOrReplaceTempView(name)


def _cdc_win_view(tenv, assigner, name="W"):
    """Net row multiset per window: deletes cancel one matching row by
    VALUE (the reference's retract-aggregate input)."""
    pairs = surviving_windows(_cdc_seq(), assigner)
    net: dict = {}
    for ts, p, _i, ws, we in pairs:
        kind, row = p[0], p[1:]
        bucket = net.setdefault((ws, we), [])
        if kind in ("+I", "+U"):
            bucket.append((row, ts))
        else:
            for k, (r, _t) in enumerate(bucket):
                if r == row:
                    del bucket[k]
                    break
            else:
                bucket.append((("__NEG__",) + row, ts))
    rows = []
    for (ws, we), items in net.items():
        for row, ts in items:
            assert row[0] != "__NEG__", "net-negative needs the signed pin"
            rows.append(_make_row(row, ts, ws, we))
    df = tenv.spark.createDataFrame(rows, SCHEMA)
    df.createOrReplaceTempView(name)


def _session_view(tenv, gap_ms, cdc=False, name="W"):
    if cdc:
        pairs = session_windows(
            _cdc_seq(), gap_ms, key_fn=lambda p: p[6]
        )
        net: dict = {}
        for ts, p, _i, ws, we in pairs:
            kind, row = p[0], p[1:]
            bucket = net.setdefault((row[5], ws, we), [])
            if kind in ("+I", "+U"):
                bucket.append((row, ts))
            else:
                for k, (r, _t) in enumerate(bucket):
                    if r == row:
                        del bucket[k]
                        break
        rows = [
            _make_row(row, ts, ws, we)
            for (_n, ws, we), items in net.items()
            for row, ts in items
        ]
    else:
        pairs = session_windows(_seq(), gap_ms, key_fn=lambda p: p[5])
        rows = [_make_row(p, ts, ws, we) for ts, p, _i, ws, we in pairs]
    df = tenv.spark.createDataFrame(rows, SCHEMA)
    df.createOrReplaceTempView(name)


def sort_concat(expected):
    """Sort the trailing '|'-joined field of each expected row string
    (slice-merge ordering artifact — module docstring)."""
    out = []
    for line in expected:
        head, _, last = line.rpartition(",")
        if last != "null" and not last.replace(".", "").replace(
            "-", ""
        ).isdigit():
            last = "|".join(sorted(last.split("|")))
        out.append(f"{head},{last}")
    return sorted(out)


def rows_str(df):
    return sorted(
        ",".join(flink_val(v) for v in row) for row in df.collect()
    )


@pytest.fixture(scope="module")
def tenv(spark):
    from apache_flink_spark.environment import TableEnvironment

    return TableEnvironment(spark=spark)


GROUP_SQL = (
    "SELECT `name`, window_start, window_end, " + AGGS +
    " FROM W GROUP BY `name`, window_start, window_end"
)

TUMBLE_EXPECTED = [
    "a,2020-10-10T00:00,2020-10-10T00:00:05,4,11.10,5.0,1.0,2,Hi|Comment#1",
    "a,2020-10-10T00:00:05,2020-10-10T00:00:10,1,3.33,null,3.0,1,Comment#2",
    "b,2020-10-10T00:00:05,2020-10-10T00:00:10,2,6.66,6.0,3.0,2,Hello|Hi",
    "b,2020-10-10T00:00:15,2020-10-10T00:00:20,1,4.44,4.0,4.0,1,Hi",
    "b,2020-10-10T00:00:30,2020-10-10T00:00:35,1,3.33,3.0,3.0,1,Comment#3",
    "null,2020-10-10T00:00:30,2020-10-10T00:00:35,1,7.77,7.0,7.0,0,null",
]


def test_event_time_tumble_window(tenv):
    """:214 — the late ts-00:00:04 row is dropped from its (already
    fired) tumble slice."""
    _win_view(tenv, tumble(MIN5))
    assert rows_str(tenv.sql(GROUP_SQL)) == sort_concat(TUMBLE_EXPECTED)


def test_event_time_tumble_window_with_offset(tenv):
    """:249 — 1-day tumble at +8h: the late row's window has not fired,
    so it IS included (count 6 for a)."""
    _win_view(tenv, tumble(DAY, 8 * HOUR))
    assert rows_str(tenv.sql(GROUP_SQL)) == sort_concat([
        "a,2020-10-09T08:00,2020-10-10T08:00,6,19.98,5.0,1.0,3,"
        "Hi|Comment#1|Comment#2",
        "b,2020-10-09T08:00,2020-10-10T08:00,4,14.43,6.0,3.0,3,"
        "Hello|Hi|Comment#3",
        "null,2020-10-09T08:00,2020-10-10T08:00,1,7.77,7.0,7.0,0,null",
    ])


def test_cascade_event_time_tumble_window_with_offset(tenv):
    """:281 — window agg over a window agg (cascade)."""
    _win_view(tenv, tumble(DAY, 8 * HOUR))
    out = tenv.sql(
        "SELECT cnt, window_start, window_end, COUNT(*) FROM ("
        "  SELECT `name`, window_start, window_end, "
        "  COUNT(DISTINCT `string`) AS cnt FROM W "
        "  GROUP BY `name`, window_start, window_end"
        ") GROUP BY cnt, window_start, window_end"
    )
    assert rows_str(out) == sorted([
        "0,2020-10-09T08:00,2020-10-10T08:00,1",
        "3,2020-10-09T08:00,2020-10-10T08:00,2",
    ])


def test_event_time_tumble_window_with_negative_offset(tenv):
    """:313"""
    _win_view(tenv, tumble(DAY, -8 * HOUR))
    assert rows_str(tenv.sql(GROUP_SQL)) == sort_concat([
        "a,2020-10-09T16:00,2020-10-10T16:00,6,19.98,5.0,1.0,3,"
        "Hi|Comment#1|Comment#2",
        "b,2020-10-09T16:00,2020-10-10T16:00,4,14.43,6.0,3.0,3,"
        "Hello|Hi|Comment#3",
        "null,2020-10-09T16:00,2020-10-10T16:00,1,7.77,7.0,7.0,0,null",
    ])


# WindowAggregateITCase.scala:57 TumbleWindowGroupSetExpectedData
TUMBLE_GS_EXPECTED = [
    "0,a,2020-10-10T00:00,2020-10-10T00:00:05,4,11.10,5.0,1.0,2,Hi|Comment#1",
    "0,a,2020-10-10T00:00:05,2020-10-10T00:00:10,1,3.33,null,3.0,1,Comment#2",
    "0,b,2020-10-10T00:00:05,2020-10-10T00:00:10,2,6.66,6.0,3.0,2,Hello|Hi",
    "0,b,2020-10-10T00:00:15,2020-10-10T00:00:20,1,4.44,4.0,4.0,1,Hi",
    "0,b,2020-10-10T00:00:30,2020-10-10T00:00:35,1,3.33,3.0,3.0,1,Comment#3",
    "0,null,2020-10-10T00:00:30,2020-10-10T00:00:35,1,7.77,7.0,7.0,0,null",
    "1,null,2020-10-10T00:00,2020-10-10T00:00:05,4,11.10,5.0,1.0,2,Hi|Comment#1",
    "1,null,2020-10-10T00:00:05,2020-10-10T00:00:10,3,9.99,6.0,3.0,3,Hello|Hi|Comment#2",
    "1,null,2020-10-10T00:00:15,2020-10-10T00:00:20,1,4.44,4.0,4.0,1,Hi",
    "1,null,2020-10-10T00:00:30,2020-10-10T00:00:35,2,11.10,7.0,3.0,1,Comment#3",
]


def _gs_sql(group_tail):
    # GROUPING_ID(`name`) (single column) == grouping(`name`)
    return (
        "SELECT grouping(`name`), `name`, window_start, window_end, "
        + AGGS + f" FROM W GROUP BY {group_tail}"
    )


def test_event_time_tumble_window_grouping_sets_cube_rollup(tenv):
    """:345 / :373 / :401 — the suite asserts all three produce
    TumbleWindowGroupSetExpectedData."""
    _win_view(tenv, tumble(MIN5))
    for tail in (
        "GROUPING SETS((`name`), ()), window_start, window_end",
        "window_start, window_end, CUBE(`name`)",
        "window_start, window_end, ROLLUP(`name`)",
    ):
        assert rows_str(tenv.sql(_gs_sql(tail))) == sort_concat(
            TUMBLE_GS_EXPECTED
        ), tail


def test_tumble_window_output_window_time(tenv):
    """:429 — window_time == window_end - 1ms."""
    _win_view(tenv, tumble(MIN5))
    out = tenv.sql(
        "SELECT `name`, window_start, window_end, window_time, COUNT(*) "
        "FROM W GROUP BY `name`, window_start, window_end, window_time"
    )
    assert rows_str(out) == sorted([
        "a,2020-10-10T00:00,2020-10-10T00:00:05,2020-10-10T00:00:04.999,4",
        "a,2020-10-10T00:00:05,2020-10-10T00:00:10,2020-10-10T00:00:09.999,1",
        "b,2020-10-10T00:00:05,2020-10-10T00:00:10,2020-10-10T00:00:09.999,2",
        "b,2020-10-10T00:00:15,2020-10-10T00:00:20,2020-10-10T00:00:19.999,1",
        "b,2020-10-10T00:00:30,2020-10-10T00:00:35,2020-10-10T00:00:34.999,1",
        "null,2020-10-10T00:00:30,2020-10-10T00:00:35,2020-10-10T00:00:34.999,1",
    ])


def test_tumble_window_group_on_window_only(tenv):
    """:471"""
    _win_view(tenv, tumble(MIN5))
    out = tenv.sql(
        "SELECT window_start, window_end, " + AGGS +
        " FROM W GROUP BY window_start, window_end"
    )
    assert rows_str(out) == sort_concat([
        "2020-10-10T00:00,2020-10-10T00:00:05,4,11.10,5.0,1.0,2,Hi|Comment#1",
        "2020-10-10T00:00:05,2020-10-10T00:00:10,3,9.99,6.0,3.0,3,"
        "Hello|Hi|Comment#2",
        "2020-10-10T00:00:15,2020-10-10T00:00:20,1,4.44,4.0,4.0,1,Hi",
        "2020-10-10T00:00:30,2020-10-10T00:00:35,2,11.10,7.0,3.0,1,Comment#3",
    ])


def test_tumble_window_without_output_window_columns(tenv):
    """:503"""
    _win_view(tenv, tumble(MIN5))
    out = tenv.sql(
        "SELECT " + AGGS + " FROM W GROUP BY window_start, window_end"
    )
    assert rows_str(out) == sort_concat([
        "4,11.10,5.0,1.0,2,Hi|Comment#1",
        "3,9.99,6.0,3.0,3,Hello|Hi|Comment#2",
        "1,4.44,4.0,4.0,1,Hi",
        "2,11.10,7.0,3.0,1,Comment#3",
    ])


HOP_EXPECTED = [
    "a,2020-10-09T23:59:55,2020-10-10T00:00:05,4,11.10,5.0,1.0,2,Hi|Comment#1",
    "a,2020-10-10T00:00,2020-10-10T00:00:10,6,19.98,5.0,1.0,3,Comment#2|Hi|Comment#1",
    "a,2020-10-10T00:00:05,2020-10-10T00:00:15,1,3.33,null,3.0,1,Comment#2",
    "b,2020-10-10T00:00,2020-10-10T00:00:10,2,6.66,6.0,3.0,2,Hello|Hi",
    "b,2020-10-10T00:00:05,2020-10-10T00:00:15,2,6.66,6.0,3.0,2,Hello|Hi",
    "b,2020-10-10T00:00:10,2020-10-10T00:00:20,1,4.44,4.0,4.0,1,Hi",
    "b,2020-10-10T00:00:15,2020-10-10T00:00:25,1,4.44,4.0,4.0,1,Hi",
    "b,2020-10-10T00:00:25,2020-10-10T00:00:35,1,3.33,3.0,3.0,1,Comment#3",
    "b,2020-10-10T00:00:30,2020-10-10T00:00:40,1,3.33,3.0,3.0,1,Comment#3",
    "null,2020-10-10T00:00:25,2020-10-10T00:00:35,1,7.77,7.0,7.0,0,null",
    "null,2020-10-10T00:00:30,2020-10-10T00:00:40,1,7.77,7.0,7.0,0,null",
]


def test_event_time_hop_window(tenv):
    """:532 — the late row keeps its unfired [00:00, 00:00:10) hop
    window (count 6) but loses the fired [23:59:55, 00:00:05) one."""
    _win_view(tenv, hop(10 * SEC, MIN5))
    assert rows_str(tenv.sql(GROUP_SQL)) == sort_concat(HOP_EXPECTED)


def test_event_time_hop_window_with_offset(tenv):
    """:572 — 1-day windows sliding 12h at +8h."""
    _win_view(tenv, hop(DAY, 12 * HOUR, 8 * HOUR))
    assert rows_str(tenv.sql(GROUP_SQL)) == sort_concat([
        "a,2020-10-09T08:00,2020-10-10T08:00,6,19.98,5.0,1.0,3,"
        "Hi|Comment#1|Comment#2",
        "a,2020-10-09T20:00,2020-10-10T20:00,6,19.98,5.0,1.0,3,"
        "Hi|Comment#1|Comment#2",
        "b,2020-10-09T08:00,2020-10-10T08:00,4,14.43,6.0,3.0,3,"
        "Hello|Hi|Comment#3",
        "b,2020-10-09T20:00,2020-10-10T20:00,4,14.43,6.0,3.0,3,"
        "Hello|Hi|Comment#3",
        "null,2020-10-09T08:00,2020-10-10T08:00,1,7.77,7.0,7.0,0,null",
        "null,2020-10-09T20:00,2020-10-10T20:00,1,7.77,7.0,7.0,0,null",
    ])


def test_event_time_hop_window_with_negative_offset(tenv):
    """:612"""
    _win_view(tenv, hop(DAY, 12 * HOUR, -8 * HOUR))
    assert rows_str(tenv.sql(GROUP_SQL)) == sort_concat([
        "a,2020-10-09T04:00,2020-10-10T04:00,6,19.98,5.0,1.0,3,"
        "Hi|Comment#1|Comment#2",
        "a,2020-10-09T16:00,2020-10-10T16:00,6,19.98,5.0,1.0,3,"
        "Hi|Comment#1|Comment#2",
        "b,2020-10-09T04:00,2020-10-10T04:00,4,14.43,6.0,3.0,3,"
        "Hello|Hi|Comment#3",
        "b,2020-10-09T16:00,2020-10-10T16:00,4,14.43,6.0,3.0,3,"
        "Hello|Hi|Comment#3",
        "null,2020-10-09T04:00,2020-10-10T04:00,1,7.77,7.0,7.0,0,null",
        "null,2020-10-09T16:00,2020-10-10T16:00,1,7.77,7.0,7.0,0,null",
    ])


# WindowAggregateITCase.scala:79 HopWindowGroupSetExpectedData
HOP_GS_EXPECTED = [
    "0," + r for r in HOP_EXPECTED
] + [
    "1,null,2020-10-09T23:59:55,2020-10-10T00:00:05,4,11.10,5.0,1.0,2,Hi|Comment#1",
    "1,null,2020-10-10T00:00,2020-10-10T00:00:10,8,26.64,6.0,1.0,4,Hello|Hi|Comment#2|Comment#1",
    "1,null,2020-10-10T00:00:05,2020-10-10T00:00:15,3,9.99,6.0,3.0,3,Hello|Hi|Comment#2",
    "1,null,2020-10-10T00:00:10,2020-10-10T00:00:20,1,4.44,4.0,4.0,1,Hi",
    "1,null,2020-10-10T00:00:15,2020-10-10T00:00:25,1,4.44,4.0,4.0,1,Hi",
    "1,null,2020-10-10T00:00:25,2020-10-10T00:00:35,2,11.10,7.0,3.0,1,Comment#3",
    "1,null,2020-10-10T00:00:30,2020-10-10T00:00:40,2,11.10,7.0,3.0,1,Comment#3",
]


def test_event_time_hop_window_grouping_sets_cube_rollup(tenv):
    """:652 / :680 / :708 — HopWindowGroupSetExpectedData for all
    three (the '0,'-prefixed name rows == the plain hop expectations)."""
    _win_view(tenv, hop(10 * SEC, MIN5))
    for tail in (
        "GROUPING SETS((`name`), ()), window_start, window_end",
        "window_start, window_end, CUBE(`name`)",
        "window_start, window_end, ROLLUP(`name`)",
    ):
        assert rows_str(tenv.sql(_gs_sql(tail))) == sort_concat(
            HOP_GS_EXPECTED
        ), tail


CUMULATE_EXPECTED = [
    "a,2020-10-10T00:00,2020-10-10T00:00:05,4,11.10,5.0,1.0,2,Hi|Comment#1",
    "a,2020-10-10T00:00,2020-10-10T00:00:10,6,19.98,5.0,1.0,3,Hi|Comment#1|Comment#2",
    "a,2020-10-10T00:00,2020-10-10T00:00:15,6,19.98,5.0,1.0,3,Hi|Comment#1|Comment#2",
    "b,2020-10-10T00:00,2020-10-10T00:00:10,2,6.66,6.0,3.0,2,Hello|Hi",
    "b,2020-10-10T00:00,2020-10-10T00:00:15,2,6.66,6.0,3.0,2,Hello|Hi",
    "b,2020-10-10T00:00:15,2020-10-10T00:00:20,1,4.44,4.0,4.0,1,Hi",
    "b,2020-10-10T00:00:15,2020-10-10T00:00:25,1,4.44,4.0,4.0,1,Hi",
    "b,2020-10-10T00:00:15,2020-10-10T00:00:30,1,4.44,4.0,4.0,1,Hi",
    "b,2020-10-10T00:00:30,2020-10-10T00:00:35,1,3.33,3.0,3.0,1,Comment#3",
    "b,2020-10-10T00:00:30,2020-10-10T00:00:40,1,3.33,3.0,3.0,1,Comment#3",
    "b,2020-10-10T00:00:30,2020-10-10T00:00:45,1,3.33,3.0,3.0,1,Comment#3",
    "null,2020-10-10T00:00:30,2020-10-10T00:00:35,1,7.77,7.0,7.0,0,null",
    "null,2020-10-10T00:00:30,2020-10-10T00:00:40,1,7.77,7.0,7.0,0,null",
    "null,2020-10-10T00:00:30,2020-10-10T00:00:45,1,7.77,7.0,7.0,0,null",
]


def test_event_time_cumulate_window(tenv):
    """:736 — expanding 5s slices up to 15s; the late row's first slice
    is fired (dropped) but the later expansions keep it (count 6)."""
    _win_view(tenv, cumulate(15 * SEC, MIN5))
    assert rows_str(tenv.sql(GROUP_SQL)) == sort_concat(CUMULATE_EXPECTED)


def test_event_time_cumulate_window_with_offset(tenv):
    """:783 — 12h steps to 1 day at +8h: only the full-day slice
    contains the data."""
    _win_view(tenv, cumulate(DAY, 12 * HOUR, 8 * HOUR))
    assert rows_str(tenv.sql(GROUP_SQL)) == sort_concat([
        "a,2020-10-09T08:00,2020-10-10T08:00,6,19.98,5.0,1.0,3,"
        "Hi|Comment#1|Comment#2",
        "b,2020-10-09T08:00,2020-10-10T08:00,4,14.43,6.0,3.0,3,"
        "Hello|Hi|Comment#3",
        "null,2020-10-09T08:00,2020-10-10T08:00,1,7.77,7.0,7.0,0,null",
    ])


def test_event_time_cumulate_window_with_negative_offset(tenv):
    """:820 — at -8h both expanding slices contain the data."""
    _win_view(tenv, cumulate(DAY, 12 * HOUR, -8 * HOUR))
    assert rows_str(tenv.sql(GROUP_SQL)) == sort_concat([
        "a,2020-10-09T16:00,2020-10-10T04:00,6,19.98,5.0,1.0,3,"
        "Hi|Comment#1|Comment#2",
        "a,2020-10-09T16:00,2020-10-10T16:00,6,19.98,5.0,1.0,3,"
        "Hi|Comment#1|Comment#2",
        "b,2020-10-09T16:00,2020-10-10T04:00,4,14.43,6.0,3.0,3,"
        "Hello|Hi|Comment#3",
        "b,2020-10-09T16:00,2020-10-10T16:00,4,14.43,6.0,3.0,3,"
        "Hello|Hi|Comment#3",
        "null,2020-10-09T16:00,2020-10-10T04:00,1,7.77,7.0,7.0,0,null",
        "null,2020-10-09T16:00,2020-10-10T16:00,1,7.77,7.0,7.0,0,null",
    ])


# WindowAggregateITCase.scala:107 CumulateWindowGroupSetExpectedData
CUMULATE_GS_EXPECTED = [
    "0," + r for r in CUMULATE_EXPECTED
] + [
    "1,null,2020-10-10T00:00,2020-10-10T00:00:05,4,11.10,5.0,1.0,2,Hi|Comment#1",
    "1,null,2020-10-10T00:00,2020-10-10T00:00:10,8,26.64,6.0,1.0,4,Hi|Comment#1|Hello|Comment#2",
    "1,null,2020-10-10T00:00,2020-10-10T00:00:15,8,26.64,6.0,1.0,4,Hi|Comment#1|Hello|Comment#2",
    "1,null,2020-10-10T00:00:15,2020-10-10T00:00:20,1,4.44,4.0,4.0,1,Hi",
    "1,null,2020-10-10T00:00:15,2020-10-10T00:00:25,1,4.44,4.0,4.0,1,Hi",
    "1,null,2020-10-10T00:00:15,2020-10-10T00:00:30,1,4.44,4.0,4.0,1,Hi",
    "1,null,2020-10-10T00:00:30,2020-10-10T00:00:35,2,11.10,7.0,3.0,1,Comment#3",
    "1,null,2020-10-10T00:00:30,2020-10-10T00:00:40,2,11.10,7.0,3.0,1,Comment#3",
    "1,null,2020-10-10T00:00:30,2020-10-10T00:00:45,2,11.10,7.0,3.0,1,Comment#3",
]


def test_event_time_cumulate_window_grouping_sets_cube_rollup(tenv):
    """:860 / :892 / :924"""
    _win_view(tenv, cumulate(15 * SEC, MIN5))
    for tail in (
        "GROUPING SETS((`name`), ()), window_start, window_end",
        "window_start, window_end, CUBE(`name`)",
        "window_start, window_end, ROLLUP(`name`)",
    ):
        assert rows_str(tenv.sql(_gs_sql(tail))) == sort_concat(
            CUMULATE_GS_EXPECTED
        ), tail


def test_field_name_conflict(tenv):
    """:956 — selecting window_time next to MIN/MAX(rowtime)."""
    _win_view(tenv, tumble(MIN5))
    out = tenv.sql(
        "SELECT window_time, MIN(rowtime) as start_time, "
        "MAX(rowtime) as end_time FROM W "
        "GROUP BY window_start, window_end, window_time"
    )
    assert rows_str(out) == sorted([
        "2020-10-10T00:00:04.999,2020-10-10T00:00:01,2020-10-10T00:00:04",
        "2020-10-10T00:00:09.999,2020-10-10T00:00:06,2020-10-10T00:00:08",
        "2020-10-10T00:00:19.999,2020-10-10T00:00:16,2020-10-10T00:00:16",
        "2020-10-10T00:00:34.999,2020-10-10T00:00:32,2020-10-10T00:00:34",
    ])


CDC_GROUP_SQL = (
    "SELECT `name`, window_start, window_end, COUNT(*), SUM(`bigdec`), "
    "MAX(`double`), MIN(`float`), COUNT(DISTINCT `string`) "
    "FROM W GROUP BY `name`, window_start, window_end"
)


def test_event_time_tumble_window_with_cdc_source(tenv):
    """:1037 — retract-aggregate over the net row multiset per window;
    the late +I and late -D both lose their fired tumble slice."""
    _cdc_win_view(tenv, tumble(MIN5))
    assert rows_str(tenv.sql(CDC_GROUP_SQL)) == sorted([
        "a,2020-10-10T00:00,2020-10-10T00:00:05,3,29.99,22.0,2.0,2",
        "a,2020-10-10T00:00:05,2020-10-10T00:00:10,1,3.33,null,3.0,1",
        "b,2020-10-10T00:00:05,2020-10-10T00:00:10,2,6.66,6.0,3.0,2",
        "b,2020-10-10T00:00:15,2020-10-10T00:00:20,1,4.44,4.0,4.0,1",
    ])


def test_event_time_hop_window_with_cdc_source(tenv):
    """:1069 — the late +I keeps its unfired hop window (count 5 for
    a[00:00,00:00:10)) while the late -D (arriving at watermark
    00:00:15) is fully late; the deleted-to-zero [00:00:35,...) windows
    of the ts-38/39 pair vanish."""
    _cdc_win_view(tenv, hop(10 * SEC, MIN5))
    assert rows_str(tenv.sql(CDC_GROUP_SQL)) == sorted([
        "a,2020-10-09T23:59:55,2020-10-10T00:00:05,3,29.99,22.0,2.0,2",
        "a,2020-10-10T00:00,2020-10-10T00:00:10,5,38.87,22.0,2.0,4",
        "a,2020-10-10T00:00:05,2020-10-10T00:00:15,1,3.33,null,3.0,1",
        "b,2020-10-10T00:00,2020-10-10T00:00:10,2,6.66,6.0,3.0,2",
        "b,2020-10-10T00:00:05,2020-10-10T00:00:15,2,6.66,6.0,3.0,2",
        "b,2020-10-10T00:00:10,2020-10-10T00:00:20,1,4.44,4.0,4.0,1",
        "b,2020-10-10T00:00:15,2020-10-10T00:00:25,1,4.44,4.0,4.0,1",
    ])


def test_event_time_cumulate_window_with_cdc_source(tenv):
    """:1104"""
    _cdc_win_view(tenv, cumulate(15 * SEC, MIN5))
    assert rows_str(tenv.sql(CDC_GROUP_SQL)) == sorted([
        "a,2020-10-10T00:00,2020-10-10T00:00:05,3,29.99,22.0,2.0,2",
        "a,2020-10-10T00:00,2020-10-10T00:00:10,5,38.87,22.0,2.0,4",
        "a,2020-10-10T00:00,2020-10-10T00:00:15,5,38.87,22.0,2.0,4",
        "b,2020-10-10T00:00,2020-10-10T00:00:10,2,6.66,6.0,3.0,2",
        "b,2020-10-10T00:00,2020-10-10T00:00:15,2,6.66,6.0,3.0,2",
        "b,2020-10-10T00:00:15,2020-10-10T00:00:20,1,4.44,4.0,4.0,1",
        "b,2020-10-10T00:00:15,2020-10-10T00:00:25,1,4.44,4.0,4.0,1",
        "b,2020-10-10T00:00:15,2020-10-10T00:00:30,1,4.44,4.0,4.0,1",
    ])


def test_retract_previous_slicing_state_with_slicing_window(tenv):
    """:1140 — a delete with no matching insert in its window drives the
    SIGNED aggregates negative: COUNT(*) = -1 (FLINK-33760 behavior
    pinned verbatim)."""
    rows = [
        ("+I", 1, 1, "s1", "a"),
        ("+I", 4, 1, "s2", "a"),
        ("-D", 6, 3, "s3", "a"),
    ]
    seq = []
    for kind, s, i, st, n in rows:
        ts = BASE + s * SEC
        seq.append(("row", ts, (kind, i, st, n)))
        seq.append(("wm", ts - SEC))
    pairs = surviving_windows(seq, hop(10 * SEC, MIN5))
    vrows = [
        (1 if p[0] in ("+I", "+U") else -1, p[1], p[2], p[3],
         _dt(ws), _dt(we))
        for _ts, p, _i, ws, we in pairs
    ]
    df = tenv.spark.createDataFrame(
        vrows,
        "sign int, `int` int, string string, name string, "
        "window_start timestamp, window_end timestamp",
    )
    df.createOrReplaceTempView("W")
    out = tenv.sql(
        """
        SELECT w.name, w.window_start, w.window_end,
               SUM(w.sign), SUM(w.sign * w.`int`),
               MAX(d.n_distinct)
        FROM W w
        LEFT JOIN (
          SELECT name, window_start, window_end,
                 COUNT(CASE WHEN net > 0 THEN 1 END) AS n_distinct
          FROM (
            SELECT name, window_start, window_end, string,
                   SUM(sign) AS net
            FROM W GROUP BY name, window_start, window_end, string
          ) GROUP BY name, window_start, window_end
        ) d USING (name, window_start, window_end)
        GROUP BY w.name, w.window_start, w.window_end
        """
    )
    assert rows_str(out) == sorted([
        "a,2020-10-09T23:59:55,2020-10-10T00:00:05,2,2,2",
        "a,2020-10-10T00:00,2020-10-10T00:00:10,1,-1,2",
        "a,2020-10-10T00:00:05,2020-10-10T00:00:15,-1,-3,0",
    ])


SESSION_EXPECTED = [
    "a,2020-10-10T00:00:01,2020-10-10T00:00:13,6,19.98,5.0,1.0,3,"
    "Hi|Comment#1|Comment#2",
    "b,2020-10-10T00:00:06,2020-10-10T00:00:12,2,6.66,6.0,3.0,2,Hello|Hi",
    "b,2020-10-10T00:00:16,2020-10-10T00:00:21,1,4.44,4.0,4.0,1,Hi",
    "b,2020-10-10T00:00:34,2020-10-10T00:00:39,1,3.33,3.0,3.0,1,Comment#3",
    "null,2020-10-10T00:00:32,2020-10-10T00:00:37,1,7.77,7.0,7.0,0,null",
]


def test_event_time_session_window(tenv):
    """:1192 — SESSION TVF PARTITION BY name, gap 5s: the late row's
    proto-window [00:00:04, 00:00:09) is still above the watermark, so
    it joins the merged session (count 6)."""
    _session_view(tenv, MIN5)
    assert rows_str(tenv.sql(GROUP_SQL)) == sort_concat(SESSION_EXPECTED)


def test_event_time_session_window_with_tvf_not_pull_up(tenv):
    """:1226 — a WHERE on window_start between the TVF and the agg."""
    _session_view(tenv, MIN5)
    out = tenv.sql(
        "SELECT `name`, window_start, window_end, " + AGGS +
        " FROM (SELECT * FROM W "
        "  WHERE window_start > TIMESTAMP '2000-01-01 10:10:00.000') "
        "GROUP BY `name`, window_start, window_end"
    )
    assert rows_str(out) == sort_concat(SESSION_EXPECTED)


def test_event_time_session_window_with_cdc_source(tenv):
    """:1263 — sessions over a changelog: the ts-38 insert is cancelled
    by the ts-39 delete, so that session nets to zero rows and is NOT
    emitted."""
    _session_view(tenv, MIN5, cdc=True)
    out = tenv.sql(CDC_GROUP_SQL + " HAVING COUNT(*) > 0")
    assert rows_str(out) == sorted([
        "a,2020-10-10T00:00:01,2020-10-10T00:00:13,5,38.87,22.0,2.0,4",
        "b,2020-10-10T00:00:06,2020-10-10T00:00:12,2,6.66,6.0,3.0,2",
        "b,2020-10-10T00:00:16,2020-10-10T00:00:21,1,4.44,4.0,4.0,1",
    ])


def test_distinct_agg_with_merge_on_event_time_session_window(tenv):
    """:1294 — session merging triggered by a bridging element (the ts-4
    row merges [1,2] with [8,10]); watermark offset 10ms."""
    data = [(1, 2, "Hello"), (2, 2, "Hello"), (8, 2, "Hello"),
            (10, 3, "Hello"), (9, 9, "Hello World"), (4, 1, "Hello"),
            (16, 16, "Hello")]
    seq = []
    for ts, b, c in data:
        seq.append(("row", ts, (b, c)))
        seq.append(("wm", ts - 10))
    pairs = session_windows(seq, 5, key_fn=lambda p: p[1])
    rows = [
        (p[0], p[1],
         datetime.datetime(1970, 1, 1) + datetime.timedelta(
             milliseconds=we))
        for _ts, p, _i, _ws, we in pairs
    ]
    df = tenv.spark.createDataFrame(
        rows, "b int, c string, window_end timestamp"
    )
    df.createOrReplaceTempView("MyTable")
    out = tenv.sql(
        "SELECT c, COUNT(DISTINCT b), window_end FROM MyTable "
        "GROUP BY c, window_end"
    )
    assert rows_str(out) == sorted([
        "Hello World,1,1970-01-01T00:00:00.014",
        "Hello,1,1970-01-01T00:00:00.021",
        "Hello,3,1970-01-01T00:00:00.015",
    ])


def test_percentile_on_event_time_tumble_window(tenv):
    """:1335 — PERCENTILE over the CDC net multiset per tumble window
    (weighted by `int`); all-null double window prints null."""
    _cdc_win_view(tenv, tumble(MIN5))
    inner = (
        "SELECT `name`, window_start, window_end, "
        "PERCENTILE(`double`, 0.5) as swo, "
        "PERCENTILE(`double`, 0.5, `int`) as sw, "
        "PERCENTILE(`double`, ARRAY(0.5, 0.2, 0.6)) as mwo, "
        "PERCENTILE(`double`, ARRAY(0.5, 0.2, 0.6), `int`) as mw "
        "FROM W GROUP BY `name`, window_start, window_end"
    )
    out = tenv.sql(
        f"select `name`, window_start, window_end, swo, sw, "
        f"mwo[0], mwo[1], mwo[2], mw[0], mw[1], mw[2] FROM ({inner})"
    ).collect()
    got = sorted(out, key=lambda r: (r[0], r[1]))
    expected_key = [
        ("a", "2020-10-10T00:00", "2020-10-10T00:00:05"),
        ("a", "2020-10-10T00:00:05", "2020-10-10T00:00:10"),
        ("b", "2020-10-10T00:00:05", "2020-10-10T00:00:10"),
        ("b", "2020-10-10T00:00:15", "2020-10-10T00:00:20"),
    ]
    expected_value = [
        [5.0, 22.0, 5.0, 3.2, 8.4, 22.0, 5.0, 22.0],
        [None] * 8,
        [4.5, 6.0, 4.5, 3.6, 4.8, 6.0, 3.0, 6.0],
        [4.0] * 8,
    ]
    assert len(got) == 4
    for r, key, vals in zip(got, expected_key, expected_value):
        assert (r[0], flink_val(r[1]), flink_val(r[2])) == key
        for j, e in enumerate(vals):
            if e is None:
                assert r[j + 3] is None
            else:
                assert abs(r[j + 3] - e) <= 1e-6 * abs(e), (key, j)
