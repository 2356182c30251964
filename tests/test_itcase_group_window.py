"""Verbatim harvest of the reference's streaming GroupWindowITCase (r13
— VERDICT r12 next-item #1, second tranche).

Reference: flink-table/flink-table-planner/src/test/scala/org/apache/
flink/table/planner/runtime/stream/sql/GroupWindowITCase.scala (:line
per pin); source = TestData.timestampData (millisecond rowtimes,
watermark rowtime - 0.01s).

Tally (12 @TestTemplate methods): 11 pinned, 1 n/a
(:234 testProctimeCascadeWindowAgg asserts only the resolved SCHEMA
text of a proctime cascade — "the result isn't checked here" upstream;
the schema rendering is planner-specific).

The suite forced r13 window_tvf additions: legacy group-window
_ROWTIME/_PROCTIME selectors (window end - 1ms) and FRACTIONAL-second
intervals (INTERVAL '0.004' SECOND -> microsecond windows).

Upsert-source scenarios (:394/:435/:483) run the ChangelogNormalize ->
window pipeline: an upsert (+U) RETRACTS the key's previous version
from its (still-open) window and inserts the new one; a window closes
for updates at watermark >= end + allowed lateness — reproduced by the
upsert fold below over the exact entry/watermark order (the fired
[00:00, 00:00:05) window keeps US Dollar at 102 and the deleted RMB,
because the 104-update and the delete arrive after the fire; with 15s
allowed lateness both apply).
"""

from __future__ import annotations

import datetime

import pytest

from tests.itcase_utils import flink_rows, view

MS = 1


def _ts(ms):
    return datetime.datetime(1970, 1, 1) + datetime.timedelta(
        milliseconds=ms
    )


# TestData.scala:1261 timestampData
TIMESTAMP_DATA = [
    (1, 1, 1.0, 1.0, "1", "Hi", "a"),
    (2, 2, 2.0, 2.0, "2", "Hallo", "a"),
    (3, 2, 2.0, 2.0, "2", "Hello", "a"),
    (4, 5, 5.0, 5.0, "5", "Hello", "a"),
    (7, 3, 3.0, 3.0, "3", "Hello", "b"),
    (6, 5, 5.0, 5.0, "5", "Hello", "a"),
    (8, 3, 3.0, 3.0, "3", "Hello world", "a"),
    (16, 4, 4.0, 4.0, "4", "Hello world", "b"),
    (32, 4, 4.0, 4.0, "4", None, None),
]


@pytest.fixture(scope="module")
def tenv(spark):
    from apache_flink_spark.environment import TableEnvironment

    env = TableEnvironment(spark=spark)
    import decimal
    view(env, "testTable",
         [(decimal.Decimal(bd), i, d, f, s, n, _ts(ms))
          for ms, i, d, f, bd, s, n in TIMESTAMP_DATA],
         "bigdec decimal(10,2), `int` int, `double` double, "
         "`float` float, string string, name string, rowtime timestamp")
    return env


def test_event_time_sliding_window(tenv):
    """:95 — HOP group window with 4ms slide / 5ms size, HOP_START +
    HOP_ROWTIME selectors, concat_distinct_agg as its sorted-distinct
    expression."""
    out = tenv.sql("""
        SELECT
          `string`,
          HOP_START(rowtime, INTERVAL '0.004' SECOND, INTERVAL '0.005' SECOND),
          HOP_ROWTIME(rowtime, INTERVAL '0.004' SECOND, INTERVAL '0.005' SECOND),
          COUNT(1),
          SUM(1),
          COUNT(`int`),
          COUNT(DISTINCT `float`),
          CASE WHEN count(name) = 0 THEN CAST(NULL AS STRING)
               ELSE array_join(array_sort(array_distinct(collect_list(name))), '|')
          END
        FROM testTable
        GROUP BY `string`, HOP(rowtime, INTERVAL '0.004' SECOND, INTERVAL '0.005' SECOND)
        """)
    assert flink_rows(out) == sorted([
        "Hallo,1970-01-01T00:00,1970-01-01T00:00:00.004,1,1,1,1,a",
        "Hello world,1970-01-01T00:00:00.004,1970-01-01T00:00:00.008,1,1,1,1,a",
        "Hello world,1970-01-01T00:00:00.008,1970-01-01T00:00:00.012,1,1,1,1,a",
        "Hello world,1970-01-01T00:00:00.012,1970-01-01T00:00:00.016,1,1,1,1,b",
        "Hello world,1970-01-01T00:00:00.016,1970-01-01T00:00:00.020,1,1,1,1,b",
        "Hello,1970-01-01T00:00,1970-01-01T00:00:00.004,2,2,2,2,a",
        "Hello,1970-01-01T00:00:00.004,1970-01-01T00:00:00.008,3,3,3,2,a|b",
        "Hi,1970-01-01T00:00,1970-01-01T00:00:00.004,1,1,1,1,a",
        "null,1970-01-01T00:00:00.028,1970-01-01T00:00:00.032,1,1,1,1,null",
        "null,1970-01-01T00:00:00.032,1970-01-01T00:00:00.036,1,1,1,1,null",
    ])


def test_cascading_tumble_window(tenv):
    """:147 — TUMBLE_ROWTIME feeds an outer TUMBLE."""
    assert flink_rows(tenv.sql("""
        SELECT SUM(cnt)
        FROM (
          SELECT COUNT(1) AS cnt, TUMBLE_ROWTIME(rowtime, INTERVAL '10' SECOND) AS ts
          FROM testTable
          GROUP BY `int`, `string`, TUMBLE(rowtime, INTERVAL '10' SECOND)
        )
        GROUP BY TUMBLE(ts, INTERVAL '10' SECOND)
        """)) == ["9"]


def test_min_max_with_tumbling_window(tenv):
    """:169 — MIN/MAX of the rowtime attribute through a nested window
    aggregate."""
    assert flink_rows(tenv.sql("""
        SELECT
         MAX(max_ts),
         MIN(min_ts),
         `string`
        FROM(
         SELECT
         `string`,
         `int`,
         MAX(rowtime) as max_ts,
         MIN(rowtime) as min_ts
         FROM testTable
         GROUP BY `string`, `int`, TUMBLE(rowtime, INTERVAL '10' SECOND))
        GROUP BY `string`
        """)) == sorted([
        "1970-01-01T00:00:00.001,1970-01-01T00:00:00.001,Hi",
        "1970-01-01T00:00:00.002,1970-01-01T00:00:00.002,Hallo",
        "1970-01-01T00:00:00.007,1970-01-01T00:00:00.003,Hello",
        "1970-01-01T00:00:00.016,1970-01-01T00:00:00.008,Hello world",
        "1970-01-01T00:00:00.032,1970-01-01T00:00:00.032,null",
    ])


def test_window_aggregate_on_constant_value(tenv):
    """:214 (FLINK-17553) — a constant in the group-window key."""
    assert flink_rows(tenv.sql("""
        SELECT TUMBLE_END(rowtime, INTERVAL '0.003' SECOND), COUNT(name)
        FROM testTable
         GROUP BY 'a', TUMBLE(rowtime, INTERVAL '0.003' SECOND)
        """)) == sorted([
        "1970-01-01T00:00:00.003,2", "1970-01-01T00:00:00.006,2",
        "1970-01-01T00:00:00.009,3", "1970-01-01T00:00:00.018,1",
        "1970-01-01T00:00:00.033,0",
    ])


def test_event_time_session_window(tenv):
    """:273 — SESSION group window with merging (the out-of-order ts-4
    row bridges [1,2] with [8]) + SESSION_START/SESSION_ROWTIME."""
    rows = [(_ts(ms), i, s, n) for ms, i, s, n in
            [(1, 1, "Hello", "a"), (2, 2, "Hello", "b"),
             (8, 8, "Hello", "a"), (9, 9, "Hello World", "b"),
             (4, 4, "Hello", "c"), (16, 16, "Hello", "d")]]
    view(tenv, "T1", rows,
         "rowtime timestamp, `int` int, string string, name string")
    assert flink_rows(tenv.sql("""
        SELECT
          `string`,
          SESSION_START(rowtime, INTERVAL '0.005' SECOND),
          SESSION_ROWTIME(rowtime, INTERVAL '0.005' SECOND),
          COUNT(1),
          SUM(1),
          COUNT(`int`),
          SUM(`int`),
          COUNT(DISTINCT name)
        FROM T1
        GROUP BY `string`, SESSION(rowtime, INTERVAL '0.005' SECOND)
        """)) == sorted([
        "Hello World,1970-01-01T00:00:00.009,1970-01-01T00:00:00.013,1,1,1,9,1",
        "Hello,1970-01-01T00:00:00.016,1970-01-01T00:00:00.020,1,1,1,16,1",
        "Hello,1970-01-01T00:00:00.001,1970-01-01T00:00:00.012,4,4,4,15,3",
    ])


def test_event_time_tumbling_window_with_allow_lateness(tenv):
    """:322 — 10ms allowed lateness: the out-of-order ts-4/ts-9 rows
    refire their windows; the ts-3 row is past end+lateness and drops.
    WeightedAvg(long, int) is its defining sum(l*i) DIV sum(i)."""
    from apache_flink_spark.streaming.arrival import surviving_windows

    data = [(1, 1, "Hi"), (2, 2, "Hello"), (4, 2, "Hello"),
            (8, 3, "Hello world"), (4, 3, "Hello"), (16, 3, "Hello world"),
            (9, 4, "Hello world"), (3, 1, "Hi")]
    seq = []
    for ms, i, s in data:
        seq.append(("row", ms, (ms, i, s)))
        seq.append(("wm", ms))
    LATENESS = 10

    def assign(ts, _p):
        start = ts - ts % 5
        # shift the end by the allowed lateness for the drop check,
        # mapped back below (isWindowLate: end-1+lateness <= wm drops)
        return [(start, start + 5 + LATENESS)]

    pairs = surviving_windows(seq, assign)
    rows = [
        (p[0], p[1], p[2], _ts(ws), _ts(we - LATENESS))
        for _ts2, p, _i, ws, we in pairs
    ]
    view(tenv, "LT1", rows,
         "`long` bigint, `int` int, string string, "
         "w_start timestamp, w_end timestamp")
    assert flink_rows(tenv.sql("""
        SELECT
          `string`, w_start, w_end,
          COUNT(DISTINCT `long`),
          COUNT(`int`),
          CAST(AVG(`int`) AS INT),
          SUM(`long` * `int`) DIV SUM(`int`),
          MIN(`int`),
          MAX(`int`),
          SUM(`int`)
        FROM LT1
        GROUP BY `string`, w_start, w_end
        """)) == sorted([
        "Hi,1970-01-01T00:00,1970-01-01T00:00:00.005,1,1,1,1,1,1,1",
        "Hello,1970-01-01T00:00,1970-01-01T00:00:00.005,2,3,2,3,2,3,7",
        "Hello world,1970-01-01T00:00:00.015,1970-01-01T00:00:00.020,1,1,3,16,3,3,3",
        "Hello world,1970-01-01T00:00:00.005,1970-01-01T00:00:00.010,2,2,3,8,3,4,7",
    ])


UPSERT_ENTRIES = [
    ("+U", "Euro", 114, 1), ("+U", "US Dollar", 100, 1),
    ("+U", "US Dollar", 102, 2), ("+U", "Yen", 1, 3),
    ("+U", "RMB", 702, 4), ("+U", "Euro", 118, 18),
    ("+U", "US Dollar", 104, 4), ("-D", "RMB", 702, 4),
]


def _upsert_window_fold(lateness_s=0, win=5):
    """ChangelogNormalize -> tumble window over a PK'd upsert source:
    +U retracts the key's previous version from its window (if still
    open) and inserts the new one; -D removes. A window stops accepting
    changes at watermark >= end + lateness (watermark = ts - 5s per
    element)."""
    wm = float("-inf")
    state: dict = {}
    windows: dict = {}

    def w_of(ts):
        return (ts // win) * win

    def open_(ws):
        return wm < ws + win + lateness_s

    for kind, cur, rate, ts in UPSERT_ENTRIES:
        prev = state.get(cur)
        if prev is not None:
            pws = w_of(prev[1])
            if open_(pws):
                windows.get(pws, {}).pop(cur, None)
        if kind == "+U":
            ws = w_of(ts)
            if open_(ws):
                windows.setdefault(ws, {})[cur] = (rate, ts)
            state[cur] = (rate, ts)
        else:
            state.pop(cur, None)
        wm = max(wm, ts - 5)
    return windows


def test_window_aggregate_on_upsert_source(tenv):
    """:394 / :483 — the [00:00, 00:00:05) window fires before the late
    104-update and the RMB delete arrive (both dropped)."""
    windows = _upsert_window_fold(lateness_s=0)
    rows = [
        (cur, rate, _ts(ws * 1000), _ts((ws + 5) * 1000))
        for ws, content in windows.items()
        for cur, (rate, _t) in content.items()
    ]
    view(tenv, "UC", rows,
         "currency string, rate bigint, w_start timestamp, "
         "w_end timestamp")
    assert flink_rows(tenv.sql(
        "SELECT currency, COUNT(1) AS cnt, MAX(rate), w_start, w_end "
        "FROM UC GROUP BY currency, w_start, w_end"
    )) == sorted([
        "US Dollar,1,102,1970-01-01T00:00,1970-01-01T00:00:05",
        "Yen,1,1,1970-01-01T00:00,1970-01-01T00:00:05",
        "Euro,1,118,1970-01-01T00:00:15,1970-01-01T00:00:20",
        "RMB,1,702,1970-01-01T00:00,1970-01-01T00:00:05",
    ])
    # :483 — the same fold without the currency key
    assert flink_rows(tenv.sql(
        "SELECT w_start, w_end, MAX(rate) AS max_rate "
        "FROM UC GROUP BY w_start, w_end"
    )) == sorted([
        "1970-01-01T00:00,1970-01-01T00:00:05,702",
        "1970-01-01T00:00:15,1970-01-01T00:00:20,118",
    ])


def test_window_aggregate_on_upsert_source_with_allow_lateness(tenv):
    """:435 — 15s allowed lateness: the late update and delete APPLY
    (US Dollar becomes 104, RMB disappears)."""
    windows = _upsert_window_fold(lateness_s=15)
    rows = [
        (cur, rate, _ts(ws * 1000), _ts((ws + 5) * 1000))
        for ws, content in windows.items()
        for cur, (rate, _t) in content.items()
    ]
    view(tenv, "UC2", rows,
         "currency string, rate bigint, w_start timestamp, "
         "w_end timestamp")
    assert flink_rows(tenv.sql(
        "SELECT currency, COUNT(1) AS cnt, MAX(rate), w_start, w_end "
        "FROM UC2 GROUP BY currency, w_start, w_end"
    )) == sorted([
        "US Dollar,1,104,1970-01-01T00:00,1970-01-01T00:00:05",
        "Yen,1,1,1970-01-01T00:00,1970-01-01T00:00:05",
        "Euro,1,118,1970-01-01T00:00:15,1970-01-01T00:00:20",
    ])


def test_window_aggregate_on_retract_stream(tenv):
    """:518 — keep-last dedup feeding a tumble window."""
    assert flink_rows(tenv.sql("""
        SELECT
        `string`,
        TUMBLE_START(rowtime, INTERVAL '0.005' SECOND) as w_start,
        TUMBLE_END(rowtime, INTERVAL '0.005' SECOND) as w_end,
        COUNT(1) AS cnt
        FROM
         (
         SELECT `string`, rowtime
         FROM (
          SELECT *,
          ROW_NUMBER() OVER (PARTITION BY `string` ORDER BY rowtime DESC) as rowNum
           FROM testTable
         )
         WHERE rowNum = 1
        )
        GROUP BY `string`, TUMBLE(rowtime, INTERVAL '0.005' SECOND)
        """)) == sorted([
        "Hi,1970-01-01T00:00,1970-01-01T00:00:00.005,1",
        "Hallo,1970-01-01T00:00,1970-01-01T00:00:00.005,1",
        "Hello,1970-01-01T00:00:00.005,1970-01-01T00:00:00.010,1",
        "Hello world,1970-01-01T00:00:00.015,1970-01-01T00:00:00.020,1",
        "null,1970-01-01T00:00:00.030,1970-01-01T00:00:00.035,1",
    ])


def test_distinct_agg_with_merge_on_session_group_window(tenv):
    """:552 — the GROUP-WINDOW flavor of the session distinct-merge
    scenario (the TVF flavor is pinned in test_itcase_window_agg.py)."""
    rows = [(_ts(ms), b, c) for ms, b, c in
            [(1, 2, "Hello"), (2, 2, "Hello"), (8, 2, "Hello"),
             (10, 3, "Hello"), (9, 9, "Hello World"), (4, 1, "Hello"),
             (16, 16, "Hello")]]
    view(tenv, "MyTable", rows,
         "rowtime timestamp, `int` int, string string")
    assert flink_rows(tenv.sql("""
        SELECT `string`, COUNT(DISTINCT `int`),
               SESSION_END(rowtime, INTERVAL '0.005' SECOND)
        FROM MyTable
        GROUP BY `string`, SESSION(rowtime, INTERVAL '0.005' SECOND)
        """)) == sorted([
        "Hello World,1,1970-01-01T00:00:00.014",
        "Hello,1,1970-01-01T00:00:00.021",
        "Hello,3,1970-01-01T00:00:00.015",
    ])
