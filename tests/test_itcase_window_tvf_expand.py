"""Verbatim harvest of the reference's streaming WindowTableFunctionITCase
(r13 — VERDICT r12 next-item #1, final tranche).

Reference: flink-table-planner .../runtime/stream/sql/
WindowTableFunctionITCase.scala (7 tests — the RAW window TVF expansion,
no aggregation on top): testTumbleWindow:73, testTumbleWindowTVFWithOffset
:124, testTumbleWindowTVFWithNegativeOffset:177, testHopWindow:230,
testCumulateWindow:304, testSessionWindow:394,
testSessionWindowWithPartitionBy:445. All run over
TestData.windowDataWithTimestamp through a TestingAppendSink.

Semantic pin this suite adds over the window-AGGREGATE harvest: the raw
TVF expansion does NOT drop late rows. The late ts-00:00:04 row (arriving
after the watermark passed 00:00:07) appears in its windows in EVERY
expected list here — e.g. ``2020-10-10T00:00:04,5,5.0,null,5.55,Hi,a``
inside tumble ``[00:00, 00:00:05)`` at :104 — because the WTF operator is
a stateless per-row assigner with no timer to fire
(flink-table-runtime WindowTableFunctionOperatorBase emits every
incoming row into all its windows; lateness only matters to the
downstream aggregate's triggers). So these pins run the suite's VERBATIM
SQL straight through ``TableEnvironment.sql`` (the production
window_tvf.py rewrite) with no arrival-sequence modelling at all.

What the suite forced into production window_tvf.py: the ``window_time``
column (window_end - 1ms, the windowed table's rowtime attribute —
every expected row carries it), the optional TUMBLE offset argument
(``INTERVAL '1' SECOND`` shifts the tiling; negative offsets normalize
mod size — :177's ``INTERVAL '-1' SECOND`` puts 00:00:01 into
``[23:59:59, 00:00:04)``), and backtick-quoted SESSION PARTITION BY
keys.

Expected-string encoding: each reference expected line is
``<row prefix>,<window_start>,<window_end>,<window_time>`` where the 11
row prefixes repeat verbatim across all 7 tests — transcribed once in
``PREFIX`` below — and each test contributes its (row, window) pairs in
``_expand``. ``CAST(rowtime AS STRING)`` is expressed as the millisecond
date_format (Flink's cast renders .000, Spark's drops it) — same
deviation convention as the WindowRank pins.

Tally: WindowTableFunctionITCase 7/7 pinned.
"""

from __future__ import annotations

import datetime
import decimal

import pytest

from tests.itcase_utils import flink_val, run_retract, view
from tests.test_itcase_window_agg import WINDOW_DATA


@pytest.fixture(scope="module")
def tenv(spark):
    from apache_flink_spark.environment import TableEnvironment

    return TableEnvironment(spark=spark)

SCHEMA = (
    "`ts` string, `int` int, `double` double, `float` float, "
    "`bigdec` decimal(10,2), `string` string, `name` string"
)

# The 11 expected-row prefixes, verbatim from the reference expected
# lists (WindowTableFunctionITCase.scala:97-:120 — identical in all 7
# tests): TO_TIMESTAMP(ts), int, double, float, bigdec, string, name,
# CAST(rowtime AS STRING)
PREFIX = [
    "2020-10-10T00:00:01,1,1.0,1.0,1.11,Hi,a,2020-10-10 00:00:01.000",
    "2020-10-10T00:00:02,2,2.0,2.0,2.22,Comment#1,a,2020-10-10 00:00:02.000",
    "2020-10-10T00:00:03,2,2.0,2.0,2.22,Comment#1,a,2020-10-10 00:00:03.000",
    "2020-10-10T00:00:04,5,5.0,5.0,5.55,null,a,2020-10-10 00:00:04.000",
    "2020-10-10T00:00:04,5,5.0,null,5.55,Hi,a,2020-10-10 00:00:04.000",
    "2020-10-10T00:00:06,6,6.0,6.0,6.66,Hi,b,2020-10-10 00:00:06.000",
    "2020-10-10T00:00:07,3,3.0,3.0,null,Hello,b,2020-10-10 00:00:07.000",
    "2020-10-10T00:00:08,3,null,3.0,3.33,Comment#2,a,2020-10-10 00:00:08.000",
    "2020-10-10T00:00:16,4,4.0,4.0,4.44,Hi,b,2020-10-10 00:00:16.000",
    "2020-10-10T00:00:32,7,7.0,7.0,7.77,null,null,2020-10-10 00:00:32.000",
    "2020-10-10T00:00:34,1,3.0,3.0,3.33,Comment#3,b,2020-10-10 00:00:34.000",
]

def _dt(sec: float) -> datetime.datetime:
    return datetime.datetime(2020, 10, 10) + datetime.timedelta(seconds=sec)


def _expand(assigns: list[tuple[int, int, int]]) -> list[str]:
    """(prefix-idx, window-start-sec, window-end-sec) triples — the
    window columns of each reference expected line — into full sorted
    expected strings (window_time = end - 1ms)."""
    out = []
    for i, ws, we in assigns:
        out.append(
            f"{PREFIX[i]},{flink_val(_dt(ws))},{flink_val(_dt(we))},"
            f"{flink_val(_dt(we) - datetime.timedelta(milliseconds=1))}"
        )
    return sorted(out)


_SELECT = (
    "SELECT TO_TIMESTAMP(`ts`), `int`, `double`, `float`, `bigdec`, "
    "`string`, `name`, "
    "date_format(`rowtime`, 'yyyy-MM-dd HH:mm:ss.SSS'), "
    "window_start, window_end, window_time "
)


def _t1(tenv):
    # (ts-string, payload...) from the shared windowDataWithTimestamp
    # fixture (bigdec strings become Decimals for the DECIMAL(10,2) col)
    rows = []
    for r in WINDOW_DATA:
        sec, payload = r[0], r[1:]
        bd = payload[3]
        payload = payload[:3] + (
            None if bd is None else decimal.Decimal(bd),
        ) + payload[4:]
        rows.append((f"2020-10-10 00:00:{sec:02d}",) + payload)
    view(tenv, "T1base", rows, SCHEMA)
    tenv.sql(
        "CREATE OR REPLACE TEMPORARY VIEW T1 AS "
        "SELECT *, TO_TIMESTAMP(`ts`) AS rowtime FROM T1base"
    )


def test_tumble_window(tenv):
    """WindowTableFunctionITCase.scala:73 testTumbleWindow — including
    the late row in its [00:00, 00:00:05) window (:104)."""
    _t1(tenv)
    got = run_retract(
        tenv,
        _SELECT
        + "FROM TABLE(TUMBLE(TABLE T1, DESCRIPTOR(rowtime), INTERVAL '5' SECOND))",
    )
    assert got == _expand(
        [(i, 0, 5) for i in range(5)]
        + [(i, 5, 10) for i in (5, 6, 7)]
        + [(8, 15, 20), (9, 30, 35), (10, 30, 35)]
    )


def test_tumble_window_tvf_with_offset(tenv):
    """:124 testTumbleWindowTVFWithOffset — INTERVAL '1' SECOND shifts
    the tiling to [1, 6), [6, 11), ..."""
    _t1(tenv)
    got = run_retract(
        tenv,
        _SELECT
        + "FROM TABLE(TUMBLE(TABLE T1, DESCRIPTOR(rowtime), "
        "INTERVAL '5' SECOND, INTERVAL '1' SECOND))",
    )
    assert got == _expand(
        [(i, 1, 6) for i in range(5)]
        + [(i, 6, 11) for i in (5, 6, 7)]
        + [(8, 16, 21), (9, 31, 36), (10, 31, 36)]
    )


def test_tumble_window_tvf_with_negative_offset(tenv):
    """:177 testTumbleWindowTVFWithNegativeOffset — INTERVAL '-1'
    SECOND tiles [..., 23:59:59, 00:00:04, 00:00:09, ...)."""
    _t1(tenv)
    got = run_retract(
        tenv,
        _SELECT
        + "FROM TABLE(TUMBLE(TABLE T1, DESCRIPTOR(rowtime), "
        "INTERVAL '5' SECOND, INTERVAL '-1' SECOND))",
    )
    assert got == _expand(
        [(i, -1, 4) for i in (0, 1, 2)]
        + [(i, 4, 9) for i in (3, 4, 5, 6, 7)]
        + [(8, 14, 19), (9, 29, 34), (10, 34, 39)]
    )


def test_hop_window(tenv):
    """:230 testHopWindow — every row fans into its two size-10
    slide-5 windows."""
    _t1(tenv)
    got = run_retract(
        tenv,
        _SELECT
        + "FROM TABLE(HOP(TABLE T1, DESCRIPTOR(rowtime), "
        "INTERVAL '5' SECOND, INTERVAL '10' SECOND))",
    )
    assert got == _expand(
        [(i, -5, 5) for i in range(5)]
        + [(i, 0, 10) for i in range(8)]
        + [(i, 5, 15) for i in (5, 6, 7)]
        + [(8, 10, 20), (8, 15, 25)]
        + [(i, 25, 35) for i in (9, 10)]
        + [(i, 30, 40) for i in (9, 10)]
    )


def test_cumulate_window(tenv):
    """:304 testCumulateWindow — step 5 / max 15: each row belongs to
    every slice of its max-window ending after it."""
    _t1(tenv)
    got = run_retract(
        tenv,
        _SELECT
        + "FROM TABLE(CUMULATE(TABLE T1, DESCRIPTOR(rowtime), "
        "INTERVAL '5' SECOND, INTERVAL '15' SECOND))",
    )
    assert got == _expand(
        [(i, 0, e) for i in range(5) for e in (5, 10, 15)]
        + [(i, 0, e) for i in (5, 6, 7) for e in (10, 15)]
        + [(8, 15, e) for e in (20, 25, 30)]
        + [(i, 30, e) for i in (9, 10) for e in (35, 40, 45)]
    )


def test_session_window(tenv):
    """:394 testSessionWindow — unpartitioned gap-5 sessions merge
    ts 1..8 into [00:00:01, 00:00:13) (late row included) and ts 32,34
    into [00:00:32, 00:00:39)."""
    _t1(tenv)
    got = run_retract(
        tenv,
        _SELECT
        + "FROM TABLE(SESSION(TABLE T1, DESCRIPTOR(rowtime), INTERVAL '5' SECOND))",
    )
    assert got == _expand(
        [(i, 1, 13) for i in range(8)]
        + [(8, 16, 21), (9, 32, 39), (10, 32, 39)]
    )


def test_session_window_with_partition_by(tenv):
    """:445 testSessionWindowWithPartitionBy — per-`name` sessions: b
    splits into [06, 12), [16, 21), [34, 39); the null-name row
    sessions alone at [32, 37)."""
    _t1(tenv)
    got = run_retract(
        tenv,
        _SELECT
        + "FROM TABLE(SESSION(TABLE T1 PARTITION BY `name`, "
        "DESCRIPTOR(rowtime), INTERVAL '5' SECOND))",
    )
    assert got == _expand(
        [(i, 1, 13) for i in (0, 1, 2, 3, 4, 7)]
        + [(5, 6, 12), (6, 6, 12), (8, 16, 21), (9, 32, 37), (10, 34, 39)]
    )
