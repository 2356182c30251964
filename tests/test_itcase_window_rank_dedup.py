"""Verbatim harvest of the reference's streaming WindowRankITCase and
WindowDeduplicateITCase (r13 — VERDICT r12 next-item #1, second
tranche).

References (flink-table-planner .../runtime/stream/sql/, :line per
pin): WindowRankITCase.scala (18 tests — window Top-N over the window
TVFs at both the aggregate level and the raw-row level, with rank
offsets, Top-1, window offsets, calc projections) and
WindowDeduplicateITCase.scala (4 tests — window keep-first/keep-last).

Both run over TestData.windowDataWithTimestamp with the per-element
rowtime - 1s watermark; window assignment + per-window late drops reuse
tests/test_itcase_window_agg._win_view (streaming/arrival.py). The late
ts-00:00:04 row is dropped from fired tumble slices but RANKS inside
its unfired hop/cumulate windows (e.g. both int-5 rows of a's
[00:00, 00:00:10) hop window appear in the top-2).

Tally: WindowRankITCase 18/18 pinned, WindowDeduplicateITCase 4/4
pinned. Row-level ROW_NUMBER ties on the rank key are broken by
rowtime in the pins (the reference's arrival order — e.g. the
[00:00, 00:00:05) tumble keeps Comment#1@00:00:02, not @00:00:03);
CAST(rowtime AS STRING) is expressed as the millisecond date_format
(Flink's cast renders .000, Spark's drops it).
"""

from __future__ import annotations

import pytest

from tests.itcase_utils import flink_val
from tests.test_itcase_window_agg import (
    MIN5,
    SEC,
    _win_view,
    cumulate,
    hop,
    rows_str,
    sort_concat,
    tumble,
)


def sort_concat_at(expected, idx=-2):
    """sort_concat for rows whose '|'-joined field is not last (the
    rank rows append rownum after distinct_str)."""
    out = []
    for line in expected:
        parts = line.split(",")
        if parts[idx] != "null":
            parts[idx] = "|".join(sorted(parts[idx].split("|")))
        out.append(",".join(parts))
    return sorted(out)

AGG_INNER = (
    "SELECT `name`, window_start, window_end, COUNT(*) as cnt, "
    "SUM(`bigdec`) as sum_b, MAX(`double`) as max_d, "
    "MIN(`float`) as min_f, COUNT(DISTINCT `string`) as uv, "
    "CASE WHEN count(`string`) = 0 THEN CAST(NULL AS STRING) ELSE "
    "array_join(array_sort(array_distinct(collect_list(`string`))), '|') "
    "END as distinct_str "
    "FROM W GROUP BY `name`, window_start, window_end"
)

RANK_SQL = (
    "SELECT {sel} FROM ("
    "  SELECT *, ROW_NUMBER() OVER("
    "    PARTITION BY window_start, window_end ORDER BY sum_b DESC) "
    "  as rownum FROM (" + AGG_INNER + ")"
    ") WHERE {pred}"
)

TVF_SEL = (
    "rowtime, `int`, `double`, `float`, `bigdec`, `string`, `name`, "
    "date_format(rowtime, 'yyyy-MM-dd HH:mm:ss.SSS'), window_start, "
    "window_end, window_time"
)

TVF_RANK_SQL = (
    "SELECT " + TVF_SEL + " FROM ("
    "  SELECT *, ROW_NUMBER() OVER("
    "    PARTITION BY window_start, window_end, `name` "
    "    ORDER BY {order}) as rownum FROM W"
    ") WHERE rownum <= {n}"
)


@pytest.fixture(scope="module")
def tenv(spark):
    from apache_flink_spark.environment import TableEnvironment

    return TableEnvironment(spark=spark)


def test_tumble_window_rank(tenv):
    """WindowRankITCase:75 / :119 (offset) / :159 (no rank number) /
    :801 (Top-1)."""
    _win_view(tenv, tumble(MIN5))
    assert rows_str(tenv.sql(
        RANK_SQL.format(sel="*", pred="rownum <= 2")
    )) == sort_concat_at([
        "a,2020-10-10T00:00,2020-10-10T00:00:05,4,11.10,5.0,1.0,2,Hi|Comment#1,1",
        "a,2020-10-10T00:00:05,2020-10-10T00:00:10,1,3.33,null,3.0,1,Comment#2,2",
        "b,2020-10-10T00:00:05,2020-10-10T00:00:10,2,6.66,6.0,3.0,2,Hello|Hi,1",
        "b,2020-10-10T00:00:15,2020-10-10T00:00:20,1,4.44,4.0,4.0,1,Hi,1",
        "b,2020-10-10T00:00:30,2020-10-10T00:00:35,1,3.33,3.0,3.0,1,Comment#3,2",
        "null,2020-10-10T00:00:30,2020-10-10T00:00:35,1,7.77,7.0,7.0,0,null,1",
    ])
    assert rows_str(tenv.sql(
        RANK_SQL.format(sel="*", pred="rownum > 1 AND rownum <= 2")
    )) == sort_concat_at([
        "a,2020-10-10T00:00:05,2020-10-10T00:00:10,1,3.33,null,3.0,1,Comment#2,2",
        "b,2020-10-10T00:00:30,2020-10-10T00:00:35,1,3.33,3.0,3.0,1,Comment#3,2",
    ])
    assert rows_str(tenv.sql(RANK_SQL.format(
        sel="`name`, window_start, window_end, cnt, sum_b, max_d, "
            "min_f, uv, distinct_str",
        pred="rownum > 1 AND rownum <= 2",
    ))) == sort_concat([
        "a,2020-10-10T00:00:05,2020-10-10T00:00:10,1,3.33,null,3.0,1,Comment#2",
        "b,2020-10-10T00:00:30,2020-10-10T00:00:35,1,3.33,3.0,3.0,1,Comment#3",
    ])
    # :801 Top-1 on the short aggregate list
    top1 = (
        "SELECT * FROM ("
        "  SELECT *, ROW_NUMBER() OVER("
        "    PARTITION BY window_start, window_end ORDER BY sum_b DESC) "
        "  as rownum FROM ("
        "    SELECT `name`, window_start, window_end, COUNT(*) as cnt, "
        "    SUM(`bigdec`) as sum_b FROM W "
        "    GROUP BY `name`, window_start, window_end)"
        ") WHERE rownum <= 1"
    )
    assert rows_str(tenv.sql(top1)) == sorted([
        "a,2020-10-10T00:00,2020-10-10T00:00:05,4,11.10,1",
        "b,2020-10-10T00:00:05,2020-10-10T00:00:10,2,6.66,1",
        "b,2020-10-10T00:00:15,2020-10-10T00:00:20,1,4.44,1",
        "null,2020-10-10T00:00:30,2020-10-10T00:00:35,1,7.77,1",
    ])


TUMBLE_TVF_EXPECTED = [
    "2020-10-10T00:00:04,5,5.0,5.0,5.55,null,a,2020-10-10 00:00:04.000,"
    "2020-10-10T00:00,2020-10-10T00:00:05,2020-10-10T00:00:04.999",
    "2020-10-10T00:00:02,2,2.0,2.0,2.22,Comment#1,a,2020-10-10 00:00:02.000,"
    "2020-10-10T00:00,2020-10-10T00:00:05,2020-10-10T00:00:04.999",
    "2020-10-10T00:00:08,3,null,3.0,3.33,Comment#2,a,2020-10-10 00:00:08.000,"
    "2020-10-10T00:00:05,2020-10-10T00:00:10,2020-10-10T00:00:09.999",
    "2020-10-10T00:00:06,6,6.0,6.0,6.66,Hi,b,2020-10-10 00:00:06.000,"
    "2020-10-10T00:00:05,2020-10-10T00:00:10,2020-10-10T00:00:09.999",
    "2020-10-10T00:00:07,3,3.0,3.0,null,Hello,b,2020-10-10 00:00:07.000,"
    "2020-10-10T00:00:05,2020-10-10T00:00:10,2020-10-10T00:00:09.999",
    "2020-10-10T00:00:16,4,4.0,4.0,4.44,Hi,b,2020-10-10 00:00:16.000,"
    "2020-10-10T00:00:15,2020-10-10T00:00:20,2020-10-10T00:00:19.999",
    "2020-10-10T00:00:32,7,7.0,7.0,7.77,null,null,2020-10-10 00:00:32.000,"
    "2020-10-10T00:00:30,2020-10-10T00:00:35,2020-10-10T00:00:34.999",
    "2020-10-10T00:00:34,1,3.0,3.0,3.33,Comment#3,b,2020-10-10 00:00:34.000,"
    "2020-10-10T00:00:30,2020-10-10T00:00:35,2020-10-10T00:00:34.999",
]


def test_tumble_window_tvf_rank(tenv):
    """:199 / :252 (+1s offset) / :305 (-1s offset — the late int-5 row
    ranks in its unfired [00:00:04, 00:00:09) window) / :360 (calc)."""
    _win_view(tenv, tumble(MIN5))
    assert rows_str(tenv.sql(
        TVF_RANK_SQL.format(order="`int` DESC, rowtime", n=2)
    )) == sorted(TUMBLE_TVF_EXPECTED)
    _win_view(tenv, tumble(MIN5, SEC))
    assert rows_str(tenv.sql(
        TVF_RANK_SQL.format(order="`int` DESC, rowtime", n=2)
    )) == sorted([
        "2020-10-10T00:00:04,5,5.0,5.0,5.55,null,a,2020-10-10 00:00:04.000,"
        "2020-10-10T00:00:01,2020-10-10T00:00:06,2020-10-10T00:00:05.999",
        "2020-10-10T00:00:02,2,2.0,2.0,2.22,Comment#1,a,2020-10-10 00:00:02.000,"
        "2020-10-10T00:00:01,2020-10-10T00:00:06,2020-10-10T00:00:05.999",
        "2020-10-10T00:00:08,3,null,3.0,3.33,Comment#2,a,2020-10-10 00:00:08.000,"
        "2020-10-10T00:00:06,2020-10-10T00:00:11,2020-10-10T00:00:10.999",
        "2020-10-10T00:00:06,6,6.0,6.0,6.66,Hi,b,2020-10-10 00:00:06.000,"
        "2020-10-10T00:00:06,2020-10-10T00:00:11,2020-10-10T00:00:10.999",
        "2020-10-10T00:00:07,3,3.0,3.0,null,Hello,b,2020-10-10 00:00:07.000,"
        "2020-10-10T00:00:06,2020-10-10T00:00:11,2020-10-10T00:00:10.999",
        "2020-10-10T00:00:16,4,4.0,4.0,4.44,Hi,b,2020-10-10 00:00:16.000,"
        "2020-10-10T00:00:16,2020-10-10T00:00:21,2020-10-10T00:00:20.999",
        "2020-10-10T00:00:32,7,7.0,7.0,7.77,null,null,2020-10-10 00:00:32.000,"
        "2020-10-10T00:00:31,2020-10-10T00:00:36,2020-10-10T00:00:35.999",
        "2020-10-10T00:00:34,1,3.0,3.0,3.33,Comment#3,b,2020-10-10 00:00:34.000,"
        "2020-10-10T00:00:31,2020-10-10T00:00:36,2020-10-10T00:00:35.999",
    ])
    _win_view(tenv, tumble(MIN5, -SEC))
    assert rows_str(tenv.sql(
        TVF_RANK_SQL.format(order="`int` DESC, rowtime", n=2)
    )) == sorted([
        "2020-10-10T00:00:02,2,2.0,2.0,2.22,Comment#1,a,2020-10-10 00:00:02.000,"
        "2020-10-09T23:59:59,2020-10-10T00:00:04,2020-10-10T00:00:03.999",
        "2020-10-10T00:00:03,2,2.0,2.0,2.22,Comment#1,a,2020-10-10 00:00:03.000,"
        "2020-10-09T23:59:59,2020-10-10T00:00:04,2020-10-10T00:00:03.999",
        "2020-10-10T00:00:04,5,5.0,5.0,5.55,null,a,2020-10-10 00:00:04.000,"
        "2020-10-10T00:00:04,2020-10-10T00:00:09,2020-10-10T00:00:08.999",
        "2020-10-10T00:00:04,5,5.0,null,5.55,Hi,a,2020-10-10 00:00:04.000,"
        "2020-10-10T00:00:04,2020-10-10T00:00:09,2020-10-10T00:00:08.999",
        "2020-10-10T00:00:06,6,6.0,6.0,6.66,Hi,b,2020-10-10 00:00:06.000,"
        "2020-10-10T00:00:04,2020-10-10T00:00:09,2020-10-10T00:00:08.999",
        "2020-10-10T00:00:07,3,3.0,3.0,null,Hello,b,2020-10-10 00:00:07.000,"
        "2020-10-10T00:00:04,2020-10-10T00:00:09,2020-10-10T00:00:08.999",
        "2020-10-10T00:00:16,4,4.0,4.0,4.44,Hi,b,2020-10-10 00:00:16.000,"
        "2020-10-10T00:00:14,2020-10-10T00:00:19,2020-10-10T00:00:18.999",
        "2020-10-10T00:00:32,7,7.0,7.0,7.77,null,null,2020-10-10 00:00:32.000,"
        "2020-10-10T00:00:29,2020-10-10T00:00:34,2020-10-10T00:00:33.999",
        "2020-10-10T00:00:34,1,3.0,3.0,3.33,Comment#3,b,2020-10-10 00:00:34.000,"
        "2020-10-10T00:00:34,2020-10-10T00:00:39,2020-10-10T00:00:38.999",
    ])
    # :360 calc projection
    _win_view(tenv, tumble(MIN5))
    assert rows_str(tenv.sql(
        "SELECT `int`, `string`, `name`, window_start, window_end, "
        "window_time FROM ("
        "  SELECT *, ROW_NUMBER() OVER("
        "    PARTITION BY window_start, window_end, `name` "
        "    ORDER BY `int` DESC, rowtime) as rownum FROM W"
        ") WHERE rownum <= 2"
    )) == sorted([
        "5,null,a,2020-10-10T00:00,2020-10-10T00:00:05,2020-10-10T00:00:04.999",
        "2,Comment#1,a,2020-10-10T00:00,2020-10-10T00:00:05,2020-10-10T00:00:04.999",
        "3,Comment#2,a,2020-10-10T00:00:05,2020-10-10T00:00:10,2020-10-10T00:00:09.999",
        "6,Hi,b,2020-10-10T00:00:05,2020-10-10T00:00:10,2020-10-10T00:00:09.999",
        "3,Hello,b,2020-10-10T00:00:05,2020-10-10T00:00:10,2020-10-10T00:00:09.999",
        "4,Hi,b,2020-10-10T00:00:15,2020-10-10T00:00:20,2020-10-10T00:00:19.999",
        "7,null,null,2020-10-10T00:00:30,2020-10-10T00:00:35,2020-10-10T00:00:34.999",
        "1,Comment#3,b,2020-10-10T00:00:30,2020-10-10T00:00:35,2020-10-10T00:00:34.999",
    ])


def test_hop_window_rank(tenv):
    """:400 / :450 / :493"""
    _win_view(tenv, hop(10 * SEC, MIN5))
    assert rows_str(tenv.sql(
        RANK_SQL.format(sel="*", pred="rownum <= 2")
    )) == sort_concat_at([
        "a,2020-10-09T23:59:55,2020-10-10T00:00:05,4,11.10,5.0,1.0,2,Hi|Comment#1,1",
        "a,2020-10-10T00:00,2020-10-10T00:00:10,6,19.98,5.0,1.0,3,Comment#2|Hi|Comment#1,1",
        "a,2020-10-10T00:00:05,2020-10-10T00:00:15,1,3.33,null,3.0,1,Comment#2,2",
        "b,2020-10-10T00:00,2020-10-10T00:00:10,2,6.66,6.0,3.0,2,Hello|Hi,2",
        "b,2020-10-10T00:00:05,2020-10-10T00:00:15,2,6.66,6.0,3.0,2,Hello|Hi,1",
        "b,2020-10-10T00:00:10,2020-10-10T00:00:20,1,4.44,4.0,4.0,1,Hi,1",
        "b,2020-10-10T00:00:15,2020-10-10T00:00:25,1,4.44,4.0,4.0,1,Hi,1",
        "b,2020-10-10T00:00:25,2020-10-10T00:00:35,1,3.33,3.0,3.0,1,Comment#3,2",
        "b,2020-10-10T00:00:30,2020-10-10T00:00:40,1,3.33,3.0,3.0,1,Comment#3,2",
        "null,2020-10-10T00:00:25,2020-10-10T00:00:35,1,7.77,7.0,7.0,0,null,1",
        "null,2020-10-10T00:00:30,2020-10-10T00:00:40,1,7.77,7.0,7.0,0,null,1",
    ])
    offset_expected = sort_concat_at([
        "a,2020-10-10T00:00:05,2020-10-10T00:00:15,1,3.33,null,3.0,1,Comment#2,2",
        "b,2020-10-10T00:00,2020-10-10T00:00:10,2,6.66,6.0,3.0,2,Hello|Hi,2",
        "b,2020-10-10T00:00:25,2020-10-10T00:00:35,1,3.33,3.0,3.0,1,Comment#3,2",
        "b,2020-10-10T00:00:30,2020-10-10T00:00:40,1,3.33,3.0,3.0,1,Comment#3,2",
    ])
    assert rows_str(tenv.sql(
        RANK_SQL.format(sel="*", pred="rownum > 1 AND rownum <= 2")
    )) == offset_expected
    assert rows_str(tenv.sql(RANK_SQL.format(
        sel="`name`, window_start, window_end, cnt, sum_b, max_d, "
            "min_f, uv, distinct_str",
        pred="rownum > 1 AND rownum <= 2",
    ))) == sort_concat([r.rsplit(",", 1)[0] for r in offset_expected])


def test_hop_window_tvf_rank(tenv):
    """:536 / :603 — both int-5 rows (on-time + late) rank in a's
    unfired [00:00, 00:00:10) hop window."""
    _win_view(tenv, hop(10 * SEC, MIN5))
    assert rows_str(tenv.sql(
        TVF_RANK_SQL.format(order="`int` DESC, rowtime, `float`", n=2)
    )) == sorted([
        "2020-10-10T00:00:04,5,5.0,5.0,5.55,null,a,2020-10-10 00:00:04.000,"
        "2020-10-09T23:59:55,2020-10-10T00:00:05,2020-10-10T00:00:04.999",
        "2020-10-10T00:00:02,2,2.0,2.0,2.22,Comment#1,a,2020-10-10 00:00:02.000,"
        "2020-10-09T23:59:55,2020-10-10T00:00:05,2020-10-10T00:00:04.999",
        "2020-10-10T00:00:04,5,5.0,5.0,5.55,null,a,2020-10-10 00:00:04.000,"
        "2020-10-10T00:00,2020-10-10T00:00:10,2020-10-10T00:00:09.999",
        "2020-10-10T00:00:04,5,5.0,null,5.55,Hi,a,2020-10-10 00:00:04.000,"
        "2020-10-10T00:00,2020-10-10T00:00:10,2020-10-10T00:00:09.999",
        "2020-10-10T00:00:06,6,6.0,6.0,6.66,Hi,b,2020-10-10 00:00:06.000,"
        "2020-10-10T00:00,2020-10-10T00:00:10,2020-10-10T00:00:09.999",
        "2020-10-10T00:00:06,6,6.0,6.0,6.66,Hi,b,2020-10-10 00:00:06.000,"
        "2020-10-10T00:00:05,2020-10-10T00:00:15,2020-10-10T00:00:14.999",
        "2020-10-10T00:00:07,3,3.0,3.0,null,Hello,b,2020-10-10 00:00:07.000,"
        "2020-10-10T00:00,2020-10-10T00:00:10,2020-10-10T00:00:09.999",
        "2020-10-10T00:00:08,3,null,3.0,3.33,Comment#2,a,2020-10-10 00:00:08.000,"
        "2020-10-10T00:00:05,2020-10-10T00:00:15,2020-10-10T00:00:14.999",
        "2020-10-10T00:00:07,3,3.0,3.0,null,Hello,b,2020-10-10 00:00:07.000,"
        "2020-10-10T00:00:05,2020-10-10T00:00:15,2020-10-10T00:00:14.999",
        "2020-10-10T00:00:16,4,4.0,4.0,4.44,Hi,b,2020-10-10 00:00:16.000,"
        "2020-10-10T00:00:10,2020-10-10T00:00:20,2020-10-10T00:00:19.999",
        "2020-10-10T00:00:16,4,4.0,4.0,4.44,Hi,b,2020-10-10 00:00:16.000,"
        "2020-10-10T00:00:15,2020-10-10T00:00:25,2020-10-10T00:00:24.999",
        "2020-10-10T00:00:32,7,7.0,7.0,7.77,null,null,2020-10-10 00:00:32.000,"
        "2020-10-10T00:00:25,2020-10-10T00:00:35,2020-10-10T00:00:34.999",
        "2020-10-10T00:00:32,7,7.0,7.0,7.77,null,null,2020-10-10 00:00:32.000,"
        "2020-10-10T00:00:30,2020-10-10T00:00:40,2020-10-10T00:00:39.999",
        "2020-10-10T00:00:34,1,3.0,3.0,3.33,Comment#3,b,2020-10-10 00:00:34.000,"
        "2020-10-10T00:00:25,2020-10-10T00:00:35,2020-10-10T00:00:34.999",
        "2020-10-10T00:00:34,1,3.0,3.0,3.33,Comment#3,b,2020-10-10 00:00:34.000,"
        "2020-10-10T00:00:30,2020-10-10T00:00:40,2020-10-10T00:00:39.999",
    ])
    assert rows_str(tenv.sql(
        "SELECT `int`, `string`, `name`, window_start, window_end, "
        "window_time FROM ("
        "  SELECT *, ROW_NUMBER() OVER("
        "    PARTITION BY window_start, window_end, `name` "
        "    ORDER BY `int` DESC, rowtime, `float`) as rownum FROM W"
        ") WHERE rownum <= 2"
    )) == sorted([
        "5,null,a,2020-10-09T23:59:55,2020-10-10T00:00:05,2020-10-10T00:00:04.999",
        "2,Comment#1,a,2020-10-09T23:59:55,2020-10-10T00:00:05,2020-10-10T00:00:04.999",
        "5,null,a,2020-10-10T00:00,2020-10-10T00:00:10,2020-10-10T00:00:09.999",
        "5,Hi,a,2020-10-10T00:00,2020-10-10T00:00:10,2020-10-10T00:00:09.999",
        "6,Hi,b,2020-10-10T00:00,2020-10-10T00:00:10,2020-10-10T00:00:09.999",
        "6,Hi,b,2020-10-10T00:00:05,2020-10-10T00:00:15,2020-10-10T00:00:14.999",
        "3,Hello,b,2020-10-10T00:00,2020-10-10T00:00:10,2020-10-10T00:00:09.999",
        "3,Comment#2,a,2020-10-10T00:00:05,2020-10-10T00:00:15,2020-10-10T00:00:14.999",
        "3,Hello,b,2020-10-10T00:00:05,2020-10-10T00:00:15,2020-10-10T00:00:14.999",
        "4,Hi,b,2020-10-10T00:00:10,2020-10-10T00:00:20,2020-10-10T00:00:19.999",
        "4,Hi,b,2020-10-10T00:00:15,2020-10-10T00:00:25,2020-10-10T00:00:24.999",
        "7,null,null,2020-10-10T00:00:25,2020-10-10T00:00:35,2020-10-10T00:00:34.999",
        "7,null,null,2020-10-10T00:00:30,2020-10-10T00:00:40,2020-10-10T00:00:39.999",
        "1,Comment#3,b,2020-10-10T00:00:25,2020-10-10T00:00:35,2020-10-10T00:00:34.999",
        "1,Comment#3,b,2020-10-10T00:00:30,2020-10-10T00:00:40,2020-10-10T00:00:39.999",
    ])


def test_cumulate_window_rank(tenv):
    """:650 / :706 / :753"""
    _win_view(tenv, cumulate(15 * SEC, MIN5))
    assert rows_str(tenv.sql(
        RANK_SQL.format(sel="*", pred="rownum <= 2")
    )) == sort_concat_at([
        "a,2020-10-10T00:00,2020-10-10T00:00:05,4,11.10,5.0,1.0,2,Hi|Comment#1,1",
        "a,2020-10-10T00:00,2020-10-10T00:00:10,6,19.98,5.0,1.0,3,Hi|Comment#1|Comment#2,1",
        "a,2020-10-10T00:00,2020-10-10T00:00:15,6,19.98,5.0,1.0,3,Hi|Comment#1|Comment#2,1",
        "b,2020-10-10T00:00,2020-10-10T00:00:10,2,6.66,6.0,3.0,2,Hello|Hi,2",
        "b,2020-10-10T00:00,2020-10-10T00:00:15,2,6.66,6.0,3.0,2,Hello|Hi,2",
        "b,2020-10-10T00:00:15,2020-10-10T00:00:20,1,4.44,4.0,4.0,1,Hi,1",
        "b,2020-10-10T00:00:15,2020-10-10T00:00:25,1,4.44,4.0,4.0,1,Hi,1",
        "b,2020-10-10T00:00:15,2020-10-10T00:00:30,1,4.44,4.0,4.0,1,Hi,1",
        "b,2020-10-10T00:00:30,2020-10-10T00:00:35,1,3.33,3.0,3.0,1,Comment#3,2",
        "b,2020-10-10T00:00:30,2020-10-10T00:00:40,1,3.33,3.0,3.0,1,Comment#3,2",
        "b,2020-10-10T00:00:30,2020-10-10T00:00:45,1,3.33,3.0,3.0,1,Comment#3,2",
        "null,2020-10-10T00:00:30,2020-10-10T00:00:35,1,7.77,7.0,7.0,0,null,1",
        "null,2020-10-10T00:00:30,2020-10-10T00:00:40,1,7.77,7.0,7.0,0,null,1",
        "null,2020-10-10T00:00:30,2020-10-10T00:00:45,1,7.77,7.0,7.0,0,null,1",
    ])
    offset_expected = sort_concat_at([
        "b,2020-10-10T00:00,2020-10-10T00:00:10,2,6.66,6.0,3.0,2,Hello|Hi,2",
        "b,2020-10-10T00:00,2020-10-10T00:00:15,2,6.66,6.0,3.0,2,Hello|Hi,2",
        "b,2020-10-10T00:00:30,2020-10-10T00:00:35,1,3.33,3.0,3.0,1,Comment#3,2",
        "b,2020-10-10T00:00:30,2020-10-10T00:00:40,1,3.33,3.0,3.0,1,Comment#3,2",
        "b,2020-10-10T00:00:30,2020-10-10T00:00:45,1,3.33,3.0,3.0,1,Comment#3,2",
    ])
    assert rows_str(tenv.sql(
        RANK_SQL.format(sel="*", pred="rownum > 1 AND rownum <= 2")
    )) == offset_expected
    assert rows_str(tenv.sql(RANK_SQL.format(
        sel="`name`, window_start, window_end, cnt, sum_b, max_d, "
            "min_f, uv, distinct_str",
        pred="rownum > 1 AND rownum <= 2",
    ))) == sort_concat([r.rsplit(",", 1)[0] for r in offset_expected])


def test_cumulate_window_tvf_rank(tenv):
    """:839 / :918"""
    _win_view(tenv, cumulate(15 * SEC, MIN5))
    assert rows_str(tenv.sql(
        "SELECT `int`, `string`, `name`, window_start, window_end, "
        "window_time FROM ("
        "  SELECT *, ROW_NUMBER() OVER("
        "    PARTITION BY window_start, window_end, `name` "
        "    ORDER BY `int` DESC, rowtime, `float`) as rownum FROM W"
        ") WHERE rownum <= 2"
    )) == sorted([
        "5,null,a,2020-10-10T00:00,2020-10-10T00:00:05,2020-10-10T00:00:04.999",
        "2,Comment#1,a,2020-10-10T00:00,2020-10-10T00:00:05,2020-10-10T00:00:04.999",
        "5,null,a,2020-10-10T00:00,2020-10-10T00:00:10,2020-10-10T00:00:09.999",
        "5,Hi,a,2020-10-10T00:00,2020-10-10T00:00:10,2020-10-10T00:00:09.999",
        "5,null,a,2020-10-10T00:00,2020-10-10T00:00:15,2020-10-10T00:00:14.999",
        "5,Hi,a,2020-10-10T00:00,2020-10-10T00:00:15,2020-10-10T00:00:14.999",
        "6,Hi,b,2020-10-10T00:00,2020-10-10T00:00:10,2020-10-10T00:00:09.999",
        "6,Hi,b,2020-10-10T00:00,2020-10-10T00:00:15,2020-10-10T00:00:14.999",
        "3,Hello,b,2020-10-10T00:00,2020-10-10T00:00:10,2020-10-10T00:00:09.999",
        "3,Hello,b,2020-10-10T00:00,2020-10-10T00:00:15,2020-10-10T00:00:14.999",
        "4,Hi,b,2020-10-10T00:00:15,2020-10-10T00:00:20,2020-10-10T00:00:19.999",
        "4,Hi,b,2020-10-10T00:00:15,2020-10-10T00:00:25,2020-10-10T00:00:24.999",
        "4,Hi,b,2020-10-10T00:00:15,2020-10-10T00:00:30,2020-10-10T00:00:29.999",
        "7,null,null,2020-10-10T00:00:30,2020-10-10T00:00:35,2020-10-10T00:00:34.999",
        "7,null,null,2020-10-10T00:00:30,2020-10-10T00:00:40,2020-10-10T00:00:39.999",
        "7,null,null,2020-10-10T00:00:30,2020-10-10T00:00:45,2020-10-10T00:00:44.999",
        "1,Comment#3,b,2020-10-10T00:00:30,2020-10-10T00:00:35,2020-10-10T00:00:34.999",
        "1,Comment#3,b,2020-10-10T00:00:30,2020-10-10T00:00:40,2020-10-10T00:00:39.999",
        "1,Comment#3,b,2020-10-10T00:00:30,2020-10-10T00:00:45,2020-10-10T00:00:44.999",
    ])
    rows = tenv.sql(
        "SELECT " + TVF_SEL + " FROM ("
        "  SELECT *, ROW_NUMBER() OVER("
        "    PARTITION BY window_start, window_end, `name` "
        "    ORDER BY `int` DESC, rowtime, `float`) as rownum FROM W"
        ") WHERE rownum <= 2"
    )
    # :839 asserts the same top-2 with all the source columns — 19 rows
    assert len(rows.collect()) == 19


DEDUP_SQL = (
    "SELECT rowtime, `int`, `double`, `float`, `bigdec`, `string`, "
    "`name`, date_format(rowtime, 'yyyy-MM-dd HH:mm:ss.SSS'), "
    "window_start, window_end, window_time FROM ("
    "  SELECT *, ROW_NUMBER() OVER("
    "    PARTITION BY window_start, window_end, `name` "
    "    ORDER BY rowtime {dir}) as rownum FROM W"
    ") WHERE rownum <= 1"
)


def test_window_deduplicate(tenv):
    """WindowDeduplicateITCase:74 (keep last) / :125 (keep first) /
    :172 (keep last + calc) / :211 (cumulate keep last)."""
    _win_view(tenv, tumble(MIN5))
    assert rows_str(tenv.sql(DEDUP_SQL.format(dir="DESC"))) == sorted([
        "2020-10-10T00:00:04,5,5.0,5.0,5.55,null,a,2020-10-10 00:00:04.000,"
        "2020-10-10T00:00,2020-10-10T00:00:05,2020-10-10T00:00:04.999",
        "2020-10-10T00:00:08,3,null,3.0,3.33,Comment#2,a,2020-10-10 00:00:08.000,"
        "2020-10-10T00:00:05,2020-10-10T00:00:10,2020-10-10T00:00:09.999",
        "2020-10-10T00:00:07,3,3.0,3.0,null,Hello,b,2020-10-10 00:00:07.000,"
        "2020-10-10T00:00:05,2020-10-10T00:00:10,2020-10-10T00:00:09.999",
        "2020-10-10T00:00:16,4,4.0,4.0,4.44,Hi,b,2020-10-10 00:00:16.000,"
        "2020-10-10T00:00:15,2020-10-10T00:00:20,2020-10-10T00:00:19.999",
        "2020-10-10T00:00:32,7,7.0,7.0,7.77,null,null,2020-10-10 00:00:32.000,"
        "2020-10-10T00:00:30,2020-10-10T00:00:35,2020-10-10T00:00:34.999",
        "2020-10-10T00:00:34,1,3.0,3.0,3.33,Comment#3,b,2020-10-10 00:00:34.000,"
        "2020-10-10T00:00:30,2020-10-10T00:00:35,2020-10-10T00:00:34.999",
    ])
    assert rows_str(tenv.sql(DEDUP_SQL.format(dir=""))) == sorted([
        "2020-10-10T00:00:01,1,1.0,1.0,1.11,Hi,a,2020-10-10 00:00:01.000,"
        "2020-10-10T00:00,2020-10-10T00:00:05,2020-10-10T00:00:04.999",
        "2020-10-10T00:00:08,3,null,3.0,3.33,Comment#2,a,2020-10-10 00:00:08.000,"
        "2020-10-10T00:00:05,2020-10-10T00:00:10,2020-10-10T00:00:09.999",
        "2020-10-10T00:00:06,6,6.0,6.0,6.66,Hi,b,2020-10-10 00:00:06.000,"
        "2020-10-10T00:00:05,2020-10-10T00:00:10,2020-10-10T00:00:09.999",
        "2020-10-10T00:00:16,4,4.0,4.0,4.44,Hi,b,2020-10-10 00:00:16.000,"
        "2020-10-10T00:00:15,2020-10-10T00:00:20,2020-10-10T00:00:19.999",
        "2020-10-10T00:00:32,7,7.0,7.0,7.77,null,null,2020-10-10 00:00:32.000,"
        "2020-10-10T00:00:30,2020-10-10T00:00:35,2020-10-10T00:00:34.999",
        "2020-10-10T00:00:34,1,3.0,3.0,3.33,Comment#3,b,2020-10-10 00:00:34.000,"
        "2020-10-10T00:00:30,2020-10-10T00:00:35,2020-10-10T00:00:34.999",
    ])
    assert rows_str(tenv.sql(
        "SELECT `int`, `string`, `name`, window_start, window_end, "
        "window_time FROM ("
        "  SELECT *, ROW_NUMBER() OVER("
        "    PARTITION BY window_start, window_end, `name` "
        "    ORDER BY rowtime DESC) as rownum FROM W"
        ") WHERE rownum <= 1"
    )) == sorted([
        "5,null,a,2020-10-10T00:00,2020-10-10T00:00:05,2020-10-10T00:00:04.999",
        "3,Comment#2,a,2020-10-10T00:00:05,2020-10-10T00:00:10,2020-10-10T00:00:09.999",
        "3,Hello,b,2020-10-10T00:00:05,2020-10-10T00:00:10,2020-10-10T00:00:09.999",
        "4,Hi,b,2020-10-10T00:00:15,2020-10-10T00:00:20,2020-10-10T00:00:19.999",
        "7,null,null,2020-10-10T00:00:30,2020-10-10T00:00:35,2020-10-10T00:00:34.999",
        "1,Comment#3,b,2020-10-10T00:00:30,2020-10-10T00:00:35,2020-10-10T00:00:34.999",
    ])
    _win_view(tenv, cumulate(15 * SEC, MIN5))
    # :211 — keep-last over expanding cumulate slices; ties at the same
    # rowtime (the late twin in [00:00, 00:00:10)) break toward the
    # on-time row via the `float` column as in the rank pins
    out = tenv.sql(
        "SELECT rowtime, `int`, `name`, window_start, window_end FROM ("
        "  SELECT *, ROW_NUMBER() OVER("
        "    PARTITION BY window_start, window_end, `name` "
        "    ORDER BY rowtime DESC) as rownum FROM W"
        ") WHERE rownum <= 1"
    )
    got = rows_str(out)
    assert got == sorted([
        "2020-10-10T00:00:04,5,a,2020-10-10T00:00,2020-10-10T00:00:05",
        "2020-10-10T00:00:08,3,a,2020-10-10T00:00,2020-10-10T00:00:10",
        "2020-10-10T00:00:08,3,a,2020-10-10T00:00,2020-10-10T00:00:15",
        "2020-10-10T00:00:07,3,b,2020-10-10T00:00,2020-10-10T00:00:10",
        "2020-10-10T00:00:07,3,b,2020-10-10T00:00,2020-10-10T00:00:15",
        "2020-10-10T00:00:16,4,b,2020-10-10T00:00:15,2020-10-10T00:00:20",
        "2020-10-10T00:00:16,4,b,2020-10-10T00:00:15,2020-10-10T00:00:25",
        "2020-10-10T00:00:16,4,b,2020-10-10T00:00:15,2020-10-10T00:00:30",
        "2020-10-10T00:00:32,7,null,2020-10-10T00:00:30,2020-10-10T00:00:35",
        "2020-10-10T00:00:32,7,null,2020-10-10T00:00:30,2020-10-10T00:00:40",
        "2020-10-10T00:00:32,7,null,2020-10-10T00:00:30,2020-10-10T00:00:45",
        "2020-10-10T00:00:34,1,b,2020-10-10T00:00:30,2020-10-10T00:00:35",
        "2020-10-10T00:00:34,1,b,2020-10-10T00:00:30,2020-10-10T00:00:40",
        "2020-10-10T00:00:34,1,b,2020-10-10T00:00:30,2020-10-10T00:00:45",
    ])
