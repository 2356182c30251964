"""Verbatim harvest of the reference's streaming WindowJoinITCase (r13
— VERDICT r12 next-item #1, second tranche).

Reference: flink-table/flink-table-planner/src/test/scala/org/apache/
flink/table/planner/runtime/stream/sql/WindowJoinITCase.scala (:line per
pin). T1 = TestData.windowDataWithTimestamp, T2 =
TestData.windowData2WithTimestamp (the same rows with name 'a' -> 'a1'),
both with per-element rowtime - 1s watermarks; window survivors come
from streaming/arrival.py via tests/test_itcase_window_agg._win_view.

Tally (20 @TestTemplate methods): 20/20 pinned — window inner joins at
the aggregate and raw-WTF level (incl. +1s/-1s window offsets),
IS NOT DISTINCT FROM null-key windows joining, EXISTS/IN semi joins,
NOT EXISTS/NOT IN anti joins, LEFT/RIGHT/FULL OUTER. The
useTimestampLtz=true parameterization is covered-by-variant (Spark
timestamps are instant-semantics; the TIMESTAMP flavor is pinned).
"""

from __future__ import annotations

import pytest

from tests.test_itcase_window_agg import (
    MIN5,
    SEC,
    WINDOW_DATA,
    _make_row,
    _seq,
    rows_str,
    surviving_windows,
    tumble,
)

WINDOW_DATA_2 = [
    r[:-1] + ("a1" if r[-1] == "a" else r[-1],) for r in WINDOW_DATA
]

SCHEMA2 = (
    "`int` int, `double` double, `float` float, bigdec decimal(10,2), "
    "string string, name string, rowtime timestamp, "
    "window_start timestamp, window_end timestamp, window_time timestamp"
)


def _join_views(tenv, assigner):
    for name, data in (("WL", WINDOW_DATA), ("WR", WINDOW_DATA_2)):
        pairs = surviving_windows(_seq(data), assigner)
        rows = [_make_row(p, ts, ws, we) for ts, p, _i, ws, we in pairs]
        tenv.spark.createDataFrame(rows, SCHEMA2).createOrReplaceTempView(
            name
        )


AGG = (
    "SELECT `name`, window_start, window_end, "
    "COUNT(DISTINCT `string`) as {uv} FROM {src} "
    "GROUP BY `name`, window_start, window_end"
)

WTF_SEL = (
    "L.rowtime, L.`int`, L.`double`, L.`float`, L.`bigdec`, L.`string`, "
    "L.`name`, date_format(L.rowtime, 'yyyy-MM-dd HH:mm:ss.SSS'), "
    "L.window_start, L.window_end, L.window_time"
)


@pytest.fixture(scope="module")
def tenv(spark):
    from apache_flink_spark.environment import TableEnvironment

    env = TableEnvironment(spark=spark)
    _join_views(env, tumble(MIN5))
    return env


INNER_EXPECTED = sorted([
    "b,2020-10-10T00:00:05,2020-10-10T00:00:10,2,2",
    "b,2020-10-10T00:00:15,2020-10-10T00:00:20,1,1",
    "b,2020-10-10T00:00:30,2020-10-10T00:00:35,1,1",
])


def test_inner_join_agg(tenv):
    """:106 / :362 (IS NOT DISTINCT FROM joins the null-name windows)."""
    base = (
        "SELECT L.`name`, L.window_start, L.window_end, uv1, uv2 "
        f"FROM ({AGG.format(uv='uv1', src='WL')}) L "
        f"JOIN ({AGG.format(uv='uv2', src='WR')}) R "
        "ON L.window_start = R.window_start AND "
        "L.window_end = R.window_end AND {cond}"
    )
    assert rows_str(tenv.sql(
        base.format(cond="L.`name` = R.`name`")
    )) == INNER_EXPECTED
    assert rows_str(tenv.sql(
        base.format(cond="L.`name` IS NOT DISTINCT from R.`name`")
    )) == sorted(INNER_EXPECTED + [
        "null,2020-10-10T00:00:30,2020-10-10T00:00:35,0,0",
    ])


WTF_B_ROWS = [
    "2020-10-10T00:00:06,6,6.0,6.0,6.66,Hi,b,2020-10-10 00:00:06.000,"
    "2020-10-10T00:00:05,2020-10-10T00:00:10,2020-10-10T00:00:09.999",
    "2020-10-10T00:00:07,3,3.0,3.0,null,Hello,b,2020-10-10 00:00:07.000,"
    "2020-10-10T00:00:05,2020-10-10T00:00:10,2020-10-10T00:00:09.999",
    "2020-10-10T00:00:16,4,4.0,4.0,4.44,Hi,b,2020-10-10 00:00:16.000,"
    "2020-10-10T00:00:15,2020-10-10T00:00:20,2020-10-10T00:00:19.999",
    "2020-10-10T00:00:34,1,3.0,3.0,3.33,Comment#3,b,2020-10-10 00:00:34.000,"
    "2020-10-10T00:00:30,2020-10-10T00:00:35,2020-10-10T00:00:34.999",
]


def test_inner_join_wtf(tenv):
    """:146 — raw (row x window) pairs join on (window, name); each
    [00:00:05,00:00:10) b-row matches both right rows."""
    out = tenv.sql(
        f"SELECT {WTF_SEL}, R.`int`, R.`string`, R.`name` "
        "FROM WL L JOIN WR R "
        "ON L.window_start = R.window_start AND "
        "L.window_end = R.window_end AND L.`name` = R.`name`"
    )
    assert rows_str(out) == sorted([
        WTF_B_ROWS[0] + ",3,Hello,b", WTF_B_ROWS[0] + ",6,Hi,b",
        WTF_B_ROWS[1] + ",3,Hello,b", WTF_B_ROWS[1] + ",6,Hi,b",
        WTF_B_ROWS[2] + ",4,Hi,b", WTF_B_ROWS[3] + ",1,Comment#3,b",
    ])


def test_inner_join_wtf_with_offsets(tenv):
    """:218 (+1s) / :290 (-1s)."""
    try:
        _join_views(tenv, tumble(MIN5, SEC))
        out = tenv.sql(
            f"SELECT {WTF_SEL}, R.`int`, R.`string`, R.`name` "
            "FROM WL L JOIN WR R "
            "ON L.window_start = R.window_start AND "
            "L.window_end = R.window_end AND L.`name` = R.`name`"
        )
        assert rows_str(out) == sorted([
            "2020-10-10T00:00:06,6,6.0,6.0,6.66,Hi,b,2020-10-10 00:00:06.000,"
            "2020-10-10T00:00:06,2020-10-10T00:00:11,2020-10-10T00:00:10.999,3,Hello,b",
            "2020-10-10T00:00:06,6,6.0,6.0,6.66,Hi,b,2020-10-10 00:00:06.000,"
            "2020-10-10T00:00:06,2020-10-10T00:00:11,2020-10-10T00:00:10.999,6,Hi,b",
            "2020-10-10T00:00:07,3,3.0,3.0,null,Hello,b,2020-10-10 00:00:07.000,"
            "2020-10-10T00:00:06,2020-10-10T00:00:11,2020-10-10T00:00:10.999,3,Hello,b",
            "2020-10-10T00:00:07,3,3.0,3.0,null,Hello,b,2020-10-10 00:00:07.000,"
            "2020-10-10T00:00:06,2020-10-10T00:00:11,2020-10-10T00:00:10.999,6,Hi,b",
            "2020-10-10T00:00:16,4,4.0,4.0,4.44,Hi,b,2020-10-10 00:00:16.000,"
            "2020-10-10T00:00:16,2020-10-10T00:00:21,2020-10-10T00:00:20.999,4,Hi,b",
            "2020-10-10T00:00:34,1,3.0,3.0,3.33,Comment#3,b,2020-10-10 00:00:34.000,"
            "2020-10-10T00:00:31,2020-10-10T00:00:36,2020-10-10T00:00:35.999,1,Comment#3,b",
        ])
        _join_views(tenv, tumble(MIN5, -SEC))
        out = tenv.sql(
            f"SELECT {WTF_SEL}, R.`int`, R.`string`, R.`name` "
            "FROM WL L JOIN WR R "
            "ON L.window_start = R.window_start AND "
            "L.window_end = R.window_end AND L.`name` = R.`name`"
        )
        assert rows_str(out) == sorted([
            "2020-10-10T00:00:06,6,6.0,6.0,6.66,Hi,b,2020-10-10 00:00:06.000,"
            "2020-10-10T00:00:04,2020-10-10T00:00:09,2020-10-10T00:00:08.999,3,Hello,b",
            "2020-10-10T00:00:06,6,6.0,6.0,6.66,Hi,b,2020-10-10 00:00:06.000,"
            "2020-10-10T00:00:04,2020-10-10T00:00:09,2020-10-10T00:00:08.999,6,Hi,b",
            "2020-10-10T00:00:07,3,3.0,3.0,null,Hello,b,2020-10-10 00:00:07.000,"
            "2020-10-10T00:00:04,2020-10-10T00:00:09,2020-10-10T00:00:08.999,3,Hello,b",
            "2020-10-10T00:00:07,3,3.0,3.0,null,Hello,b,2020-10-10 00:00:07.000,"
            "2020-10-10T00:00:04,2020-10-10T00:00:09,2020-10-10T00:00:08.999,6,Hi,b",
            "2020-10-10T00:00:16,4,4.0,4.0,4.44,Hi,b,2020-10-10 00:00:16.000,"
            "2020-10-10T00:00:14,2020-10-10T00:00:19,2020-10-10T00:00:18.999,4,Hi,b",
            "2020-10-10T00:00:34,1,3.0,3.0,3.33,Comment#3,b,2020-10-10 00:00:34.000,"
            "2020-10-10T00:00:34,2020-10-10T00:00:39,2020-10-10T00:00:38.999,1,Comment#3,b",
        ])
    finally:
        _join_views(tenv, tumble(MIN5))


def test_inner_join_is_not_distinct_from_wtf(tenv):
    """:405 — the null-name rows join under the null-safe equality."""
    out = tenv.sql(
        f"SELECT {WTF_SEL}, R.`int`, R.`string`, R.`name` "
        "FROM WL L JOIN WR R "
        "ON L.window_start = R.window_start AND "
        "L.window_end = R.window_end AND "
        "L.`name` IS NOT DISTINCT from R.`name`"
    )
    assert rows_str(out) == sorted([
        WTF_B_ROWS[0] + ",3,Hello,b", WTF_B_ROWS[0] + ",6,Hi,b",
        WTF_B_ROWS[1] + ",3,Hello,b", WTF_B_ROWS[1] + ",6,Hi,b",
        WTF_B_ROWS[2] + ",4,Hi,b", WTF_B_ROWS[3] + ",1,Comment#3,b",
        "2020-10-10T00:00:32,7,7.0,7.0,7.77,null,null,"
        "2020-10-10 00:00:32.000,2020-10-10T00:00:30,"
        "2020-10-10T00:00:35,2020-10-10T00:00:34.999,7,null,null",
    ])


SEMI_EXPECTED = sorted([
    "b,2020-10-10T00:00:05,2020-10-10T00:00:10,2",
    "b,2020-10-10T00:00:15,2020-10-10T00:00:20,1",
    "b,2020-10-10T00:00:30,2020-10-10T00:00:35,1",
])

def test_semi_joins(tenv):
    """:481 (EXISTS) / :521 (EXISTS over raw WTF rows) / :580 (IN) /
    :619 (IN over raw rows)."""
    agg_l = AGG.format(uv="uv1", src="WL")
    agg_r = AGG.format(uv="uv2", src="WR")
    assert rows_str(tenv.sql(
        f"SELECT * FROM ({agg_l}) L WHERE EXISTS ("
        f"SELECT * FROM ({agg_r}) R "
        "WHERE L.window_start = R.window_start AND "
        "L.window_end = R.window_end AND L.`name` = R.`name`)"
    )) == SEMI_EXPECTED
    assert rows_str(tenv.sql(
        f"SELECT * FROM ({agg_l}) L WHERE L.`name` IN ("
        f"SELECT `name` FROM ({agg_r}) R "
        "WHERE L.window_start = R.window_start AND "
        "L.window_end = R.window_end)"
    )) == SEMI_EXPECTED
    wtf_semi = sorted([
        "6,6.0,6.0,6.66,Hi,b,2020-10-10 00:00:06.000,"
        "2020-10-10T00:00:05,2020-10-10T00:00:10,2020-10-10T00:00:09.999",
        "3,3.0,3.0,null,Hello,b,2020-10-10 00:00:07.000,"
        "2020-10-10T00:00:05,2020-10-10T00:00:10,2020-10-10T00:00:09.999",
        "4,4.0,4.0,4.44,Hi,b,2020-10-10 00:00:16.000,"
        "2020-10-10T00:00:15,2020-10-10T00:00:20,2020-10-10T00:00:19.999",
        "1,3.0,3.0,3.33,Comment#3,b,2020-10-10 00:00:34.000,"
        "2020-10-10T00:00:30,2020-10-10T00:00:35,2020-10-10T00:00:34.999",
    ])
    wtf_sel = (
        "L.`int`, L.`double`, L.`float`, L.`bigdec`, L.`string`, "
        "L.`name`, date_format(L.rowtime, 'yyyy-MM-dd HH:mm:ss.SSS'), "
        "L.window_start, L.window_end, L.window_time"
    )
    assert rows_str(tenv.sql(
        f"SELECT {wtf_sel} FROM WL L WHERE EXISTS ("
        "SELECT * FROM WR R "
        "WHERE L.window_start = R.window_start AND "
        "L.window_end = R.window_end AND L.`name` = R.`name`)"
    )) == wtf_semi
    assert rows_str(tenv.sql(
        f"SELECT {wtf_sel} FROM WL L WHERE L.`name` IN ("
        "SELECT `name` FROM WR R "
        "WHERE L.window_start = R.window_start AND "
        "L.window_end = R.window_end AND L.`name` = R.`name`)"
    )) == wtf_semi


def test_anti_joins(tenv):
    """:678 (NOT EXISTS) / :718 (raw rows + float filter) / :785
    (NOT IN — null-name windows vanish under three-valued NOT IN) /
    :822 (raw rows)."""
    agg_l = AGG.format(uv="uv1", src="WL")
    agg_r = AGG.format(uv="uv2", src="WR")
    assert rows_str(tenv.sql(
        f"SELECT * FROM ({agg_l}) L WHERE NOT EXISTS ("
        f"SELECT * FROM ({agg_r}) R "
        "WHERE L.window_start = R.window_start AND "
        "L.window_end = R.window_end AND L.`name` = R.`name`)"
    )) == sorted([
        "a,2020-10-10T00:00,2020-10-10T00:00:05,2",
        "a,2020-10-10T00:00:05,2020-10-10T00:00:10,1",
        "null,2020-10-10T00:00:30,2020-10-10T00:00:35,0",
    ])
    assert rows_str(tenv.sql(
        f"SELECT * FROM ({agg_l}) L WHERE L.`name` NOT IN ("
        f"SELECT `name` FROM ({agg_r}) R "
        "WHERE L.window_start = R.window_start AND "
        "L.window_end = R.window_end)"
    )) == sorted([
        "a,2020-10-10T00:00,2020-10-10T00:00:05,2",
        "a,2020-10-10T00:00:05,2020-10-10T00:00:10,1",
    ])
    wtf_sel = (
        "L.`int`, L.`double`, L.`float`, L.`bigdec`, L.`string`, "
        "L.`name`, date_format(L.rowtime, 'yyyy-MM-dd HH:mm:ss.SSS'), "
        "L.window_start, L.window_end, L.window_time"
    )
    anti_base = sorted([
        "1,1.0,1.0,1.11,Hi,a,2020-10-10 00:00:01.000,"
        "2020-10-10T00:00,2020-10-10T00:00:05,2020-10-10T00:00:04.999",
        "2,2.0,2.0,2.22,Comment#1,a,2020-10-10 00:00:02.000,"
        "2020-10-10T00:00,2020-10-10T00:00:05,2020-10-10T00:00:04.999",
        "2,2.0,2.0,2.22,Comment#1,a,2020-10-10 00:00:03.000,"
        "2020-10-10T00:00,2020-10-10T00:00:05,2020-10-10T00:00:04.999",
        "5,5.0,5.0,5.55,null,a,2020-10-10 00:00:04.000,"
        "2020-10-10T00:00,2020-10-10T00:00:05,2020-10-10T00:00:04.999",
        "3,null,3.0,3.33,Comment#2,a,2020-10-10 00:00:08.000,"
        "2020-10-10T00:00:05,2020-10-10T00:00:10,2020-10-10T00:00:09.999",
    ])
    assert rows_str(tenv.sql(
        f"SELECT {wtf_sel} FROM WL L WHERE NOT EXISTS ("
        "SELECT * FROM WR R "
        "WHERE L.window_start = R.window_start AND "
        "L.window_end = R.window_end AND L.`name` = R.`name`) "
        "AND L.`float` IS NOT NULL"
    )) == sorted(anti_base + [
        "7,7.0,7.0,7.77,null,null,2020-10-10 00:00:32.000,"
        "2020-10-10T00:00:30,2020-10-10T00:00:35,2020-10-10T00:00:34.999",
    ])
    assert rows_str(tenv.sql(
        f"SELECT {wtf_sel} FROM WL L WHERE L.`name` NOT IN ("
        "SELECT `name` FROM WR R "
        "WHERE L.window_start = R.window_start AND "
        "L.window_end = R.window_end) AND L.`float` IS NOT NULL"
    )) == anti_base


def test_outer_joins(tenv):
    """:885 / :929 / :974 / :1018 / :1063 / :1111"""
    agg_l = AGG.format(uv="uv1", src="WL")
    agg_r = AGG.format(uv="uv2", src="WR")
    left_base = (
        "SELECT L.`name`, L.window_start, L.window_end, uv1, uv2 "
        f"FROM ({agg_l}) L LEFT JOIN ({agg_r}) R "
        "ON L.window_start = R.window_start AND "
        "L.window_end = R.window_end AND {cond}"
    )
    assert rows_str(tenv.sql(
        left_base.format(cond="L.`name` = R.`name`")
    )) == sorted([
        "a,2020-10-10T00:00,2020-10-10T00:00:05,2,null",
        "a,2020-10-10T00:00:05,2020-10-10T00:00:10,1,null",
        "b,2020-10-10T00:00:05,2020-10-10T00:00:10,2,2",
        "b,2020-10-10T00:00:15,2020-10-10T00:00:20,1,1",
        "b,2020-10-10T00:00:30,2020-10-10T00:00:35,1,1",
        "null,2020-10-10T00:00:30,2020-10-10T00:00:35,0,null",
    ])
    assert rows_str(tenv.sql(
        left_base.format(cond="L.`name` IS NOT DISTINCT from R.`name`")
    )) == sorted([
        "a,2020-10-10T00:00,2020-10-10T00:00:05,2,null",
        "a,2020-10-10T00:00:05,2020-10-10T00:00:10,1,null",
        "b,2020-10-10T00:00:05,2020-10-10T00:00:10,2,2",
        "b,2020-10-10T00:00:15,2020-10-10T00:00:20,1,1",
        "b,2020-10-10T00:00:30,2020-10-10T00:00:35,1,1",
        "null,2020-10-10T00:00:30,2020-10-10T00:00:35,0,0",
    ])
    right_base = (
        "SELECT L.`name`, R.window_start, R.window_end, uv1, uv2 "
        f"FROM ({agg_l}) L RIGHT JOIN ({agg_r}) R "
        "ON L.window_start = R.window_start AND "
        "L.window_end = R.window_end AND {cond}"
    )
    assert rows_str(tenv.sql(
        right_base.format(cond="L.`name` = R.`name`")
    )) == sorted([
        "null,2020-10-10T00:00,2020-10-10T00:00:05,null,2",
        "null,2020-10-10T00:00:05,2020-10-10T00:00:10,null,1",
        "b,2020-10-10T00:00:05,2020-10-10T00:00:10,2,2",
        "b,2020-10-10T00:00:15,2020-10-10T00:00:20,1,1",
        "b,2020-10-10T00:00:30,2020-10-10T00:00:35,1,1",
        "null,2020-10-10T00:00:30,2020-10-10T00:00:35,null,0",
    ])
    assert rows_str(tenv.sql(
        right_base.format(cond="L.`name` IS NOT DISTINCT from R.`name`")
    )) == sorted([
        "null,2020-10-10T00:00,2020-10-10T00:00:05,null,2",
        "null,2020-10-10T00:00:05,2020-10-10T00:00:10,null,1",
        "b,2020-10-10T00:00:05,2020-10-10T00:00:10,2,2",
        "b,2020-10-10T00:00:15,2020-10-10T00:00:20,1,1",
        "b,2020-10-10T00:00:30,2020-10-10T00:00:35,1,1",
        "null,2020-10-10T00:00:30,2020-10-10T00:00:35,0,0",
    ])
    full_base = (
        "SELECT L.`name`, L.window_start, L.window_end, R.`name`, "
        "R.window_start, R.window_end, uv1, uv2 "
        f"FROM ({agg_l}) L FULL OUTER JOIN ({agg_r}) R "
        "ON L.window_start = R.window_start AND "
        "L.window_end = R.window_end AND {cond}"
    )
    assert rows_str(tenv.sql(
        full_base.format(cond="L.`name` = R.`name`")
    )) == sorted([
        "a,2020-10-10T00:00,2020-10-10T00:00:05,null,null,null,2,null",
        "a,2020-10-10T00:00:05,2020-10-10T00:00:10,null,null,null,1,null",
        "b,2020-10-10T00:00:05,2020-10-10T00:00:10,b,2020-10-10T00:00:05,"
        "2020-10-10T00:00:10,2,2",
        "b,2020-10-10T00:00:15,2020-10-10T00:00:20,b,2020-10-10T00:00:15,"
        "2020-10-10T00:00:20,1,1",
        "b,2020-10-10T00:00:30,2020-10-10T00:00:35,b,2020-10-10T00:00:30,"
        "2020-10-10T00:00:35,1,1",
        "null,2020-10-10T00:00:30,2020-10-10T00:00:35,null,null,null,0,null",
        "null,null,null,a1,2020-10-10T00:00,2020-10-10T00:00:05,null,2",
        "null,null,null,a1,2020-10-10T00:00:05,2020-10-10T00:00:10,null,1",
        "null,null,null,null,2020-10-10T00:00:30,2020-10-10T00:00:35,null,0",
    ])
    assert rows_str(tenv.sql(
        full_base.format(cond="L.`name` IS NOT DISTINCT from R.`name`")
    )) == sorted([
        "a,2020-10-10T00:00,2020-10-10T00:00:05,null,null,null,2,null",
        "a,2020-10-10T00:00:05,2020-10-10T00:00:10,null,null,null,1,null",
        "b,2020-10-10T00:00:05,2020-10-10T00:00:10,b,2020-10-10T00:00:05,"
        "2020-10-10T00:00:10,2,2",
        "b,2020-10-10T00:00:15,2020-10-10T00:00:20,b,2020-10-10T00:00:15,"
        "2020-10-10T00:00:20,1,1",
        "b,2020-10-10T00:00:30,2020-10-10T00:00:35,b,2020-10-10T00:00:30,"
        "2020-10-10T00:00:35,1,1",
        "null,2020-10-10T00:00:30,2020-10-10T00:00:35,null,"
        "2020-10-10T00:00:30,2020-10-10T00:00:35,0,0",
        "null,null,null,a1,2020-10-10T00:00,2020-10-10T00:00:05,null,2",
        "null,null,null,a1,2020-10-10T00:00:05,2020-10-10T00:00:10,null,1",
    ])
