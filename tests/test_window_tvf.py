"""Window-TVF SQL rewrite (reference Flink SQL windowing TVFs)."""

from __future__ import annotations

import pytest

from apache_flink_spark.window_tvf import WindowTvfError, rewrite_window_tvfs


def test_tumble_rewrites_to_window_call():
    out = rewrite_window_tvfs(
        "SELECT * FROM TABLE(TUMBLE(TABLE t, DESCRIPTOR(ts), INTERVAL '10' MINUTES))"
    )
    assert "window(`ts`, '10 minutes')" in out
    assert "window_start" in out and "window_end" in out
    assert "TUMBLE" not in out


def test_hop_arg_order_slide_then_size():
    out = rewrite_window_tvfs(
        "SELECT * FROM TABLE(HOP(TABLE t, DESCRIPTOR(ts),"
        " INTERVAL '5' MINUTES, INTERVAL '10' MINUTES))"
    )
    # Spark arg order is (col, size, slide).
    assert "window(`ts`, '10 minutes', '5 minutes')" in out


def test_cumulate_requires_divisible_step():
    with pytest.raises(WindowTvfError, match="multiple of step"):
        rewrite_window_tvfs(
            "SELECT * FROM TABLE(CUMULATE(TABLE t, DESCRIPTOR(ts),"
            " INTERVAL '7' MINUTES, INTERVAL '1' HOUR))"
        )


def test_session_tvf_rewrites_to_islands():
    """SESSION TVF (r4): gaps-and-islands subquery with window_start /
    window_end; PARTITION BY keys thread into every analytic window."""
    out = rewrite_window_tvfs(
        "SELECT * FROM TABLE(SESSION(TABLE t PARTITION BY k,"
        " DESCRIPTOR(ts), INTERVAL '5' MINUTES))"
    )
    assert "window_start" in out and "window_end" in out
    assert "PARTITION BY `k`" in out
    assert "300000000" in out  # the 5-minute gap in micros
    # global (un-partitioned) sessions are also valid syntax
    out2 = rewrite_window_tvfs(
        "SELECT * FROM TABLE(SESSION(TABLE t, DESCRIPTOR(ts),"
        " INTERVAL '5' MINUTES))"
    )
    assert "window_start" in out2 and "PARTITION BY `" not in out2


def test_partition_by_rejected_on_non_session():
    with pytest.raises(WindowTvfError, match="PARTITION BY"):
        rewrite_window_tvfs(
            "SELECT * FROM TABLE(TUMBLE(TABLE t PARTITION BY k,"
            " DESCRIPTOR(ts), INTERVAL '5' MINUTES))"
        )


def test_plain_sql_passes_through():
    sql = "SELECT tumble_me, hop FROM t WHERE x < 1"
    assert rewrite_window_tvfs(sql) == sql


def test_two_sites_both_rewritten():
    out = rewrite_window_tvfs(
        "SELECT * FROM TABLE(TUMBLE(TABLE a, DESCRIPTOR(ts), INTERVAL '1' HOUR)) x"
        " JOIN TABLE(TUMBLE(TABLE b, DESCRIPTOR(ts), INTERVAL '1' HOUR)) y"
        " ON x.window_start = y.window_start"
    )
    assert "TUMBLE" not in out
    assert out.count("window(`ts`, '1 hours')") == 2


def test_legacy_group_window_rewrites():
    from apache_flink_spark.window_tvf import rewrite_group_windows

    out = rewrite_group_windows(
        "SELECT TUMBLE_START(ts, INTERVAL '10' MINUTES) AS s, COUNT(*)"
        " FROM t GROUP BY TUMBLE(ts, INTERVAL '10' MINUTES)"
    )
    assert "window(`ts`, '10 minutes').start" in out
    assert "GROUP BY window(`ts`, '10 minutes')" in out

    out = rewrite_group_windows(
        "SELECT HOP_END(ts, INTERVAL '5' MINUTES, INTERVAL '10' MINUTES)"
        " FROM t GROUP BY HOP(ts, INTERVAL '5' MINUTES, INTERVAL '10' MINUTES)"
    )
    # Spark arg order (col, size, slide); END needs backticks.
    assert "window(`ts`, '10 minutes', '5 minutes').`end`" in out

    out = rewrite_group_windows(
        "SELECT SESSION_START(ts, INTERVAL '30' MINUTES)"
        " FROM t GROUP BY SESSION(ts, INTERVAL '30' MINUTES)"
    )
    assert "session_window(`ts`, '30 minutes').start" in out
    assert "GROUP BY session_window(`ts`, '30 minutes')" in out
