"""FOR SYSTEM_TIME AS OF rewrite (reference temporal-join SQL syntax)."""

from __future__ import annotations

import pytest

from apache_flink_spark.temporal_sql import (
    TemporalSqlError,
    rewrite_system_time_joins,
)


def test_left_join_rewrites_to_lateral():
    out = rewrite_system_time_joins(
        "SELECT * FROM orders o LEFT JOIN rates FOR SYSTEM_TIME AS OF o.ts"
        " AS r ON r.currency = o.currency WHERE o.amount > 0"
    )
    assert "LEFT JOIN LATERAL" in out
    assert "r.`ts` <= o.`ts`" in out
    assert "ORDER BY r.`ts` DESC LIMIT 1" in out
    assert "SYSTEM_TIME" not in out
    assert out.endswith("WHERE o.amount > 0")


def test_inner_join_keeps_inner_semantics():
    out = rewrite_system_time_joins(
        "SELECT * FROM orders o JOIN rates FOR SYSTEM_TIME AS OF o.ts r"
        " ON r.cur = o.cur"
    )
    assert out.count("LEFT JOIN") == 0
    assert "JOIN LATERAL" in out


def test_unsupported_form_raises():
    with pytest.raises(TemporalSqlError, match="supported subset"):
        rewrite_system_time_joins(
            "SELECT * FROM o JOIN r FOR SYSTEM_TIME AS OF o.ts AS v"
            " ON (v.k = o.k OR v.j = o.j)"  # parenthesized condition
        )


def test_plain_sql_passes_through():
    sql = "SELECT system_time_col FROM t"
    assert rewrite_system_time_joins(sql) == sql
