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
    # an OR'd key pair provides no usable version-lookup equality — the
    # reference requires the join key to contain the versioned table's PK
    with pytest.raises(TemporalSqlError, match="equality conjunct"):
        rewrite_system_time_joins(
            "SELECT * FROM o JOIN r FOR SYSTEM_TIME AS OF o.ts AS v"
            " ON (v.k = o.k OR v.j = o.j)"
        )


def test_residual_predicates_filter_the_picked_version():
    # non-key conjuncts must NOT participate in the as-of pick
    # (TemporalJoinITCase testEventTimeTemporalJoinWithNonEqualCondition)
    out = rewrite_system_time_joins(
        "SELECT * FROM o JOIN rates FOR SYSTEM_TIME AS OF o.ts AS r"
        " ON r.cur = o.cur AND r.rate > 102"
    )
    inner_pick = out.index("LIMIT 1")
    assert "r.rate > 102" in out[inner_pick:]
    assert "r.rate > 102" not in out[:inner_pick]


def test_plain_sql_passes_through():
    sql = "SELECT system_time_col FROM t"
    assert rewrite_system_time_joins(sql) == sql
