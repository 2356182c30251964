"""Verbatim harvest of the reference's streaming AggregateRemoveITCase
and PruneAggregateCallITCase (r13 — VERDICT r12 next-item #1 tranche).

References (flink-table-planner .../runtime/stream/sql/, :line per pin):
AggregateRemoveITCase.scala (8 tests) and PruneAggregateCallITCase.scala
(2 tests). Both suites exist to exercise the reference's
AggregateRemoveRule / PruneAggregateCallRule — planner rules that drop a
(sub-)aggregate when the grouping key is a declared unique key, or prune
unreferenced aggregate calls. The rules are physical: every test's
RESULT is plain relational semantics, asserted through a
TestingRetractSink. In this engine the equivalent eliminations are
Catalyst's (RemoveRedundantAggregates, column pruning), so the pins run
each test's verbatim SQL through ``TableEnvironment.sql`` — the unique-key
FlinkStatistic the reference attaches to its test views is optimizer
metadata with no semantic surface.

Fixtures: ``T`` is the suite's inline 4-row list (:318), ``MyTable`` /
``MyTable2`` are TestData.smallTupleData3/smallTupleData5 (the first 3
rows of the tuple3/tuple5 tables), and testAggregateRemove's ``T1`` is
its own 6-row list (:272).

Tally: AggregateRemoveITCase 8/8 pinned, PruneAggregateCallITCase 2/2
pinned (its two commented-out EXISTS variants are disabled in the
reference itself — not counted).
"""

from __future__ import annotations

import pytest

from tests.itcase_utils import run_retract, view


@pytest.fixture(scope="module")
def tenv(spark):
    from apache_flink_spark.environment import TableEnvironment

    t = TableEnvironment(spark=spark)
    # AggregateRemoveITCase:318 checkResult's three views
    view(t, "T", [
        (2, 1, "A", None),
        (3, 2, "A", "Hi"),
        (5, 2, "B", "Hello"),
        (6, 3, "C", "Hello world"),
    ], "a int, b int, c string, d string")
    view(t, "MyTable", [
        (1, 1, "Hi"), (2, 2, "Hello"), (3, 2, "Hello world"),
    ], "a int, b bigint, c string")
    view(t, "MyTable2", [
        (1, 1, 0, "Hallo", 1),
        (2, 2, 1, "Hallo Welt", 2),
        (2, 3, 2, "Hallo Welt wie", 1),
    ], "a int, b bigint, c int, d string, e bigint")
    return t


def test_simple(tenv):
    """AggregateRemoveITCase:50 testSimple."""
    assert run_retract(tenv, "SELECT a, b FROM T GROUP BY a, b") == sorted(
        ["2,1", "3,2", "5,2", "6,3"]
    )
    assert run_retract(
        tenv,
        "SELECT a, b + 1, c, s FROM ("
        "SELECT a, MIN(b) AS b, SUM(b) AS s, MAX(c) AS c FROM MyTable2 GROUP BY a)",
    ) == sorted(["1,2,0,1", "2,3,2,5"])
    assert run_retract(
        tenv, "SELECT a, SUM(b) AS s FROM MyTable2 GROUP BY a"
    ) == sorted(["1,1", "2,5"])
    assert run_retract(
        tenv,
        "SELECT a, b + 1, c, s FROM ("
        "SELECT a, MIN(b) AS b, SUM(b) AS s, MAX(c) AS c FROM MyTable GROUP BY a)",
    ) == sorted(["1,2,Hi,1", "2,3,Hello,2", "3,3,Hello world,2"])


def test_with_grouping_sets(tenv):
    """:69 testWithGroupingSets."""
    assert run_retract(
        tenv,
        "SELECT a, b, c, COUNT(d) FROM T GROUP BY GROUPING SETS ((a, b), (a, c))",
    ) == sorted([
        "2,1,null,0", "2,null,A,0", "3,2,null,1", "3,null,A,1",
        "5,2,null,1", "5,null,B,1", "6,3,null,1", "6,null,C,1",
    ])
    assert run_retract(
        tenv,
        "SELECT a, c, COUNT(d) FROM T GROUP BY GROUPING SETS ((a, c), (a), ())",
    ) == sorted([
        "2,A,0", "2,null,0", "3,A,1", "3,null,1", "5,B,1", "5,null,1",
        "6,C,1", "6,null,1", "null,null,3",
    ])
    assert run_retract(
        tenv,
        "SELECT a, b, c, COUNT(d) FROM T "
        "GROUP BY GROUPING SETS ((a, b, c), (a, b, d))",
    ) == sorted([
        "2,1,A,0", "2,1,null,0", "3,2,A,1", "3,2,null,1",
        "5,2,B,1", "5,2,null,1", "6,3,C,1", "6,3,null,1",
    ])


def test_with_rollup(tenv):
    """:119 testWithRollup."""
    assert run_retract(
        tenv, "SELECT a, b, c, COUNT(d) FROM T GROUP BY ROLLUP (a, b, c)"
    ) == sorted([
        "2,1,A,0", "2,1,null,0", "2,null,null,0",
        "3,2,A,1", "3,2,null,1", "3,null,null,1",
        "5,2,B,1", "5,2,null,1", "5,null,null,1",
        "6,3,C,1", "6,3,null,1", "6,null,null,1",
        "null,null,null,3",
    ])


def test_with_cube(tenv):
    """:138 testWithCube — both the 4-row T cube and the MyTable2
    3-column cube with SUM/MAX."""
    assert run_retract(
        tenv, "SELECT a, b, c, COUNT(d) FROM T GROUP BY CUBE (a, b, c)"
    ) == sorted([
        "2,1,A,0", "2,1,null,0", "2,null,A,0", "2,null,null,0",
        "3,2,A,1", "3,2,null,1", "3,null,A,1", "3,null,null,1",
        "5,2,B,1", "5,2,null,1", "5,null,B,1", "5,null,null,1",
        "6,3,C,1", "6,3,null,1", "6,null,C,1", "6,null,null,1",
        "null,1,A,0", "null,1,null,0", "null,2,A,1", "null,2,B,1",
        "null,2,null,2", "null,3,C,1", "null,3,null,1",
        "null,null,A,1", "null,null,B,1", "null,null,C,1",
        "null,null,null,3",
    ])
    assert run_retract(
        tenv,
        "SELECT b, c, e, SUM(a), MAX(d) FROM MyTable2 GROUP BY CUBE (b, c, e)",
    ) == sorted([
        "null,null,null,5,Hallo Welt wie",
        "null,null,1,3,Hallo Welt wie",
        "null,null,2,2,Hallo Welt",
        "null,0,null,1,Hallo",
        "null,0,1,1,Hallo",
        "null,1,null,2,Hallo Welt",
        "null,1,2,2,Hallo Welt",
        "null,2,null,2,Hallo Welt wie",
        "null,2,1,2,Hallo Welt wie",
        "1,null,null,1,Hallo",
        "1,null,1,1,Hallo",
        "1,0,null,1,Hallo",
        "1,0,1,1,Hallo",
        "2,null,null,2,Hallo Welt",
        "2,null,2,2,Hallo Welt",
        "2,1,null,2,Hallo Welt",
        "2,1,2,2,Hallo Welt",
        "3,null,null,2,Hallo Welt wie",
        "3,null,1,2,Hallo Welt wie",
        "3,2,null,2,Hallo Welt wie",
        "3,2,1,2,Hallo Welt wie",
    ])


def test_single_distinct_agg(tenv):
    """:203 testSingleDistinctAgg."""
    assert run_retract(
        tenv, "SELECT a, COUNT(DISTINCT c) FROM T GROUP BY a"
    ) == sorted(["2,1", "3,1", "5,1", "6,1"])
    assert run_retract(
        tenv, "SELECT a, b, COUNT(DISTINCT c) FROM T GROUP BY a, b"
    ) == sorted(["2,1,1", "3,2,1", "5,2,1", "6,3,1"])
    assert run_retract(
        tenv,
        "SELECT a, b, COUNT(DISTINCT c), COUNT(DISTINCT d) FROM T GROUP BY a, b",
    ) == sorted(["2,1,1,0", "3,2,1,1", "5,2,1,1", "6,3,1,1"])


def test_single_distinct_agg_with_non_distinct_agg(tenv):
    """:218 testSingleDistinctAgg_WithNonDistinctAgg."""
    assert run_retract(
        tenv, "SELECT a, COUNT(DISTINCT c), SUM(b) FROM T GROUP BY a"
    ) == sorted(["2,1,1", "3,1,2", "5,1,2", "6,1,3"])
    assert run_retract(
        tenv, "SELECT a, c, COUNT(DISTINCT c), SUM(b) FROM T GROUP BY a, c"
    ) == sorted(["2,A,1,1", "3,A,1,2", "5,B,1,2", "6,C,1,3"])
    assert run_retract(
        tenv, "SELECT a, d, COUNT(DISTINCT c), SUM(b) FROM T GROUP BY a, d"
    ) == sorted([
        "2,null,1,1", "3,Hi,1,2", "5,Hello,1,2", "6,Hello world,1,3",
    ])


def test_multi_distinct_aggs(tenv):
    """:240 testMultiDistinctAggs."""
    assert run_retract(
        tenv, "SELECT a, COUNT(DISTINCT b), SUM(DISTINCT b) FROM T GROUP BY a"
    ) == sorted(["2,1,1", "3,1,2", "5,1,2", "6,1,3"])
    assert run_retract(
        tenv,
        "SELECT a, d, COUNT(DISTINCT c), SUM(DISTINCT b) FROM T GROUP BY a, d",
    ) == sorted([
        "2,null,1,1", "3,Hi,1,2", "5,Hello,1,2", "6,Hello world,1,3",
    ])
    assert run_retract(
        tenv,
        "SELECT a, SUM(DISTINCT b), MAX(DISTINCT b), MIN(DISTINCT c) "
        "FROM T GROUP BY a",
    ) == sorted(["2,1,1,A", "3,2,2,A", "5,2,2,B", "6,3,3,C"])
    assert run_retract(
        tenv,
        "SELECT a, d, COUNT(DISTINCT c), MAX(DISTINCT b), SUM(b) "
        "FROM T GROUP BY a, d",
    ) == sorted([
        "2,null,1,1,1", "3,Hi,1,2,2", "5,Hello,1,2,2",
        "6,Hello world,1,3,3",
    ])


def test_aggregate_remove(tenv):
    """:266 testAggregateRemove — the nested sum-over-sum cascade whose
    inner aggregates the rule chain removes; result is a single 10."""
    view(tenv, "T1", [
        (1, 1), (2, 2), (3, 3), (4, 2), (4, 4), (6, 2),
    ], "a int, b int")
    assert run_retract(
        tenv,
        "select sum(b) from "
        " (select b from "
        "   (select b, sum(a) from "
        "     (select b, sum(a) as a from T1 group by b) t1 "
        "   group by b) t2 "
        " ) t3",
    ) == ["10"]


def test_prune_none_empty_group_key(tenv):
    """PruneAggregateCallITCase:52 testNoneEmptyGroupKey — unreferenced
    aggregate calls pruned from a keyed sub-aggregate."""
    assert run_retract(
        tenv,
        "SELECT a FROM (SELECT b, MAX(a) AS a, COUNT(*), MAX(c) "
        "FROM MyTable GROUP BY b) t",
    ) == sorted(["1", "3"])
    assert run_retract(
        tenv,
        "SELECT c, a FROM "
        "(SELECT a, c, COUNT(b) as b, SUM(b) as s FROM MyTable GROUP BY a, c) t "
        "WHERE s > 1",
    ) == sorted(["Hello world,3", "Hello,2"])


def test_prune_empty_group_key(tenv):
    """:68 testEmptyGroupKey — global aggregates reduced to a constant
    row (the reference's two EXISTS variants are disabled upstream)."""
    assert run_retract(
        tenv, "SELECT 1 FROM (SELECT SUM(a) FROM MyTable) t"
    ) == ["1"]
    assert run_retract(
        tenv, "SELECT 1 FROM (SELECT SUM(a), COUNT(*) FROM MyTable) t"
    ) == ["1"]
    assert run_retract(
        tenv, "SELECT 1 FROM (SELECT COUNT(*), SUM(a) FROM MyTable) t"
    ) == ["1"]
