"""Verbatim harvest of the reference's streaming UnnestITCase (r13 —
VERDICT r12 next-item #1, second tranche).

Reference: flink-table/flink-table-planner/src/test/scala/org/apache/
flink/table/planner/runtime/stream/sql/UnnestITCase.scala (:line cited
per pin).

Tally (13 @TestTemplate methods): 13/13 pinned below.

The suite forced the r13 UNNEST dialect surface
(flink_dialect.rewrite_unnest): Flink's ``FROM T, UNNEST(expr) AS
A (cols)`` / ``CROSS JOIN UNNEST`` / ``LEFT JOIN UNNEST ... ON TRUE`` /
standalone ``FROM UNNEST(ARRAY[...])`` collection-table syntax compiles
onto Spark's LATERAL VIEW (explode / inline for struct splats / OUTER
for the left join), with MULTISET arguments (the engine's COLLECT
value->count map encoding) expanded per multiplicity via
map_entries + array_repeat, and ``ARRAY[...]`` literals mapped to
``array(...)``. Scala tuple elements surface as struct fields _1/_2 —
the same names Flink gives them (testUnnestObjectArrayWithoutAlias
reads A._1 verbatim).
"""

from __future__ import annotations

import pytest

from tests.itcase_utils import view

TUPLE_ARRAYS = [
    (1, [(12, "45.6"), (12, "45.612")]),
    (2, [(13, "41.6"), (14, "45.2136")]),
    (3, [(18, "42.6")]),
]

TUPLE_SCHEMA = "a int, b array<struct<_1:int,_2:string>>"


@pytest.fixture(scope="module")
def tenv(spark):
    from apache_flink_spark.environment import TableEnvironment

    return TableEnvironment(spark=spark)


def _rows(tenv, sql):
    return sorted(tuple(r) for r in tenv.sql(sql).collect())


def test_unnest_primitive_array_from_table(tenv):
    """:44"""
    view(tenv, "T",
         [(1, [12, 45], [[12, 45]]), (2, [41, 5], [[18], [87]]),
          (3, [18, 42], [[1], [45]])],
         "a int, b array<int>, c array<array<int>>")
    assert _rows(tenv, "SELECT a, b, s FROM T, UNNEST(T.b) AS A (s)") == [
        (1, [12, 45], 12), (1, [12, 45], 45), (2, [41, 5], 5),
        (2, [41, 5], 41), (3, [18, 42], 18), (3, [18, 42], 42),
    ]


def test_unnest_array_of_array_from_table(tenv):
    """:70"""
    view(tenv, "T",
         [(1, [12, 45], [[12, 45]]), (2, [41, 5], [[18], [87]]),
          (3, [18, 42], [[1], [45]])],
         "a int, b array<int>, c array<array<int>>")
    assert _rows(tenv, "SELECT a, s FROM T, UNNEST(T.c) AS A (s)") == [
        (1, [12, 45]), (2, [18]), (2, [87]), (3, [1]), (3, [45]),
    ]


def test_unnest_object_array_from_table_with_filter(tenv):
    """:91 — struct elements splat into (s, t) aliases."""
    view(tenv, "T", TUPLE_ARRAYS, TUPLE_SCHEMA)
    got = sorted(
        (r[0], r[2], r[3]) for r in tenv.sql(
            "SELECT a, b, s, t FROM T, UNNEST(T.b) AS A (s, t) "
            "WHERE s > 13"
        ).collect()
    )
    assert got == [(2, 14, "45.2136"), (3, 18, "42.6")]


def test_unnest_multiset_from_collect_result(tenv):
    """:113 — UNNEST over a COLLECT multiset (the value->count map
    encoding expands per multiplicity)."""
    view(tenv, "T",
         [(1, 1, (12, "45.6")), (2, 2, (12, "45.612")),
          (3, 2, (13, "41.6")), (4, 3, (14, "45.2136")),
          (5, 3, (18, "42.6"))],
         "a int, b int, c struct<id:int, point:string>")
    assert _rows(tenv, """
        WITH T1 AS (SELECT b, COLLECT(c) as `set` FROM T GROUP BY b)
        SELECT b, id, point FROM T1, UNNEST(T1.`set`) AS A(id, point)
        WHERE b < 3
        """) == [(1, 12, "45.6"), (2, 12, "45.612"), (2, 13, "41.6")]


def test_left_unnest_multiset_from_collect_result(tenv):
    """:138 — LEFT JOIN UNNEST ... ON TRUE over a possibly-empty
    multiset (nulls dropped by COLLECT) keeps the left row."""
    rows = [
        (1, "1", "Hello"), (1, "2", "Hello2"), (2, "2", "Hello"),
        (3, None, "Hello"), (4, "4", "Hello"), (5, "5", "Hello"),
        (5, None, "Hello"), (6, "6", "Hello"), (7, "7", "Hello World"),
        (7, "8", "Hello World"),
    ]
    view(tenv, "T", rows, "a int, b string, c string")
    assert _rows(tenv, """
        WITH T1 AS (SELECT a, COLLECT(b) as `set` FROM T GROUP BY a)
        SELECT a, s FROM T1 LEFT JOIN UNNEST(T1.`set`) AS A(s) ON TRUE
        WHERE a < 5
        """) == [(1, "1"), (1, "2"), (2, "2"), (3, None), (4, "4")]


def test_tumble_window_aggregate_with_collect_unnest(tenv):
    """:171 — COLLECT inside a legacy TUMBLE group window, unnested
    (b=2's multiset {2=2} expands to two rows)."""
    import datetime

    from tests.test_itcase_aggregate import TUPLE_DATA_3
    rows = [
        (b, a, c, datetime.datetime(1970, 1, 1)
         + datetime.timedelta(milliseconds=b))
        for a, b, c in TUPLE_DATA_3
    ]
    view(tenv, "T", rows, "b bigint, a int, c string, rowtime timestamp")
    assert _rows(tenv, """
        WITH T1 AS (SELECT b, COLLECT(b) as `set`
            FROM T
            GROUP BY b, TUMBLE(rowtime, INTERVAL '3' SECOND)
        )
        SELECT b, s FROM T1, UNNEST(T1.`set`) AS A(s) where b < 3
        """) == [(1, 1), (2, 2), (2, 2)]


def test_cross_with_unnest(tenv):
    """:201"""
    view(tenv, "T",
         [(1, 1, ["Hi", "w"]), (2, 2, ["Hello", "k"]),
          (3, 2, ["Hello world", "x"])],
         "a int, b bigint, c array<string>")
    assert _rows(tenv, "SELECT a, s FROM T, UNNEST(T.c) as A (s)") == [
        (1, "Hi"), (1, "w"), (2, "Hello"), (2, "k"),
        (3, "Hello world"), (3, "x"),
    ]


def test_cross_with_unnest_for_map(tenv):
    """:222 — UNNEST of a true MAP yields (k, v) pairs."""
    view(tenv, "T",
         [(1, 11, {"a": "10", "b": "11"}), (2, 22, {"c": "20"}),
          (3, 33, {"d": "30", "e": "31"})],
         "a int, b bigint, c map<string,string>")
    assert _rows(
        tenv, "SELECT a, b, v FROM T CROSS JOIN UNNEST(c) as f (k, v)"
    ) == [(1, 11, "10"), (1, 11, "11"), (2, 22, "20"), (3, 33, "30"),
          (3, 33, "31")]


def test_join_with_unnest_of_tuple(tenv):
    """:269 — correlated filter against the unnested fields."""
    view(tenv, "T",
         [(1, [(12, "45.6"), (2, "45.612")]),
          (2, [(13, "41.6"), (1, "45.2136")]), (3, [(18, "42.6")])],
         TUPLE_SCHEMA)
    got = sorted(
        (r[0], r[2], r[3]) for r in tenv.sql(
            "SELECT a, b, x, y FROM "
            "  (SELECT a, b FROM T WHERE a < 3) as tf, "
            "  UNNEST(tf.b) as A (x, y) WHERE x > a"
        ).collect()
    )
    assert got == [(1, 2, "45.612"), (1, 12, "45.6"), (2, 13, "41.6")]


def test_unnest_object_array_without_alias(tenv):
    """:297 — no column aliases: the tuple fields surface as A._1/_2."""
    view(tenv, "T", TUPLE_ARRAYS, TUPLE_SCHEMA)
    got = sorted(
        (r[0], r[2], r[3]) for r in tenv.sql(
            "SELECT a, b, A._1, A._2 FROM T, UNNEST(T.b) AS A "
            "where A._1 > 13"
        ).collect()
    )
    assert got == [(2, 14, "45.2136"), (3, 18, "42.6")]


def test_unnest_with_nested_filter(tenv):
    """:315"""
    view(tenv, "MyTable", TUPLE_ARRAYS, TUPLE_SCHEMA)
    assert _rows(tenv, """
        SELECT * FROM (
           SELECT a, b1, b2 FROM
               (SELECT a, b FROM MyTable) T
               CROSS JOIN
               UNNEST(T.b) as S(b1, b2)
               WHERE S.b1 >= 12
           ) tmp
        WHERE b2 <> '42.6'
        """) == [(1, 12, "45.6"), (1, 12, "45.612"), (2, 13, "41.6"),
                 (2, 14, "45.2136")]


def test_unnest_with_values_stream(tenv):
    """:341 — standalone FROM UNNEST(ARRAY[...])."""
    assert _rows(tenv, "SELECT * FROM UNNEST(ARRAY[1,2,3])") == [
        (1,), (2,), (3,),
    ]


def test_unnest_with_values_stream_2(tenv):
    """:352"""
    assert _rows(
        tenv,
        "SELECT * FROM (VALUES('a')) CROSS JOIN UNNEST(ARRAY[1, 2, 3])",
    ) == [("a", 1), ("a", 2), ("a", 3)]
