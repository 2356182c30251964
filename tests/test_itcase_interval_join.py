"""Verbatim harvest of the reference's streaming IntervalJoinITCase
(r13 — VERDICT r12 next-item #1, second tranche).

Reference: flink-table/flink-table-planner/src/test/scala/org/apache/
flink/table/planner/runtime/stream/sql/IntervalJoinITCase.scala (:line
cited per pin). The append-sink match sets are watermark-complete
(both sides buffer until the interval closes), so each pin runs the
exact data + SQL through the engine's SQL surface and compares the
exact expected strings.

Tally (21 @TestTemplate methods):
  - 15 rowtime tests pinned verbatim (:186 inner + boundary exclusion,
    :241 IS NOT DISTINCT FROM null-key join, :297 no-equi-condition,
    :361 unbounded agg after the join, :413 equi-time attributes
    (FLINK-24466 rows stay commented out as upstream), :485/:544 other
    conditions incl. QUARTER(rowtime), :593/:648 TUMBLE group-window
    aggregation over the joined stream on either side's rowtime,
    :740/:893/:1040 LEFT/RIGHT/FULL outer with non-equi residuals,
    :805/:953/:1103 negative interval sizes — no matches, outer
    padding only),
  - 1 proctime test pinned on its actual assertion (:136 — null keys
    never produce joined rows; proctime = one shared instant per the
    arrival convention),
  - 5 n/a: :41/:88/:699/:853/:1001 execute without ANY result
    assertion in the reference (wall-clock proctime smoke runs —
    nothing to pin).
"""

from __future__ import annotations

import datetime

import pytest

from tests.itcase_utils import flink_rows, view


def _ts(ms):
    return datetime.datetime(1970, 1, 1) + datetime.timedelta(
        milliseconds=ms
    )


@pytest.fixture(scope="module")
def tenv(spark):
    from apache_flink_spark.environment import TableEnvironment

    return TableEnvironment(spark=spark)


T1_DATA = [
    ("A", "LEFT0.999", 999), ("A", "LEFT1", 1000), ("A", "LEFT2", 2000),
    ("A", "LEFT3", 3000), ("B", "LEFT4", 4000), ("A", "LEFT5", 5000),
    ("A", "LEFT6", 6000), (None, "LEFT8", 8000),
]

T2_DATA = [("A", "RIGHT6", 6000), ("B", "RIGHT7", 7000),
           (None, "RIGHT10", 10000)]

KI_SCHEMA = "key string, id string, rowtime timestamp"


def _ki_views(tenv):
    view(tenv, "T1", [(k, i, _ts(ms)) for k, i, ms in T1_DATA], KI_SCHEMA)
    view(tenv, "T2", [(k, i, _ts(ms)) for k, i, ms in T2_DATA], KI_SCHEMA)


INNER_SQL = """
SELECT t2.key, t2.id, t1.id
FROM T1 as t1 join T2 as t2 ON
  {eq} AND
  t1.rowtime BETWEEN t2.rowtime - INTERVAL '5' SECOND AND
    t2.rowtime + INTERVAL '6' SECOND
"""


def test_rowtime_inner_join(tenv):
    """:186 — the 999 ms boundary row is outside [1000, 12000]."""
    _ki_views(tenv)
    assert flink_rows(
        tenv.sql(INNER_SQL.format(eq="t1.key = t2.key"))
    ) == sorted([
        "A,RIGHT6,LEFT1", "A,RIGHT6,LEFT2", "A,RIGHT6,LEFT3",
        "A,RIGHT6,LEFT5", "A,RIGHT6,LEFT6", "B,RIGHT7,LEFT4",
    ])


def test_rowtime_inner_join_is_not_distinct_from(tenv):
    """:241 — null keys JOIN under the null-safe equality."""
    _ki_views(tenv)
    assert flink_rows(
        tenv.sql(INNER_SQL.format(eq="t1.key is not distinct from t2.key"))
    ) == sorted([
        "A,RIGHT6,LEFT1", "A,RIGHT6,LEFT2", "A,RIGHT6,LEFT3",
        "A,RIGHT6,LEFT5", "A,RIGHT6,LEFT6", "B,RIGHT7,LEFT4",
        "null,RIGHT10,LEFT8",
    ])


def test_rowtime_inner_join_without_equal_condition(tenv):
    """:297 — a pure time-window theta join."""
    _ki_views(tenv)
    assert flink_rows(tenv.sql("""
        SELECT t2.key, t2.id, t1.id
        FROM T1 as t1 join T2 as t2 ON
          t1.rowtime BETWEEN t2.rowtime - INTERVAL '5' SECOND AND
            t2.rowtime + INTERVAL '6' SECOND
        """)) == sorted([
        "A,RIGHT6,LEFT1", "A,RIGHT6,LEFT2", "A,RIGHT6,LEFT3",
        "A,RIGHT6,LEFT4", "A,RIGHT6,LEFT5", "A,RIGHT6,LEFT6",
        "A,RIGHT6,LEFT8", "B,RIGHT7,LEFT2", "B,RIGHT7,LEFT3",
        "B,RIGHT7,LEFT4", "B,RIGHT7,LEFT5", "B,RIGHT7,LEFT6",
        "B,RIGHT7,LEFT8", "null,RIGHT10,LEFT5", "null,RIGHT10,LEFT6",
        "null,RIGHT10,LEFT8",
    ])


def test_unbounded_agg_after_rowtime_inner_join(tenv):
    """:361"""
    _ki_views(tenv)
    inner = INNER_SQL.format(eq="t1.key = t2.key").replace(
        "SELECT t2.key, t2.id, t1.id",
        "SELECT t2.key as key, t2.id as id1, t1.id as id2",
    )
    assert flink_rows(tenv.sql(
        "SELECT key, COUNT(DISTINCT id1), COUNT(DISTINCT id2) FROM ("
        + inner + ") GROUP BY key"
    )) == sorted(["A,1,5", "B,1,1"])


def test_rowtime_inner_join_with_equi_time_attrs(tenv):
    """:413 — equality on the two rowtime attributes (the FLINK-24466
    would-be-discarded rows stay commented out, as upstream)."""
    d1 = [("K1", 1000, "L1"), ("K1", 1000, "L2"), ("K1", 1000, "L3"),
          ("K2", 2000, "L4"), ("K1", 4000, "L5"), ("K1", 6000, "L7"),
          ("K1", 5001, "L8")]
    d2 = [("K1", 1000, "R1"), ("K1", 1000, "R2"), ("K1", 1000, "R3"),
          ("K2", 3000, "R4"), ("K1", 4000, "R5"), ("K1", 6000, "R6"),
          ("K1", 5001, "R7")]
    view(tenv, "T1", [(k, ms, _ts(ms), v) for k, ms, v in d1],
         "key string, _2 bigint, rowtime timestamp, val string")
    view(tenv, "T2", [(k, ms, _ts(ms), v) for k, ms, v in d2],
         "key string, _2 bigint, rowtime timestamp, val string")
    assert flink_rows(tenv.sql("""
        SELECT t1.key, t1._2, t1.val, t2.val
        FROM T1 AS t1 JOIN T2 AS t2 ON
        t1.key = t2.key AND
        t2.rowtime = t1.rowtime
        """)) == sorted([
        "K1,1000,L1,R1", "K1,1000,L1,R2", "K1,1000,L1,R3",
        "K1,1000,L2,R1", "K1,1000,L2,R2", "K1,1000,L2,R3",
        "K1,1000,L3,R1", "K1,1000,L3,R2", "K1,1000,L3,R3",
        "K1,4000,L5,R5", "K1,6000,L7,R6", "K1,5001,L8,R7",
    ])


ABCT_SCHEMA = "a int, b bigint, c string, rowtime timestamp"


def test_rowtime_inner_join_with_other_conditions(tenv):
    """:485 — open interval bounds + non-time residuals + pushdown."""
    d1 = [(1, 4, "LEFT1", 1000), (1, 8, "LEFT1.1", 1001),
          (1, 2, "LEFT2", 2000), (1, 7, "LEFT3", 3000),
          (2, 5, "LEFT4", 4000), (1, 4, "LEFT4.9", 4999),
          (1, 4, "LEFT5", 5000), (1, 10, "LEFT6", 6000)]
    d2 = [(1, 1, "RIGHT1", 1000), (1, 9, "RIGHT6", 6000),
          (2, 14, "RIGHT7", 7000), (1, 4, "RIGHT8", 8000)]
    view(tenv, "T1", [(a, b, c, _ts(ms)) for a, b, c, ms in d1],
         ABCT_SCHEMA)
    view(tenv, "T2", [(a, b, c, _ts(ms)) for a, b, c, ms in d2],
         ABCT_SCHEMA)
    assert flink_rows(tenv.sql("""
        SELECT t2.a, t1.c, t2.c
        FROM T1 as t1 JOIN T2 as t2 ON
          t1.a = t2.a AND
          t1.rowtime > t2.rowtime - INTERVAL '5' SECOND AND
            t1.rowtime < t2.rowtime - INTERVAL '1' SECOND AND
          t1.b < t2.b AND
          t1.b > 2
        """)) == sorted([
        "1,LEFT3,RIGHT6", "1,LEFT1.1,RIGHT6", "2,LEFT4,RIGHT7",
        "1,LEFT4.9,RIGHT6",
    ])


def test_rowtime_inner_join_with_other_time_condition(tenv):
    """:544 — QUARTER(rowtime) as a join residual."""
    d1 = [(1, 4, "LEFT1", 1000), (1, 2, "LEFT2", 2000),
          (1, 7, "LEFT3", 3000), (2, 5, "LEFT4", 4000),
          (1, 4, "LEFT5", 5000), (1, 10, "LEFT6", 6000)]
    d2 = [(1, 1, "RIGHT1", 1000), (1, 9, "RIGHT6", 6000),
          (2, 8, "RIGHT7", 7000), (1, 4, "RIGHT8", 8000)]
    view(tenv, "T1", [(a, b, c, _ts(ms)) for a, b, c, ms in d1],
         ABCT_SCHEMA)
    view(tenv, "T2", [(a, b, c, _ts(ms)) for a, b, c, ms in d2],
         ABCT_SCHEMA)
    assert flink_rows(tenv.sql("""
        SELECT t2.a, t1.c, t2.c
        FROM T1 as t1 JOIN T2 as t2 ON
          t1.a = t2.a AND
          t1.rowtime > t2.rowtime - INTERVAL '4' SECOND AND
            t1.rowtime < t2.rowtime AND
          QUARTER(t1.rowtime) = t2.a
        """)) == sorted([
        "1,LEFT3,RIGHT6", "1,LEFT5,RIGHT6", "1,LEFT5,RIGHT8",
        "1,LEFT6,RIGHT8",
    ])


WINAGG_D1 = [("A", "L-1", 1000), ("A", "L-2", 2000), ("A", "L-3", 3000),
             ("B", "L-4", 4000), ("C", "L-5", 4000), ("A", "L-6", 10000),
             ("A", "L-7", 13000)]
WINAGG_D2 = [("A", "R-1", 7000), ("B", "R-4", 7000), ("A", "R-3", 8000),
             ("D", "R-2", 8000)]


def _winagg_views(tenv):
    view(tenv, "T1", [(k, i, _ts(ms)) for k, i, ms in WINAGG_D1],
         KI_SCHEMA)
    view(tenv, "T2", [(k, i, _ts(ms)) for k, i, ms in WINAGG_D2],
         KI_SCHEMA)


def test_rowtime_inner_join_with_window_aggregate_on_first_time(tenv):
    """:593 — TUMBLE group window on the LEFT side's rowtime after the
    interval join."""
    _winagg_views(tenv)
    assert flink_rows(tenv.sql("""
        SELECT t1.key, TUMBLE_END(t1.rowtime, INTERVAL '4' SECOND), COUNT(t2.key)
        FROM T1 AS t1 join T2 AS t2 ON
          t1.key = t2.key AND
          t1.rowtime BETWEEN t2.rowtime - INTERVAL '5' SECOND AND
            t2.rowtime + INTERVAL '5' SECOND
        GROUP BY TUMBLE(t1.rowtime, INTERVAL '4' SECOND), t1.key
        """)) == sorted([
        "A,1970-01-01T00:00:04,3", "A,1970-01-01T00:00:12,2",
        "A,1970-01-01T00:00:16,1", "B,1970-01-01T00:00:08,1",
    ])


def test_rowtime_inner_join_with_window_aggregate_on_second_time(tenv):
    """:648 — TUMBLE group window on the RIGHT side's rowtime."""
    _winagg_views(tenv)
    assert flink_rows(tenv.sql("""
        SELECT t2.key, TUMBLE_END(t2.rowtime, INTERVAL '4' SECOND), COUNT(t1.key)
        FROM T1 AS t1 join T2 AS t2 ON
         t1.key = t2.key AND
         t1.rowtime BETWEEN t2.rowtime - INTERVAL '5' SECOND AND
         t2.rowtime + INTERVAL '5' SECOND
         GROUP BY TUMBLE(t2.rowtime, INTERVAL '4' SECOND), t2.key
        """)) == sorted([
        "A,1970-01-01T00:00:08,3", "A,1970-01-01T00:00:12,3",
        "B,1970-01-01T00:00:08,1",
    ])


def test_proctime_inner_join_null_keys_never_join(tenv):
    """:136 — the suite's only proctime ASSERTION: rows with null join
    keys never appear in the result (proctime = one shared instant)."""
    now = _ts(0)
    d1 = [("1", 1, "Hi1"), ("1", 2, "Hi2"), ("1", 5, "Hi3"),
          ("2", 7, "Hi5"), ("1", 9, "Hi6"), ("1", 8, "Hi8"),
          (None, 20, "leftNull")]
    d2 = [("1", 5, "HiHi"), ("2", 2, "HeHe"), (None, 20, "rightNull")]
    view(tenv, "T1", [(a, b, c, now) for a, b, c in d1],
         "a string, b bigint, c string, proctime timestamp")
    view(tenv, "T2", [(a, b, c, now) for a, b, c in d2],
         "a string, b bigint, c string, proctime timestamp")
    rows = flink_rows(tenv.sql("""
        SELECT t2.a, t2.c, t1.c
        FROM T1 as t1 JOIN T2 as t2 ON
          t1.a = t2.a AND
          t1.proctime BETWEEN t2.proctime - interval '5' SECOND AND
            t2.proctime + interval '5' second AND
          t1.b = t2.b
        """))
    assert not any("null" in r.lower() for r in rows)


LOUTER_D1 = [("A", "L-1", 1000), ("A", "L-2", 2000), ("B", "L-4", 4000),
             ("B", "L-5", 5000), ("A", "L-6", 6000), ("C", "L-7", 7000),
             ("A", "L-10", 10000), ("A", "L-12", 12000),
             ("A", "L-20", 20000)]
LOUTER_D2 = [("A", "R-6", 6000), ("B", "R-7", 7000), ("D", "R-8", 8000),
             ("A", "R-11", 11000)]


def test_rowtime_left_outer_join(tenv):
    """:740 — LEFT OUTER with a non-equi residual (t1.id <> 'L-5')."""
    view(tenv, "T1", [(k, i, _ts(ms)) for k, i, ms in LOUTER_D1],
         KI_SCHEMA)
    view(tenv, "T2", [(k, i, _ts(ms)) for k, i, ms in LOUTER_D2],
         KI_SCHEMA)
    assert flink_rows(tenv.sql("""
        SELECT t1.key, t2.id, t1.id
        FROM T1 AS t1 LEFT OUTER JOIN  T2 AS t2 ON
         t1.key = t2.key AND
         t1.rowtime BETWEEN t2.rowtime - INTERVAL '5' SECOND AND
         t2.rowtime + INTERVAL '6' SECOND AND
         t1.id <> 'L-5'
        """)) == sorted([
        "A,R-6,L-1", "A,R-6,L-2", "A,R-6,L-6", "A,R-6,L-10",
        "A,R-6,L-12", "B,R-7,L-4", "A,R-11,L-6", "A,R-11,L-10",
        "A,R-11,L-12", "B,null,L-5", "C,null,L-7", "A,null,L-20",
    ])


NEG_D1 = [("A", "L-1", 1000), ("B", "L-4", 4000), ("C", "L-7", 7000)]
NEG_D2 = [("A", "R-6", 6000), ("B", "R-7", 7000), ("D", "R-8", 8000)]


def test_rowtime_left_outer_join_negative_interval_size(tenv):
    """:805 — an empty interval joins nothing; every left row pads."""
    view(tenv, "T1", [(k, i, _ts(ms)) for k, i, ms in NEG_D1], KI_SCHEMA)
    view(tenv, "T2", [(k, i, _ts(ms)) for k, i, ms in NEG_D2], KI_SCHEMA)
    assert flink_rows(tenv.sql("""
        SELECT t2.key, t2.id, t1.id
        FROM T1 AS t1 LEFT OUTER JOIN T2 AS t2 ON
         t1.key = t2.key AND
          t1.rowtime BETWEEN t2.rowtime + INTERVAL '3' SECOND AND
          t2.rowtime + INTERVAL '1' SECOND
        """)) == sorted(["null,null,L-1", "null,null,L-4",
                         "null,null,L-7"])


def test_rowtime_right_outer_join(tenv):
    """:893 — RIGHT OUTER with t2.id <> 'R-5' residual."""
    d1 = [("A", "L-1", 1000), ("A", "L-2", 2000), ("B", "L-4", 4000),
          ("A", "L-6", 6000), ("C", "L-7", 7000), ("A", "L-10", 10000),
          ("A", "L-12", 12000)]
    d2 = [("A", "R-5", 5000), ("A", "R-6", 6000), ("B", "R-7", 7000),
          ("D", "R-8", 8000), ("A", "R-20", 20000)]
    view(tenv, "T1", [(k, i, _ts(ms)) for k, i, ms in d1], KI_SCHEMA)
    view(tenv, "T2", [(k, i, _ts(ms)) for k, i, ms in d2], KI_SCHEMA)
    assert flink_rows(tenv.sql("""
        SELECT t2.key, t2.id, t1.id
        FROM T1 AS t1 RIGHT OUTER JOIN T2 AS t2 ON
         t1.key = t2.key AND
         t1.rowtime BETWEEN t2.rowtime - INTERVAL '5' SECOND AND
         t2.rowtime + INTERVAL '6' SECOND AND
         t2.id <> 'R-5'
        """)) == sorted([
        "A,R-5,null", "A,R-6,L-1", "A,R-6,L-2", "A,R-6,L-6",
        "A,R-6,L-10", "A,R-6,L-12", "A,R-20,null", "B,R-7,L-4",
        "D,R-8,null",
    ])


def test_rowtime_right_outer_join_negative_interval_size(tenv):
    """:953"""
    view(tenv, "T1", [(k, i, _ts(ms)) for k, i, ms in NEG_D1], KI_SCHEMA)
    view(tenv, "T2", [(k, i, _ts(ms)) for k, i, ms in NEG_D2], KI_SCHEMA)
    assert flink_rows(tenv.sql("""
        SELECT t2.key, t2.id, t1.id
        FROM T1 AS t1 RIGHT OUTER JOIN T2 AS t2 ON
        t1.key = t2.key AND
        t1.rowtime BETWEEN t2.rowtime + INTERVAL '5' SECOND AND
        t2.rowtime + INTERVAL '1' SECOND
        """)) == sorted(["A,R-6,null", "B,R-7,null", "D,R-8,null"])


def test_rowtime_full_outer_join(tenv):
    """:1040 — FULL OUTER with a NOT(...) residual over both sides."""
    d2 = [("A", "R-5", 5000), ("A", "R-6", 6000), ("B", "R-7", 7000),
          ("D", "R-8", 8000)]
    view(tenv, "T1", [(k, i, _ts(ms)) for k, i, ms in LOUTER_D1],
         KI_SCHEMA)
    view(tenv, "T2", [(k, i, _ts(ms)) for k, i, ms in d2], KI_SCHEMA)
    assert flink_rows(tenv.sql("""
        SELECT t2.key, t2.id, t1.id
        FROM T1 AS t1 FULL OUTER JOIN T2 AS t2 ON
        t1.key = t2.key AND
        t1.rowtime BETWEEN t2.rowtime - INTERVAL '5' SECOND AND
        t2.rowtime + INTERVAL '6' SECOND AND
        NOT (t1.id = 'L-5' OR t2.id = 'R-5')
        """)) == sorted([
        "A,R-6,L-1", "A,R-6,L-2", "A,R-6,L-6", "A,R-6,L-10",
        "A,R-6,L-12", "B,R-7,L-4", "A,R-5,null", "D,R-8,null",
        "null,null,L-5", "null,null,L-7", "null,null,L-20",
    ])


def test_rowtime_full_outer_join_negative_interval_size(tenv):
    """:1103"""
    view(tenv, "T1", [(k, i, _ts(ms)) for k, i, ms in NEG_D1], KI_SCHEMA)
    view(tenv, "T2", [(k, i, _ts(ms)) for k, i, ms in NEG_D2], KI_SCHEMA)
    assert flink_rows(tenv.sql("""
        SELECT t2.key, t2.id, t1.id
        FROM T1 AS t1 FULL OUTER JOIN T2 AS t2 ON
        t1.key = t2.key AND
        t1.rowtime BETWEEN t2.rowtime + INTERVAL '5' SECOND AND
        t2.rowtime + INTERVAL '4' SECOND
        """)) == sorted([
        "A,R-6,null", "B,R-7,null", "D,R-8,null", "null,null,L-1",
        "null,null,L-4", "null,null,L-7",
    ])
