"""Verbatim harvest of the reference's streaming JoinITCase (r13 —
VERDICT r12 next-item #1, second tranche; the largest relational suite).

Reference: flink-table/flink-table-planner/src/test/scala/org/apache/
flink/table/planner/runtime/stream/sql/JoinITCase.scala (:line cited
per pin). Every scenario asserts the FINAL retract/append table
(TestingRetractSink/TestingAppendSink) — pins run the exact data + SQL
and compare sorted Flink row strings, duplicates included (streaming
joins are bag-semantics; e.g. testInnerJoin2's three 3,3 rows).

Tally (57 @TestTemplate methods): 56 pinned below (several grouped into
one test function over the shared fixtures; the join-with-UDF-filter
test's FuncWithOpen — a Java RichFunction asserting open() was called —
is expressed as its defining always-true predicate registered as a
session UDF), 1 pinned-with-note: `FullJoinWithPk`:1088 lost its `test`
prefix upstream (JUnit never runs it) but is pinned here anyway.

The suite's parameterizations (minibatch on/off, heap/rocksdb backend,
async state) assert identical results — one pin each.
"""

from __future__ import annotations

import pytest

from tests.itcase_utils import flink_rows, view
from tests.test_itcase_aggregate import TUPLE_DATA_3, TUPLE_DATA_5

SMALL3 = [(1, 1, "Hi"), (2, 2, "Hello"), (3, 2, "Hello world")]

SMALL_TUPLE5 = [
    (1, 1, 0, "Hallo", 1), (2, 2, 1, "Hallo Welt", 2),
    (2, 3, 2, "Hallo Welt wie", 1), (3, 4, 3, "Hallo Welt wie gehts?", 2),
    (3, 5, 4, "ABC", 2), (3, 6, 5, "BCD", 3),
]

CANNOT_JOIN = SMALL_TUPLE5[2:]

DATA2_1 = [(1, 2.0), (1, 2.0), (2, 1.0), (2, 1.0), (3, 3.0),
           (None, None), (None, 5.0), (6, None)]
DATA2_2 = [(2, 3.0), (2, 3.0), (3, 2.0), (4, 1.0), (None, None),
           (None, 5.0), (6, None)]


@pytest.fixture(scope="module")
def tenv(spark):
    from apache_flink_spark.environment import TableEnvironment

    env = TableEnvironment(spark=spark)
    view(env, "A", SMALL3, "a1 int, a2 bigint, a3 string")
    view(env, "B", TUPLE_DATA_5,
         "b1 int, b2 bigint, b3 int, b4 string, b5 bigint")
    view(env, "Table3", TUPLE_DATA_3, "a int, b bigint, c string")
    view(env, "Table5", TUPLE_DATA_5,
         "d int, e bigint, f int, g string, h bigint")
    view(env, "l", DATA2_1, "a int, b double")
    view(env, "r", DATA2_2, "c int, d double")
    return env


def _q(tenv, sql):
    return flink_rows(tenv.sql(sql))


def test_dependent_condition_derivation_inner_join(tenv):
    """:108 / :126 — OR'd per-side conditions."""
    assert _q(
        tenv,
        "SELECT * FROM A, B WHERE (a2 = 1 and b2 = 2) or (a1 = 2 and b1 = 4)",
    ) == sorted([
        "1,1,Hi,2,2,1,Hallo Welt,2", "2,2,Hello,4,10,9,FGH,2",
        "2,2,Hello,4,7,6,CDE,2", "2,2,Hello,4,8,7,DEF,1",
        "2,2,Hello,4,9,8,EFG,1",
    ])
    assert len(_q(
        tenv, "SELECT * FROM A, B WHERE (a2 = 1 AND true) OR (a1 = 2 AND b1 = 4)"
    )) == 19


def test_dependent_condition_derivation_inner_join_with_null(tenv):
    """:161"""
    view(tenv, "da", [(0, 1, "hi a1"), (1, 2, "hi a2"), (2, 3, "hi a3")],
         "a1 int, a2 int, a3 string")
    view(tenv, "db", [(3, 4, "hi b1"), (4, 5, None), (5, 6, "hi b3")],
         "b1 int, b2 int, b3 string")
    assert _q(
        tenv,
        "SELECT * FROM da, db WHERE (a1 = 1 AND b1 = 3) OR "
        "(a1 = 2 AND b3 is null)",
    ) == sorted(["1,2,hi a2,3,4,hi b1", "2,3,hi a3,4,5,null"])


NONWIN_D1 = [(1, 1, "Hi1"), (1, 2, "Hi2"), (1, 2, "Hi2"), (1, 5, "Hi3"),
             (2, 7, "Hi5"), (1, 9, "Hi6"), (1, 8, "Hi8"), (3, 8, "Hi9")]
NONWIN_D2 = [(1, 1, "HiHi"), (2, 2, "HeHe"), (3, 2, "HeHe")]


def test_non_window_inner_join_and_null_cond(tenv):
    """:192 — null keys never equi-join; :242 — the explicit
    null-safe OR condition DOES join them."""
    view(tenv, "T1", NONWIN_D1, "a int, b bigint, c string")
    view(tenv, "T2", NONWIN_D2, "a int, b bigint, c string")
    base = """
        SELECT t2.a, t2.c, t1.c
        FROM (
         SELECT if(a = 3, cast(null as int), a) as a, b, c FROM T1
        ) as t1
        JOIN (
         SELECT if(a = 3, cast(null as int), a) as a, b, c FROM T2
        ) as t2
        ON {cond}
        """
    assert _q(tenv, base.format(cond="t1.a = t2.a AND t1.b > t2.b")) == sorted([
        "1,HiHi,Hi2", "1,HiHi,Hi2", "1,HiHi,Hi3", "1,HiHi,Hi6",
        "1,HiHi,Hi8", "2,HeHe,Hi5",
    ])
    assert _q(tenv, base.format(
        cond="((t1.a is null AND t2.a is null) OR (t1.a = t2.a)) "
             "AND t1.b > t2.b"
    )) == sorted([
        "1,HiHi,Hi2", "1,HiHi,Hi2", "1,HiHi,Hi3", "1,HiHi,Hi6",
        "1,HiHi,Hi8", "2,HeHe,Hi5", "null,HeHe,Hi9",
    ])


def test_join_and_filter(tenv):
    """:295 testJoin, :336 testJoinWithFilter."""
    assert _q(tenv, "SELECT a3, b4 FROM A, B WHERE a2 = b2") == sorted(
        ["Hi,Hallo", "Hello,Hallo Welt", "Hello world,Hallo Welt"]
    )
    assert _q(
        tenv, "SELECT a3, b4 FROM A, B WHERE a2 = b2 AND a2 < 2"
    ) == ["Hi,Hallo"]


def test_inner_join(tenv):
    """:308"""
    view(tenv, "ds1", SMALL3, "a int, b bigint, c string")
    view(tenv, "ds2", SMALL_TUPLE5,
         "d int, e bigint, f int, g string, h bigint")
    assert _q(
        tenv, "SELECT b, c, e, g FROM ds1 JOIN ds2 ON b = e"
    ) == sorted(["1,Hi,1,Hallo", "2,Hello world,2,Hallo Welt",
                 "2,Hello,2,Hallo Welt"])


def test_inner_join2(tenv):
    """:324 — bag semantics: duplicates preserved."""
    assert _q(tenv, "SELECT a1, b1 FROM A JOIN B ON a1 = b1") == sorted(
        ["3,3", "1,1", "3,3", "2,2", "3,3", "2,2"]
    )


def test_inner_join_with_duplicate_key(tenv):
    """:348"""
    assert _q(
        tenv, "SELECT a1, b1, b3 FROM A JOIN B ON a1 = b1 AND a1 = b3"
    ) == sorted(["2,2,2", "3,3,3"])


def test_inner_join_with_boolean_filter_condition(tenv):
    """:360 — BOOLEAN join key + IS TRUE filter."""
    d = [(1, 1, "Hi", True), (2, 2, "Hello", False),
         (3, 2, "Hello world", True)]
    view(tenv, "BT3", d, "a1 int, b1 bigint, c1 string, d1 boolean")
    view(tenv, "BT5", d, "a2 int, b2 bigint, c2 string, d2 boolean")
    assert _q(
        tenv,
        "SELECT a1, a1, c2 FROM BT3 INNER JOIN BT5 ON d1 = d2 "
        "where d1 is true",
    ) == sorted(["1,1,Hello world", "1,1,Hi", "3,3,Hello world",
                 "3,3,Hi"])


def test_inner_join_with_non_equi_join_predicate(tenv):
    """:382"""
    assert _q(
        tenv, "SELECT c, g FROM Table3, Table5 WHERE b = e AND a < 6 AND h < b"
    ) == sorted(["Hello world, how are you?,Hallo Welt wie",
                 "I am fine.,Hallo Welt wie"])


def test_join_with_multiple_keys(tenv):
    """:399"""
    assert _q(
        tenv, "SELECT c, g FROM Table3, Table5 WHERE a = d AND b = h"
    ) == sorted([
        "Hi,Hallo", "Hello,Hallo Welt", "Hello world,Hallo Welt wie gehts?",
        "Hello world,ABC", "I am fine.,HIJ", "I am fine.,IJK",
    ])


def test_join_with_alias(tenv):
    """:422 — a unicode/special-char column alias survives the join."""
    assert _q(
        tenv,
        "SELECT B.b5, T.`1-_./Ü` FROM (SELECT a1, a2, a3 AS `1-_./Ü` "
        "FROM A) AS T, B WHERE a1 = b1 AND a1 < 4",
    ) == sorted(["1,Hi", "2,Hello", "1,Hello", "2,Hello world",
                 "2,Hello world", "3,Hello world"])


def test_datastream_join_with_aggregation(tenv):
    """:437"""
    assert _q(
        tenv, "SELECT COUNT(b4), COUNT(a2) FROM A, B WHERE a1 = b1"
    ) == ["6,6"]


def test_left_outer_join_and_retraction(tenv):
    """:449 (no matching rows) / :465 (matching rows)."""
    view(tenv, "ds1", SMALL3, "a int, b bigint, c string")
    view(tenv, "ds2nc", CANNOT_JOIN,
         "d int, e bigint, f int, g string, h bigint")
    assert _q(
        tenv, "SELECT b, c, e, g FROM ds1 LEFT OUTER JOIN ds2nc ON b = e"
    ) == sorted(["1,Hi,null,null", "2,Hello world,null,null",
                 "2,Hello,null,null"])
    view(tenv, "ds2", SMALL_TUPLE5,
         "d int, e bigint, f int, g string, h bigint")
    assert _q(
        tenv, "SELECT b, c, e, g FROM ds1 LEFT OUTER JOIN ds2 ON b = e"
    ) == sorted(["1,Hi,1,Hallo", "2,Hello world,2,Hallo Welt",
                 "2,Hello,2,Hallo Welt"])


def test_stream_join_with_same_record(tenv):
    """:481 — identical records each join (no dedup)."""
    d1 = [(i, i) for i in range(1, 6) for _ in range(2)]
    d2 = [(i, i) for i in range(1, 11)]
    view(tenv, "sr1", d1, "pk int, a int")
    view(tenv, "sr2", d2, "pk int, a int")
    assert _q(tenv, """
        SELECT sr1.pk as leftPk, sr1.a as leftA,
               sr2.pk as rightPk, sr2.a as rightA
        FROM sr1 JOIN sr2 ON sr1.pk = sr2.pk
        """) == sorted([f"{i},{i},{i},{i}" for i in range(1, 6)] * 2)


OUTER_EXPECTED = sorted([
    "Hi,Hallo", "Hello,Hallo Welt", "Hello world,Hallo Welt",
    "null,Hallo Welt wie", "null,Hallo Welt wie gehts?", "null,ABC",
    "null,BCD", "null,CDE", "null,DEF", "null,EFG", "null,FGH",
    "null,GHI", "null,HIJ", "null,IJK", "null,JKL", "null,KLM",
])


def test_full_left2_right_outer_join(tenv):
    """:521 / :550 / :584 — the same padded result through FULL OUTER,
    LEFT OUTER (sides swapped), and RIGHT OUTER."""
    assert _q(
        tenv, "SELECT a3, b4 FROM A FULL OUTER JOIN B ON a2 = b2"
    ) == OUTER_EXPECTED
    assert _q(
        tenv, "SELECT c, g FROM Table5 LEFT OUTER JOIN "
              "(SELECT a1 a, a2 b, a3 c FROM A) ON b = e"
    ) == OUTER_EXPECTED
    assert _q(
        tenv, "SELECT a3, b4 FROM A RIGHT OUTER JOIN B ON a2 = b2"
    ) == OUTER_EXPECTED


AGG_A = "SELECT SUM(a2) AS a2, a1 FROM A group by a1"
AGG_B = "SELECT SUM(b2) AS b2, b1 FROM B group by b1"


def test_inner_join_with_pk_variants(tenv):
    """:613 / :627"""
    assert _q(
        tenv, f"SELECT a1, b1 FROM ({AGG_A}) JOIN ({AGG_B}) ON a1 = b1"
    ) == sorted(["1,1", "2,2", "3,3"])
    assert _q(
        tenv,
        f"SELECT a1, a2, b1, b2 FROM ({AGG_A}) JOIN ({AGG_B}) ON a2 = b2",
    ) == ["1,1,1,1"]


def test_left_join_variants(tenv):
    """:641 / :653 / :667 / :680 / :694 / :706 / :720 / :733"""
    assert _q(
        tenv, "SELECT a1, b1 FROM A LEFT JOIN B ON a1 = b1 AND a2 > b2"
    ) == sorted(["3,null", "1,null", "2,null"])
    assert _q(
        tenv,
        f"SELECT a1, b1 FROM ({AGG_A}) LEFT JOIN ({AGG_B}) "
        "ON a1 = b1 AND a2 > b2",
    ) == sorted(["1,null", "3,null", "2,null"])
    assert _q(
        tenv,
        f"SELECT a1, b1 FROM ({AGG_A}) LEFT JOIN B ON a1 = b1 AND a2 > b2",
    ) == sorted(["1,null", "3,null", "2,null"])
    assert _q(
        tenv,
        f"SELECT a1, a2, b1, b2 FROM ({AGG_A}) LEFT JOIN ({AGG_B}) "
        "ON a2 = b2 AND a1 > b1",
    ) == sorted(["1,1,null,null", "3,2,null,null", "2,2,null,null"])
    assert _q(
        tenv, "SELECT a1, b1 FROM A LEFT JOIN B ON a1 = b1"
    ) == sorted(["1,1", "2,2", "3,3", "2,2", "3,3", "3,3"])
    assert _q(
        tenv, f"SELECT a1, b1 FROM ({AGG_A}) LEFT JOIN ({AGG_B}) ON a1 = b1"
    ) == sorted(["2,2", "1,1", "3,3"])
    assert _q(
        tenv, f"SELECT a1, b1 FROM ({AGG_A}) LEFT JOIN B ON a1 = b1"
    ) == sorted(["3,3", "3,3", "3,3", "2,2", "2,2", "1,1"])
    assert _q(
        tenv,
        f"SELECT a1, a2, b1, b2 FROM ({AGG_A}) LEFT JOIN ({AGG_B}) "
        "ON a2 = b2",
    ) == sorted(["1,1,1,1", "3,2,null,null", "2,2,null,null"])


def test_right_join_variants(tenv):
    """:747 / :774 / :788 / :816 / :832 / :859 / :873 / :901"""
    assert _q(
        tenv, "SELECT a1, b1 FROM A RIGHT JOIN B ON a1 = b1 AND a2 > b2"
    ) == sorted(["null,%d" % b1 for b1 in
                 [2, 1, 3, 3, 2, 5, 3, 5, 4, 5, 4, 5, 4, 5, 4]])
    assert _q(
        tenv,
        f"SELECT a1, b1 FROM ({AGG_A}) RIGHT JOIN ({AGG_B}) "
        "ON a1 = b1 AND a2 > b2",
    ) == sorted(["null,1", "null,3", "null,2", "null,5", "null,4"])
    assert _q(
        tenv,
        f"SELECT a1, b1 FROM ({AGG_A}) RIGHT JOIN B ON a1 = b1 AND a2 > b2",
    ) == sorted(["null,%d" % b1 for b1 in
                 [2, 1, 3, 2, 3, 5, 5, 3, 5, 5, 4, 5, 4, 4, 4]])
    assert _q(
        tenv,
        f"SELECT a1, a2, b1, b2 FROM ({AGG_A}) RIGHT JOIN ({AGG_B}) "
        "ON a2 = b2 AND a1 > b1",
    ) == sorted(["null,null,3,15", "null,null,4,34", "null,null,2,5",
                 "null,null,5,65", "null,null,1,1"])
    assert _q(
        tenv, "SELECT a1, b1 FROM A RIGHT JOIN B ON a1 = b1"
    ) == sorted(["2,2", "3,3", "3,3", "2,2", "3,3", "null,5", "null,4",
                 "1,1", "null,5", "null,4", "null,5", "null,5",
                 "null,5", "null,4", "null,4"])
    assert _q(
        tenv, f"SELECT a1, b1 FROM ({AGG_A}) RIGHT JOIN ({AGG_B}) ON a1 = b1"
    ) == sorted(["1,1", "2,2", "null,5", "3,3", "null,4"])
    assert _q(
        tenv, f"SELECT a1, b1 FROM ({AGG_A}) RIGHT JOIN B ON a1 = b1"
    ) == sorted(["null,4"] * 4 + ["null,5"] * 5
                + ["1,1", "2,2", "3,3", "3,3", "3,3", "2,2"])
    assert _q(
        tenv,
        f"SELECT a1, a2, b1, b2 FROM ({AGG_A}) RIGHT JOIN ({AGG_B}) "
        "ON a2 = b2",
    ) == sorted(["null,null,3,15", "null,null,4,34", "null,null,5,65",
                 "1,1,1,1", "null,null,2,5"])


def test_full_join_variants(tenv):
    """:916 / :947 / :970 / :1002 / :1026 / :1054 / :1068 /
    FullJoinWithPk:1088 (the upstream method lost its `test` prefix —
    pinned anyway)."""
    assert _q(
        tenv, "SELECT a1, b1 FROM A FULL JOIN B ON a1 = b1 AND a2 > b2"
    ) == sorted(["1,null", "3,null", "2,null"]
                + ["null,%d" % b for b in
                   [3, 2, 2, 3, 5, 3, 5, 4, 5, 4, 1, 5, 4, 5, 4]])
    assert _q(
        tenv,
        f"SELECT a1, b1 FROM ({AGG_A}) FULL JOIN ({AGG_B}) "
        "ON a1 = b1 AND a2 > b2",
    ) == sorted(["null,2", "null,5", "null,3", "null,4", "3,null",
                 "1,null", "null,1", "2,null"])
    assert _q(
        tenv,
        f"SELECT a1, b1 FROM ({AGG_A}) FULL JOIN B ON a1 = b1 AND a2 > b2",
    ) == sorted(["null,%d" % b for b in
                 [2, 1, 2, 5, 5, 5, 5, 5, 3, 3, 3, 4, 4, 4, 4]]
                + ["3,null", "1,null", "2,null"])
    assert _q(
        tenv,
        f"SELECT a1, a2, b1, b2 FROM ({AGG_A}) FULL JOIN ({AGG_B}) "
        "ON a2 = b2 AND a1 > b1",
    ) == sorted(["1,1,null,null", "null,null,5,65", "null,null,2,5",
                 "2,2,null,null", "3,2,null,null", "null,null,3,15",
                 "null,null,4,34", "null,null,1,1"])
    assert _q(
        tenv, "SELECT a1, b1 FROM A FULL JOIN B ON a1 = b1"
    ) == sorted(["1,1", "null,5", "null,5", "null,5", "null,4",
                 "null,5", "null,4", "null,5", "null,4", "null,4",
                 "2,2", "2,2", "3,3", "3,3", "3,3"])
    assert _q(
        tenv, f"SELECT a1, b1 FROM ({AGG_A}) FULL JOIN ({AGG_B}) ON a1 = b1"
    ) == sorted(["null,4", "1,1", "3,3", "2,2", "null,5"])
    assert _q(
        tenv, f"SELECT a1, b1 FROM ({AGG_A}) FULL JOIN B ON a1 = b1"
    ) == sorted(["null,4"] * 4 + ["null,5"] * 5
                + ["3,3", "3,3", "3,3", "1,1", "2,2", "2,2"])
    assert _q(
        tenv,
        f"SELECT a1, a2, b1, b2 FROM ({AGG_A}) FULL JOIN ({AGG_B}) "
        "ON a2 = b2",
    ) == sorted(["null,null,3,15", "null,null,4,34", "null,null,5,65",
                 "3,2,null,null", "2,2,null,null", "null,null,2,5",
                 "1,1,1,1"])


NULLJOIN_D1 = [(1, 1), (3, 8), (4, 2)]
NULLJOIN_D2 = [(1, 1), (2, 2), (3, 2)]
NULLJOIN_BASE = """
SELECT t1.a, t1.b, t2.a, t2.b
FROM (
 SELECT if(a = 3, cast(null as int), a) as a, b FROM NJ1
) as t1
{join} (
 SELECT if(a = 3, cast(null as int), a) as a, b FROM NJ2
) as t2
ON {cond}
"""


def _nulljoin_views(tenv):
    view(tenv, "NJ1", NULLJOIN_D1, "a int, b bigint")
    view(tenv, "NJ2", NULLJOIN_D2, "a int, b bigint")


def test_null_outer_joins(tenv):
    """:1118 / :1161 / :1204 / :1246 / :1289 / :1334 — outer joins with
    nulled keys, with and without the explicit null-safe OR condition."""
    _nulljoin_views(tenv)
    q = NULLJOIN_BASE.format
    assert _q(tenv, q(join="LEFT OUTER JOIN", cond="t1.a = t2.a")) == sorted(
        ["1,1,1,1", "4,2,null,null", "null,8,null,null"]
    )
    assert _q(tenv, q(
        join="LEFT OUTER JOIN",
        cond="t1.a = t2.a OR (t1.a is null AND t2.a is null)",
    )) == sorted(["1,1,1,1", "4,2,null,null", "null,8,null,2"])
    assert _q(tenv, q(join="RIGHT OUTER JOIN", cond="t1.a = t2.a")) == sorted(
        ["1,1,1,1", "null,null,2,2", "null,null,null,2"]
    )
    assert _q(tenv, q(
        join="RIGHT OUTER JOIN",
        cond="t1.a = t2.a OR (t1.a is null AND t2.a is null)",
    )) == sorted(["1,1,1,1", "null,null,2,2", "null,8,null,2"])
    assert _q(tenv, q(join="FULL OUTER JOIN", cond="t1.a = t2.a")) == sorted(
        ["1,1,1,1", "null,null,2,2", "4,2,null,null",
         "null,8,null,null", "null,null,null,2"]
    )
    assert _q(tenv, q(
        join="FULL OUTER JOIN",
        cond="t1.a = t2.a OR (t1.a is null AND t2.a is null)",
    )) == sorted(["1,1,1,1", "null,null,2,2", "4,2,null,null",
                  "null,8,null,2"])


def test_join_without_watermark(tenv):
    """:1379"""
    view(tenv, "W1", [(1, 1), (2, 2), (3, 3)], "a int, b bigint")
    view(tenv, "W2", [(1, -1), (2, -2), (3, -3)], "a int, c bigint")
    assert _q(
        tenv, "select W1.a, b, c from W1, W2 WHERE W1.a = W2.a"
    ) == sorted(["1,1,-1", "2,2,-2", "3,3,-3"])


def test_big_data_of_join(tenv):
    """:1403 — 500x500 keyed join feeding COUNT(DISTINCT)."""
    data = [(i % 10, i, str(i)) for i in range(500)]
    view(tenv, "BD1", data, "a int, b bigint, c string")
    view(tenv, "BD2", data, "d int, e bigint, f string")
    assert _q(
        tenv,
        "SELECT COUNT(DISTINCT b) FROM (SELECT b FROM BD1, BD2 WHERE b = e)",
    ) == ["500"]


def test_join_with_udf_filter(tenv):
    """:1430 — FuncWithOpen (a RichFunction that asserts open() ran and
    returns true) expressed as its defining always-true session UDF."""
    tenv.spark.udf.register("funcWithOpen", lambda x: True, "boolean")
    view(tenv, "T3small", SMALL3, "a int, b bigint, c string")
    assert _q(
        tenv,
        "SELECT c, g FROM T3small join Table5 on funcWithOpen(a + d) "
        "where b = e",
    ) == sorted(["Hi,Hallo", "Hello,Hallo Welt", "Hello world,Hallo Welt"])


PUSH_AGG = ("(select a, max(b) b, count(*) c1 from l group by a) "
            "{join} (select c, max(d) d, count(*) c2 from r group by c)")
PUSH_MAIN = sorted(["2,1.0,2,2,3.0,2", "3,3.0,1,3,2.0,1",
                    "6,null,1,6,null,1"])


def test_join_with_filter_push_down(tenv):
    """:1449 — the eight filter-derivation scenarios over l/r."""
    for join in ("join", "left join", "right join"):
        assert _q(
            tenv,
            f"select * from {PUSH_AGG.format(join=join)} "
            "on a = c and c1 = c2 where a >= 2",
        ) == PUSH_MAIN, join
    assert _q(
        tenv,
        f"select * from {PUSH_AGG.format(join='left join')} "
        "on a = c and c1 = c2 where c >= 2",
    ) == PUSH_MAIN
    assert _q(
        tenv,
        f"select * from {PUSH_AGG.format(join='right join')} "
        "on a = c and c1 = c2 where c >= 2",
    ) == sorted(PUSH_MAIN + ["null,null,null,4,1.0,1"])
    assert _q(
        tenv, "select * from l left join r on a = c where c = 3"
    ) == ["3,3.0,3,2.0"]
    assert _q(
        tenv, "select * from l left join r on a = c where c IS NULL"
    ) == sorted(["1,2.0,null,null", "1,2.0,null,null",
                 "null,5.0,null,null", "null,null,null,null"])
    assert _q(
        tenv,
        "select * from l left join r on a = c where c IS NULL AND a <= 1",
    ) == sorted(["1,2.0,null,null", "1,2.0,null,null"])
    assert _q(
        tenv,
        "select * from l left join r on a = c where c < 3 AND a <= 3",
    ) == ["2,1.0,2,3.0"] * 4
    assert _q(
        tenv,
        "select * from l left join r on a = c where c <> 3 AND a <= 3",
    ) == ["2,1.0,2,3.0"] * 4


def test_join_with_join_condition_push_down(tenv):
    """:1580 — the same derivations as JOIN-ON residuals (outer rows
    now survive)."""
    assert _q(
        tenv,
        f"select * from {PUSH_AGG.format(join='join')} "
        "on a = c and c1 = c2 and a >= 2",
    ) == PUSH_MAIN
    for cond in ("a >= 2", "c >= 2"):
        assert _q(
            tenv,
            f"select * from {PUSH_AGG.format(join='left join')} "
            f"on a = c and c1 = c2 and {cond}",
        ) == sorted(PUSH_MAIN + ["1,2.0,2,null,null,null",
                                 "null,5.0,2,null,null,null"]), cond
        assert _q(
            tenv,
            f"select * from {PUSH_AGG.format(join='right join')} "
            f"on a = c and c1 = c2 and {cond}",
        ) == sorted(PUSH_MAIN + ["null,null,null,4,1.0,1",
                                 "null,null,null,null,5.0,2"]), cond
