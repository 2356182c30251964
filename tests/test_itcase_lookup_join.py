"""Verbatim harvest of the reference's streaming LookupJoinITCase
(r13 — VERDICT r12 next-item #1 tranche).

Reference: flink-table-planner .../runtime/stream/sql/
LookupJoinITCase.scala (34 tests x {legacy|dynamic source} x
{NONE|PARTIAL|FULL cache}): ``FOR SYSTEM_TIME AS OF T.proctime`` probes
against a DIMENSION table with no time attribute — the reference's
lookup join (StreamExecLookupJoin / LookupJoinRunner). Every probe sees
the dimension snapshot and emits ALL matching rows, so the temporal_sql
rewrite's new LOOKUP mode compiles these to a plain join on the
snapshot; constant keys (``ON D.id = 1``), UDF conjuncts, non-equi
predicates and NULL keys/constants all follow ordinary join ON
semantics, which is exactly what the reference's expected lists encode.

30 of the 34 are pinned here (the source/cache parameterization axes
are physical — one pin each):

- 26 join-shape tests (:206-:620) run verbatim through ``tenv.sql``
  (the ``add`` UDF is registered as a Python UDF standing in for
  TestAddWithOpen — its open/close resource counters are physical).
- The 3 TryResolveMode agg+lookup tests (:703-:767) pin the final
  retract result; the nondeterministic-update strategy knob is the
  reference's plan-level materialization guard. PROCTIME() in the probe
  view maps to current_timestamp() (flink_dialect).
- testJoinTemporalTableWithRetry (:779) pins the join result with the
  LOOKUP retry hint dropped — the hint configures physical retries and
  the reference notes the result is identical ("deterministic because
  the test data of lookup source is static").

4 n/a: testLookupCacheSharingAcrossSubtasks (:629, cache-manager
internals) and the 3 lookup-threshold retry tests (:798-:841, a
source that fails its first N probes) — this engine's partial-cache /
retry behavior is pinned separately by tests/test_lookup.py
(lookup.py's DefaultLookupCache / RetryableLookupFunctionDelegator
parity).

Tally: LookupJoinITCase 30/34 pinned + 4 n/a (physical
cache/retry internals, covered by the lookup.py pins).
"""

from __future__ import annotations

import datetime

import pytest

from tests.itcase_utils import run_retract, view

# LookupJoinITCase.scala:50 data — [id, len, content] (+ proctime)
SRC = [
    (1, 12, "Julian"),
    (2, 15, "Hello"),
    (3, 15, "Fabian"),
    (8, 11, "Hello world"),
    (9, 12, "Hello world!"),
]

# :57 dataWithNull
SRC_NULL = [
    (None, 15, "Hello"),
    (3, 15, "Fabian"),
    (None, 11, "Hello world"),
    (9, 12, "Hello world!"),
]

# :63 userData — [age, id, name]
USERS = [
    (11, 1, "Julian"),
    (22, 2, "Jark"),
    (33, 3, "Fabian"),
    (11, 4, "Hello world"),
    (11, 5, "Hello world"),
]

# :70 userDataWithNull
USERS_NULL = [
    (11, 1, "Julian"),
    (22, None, "Hello"),
    (33, 3, "Fabian"),
    (44, None, "Hello world"),
]


@pytest.fixture(scope="module")
def tenv(spark):
    from apache_flink_spark.environment import TableEnvironment

    t = TableEnvironment(spark=spark)
    base = datetime.datetime(2024, 1, 1)

    def with_proc(rows):
        return [
            r + (base + datetime.timedelta(seconds=i),)
            for i, r in enumerate(rows)
        ]

    view(t, "src", with_proc(SRC),
         "id bigint, len int, content string, proctime timestamp")
    view(t, "nullable_src", with_proc(SRC_NULL),
         "id bigint, len int, content string, proctime timestamp")
    view(t, "user_table", USERS, "age int, id bigint, name string")
    view(t, "nullable_user_table", USERS_NULL, "age int, id bigint, name string")
    t.sql(
        "CREATE OR REPLACE TEMPORARY VIEW userTableWithComputedColumn AS "
        "SELECT age, id, name, age + 1 AS nominal_age FROM user_table"
    )
    spark.udf.register("add", lambda a, b: a + b, "bigint")
    return t


JOIN3 = sorted(["1,12,Julian,Julian", "2,15,Hello,Jark", "3,15,Fabian,Fabian"])


def test_join_temporal_table(tenv):
    """:206 testJoinTemporalTable."""
    assert run_retract(
        tenv,
        "SELECT T.id, T.len, T.content, D.name FROM src AS T JOIN user_table "
        "for system_time as of T.proctime AS D ON T.id = D.id",
    ) == JOIN3


def test_join_temporal_table_with_udf_filter(tenv):
    """:219 testJoinTemporalTableWithUdfFilter."""
    assert run_retract(
        tenv,
        "SELECT T.id, T.len, T.content, D.name FROM src AS T JOIN user_table "
        "for system_time as of T.proctime AS D ON T.id = D.id "
        "WHERE add(T.id, D.id) > 3 AND add(T.id, 2) > 3 AND add (D.id, 2) > 3",
    ) == sorted(["2,15,Hello,Jark", "3,15,Fabian,Fabian"])


def test_join_temporal_table_with_udf_equal_filter(tenv):
    """:236 testJoinTemporalTableWithUdfEqualFilter."""
    assert run_retract(
        tenv,
        "SELECT T.id, T.len, T.content, D.name FROM "
        "src AS T JOIN user_table for system_time as of T.proctime AS D "
        "ON T.id = D.id WHERE CONCAT('Hello-', D.name) = 'Hello-Jark'",
    ) == ["2,15,Hello,Jark"]


def test_join_temporal_table_on_constant_key(tenv):
    """:256 testJoinTemporalTableOnConstantKey — every probe row pairs
    with the id-1 dimension row."""
    assert run_retract(
        tenv,
        "SELECT T.id, T.len, T.content, D.name FROM src AS T JOIN user_table "
        "for system_time as of T.proctime AS D ON D.id = 1",
    ) == sorted([
        "1,12,Julian,Julian", "2,15,Hello,Julian", "3,15,Fabian,Julian",
        "8,11,Hello world,Julian", "9,12,Hello world!,Julian",
    ])


def test_join_temporal_table_on_nullable_key(tenv):
    """:274 testJoinTemporalTableOnNullableKey — NULL probe keys never
    match."""
    assert run_retract(
        tenv,
        "SELECT T.id, T.len, D.name FROM nullable_src AS T JOIN user_table "
        "for system_time as of T.proctime AS D ON T.id = D.id",
    ) == ["3,15,Fabian"]


def test_join_temporal_table_with_push_down(tenv):
    """:287 testJoinTemporalTableWithPushDown."""
    assert run_retract(
        tenv,
        "SELECT T.id, T.len, T.content, D.name FROM src AS T JOIN user_table "
        "for system_time as of T.proctime AS D ON T.id = D.id AND D.age > 20",
    ) == sorted(["2,15,Hello,Jark", "3,15,Fabian,Fabian"])


def test_join_temporal_table_with_non_equal_filter(tenv):
    """:300 testJoinTemporalTableWithNonEqualFilter."""
    assert run_retract(
        tenv,
        "SELECT T.id, T.len, T.content, D.name, D.age FROM src AS T JOIN "
        "user_table for system_time as of T.proctime AS D ON T.id = D.id "
        "WHERE T.len <= D.age",
    ) == sorted(["2,15,Hello,Jark,22", "3,15,Fabian,Fabian,33"])


@pytest.mark.parametrize("cond", [
    "T.id = D.id AND T.content = D.name",        # :313 OnMultiFields
    "T.content = D.name AND T.id = D.id",        # :326 OnMultiKeyFields
])
def test_join_temporal_table_on_multi_fields(tenv, cond):
    assert run_retract(
        tenv,
        "SELECT T.id, T.len, D.name FROM src AS T JOIN user_table "
        f"for system_time as of T.proctime AS D ON {cond}",
    ) == sorted(["1,12,Julian", "3,15,Fabian"])


def test_join_temporal_table_on_multi_key_fields2(tenv):
    """:339 testJoinTemporalTableOnMultiKeyFields2 — probe through a
    reordered subquery."""
    assert run_retract(
        tenv,
        "SELECT t1.id, t1.len, D.name FROM "
        "(select proctime, content, id, len FROM src) t1 "
        "JOIN user_table for system_time as of t1.proctime AS D "
        "ON t1.content = D.name AND t1.id = D.id",
    ) == sorted(["1,12,Julian", "3,15,Fabian"])


def test_join_temporal_table_on_multi_key_fields_with_constant_key(tenv):
    """:355 — int constant as one of the keys."""
    assert run_retract(
        tenv,
        "SELECT T.id, T.len, D.name FROM src AS T JOIN user_table "
        "for system_time as of T.proctime AS D "
        "ON T.content = D.name AND 3 = D.id",
    ) == ["3,15,Fabian"]


def test_join_temporal_table_on_string_constant_key(tenv):
    """:368 — string constant as one of the keys."""
    assert run_retract(
        tenv,
        "SELECT T.id, T.len, D.name FROM src AS T JOIN user_table "
        "for system_time as of T.proctime AS D "
        "ON D.name = 'Fabian' AND T.id = D.id",
    ) == ["3,15,Fabian"]


def test_join_temporal_table_on_multi_constant_key(tenv):
    """:381 — all-constant keys: a cross pairing with the single
    matching dimension row."""
    assert run_retract(
        tenv,
        "SELECT T.id, T.len, D.name FROM src AS T JOIN user_table "
        "for system_time as of T.proctime AS D "
        "ON D.name = 'Fabian' AND 3 = D.id",
    ) == sorted([
        "1,12,Fabian", "2,15,Fabian", "3,15,Fabian", "8,11,Fabian",
        "9,12,Fabian",
    ])


def test_left_join_temporal_table(tenv):
    """:400 testLeftJoinTemporalTable."""
    assert run_retract(
        tenv,
        "SELECT T.id, T.len, D.name, D.age FROM src AS T LEFT JOIN user_table "
        "for system_time as of T.proctime AS D ON T.id = D.id",
    ) == sorted([
        "1,12,Julian,11", "2,15,Jark,22", "3,15,Fabian,33",
        "8,11,null,null", "9,12,null,null",
    ])


def test_left_join_temporal_table_with_pre_filter(tenv):
    """:414 — a probe-side conjunct in ON null-extends non-qualifying
    rows (ordinary LEFT ... ON semantics)."""
    assert run_retract(
        tenv,
        "SELECT T.id, T.len, D.name, D.age FROM src AS T LEFT JOIN user_table "
        "for system_time as of T.proctime AS D ON T.id = D.id AND T.len < 15",
    ) == sorted([
        "1,12,Julian,11", "2,15,null,null", "3,15,null,null",
        "8,11,null,null", "9,12,null,null",
    ])


def test_left_join_temporal_table_with_udf_pre_filter(tenv):
    """:428 testLeftJoinTemporalTableWithUdfPreFilter."""
    assert run_retract(
        tenv,
        "SELECT T.id, T.len, T.content, D.name FROM src AS T LEFT JOIN "
        "user_table for system_time as of T.proctime AS D "
        "ON T.id = D.id AND add(T.id, 2) > 4",
    ) == sorted([
        "1,12,Julian,null", "2,15,Hello,null", "3,15,Fabian,Fabian",
        "8,11,Hello world,null", "9,12,Hello world!,null",
    ])


def test_left_join_temporal_table_on_nullable_key(tenv):
    """:452 testLeftJoinTemporalTableOnNullableKey."""
    assert run_retract(
        tenv,
        "SELECT T.id, T.len, D.name FROM nullable_src AS T LEFT OUTER JOIN "
        "user_table for system_time as of T.proctime AS D ON T.id = D.id",
    ) == sorted(["null,15,null", "3,15,Fabian", "null,11,null", "9,12,null"])


def test_left_join_temporal_table_on_mult_key_fields(tenv):
    """:465 testLeftJoinTemporalTableOnMultKeyFields."""
    assert run_retract(
        tenv,
        "SELECT T.id, T.len, D.name, D.age FROM src AS T LEFT JOIN user_table "
        "for system_time as of T.proctime AS D "
        "ON T.id = D.id and T.content = D.name",
    ) == sorted([
        "1,12,Julian,11", "2,15,null,null", "3,15,Fabian,33",
        "8,11,null,null", "9,12,null,null",
    ])


def test_join_temporal_table_multi_key_fields_with_null_data(tenv):
    """:479 — NULL keys on both sides never equal."""
    assert run_retract(
        tenv,
        "SELECT T.id, T.len, D.name FROM nullable_src AS T JOIN "
        "nullable_user_table for system_time as of T.proctime AS D "
        "ON T.content = D.name AND T.id = D.id",
    ) == ["3,15,Fabian"]


def test_left_join_temporal_table_multi_key_fields_with_null_data(tenv):
    """:492 (selects D.id, so unmatched probes print null ids)."""
    assert run_retract(
        tenv,
        "SELECT D.id, T.len, D.name FROM nullable_src AS T LEFT JOIN "
        "nullable_user_table for system_time as of T.proctime AS D "
        "ON T.content = D.name AND T.id = D.id",
    ) == sorted(["null,15,null", "3,15,Fabian", "null,11,null", "null,12,null"])


def test_join_temporal_table_on_null_constant_key(tenv):
    """:505 — ON D.id = null is never true."""
    assert run_retract(
        tenv,
        "SELECT T.id, T.len, T.content FROM nullable_src AS T JOIN "
        "nullable_user_table for system_time as of T.proctime AS D "
        "ON D.id = null",
    ) == []


def test_join_temporal_table_multi_key_fields_with_null_constant_key(tenv):
    """:517 — a NULL constant key empties the join."""
    assert run_retract(
        tenv,
        "SELECT T.id, T.len, D.name FROM src AS T JOIN user_table "
        "for system_time as of T.proctime AS D "
        "ON T.content = D.name AND null = D.id",
    ) == []


def test_join_temporal_table_on_multi_key_fields_with_udf(tenv):
    """:529 — expressions over the dimension columns in the key."""
    assert run_retract(
        tenv,
        "SELECT T.id, T.content, D.age, D.id FROM src AS T JOIN user_table "
        "for system_time as of T.proctime AS D "
        "ON T.id = D.id + 4 AND T.content = concat(D.name, '!') AND D.age = 11",
    ) == ["9,Hello world!,11,5"]


def test_join_temporal_table_with_computed_column(tenv):
    """:543 testJoinTemporalTableWithComputedColumn."""
    assert run_retract(
        tenv,
        "SELECT T.id, T.len, T.content, D.name, D.age, D.nominal_age "
        "FROM src AS T JOIN userTableWithComputedColumn "
        "for system_time as of T.proctime AS D ON T.id = D.id",
    ) == sorted([
        "1,12,Julian,Julian,11,12", "2,15,Hello,Jark,22,23",
        "3,15,Fabian,Fabian,33,34",
    ])


def test_join_temporal_table_with_computed_column_and_push_down(tenv):
    """:562 testJoinTemporalTableWithComputedColumnAndPushDown."""
    assert run_retract(
        tenv,
        "SELECT T.id, T.len, T.content, D.name, D.age, D.nominal_age "
        "FROM src AS T JOIN userTableWithComputedColumn "
        "for system_time as of T.proctime AS D "
        "ON T.id = D.id and D.nominal_age > 12",
    ) == sorted(["2,15,Hello,Jark,22,23", "3,15,Fabian,Fabian,33,34"])


def test_current_date_in_join_condition(tenv):
    """:580 testCurrentDateInJoinCondition — year-2000 rows never pass
    the CURRENT_DATE bound; empty result."""
    tenv.spark.createDataFrame(
        [("abc", datetime.datetime(2000, 1, 1),
          datetime.datetime(2024, 1, 1))],
        "id string, ts timestamp, proc timestamp",
    ).createOrReplaceTempView("Ta")
    tenv.spark.createDataFrame(
        [("abc", datetime.datetime(2000, 1, 2))], "id string, ts timestamp"
    ).createOrReplaceTempView("Tb")
    assert run_retract(
        tenv,
        "SELECT * FROM Ta AS t1 "
        "INNER JOIN Tb FOR SYSTEM_TIME AS OF t1.proc AS t2 ON t1.id = t2.id "
        "WHERE CAST(coalesce(t1.ts, t2.ts) AS VARCHAR) >= "
        "CONCAT(CAST(CURRENT_DATE AS VARCHAR), ' 00:00:00')",
    ) == []


def _t1_probe(tenv):
    """:703 sql1 — the aggregated probe side (PROCTIME() maps to the
    batch timestamp via flink_dialect)."""
    tenv.sql(
        "CREATE OR REPLACE TEMPORARY VIEW t1 AS "
        "SELECT max(id) as id, PROCTIME() as proctime FROM src AS T group by len"
    )


def test_agg_and_left_join_with_try_resolve_mode(tenv):
    """:703 testAggAndLeftJoinWithTryResolveMode — final retract result
    of the agg-then-lookup pipeline (the TRY_RESOLVE strategy is the
    reference's plan-level materialization guard)."""
    _t1_probe(tenv)
    assert run_retract(
        tenv,
        "SELECT t1.id, D.name, D.age FROM t1 LEFT JOIN user_table "
        "for system_time as of t1.proctime AS D ON t1.id = D.id",
    ) == sorted(["3,Fabian,33", "8,null,null", "9,null,null"])


def test_agg_and_left_join_all_constant_key_with_try_resolve_mode(tenv):
    """:725 — constant-key lookup from the aggregated probe."""
    _t1_probe(tenv)
    assert run_retract(
        tenv,
        "SELECT t1.id, D.name, D.age FROM t1 LEFT JOIN user_table "
        "for system_time as of t1.proctime AS D ON D.id = 3",
    ) == sorted(["3,Fabian,33", "8,Fabian,33", "9,Fabian,33"])


def test_agg_and_join_all_constant_key_with_try_resolve_mode(tenv):
    """:747 — no dimension column required downstream."""
    _t1_probe(tenv)
    assert run_retract(
        tenv,
        "SELECT t1.id FROM t1 LEFT JOIN user_table "
        "for system_time as of t1.proctime AS D ON D.id = 3",
    ) == sorted(["3", "8", "9"])


def test_join_temporal_table_with_retry(tenv):
    """:779 testJoinTemporalTableWithRetry — the LOOKUP retry hint is
    physical configuration; the reference notes the result equals the
    plain join on a static lookup source."""
    assert run_retract(
        tenv,
        "SELECT T.id, T.len, T.content, D.name FROM src AS T "
        "JOIN user_table for system_time as of T.proctime AS D ON T.id = D.id",
    ) == JOIN3
