"""Verbatim harvest of the reference's streaming AggregateITCase (r13 —
VERDICT r12 next-item #1).

Reference: flink-table/flink-table-planner/src/test/scala/org/apache/
flink/table/planner/runtime/stream/sql/AggregateITCase.scala (cited as
:line below). Every pin uses the suite's exact input data and SQL and
asserts the exact expected strings (TestingRetractSink.getRetractResults
== the final materialized table, compared sorted as Flink Row.toString
lines — tests/itcase_utils.py).

Tally (61 @TestTemplate methods + 1 @Disabled):
  - 40 pinned verbatim here (marked :line in each test),
  - 4 covered-by-equivalent: testDistinctAggWithNullValues:429 (the
    CntNullNonNull Java UDAF expressed as its defining expression),
    testListAgg:1458 (the two listagg_retract system-function columns are
    the builtin runtime retract variants whose FINAL equals listagg —
    pinned on the two builtin columns), testUnboundedGroupByCollect-
    WithObject:889 (COLLECT over a row object — pinned as the multiset
    dict, Scala's List.toString rendering n/a),
    testAggregationCodeSplit:1710 (pinned; the 2048-char codegen-split
    knob itself is Janino-specific, Catalyst splits automatically),
  - 12 n/a — Java-UDAF/JVM-internals only: testShufflePojo:142
    (MyToPojoFunc grouping key), testPojoField:959 (MyPojoAggFunction),
    testVarArgsNoGroupBy:1156 / testVarArgsWithGroupBy:1173 /
    testLongVarargsAgg:1559 (VarArgsAggFunction 260-arg Java varargs),
    testUserDefinedObjectAgg:1489 (UserDefinedObjectUDAF),
    testOverloadedAccumulator:1739 (OverloadedMaxFunction),
    testCollectOnClusteredFields:1408 (uuid() per-row grouping +
    CompositeObj toString), testGenericTypesWithoutStateClean:1666
    (no assertion — state-cleanup smoke), testAggFunctionPriority:2053
    (temporary-system-UDAF shadowing a builtin, FLINK-36283),
    testWindowWithUnboundedAgg:730 (group window + watermark — pinned in
    test_itcase_window_agg.py with the arrival simulator),
    testEmptyInputAggregationWithoutGroupBy:163 (@Disabled upstream,
    FLINK-12215).

Semantic fixes this harvest forced (now production code,
apache_flink_spark/flink_dialect.py): Flink AVG(INT)->INT via integer
division, AVG(DECIMAL(p,s)) keeps scale s, VAR_POP(INT)->INT via
Calcite's reduction, LISTAGG default delimiter ',', COLLECT multisets,
JSON_OBJECTAGG KEY VALUE syntax.
"""

from __future__ import annotations

import pytest

from tests.itcase_utils import flink_rows, run_retract, view

# TestData.scala:258 tupleData3
TUPLE_DATA_3 = [
    (1, 1, "Hi"), (2, 2, "Hello"), (3, 2, "Hello world"),
    (4, 3, "Hello world, how are you?"), (5, 3, "I am fine."),
    (6, 3, "Luke Skywalker"), (7, 4, "Comment#1"), (8, 4, "Comment#2"),
    (9, 4, "Comment#3"), (10, 4, "Comment#4"), (11, 5, "Comment#5"),
    (12, 5, "Comment#6"), (13, 5, "Comment#7"), (14, 5, "Comment#8"),
    (15, 5, "Comment#9"), (16, 6, "Comment#10"), (17, 6, "Comment#11"),
    (18, 6, "Comment#12"), (19, 6, "Comment#13"), (20, 6, "Comment#14"),
    (21, 6, "Comment#15"),
]

# TestData.scala:378 tupleData5
TUPLE_DATA_5 = [
    (1, 1, 0, "Hallo", 1), (2, 2, 1, "Hallo Welt", 2),
    (2, 3, 2, "Hallo Welt wie", 1), (3, 4, 3, "Hallo Welt wie gehts?", 2),
    (3, 5, 4, "ABC", 2), (3, 6, 5, "BCD", 3), (4, 7, 6, "CDE", 2),
    (4, 8, 7, "DEF", 1), (4, 9, 8, "EFG", 1), (4, 10, 9, "FGH", 2),
    (5, 11, 10, "GHI", 1), (5, 12, 11, "HIJ", 3), (5, 13, 12, "IJK", 3),
    (5, 14, 13, "JKL", 2), (5, 15, 14, "KLM", 2),
]

# the suite's class-level `data` list (AggregateITCase.scala:63)
CLASS_DATA = [
    (1000, 1, "Hello"), (2000, 2, "Hello"), (3000, 3, "Hello"),
    (4000, 4, "Hello"), (5000, 5, "Hello"), (6000, 6, "Hello"),
    (7000, 7, "Hello World"), (8000, 8, "Hello World"),
    (20000, 20, "Hello World"),
]

ABC12 = [
    (1, 1, "A"), (2, 2, "B"), (3, 2, "B"), (4, 3, "C"), (5, 3, "C"),
    (6, 3, "C"), (7, 4, "B"), (8, 4, "A"), (9, 4, "D"), (10, 4, "E"),
    (11, 5, "A"), (12, 5, "B"),
]


@pytest.fixture(scope="module")
def tenv(spark):
    from apache_flink_spark.environment import TableEnvironment

    return TableEnvironment(spark=spark)


def apply_changelog(rows):
    """Apply an I/UA/UB/D values-source changelog to its final multiset
    (the TestValuesTableFactory source's contract: -D/-U delete one
    matching row, +I/+U insert one)."""
    out: list[tuple] = []
    for kind, *vals in rows:
        if kind in ("+I", "+U"):
            out.append(tuple(vals))
        elif kind in ("-D", "-U"):
            out.remove(tuple(vals))
        else:  # pragma: no cover
            raise ValueError(kind)
    return out


def test_empty_input_aggregation(tenv):
    """:74 — aggregation over an empty filter result emits nothing."""
    view(tenv, "T", [(1, 1), (2, 2), (3, 3)], "a int, b int")
    assert run_retract(
        tenv,
        "select sum(a), avg(a), min(a), count(a), count(1) from T "
        "where a > 9999 group by b",
    ) == []


def test_max_agg_retract_with_condition(tenv):
    """:93 — MAX over a count-filtered changelog; final = 5."""
    view(tenv, "T", [(1, 10), (1, 10), (2, 5), (1, 10)],
         "id int, price int")
    assert run_retract(
        tenv,
        "SELECT MAX(price) FROM("
        "   SELECT id, count(*) as c, price FROM T GROUP BY id, price)"
        " WHERE c > 0 and c < 3",
    ) == ["5"]


def test_min_agg_retract_with_condition(tenv):
    """:118 — MIN over a count-filtered changelog; final = 6."""
    view(tenv, "T", [(1, 5), (2, 6), (1, 5)], "id int, price int")
    assert run_retract(
        tenv,
        "SELECT MIN(price) FROM("
        "   SELECT id, count(*) as c, price FROM T GROUP BY id, price)"
        " WHERE c < 2",
    ) == ["6"]


def test_aggregation_without_watermark(tenv):
    """:182 — avg(INT) is an INT (2, not 2.0)."""
    view(tenv, "T", [(1, 1), (2, 2), (3, 3)], "a int, b int")
    assert run_retract(
        tenv, "select sum(a), avg(a), min(a), count(a), count(1) from T"
    ) == ["6,2,1,3,3"]


def test_distinct_group_by(tenv):
    """:200 — SUM/COUNT DISTINCT with expressions over tupleData3."""
    view(tenv, "MyTable", TUPLE_DATA_3, "a int, b bigint, c string")
    assert run_retract(
        tenv,
        "SELECT b, SUM(DISTINCT (a * 3)), "
        "COUNT(DISTINCT SUBSTRING(c FROM 1 FOR 2)), COUNT(DISTINCT c) "
        "FROM MyTable GROUP BY b",
    ) == sorted([
        "1,3,1,1", "2,15,1,2", "3,45,3,3", "4,102,1,4", "5,195,1,5",
        "6,333,1,6",
    ])


def test_count_distinct(tenv):
    """:224 — COUNT(DISTINCT) over timestamp/date/time/decimal/int/
    bigint/string columns with nulls."""
    ids = [1, 2, 2, 3, 3, 3, 4, 4, 4, 4, 5, 5, 5, 5, 5]
    vals = [1, 2, None, 4, 5, 6, 7, None, None, 10, 11, 11, 13, 14, 15]
    chars = ["A", "B", None, "D", "E", "F", "H", None, None, "K", "L",
             "L", "N", "O", "P"]
    import datetime
    import decimal
    rows = [
        (
            ids[i],
            None if v is None else datetime.datetime(1970, 1, 1, 0, 0, v),
            None if v is None else datetime.date(1970, 1, v),
            # TIME modeled as a same-day timestamp (Spark has no TIME)
            None if v is None else datetime.datetime(1970, 1, 1, 0, 0, v),
            None if v is None else decimal.Decimal(v),
            v,
            v,
            chars[i],
        )
        for i, v in enumerate(vals)
    ]
    view(
        tenv, "T", rows,
        "id int, a timestamp, b date, c timestamp, d decimal(19,0), "
        "e int, f bigint, g string",
    )
    # (TIME is modeled as a timestamp column — Spark has no TIME type;
    # distinct counting is identical)
    assert run_retract(
        tenv,
        "SELECT id, count(distinct a), count(distinct b), "
        "count(distinct c), count(distinct d), count(distinct e), "
        "count(distinct f), count(distinct g) FROM T GROUP BY id",
    ) == sorted([
        "1,1,1,1,1,1,1,1", "2,1,1,1,1,1,1,1", "3,3,3,3,3,3,3,3",
        "4,2,2,2,2,2,2,2", "5,4,4,4,4,4,4,4",
    ])


def test_distinct_with_retract(tenv):
    """:345 — DISTINCT aggregates over a retracting inner count;
    avg(distinct BIGINT) is a BIGINT (3)."""
    rows = [
        (1, 1, "A"), (1, 1, "A"), (1, 1, "A"), (2, 2, "B"), (3, 2, "B"),
        (4, 3, "C"), (5, 3, "C"), (6, 3, "C"), (7, 4, "B"), (8, 4, "A"),
        (9, 4, "D"), (10, 4, "E"), (11, 5, "A"), (12, 5, "B"),
    ]
    view(tenv, "T", rows, "a int, b bigint, c string")
    assert run_retract(
        tenv,
        "SELECT count(distinct cnt), sum(distinct cnt), "
        "max(distinct cnt), min(distinct cnt), avg(distinct cnt), "
        "count(distinct max_a) FROM ("
        " SELECT b, count(a) as cnt, max(a) as max_a FROM T GROUP BY b)",
    ) == ["3,9,4,2,3,5"]


def test_distinct_aggregate_more_than_64(tenv):
    """:397 — 100 COUNT(DISTINCT) FILTER columns (the >64-distinct-slots
    codegen path in the reference; Catalyst splits automatically)."""
    rows = [(j, i) for i in range(100) for j in range(100 - i)]
    view(tenv, "T", rows, "a int, b int")
    distincts = ", ".join(
        f"count(distinct a) filter (where b = {i})" for i in range(100)
    )
    assert run_retract(tenv, f"SELECT {distincts} FROM T") == [
        ",".join(str(n) for n in range(100, 0, -1))
    ]


def test_distinct_agg_with_null_values(tenv):
    """:429 — DISTINCT aggregation where the column has nulls; the
    CntNullNonNull Java UDAF ('<distinct non-null>|<has null>') is
    expressed as its defining expression (covered-by-equivalent)."""
    rows = [
        (1, 1, "A"), (2, 2, "B"), (3, 2, "B"), (4, 3, "C"), (5, 3, "C"),
        (6, 3, None), (7, 3, "C"), (8, 4, "B"), (9, 4, None),
        (10, 4, None), (11, 4, "A"), (12, 4, "D"), (13, 4, None),
        (14, 4, "E"), (15, 5, "A"), (16, 5, None), (17, 5, "B"),
    ]
    view(tenv, "T", rows, "a int, b bigint, c string")
    assert run_retract(
        tenv,
        "SELECT b, count(*), CONCAT(CAST(count(DISTINCT c) AS STRING), "
        "'|', IF(count(*) > count(c), '1', '0')) FROM T GROUP BY b",
    ) == sorted(["1,1,1|0", "2,2,1|0", "3,4,1|1", "4,7,4|1", "5,3,2|1"])


def test_precision_for_sum_aggregation_on_decimal(tenv):
    """:463 — SUM(DECIMAL) keeps the sum's scale (no plus() override)."""
    assert run_retract(
        tenv,
        "select sum(cast(1.03520274 as DECIMAL(32, 8))), "
        "sum(cast(12345.035202748654 AS DECIMAL(30, 20))), "
        "sum(cast(12.345678901234567 AS DECIMAL(25, 22)))",
    ) == ["1.03520274,12345.03520274865400000000,"
          "12.3456789012345670000000"]
    import decimal
    view(tenv, "T", [(decimal.Decimal("1.11111111"),),
                     (decimal.Decimal("1.11111111"),)],
         "a decimal(32,8)")
    assert run_retract(
        tenv, "select sum(cast(a as decimal(32, 8))) from T"
    ) == ["2.22222222"]


def test_precision_for_sum_with_retract_aggregation_on_decimal(tenv):
    """:497 — SUM(DECIMAL) under an I,D changelog source."""
    import decimal as d
    rows = [
        ("+I", "1.03520274", "12345.035202748654", "12.345678901234567", "a"),
        ("+I", "1.03520274", "12345.035202748654", "12.345678901234567", "b"),
        ("-D", "1.03520274", "12345.035202748654", "12.345678901234567", "b"),
        ("+I", "2.13520275", "21245.542202748654", "242.78594201234567", "a"),
        ("+I", "1.11111111", "11111.111111111111", "111.11111111111111", "b"),
        ("+I", "1.11111111", "11111.111111111111", "111.11111111111111", "a"),
        ("-D", "1.11111111", "11111.111111111111", "111.11111111111111", "b"),
        ("+I", "2.13520275", "21245.542202748654", "242.78594201234567", "a"),
    ]
    final = apply_changelog(rows)
    # the reference builds these with Scala double literals and
    # BigDecimal.valueOf(double) (Double.toString shortest round-trip) —
    # Python's float repr is the same algorithm
    view(
        tenv, "T",
        [(d.Decimal(repr(float(a))), d.Decimal(repr(float(b))),
          d.Decimal(repr(float(c))), g) for a, b, c, g in final],
        "a decimal(32,8), b decimal(32,20), c decimal(32,20), d string",
    )
    assert run_retract(
        tenv, "SELECT sum(a), sum(b), sum(c) FROM T GROUP BY d"
    ) == ["6.41671935,65947.23071935707000000000,"
          "609.02867403703699700000"]


def test_precision_for_avg_aggregation_on_decimal(tenv):
    """:577 — AVG(DECIMAL(p,s)) keeps scale s, HALF_UP (2.77777778)."""
    assert run_retract(
        tenv,
        "select avg(cast(1.03520274 as DECIMAL(32, 8))), "
        "avg(cast(12345.035202748654 AS DECIMAL(30, 20))), "
        "avg(cast(12.345678901234567 AS DECIMAL(25, 22)))",
    ) == ["1.03520274,12345.03520274865400000000,"
          "12.3456789012345670000000"]
    import decimal
    view(tenv, "T", [(decimal.Decimal("2.22222222"),),
                     (decimal.Decimal("3.33333333"),)],
         "a decimal(32,8)")
    assert run_retract(
        tenv, "select avg(cast(a as decimal(32, 8))) from T"
    ) == ["2.77777778"]


def test_group_by_agg(tenv):
    """:611"""
    view(tenv, "T", ABC12, "a int, b bigint, c string")
    assert run_retract(
        tenv, "SELECT b, count(c), sum(a) FROM T GROUP BY b"
    ) == sorted(["1,1,1", "2,2,5", "3,3,15", "4,4,34", "5,2,23"])


def test_count_with_nullable_if_call(tenv):
    """:638 — COUNT over IF(...) that returns NULL."""
    view(tenv, "T", ABC12, "a int, b bigint, c string")
    assert run_retract(
        tenv,
        "select b, count(1), "
        "count(if(c in ('A', 'B'), cast(null as integer), 1)) as cnt, "
        "count(if(c not in ('A', 'B'), 1, cast(null as integer))) as cnt1 "
        "from T group by b",
    ) == sorted(["1,1,0,0", "2,2,0,0", "3,3,3,3", "4,4,2,2", "5,2,0,0"])


def test_nested_group_by_agg(tenv):
    """:676 — aggregate over an aggregate (retract-consuming group agg)."""
    view(tenv, "T", ABC12, "a int, b bigint, c string")
    assert run_retract(
        tenv,
        "SELECT sum(b), count(a), max(a), min(a), c FROM ("
        " SELECT b, count(c) as c, sum(a) as a FROM T GROUP BY b) "
        "GROUP BY c",
    ) == sorted(["1,1,1,1,1", "3,1,15,15,3", "4,1,34,34,4", "7,2,23,5,2"])


def test_unbounded_group_by(tenv):
    """:715"""
    view(tenv, "MyTable", TUPLE_DATA_3, "a int, b bigint, c string")
    assert run_retract(
        tenv, "SELECT b, COUNT(a) FROM MyTable GROUP BY b"
    ) == sorted(["1,1", "2,2", "3,3", "4,4", "5,5", "6,6"])


def test_listagg_with_retraction(tenv):
    """:759 — LISTAGG over a retracting changelog view, both explicit
    ';' and the default ',' delimiter. Flink's element ORDER is the
    retract-stream processing order (a streaming artifact) — pinned as
    the element multiset + delimiters."""
    view(tenv, "T", [("1", "a"), ("1", "b"), ("1", None), ("1", "a")],
         "x string, y string")
    tenv.sql(
        "CREATE OR REPLACE TEMPORARY VIEW view1 AS SELECT x, y, "
        "CAST(COUNT(1) AS STRING) AS ct FROM T GROUP BY x, y"
    )
    rows = tenv.sql(
        "select x, '[' || LISTAGG(CONCAT_WS('=', y, ct), ';') || ']' "
        "AS list1, '[' || LISTAGG(CONCAT_WS('=', y, ct)) || ']' AS "
        "list2 FROM view1 GROUP BY x"
    ).collect()
    assert len(rows) == 1 and rows[0][0] == "1"
    # reference expected: "1,[b=1;1;a=2],[b=1,1,a=2]"
    assert sorted(rows[0][1][1:-1].split(";")) == ["1", "a=2", "b=1"]
    assert sorted(rows[0][2][1:-1].split(",")) == ["1", "a=2", "b=1"]


def test_listagg_with_null_data(tenv):
    """:802 — LISTAGG of all-null input is null."""
    view(tenv, "T", [(1, 1, None), (2, 1, None), (3, 1, None)],
         "id int, len int, content string")
    assert run_retract(
        tenv, "SELECT len, listagg(content, '#') FROM T GROUP BY len"
    ) == ["1,null"]


def test_listagg_without_delimiter_treat_null(tenv):
    """:823 — default-delimiter LISTAGG of all-null input is null."""
    view(tenv, "T", [(1, 1, None), (2, 1, None), (3, 1, None)],
         "id int, len int, content string")
    assert run_retract(
        tenv, "SELECT len, listagg(content) FROM T GROUP BY len"
    ) == ["1,null"]


def test_listagg_with_distinct(tenv):
    """:844 — LISTAGG(DISTINCT ...) skips nulls and dedups; element
    order is first-arrival (streaming artifact) — pinned as sets."""
    rows = [
        (1, 1, "A"), (2, 2, "B"), (3, 2, "B"), (4, 3, "C"), (5, 3, "C"),
        (6, 3, "A"), (7, 4, "EF"), (1, 1, "A"), (8, 4, "EF"),
        (8, 4, None),
    ]
    view(tenv, "MyTable", rows, "a int, b bigint, c string")
    got = {
        r[0]: sorted(r[1].split("#"))
        for r in tenv.sql(
            "SELECT b, LISTAGG(DISTINCT c, '#') FROM MyTable GROUP BY b"
        ).collect()
    }
    # reference expected: 1,A / 2,B / 3,C#A / 4,EF
    assert got == {1: ["A"], 2: ["B"], 3: ["A", "C"], 4: ["EF"]}


def test_unbounded_group_by_collect(tenv):
    """:866 — COLLECT builds a value->multiplicity multiset (compared as
    maps; the reference's assertMapStrEquals is order-insensitive)."""
    view(tenv, "MyTable", TUPLE_DATA_3, "a int, b bigint, c string")
    got = {
        r[0]: r[1]
        for r in tenv.sql(
            "SELECT b, COLLECT(a) FROM MyTable GROUP BY b"
        ).collect()
    }
    assert got == {
        1: {1: 1}, 2: {2: 1, 3: 1}, 3: {4: 1, 5: 1, 6: 1},
        4: {7: 1, 8: 1, 9: 1, 10: 1},
        5: {11: 1, 12: 1, 13: 1, 14: 1, 15: 1},
        6: {16: 1, 17: 1, 18: 1, 19: 1, 20: 1, 21: 1},
    }


def test_unbounded_group_by_collect_with_object(tenv):
    """:889 — COLLECT over a composite object (covered-by-equivalent:
    the multiset is pinned as a dict; Scala's List.toString is n/a)."""
    rows = [
        (1, 1, (12, "45.6")), (2, 2, (12, "45.612")),
        (3, 2, (13, "41.6")), (4, 3, (14, "45.2136")),
        (5, 3, (18, "42.6")),
    ]
    view(tenv, "MyTable", rows,
         "a int, b int, c struct<sid:int, point:string>")
    got = {
        r[0]: {tuple(k): v for k, v in r[1].items()}
        for r in tenv.sql(
            "SELECT b, COLLECT(c) FROM MyTable GROUP BY b"
        ).collect()
    }
    assert got == {
        1: {(12, "45.6"): 1},
        2: {(13, "41.6"): 1, (12, "45.612"): 1},
        3: {(18, "42.6"): 1, (14, "45.2136"): 1},
    }


def test_group_by_single_value(tenv):
    """:914 — single-value scalar subquery + CHAR(3) space padding."""
    rows = (
        [(1, 1, "A"), (2, 2, "B"), (3, 2, "B"), (4, 3, "C"), (5, 3, "C")]
        + [(6, 3, "C")] * 9
        + [(7, 4, "B"), (8, 4, "A"), (9, 4, "D"), (10, 4, "E"),
           (11, 5, "A"), (12, 5, "B")]
    )
    view(tenv, "T2", rows, "a int, b bigint, c string")
    view(tenv, "T1", rows, "a int, b bigint, c string")
    assert run_retract(
        tenv,
        "SELECT * FROM T2 WHERE T2.a < (SELECT count(*) * 0.3 FROM T1)",
    ) == sorted(["1,1,A", "2,2,B", "3,2,B", "4,3,C", "5,3,C"])
    # CHAR(3) read-side padding needs a real CHAR-typed table column
    # (Spark's CAST treats char as string; table reads pad)
    tenv.spark.sql("DROP TABLE IF EXISTS tc_char_itcase")
    tenv.spark.sql(
        "CREATE TABLE tc_char_itcase(a CHAR(3)) USING parquet"
    )
    try:
        tenv.spark.sql("INSERT INTO tc_char_itcase VALUES ('AA')")
        assert run_retract(
            tenv,
            "SELECT * FROM tc_char_itcase "
            "WHERE tc_char_itcase.a = (SELECT a FROM tc_char_itcase)",
        ) == ["AA "]
    finally:
        tenv.spark.sql("DROP TABLE IF EXISTS tc_char_itcase")


def test_decimal_sum(tenv):
    """:978 — DECIMAL(7,2) sum over a retracting count view."""
    import decimal
    view(tenv, "T",
         [(decimal.Decimal(v),) for v in (1, 2, 2, 3)], "d decimal(7,2)")
    assert run_retract(
        tenv,
        "select c, sum(d) from ("
        "  select d, count(d) c from T group by d) group by c",
    ) == sorted(["1,4.00", "2,2.00"])


def test_different_types_sum_with_retract(tenv):
    """:1005 — SUM over tinyint..double under an I,D changelog."""
    def row(n):
        return (n, n, n, n, float(n), float(n), "a")

    rows = [("+I",) + row(1), ("+I",) + row(2), ("-D",) + row(1),
            ("+I",) + row(3), ("-D",) + row(2), ("+I",) + row(1),
            ("-D",) + row(3), ("+I",) + row(2), ("+I",) + row(3)]
    final = apply_changelog(rows)
    view(tenv, "T", final,
         "a tinyint, b smallint, c int, d bigint, e float, f double, "
         "g string")
    assert run_retract(
        tenv,
        "SELECT sum(a), sum(b), sum(c), sum(d), sum(e), sum(f) "
        "FROM T GROUP BY g",
    ) == ["6,6,6,6,6.0,6.0"]


def test_agg_after_union(tenv):
    """:1119"""
    data = [
        (1, 1, "Hello"), (2, 2, "Hello"), (2, 3, "Hello"),
        (3, 4, "Hello"), (3, 5, "Hello"), (7, 6, "Hello"),
        (7, 7, "Hello World"), (7, 8, "Hello World"),
        (10, 20, "Hello World"),
    ]
    view(tenv, "T1", data, "a bigint, b int, c string")
    view(tenv, "T2", data, "a bigint, b int, c string")
    assert run_retract(
        tenv,
        "SELECT a, sum(b), count(distinct c) FROM ("
        "  SELECT * FROM T1 UNION ALL SELECT * FROM T2) GROUP BY a",
    ) == sorted(["1,2,1", "2,10,1", "3,18,1", "7,42,2", "10,40,1"])


def test_min_max_with_binary_string(tenv):
    """:1191 — MIN/MAX over an inner per-key LISTAGG."""
    rows = [(1, 1, "A"), (2, 2, "B"), (3, 2, "BC"), (4, 3, "C"),
            (5, 3, "CD"), (6, 3, "DE"), (7, 4, "EF"), (8, 4, "FG"),
            (9, 4, "HI"), (10, 4, "IJ")]
    view(tenv, "T", rows, "a int, b bigint, c string")
    assert run_retract(
        tenv,
        "SELECT b, min(c), max(c) FROM ("
        " SELECT a, b, listagg(c) as c FROM T GROUP BY a, b) GROUP BY b",
    ) == sorted(["1,A,A", "2,B,BC", "3,C,DE", "4,EF,IJ"])


def test_big_data_of_min_max_with_binary_string(tenv):
    """:1226 — min/max over strings ('9' < '90' lexicographic edges)."""
    rows = [(i % 10, i, str(i)) for i in range(100)]
    view(tenv, "T", rows, "a int, b bigint, c string")
    assert run_retract(
        tenv, "SELECT a, min(b), max(c), min(c) FROM T GROUP BY a"
    ) == sorted([
        "0,0,90,0", "1,1,91,1", "2,2,92,12", "3,3,93,13", "4,4,94,14",
        "5,5,95,15", "6,6,96,16", "7,7,97,17", "8,8,98,18", "9,9,99,19",
    ])


def test_agg_with_filter_clause(tenv):
    """:1259 — FILTER (WHERE ...) on sum and count distinct."""
    rows = [
        (1, 5, "B", True), (1, 4, "C", False), (1, 2, "A", True),
        (2, 1, "A", True), (2, 2, "B", False), (1, 6, "A", True),
        (2, 2, "B", False), (3, 5, "B", True), (2, 3, "C", True),
        (2, 3, "D", True),
    ]
    view(tenv, "T", rows, "a int, b bigint, c string, d boolean")
    assert run_retract(
        tenv,
        "SELECT a, sum(b) filter (where c = 'A'), "
        "count(distinct c) filter (where d is true), max(b) "
        "FROM T GROUP BY a",
    ) == sorted(["1,8,2,6", "2,1,3,3", "3,null,1,5"])


def test_min_max_with_decimal(tenv):
    """:1294 — DECIMAL(7,2) min/max over a retracting count view."""
    import decimal
    view(tenv, "T", [(decimal.Decimal(v),) for v in (1, 2, 2, 4, 3)],
         "a decimal(7,2)")
    assert run_retract(
        tenv,
        "select cnt, min(a), max(a) from ("
        "  select a, count(a) as cnt from T group by a) group by cnt",
    ) == sorted(["1,1.00,4.00", "2,2.00,2.00"])


def test_min_max_with_char(tenv):
    """:1331 — CHAR columns, insert-only values source."""
    view(tenv, "src", [(1, "a", "gg"), (1, "b", "hh"), (2, "d", "j"),
                       (2, "c", "i")],
         "id int, char1 string, char2 string")
    assert run_retract(
        tenv,
        "select id, count(*), min(char1), max(char1), min(char2), "
        "max(char2) from src group by id",
    ) == sorted(["1,2,a,b,gg,hh", "2,2,c,d,i,j"])


def test_retract_min_max_with_char(tenv):
    """:1365 — CHAR min/max under an I,UA,UB,D changelog."""
    rows = [
        ("+I", 1, "a", "ee"), ("+I", 1, "b", "ff"), ("+I", 1, "c", "gg"),
        ("-D", 1, "c", "gg"), ("-D", 1, "a", "ee"), ("+I", 2, "a", "e"),
        ("+I", 2, "b", "f"), ("+I", 2, "c", "g"), ("-U", 2, "b", "f"),
        ("+U", 2, "d", "h"), ("-U", 2, "a", "e"), ("+U", 2, "b", "f"),
    ]
    view(tenv, "src", apply_changelog(rows),
         "id int, char1 string, char2 string")
    assert run_retract(
        tenv,
        "select id, count(*), min(char1), max(char1), min(char2), "
        "max(char2) from src group by id",
    ) == sorted(["1,1,b,b,ff,ff", "2,3,b,d,f,h"])


def test_listagg(tenv):
    """:1458 — LISTAGG default and explicit delimiter over 10 rows (the
    listagg_retract system-function columns are the builtin's retract
    runtime variants — final results identical; builtin columns pinned)."""
    view(tenv, "MyTable", [(i, 1, "Hi") for i in range(10)],
         "a int, b bigint, c string")
    assert run_retract(
        tenv,
        "SELECT listagg(c), listagg(c, '-') FROM MyTable GROUP BY c",
    ) == ["Hi,Hi,Hi,Hi,Hi,Hi,Hi,Hi,Hi,Hi,Hi-Hi-Hi-Hi-Hi-Hi-Hi-Hi-Hi-Hi"]


def test_stddev(tenv):
    """:1517 — STDDEV_SAMP / STDDEV_POP over doubles."""
    view(tenv, "MyTable", [(float(i), 1, "Hi") for i in range(10)],
         "a double, b bigint, c string")
    assert run_retract(
        tenv, "SELECT STDDEV_SAMP(a), STDDEV_POP(a) FROM MyTable GROUP BY c"
    ) == ["3.0276503540974917,2.8722813232690143"]


def test_var_pop(tenv):
    """:1537 — VAR_POP(INT) is an INT computed with integer division at
    each Calcite reduction step (28889, 15602500)."""
    rows = [(2900, 1, "Hi"), (2500, 1, "Hi"), (2600, 1, "Hi"),
            (3100, 1, "Hello"), (11000, 1, "Hello")]
    view(tenv, "MyTable", rows, "a int, b bigint, c string")
    assert run_retract(
        tenv, "SELECT VAR_POP(a) FROM MyTable GROUP BY c"
    ) == sorted(["15602500", "28889"])


def test_count_distinct_with_binary_row_source(tenv):
    """:1577 — count distinct under a UNION ALL fan-out."""
    rows = [("1", "1", str(i % 50), "1") for i in range(100)]
    view(tenv, "src", rows, "a string, b string, c string, d string")
    assert run_retract(
        tenv,
        "SELECT a, b, COUNT(distinct c) as uv FROM ("
        "  SELECT a, b, c, d FROM src where b <> '' "
        "  UNION ALL "
        "  SELECT a, 'ALL' as b, c, d FROM src where b <> '') t "
        "GROUP BY a, b",
    ) == sorted(["1,1,50", "1,ALL,50"])


def test_distinct_with_multi_filter(tenv):
    """:1615 — multiple COUNT(DISTINCT) FILTER columns sharing state."""
    view(tenv, "MyTable", TUPLE_DATA_3, "a int, b bigint, c string")
    assert run_retract(
        tenv,
        "SELECT b, SUM(DISTINCT (a * 3)), "
        "COUNT(DISTINCT SUBSTRING(c FROM 1 FOR 2)), COUNT(DISTINCT c), "
        "COUNT(DISTINCT c) filter (where MOD(a, 3) = 0), "
        "COUNT(DISTINCT c) filter (where MOD(a, 3) = 1) "
        "FROM MyTable GROUP BY b",
    ) == sorted([
        "1,3,1,1,0,1", "2,15,1,2,1,0", "3,45,3,3,1,1", "4,102,1,4,1,2",
        "5,195,1,5,2,1", "6,333,1,6,2,2",
    ])


def test_prune_useless_agg_call(tenv):
    """:1647 — unused agg calls are pruned, result unchanged."""
    view(tenv, "T", [(1, 1, "Hi"), (2, 2, "Hello"), (3, 2, "Hello world")],
         "a int, b bigint, c string")
    assert run_retract(
        tenv,
        "select a from (select b, max(a) as a, count(*), max(c) as c "
        "from T group by b) T1",
    ) == ["1", "3"]


def test_constant_group_key_with_upsert_sink(tenv):
    """:1681 — constant group key is projected out of the sink row."""
    view(tenv, "MyTable",
         [(1, 1, "A"), (2, 2, "B"), (3, 2, "B"), (4, 3, "C"), (5, 3, "C")],
         "a int, b bigint, c string")
    assert run_retract(
        tenv,
        "select c, max(b) from (select b, c, true as f from MyTable) t "
        "group by c, f",
    ) == sorted(["A,1", "B,2", "C,3"])


def test_aggregation_code_split(tenv):
    """:1710 — 47 SUM(CASE ...) columns (codegen-split stress; Catalyst
    handles expression splitting internally)."""
    view(tenv, "MyTable",
         [(1, 1, "Hi"), (2, 2, "Hello"), (3, 2, "Hello world")],
         "a int, b bigint, c string")
    select_list = ",".join(
        f"SUM(CASE WHEN a IS NOT NULL AND a > {i} THEN 0 WHEN a < 0 "
        f"THEN 0 ELSE {i} END)" for i in range(3, 50)
    )
    out = run_retract(
        tenv, f"select {select_list} from MyTable group by b, c"
    )
    expected_row = ",".join(str(i) for i in range(3, 50))
    assert len(out) == 3 and all(r == expected_row for r in out)


def test_coalesce_on_grouping_sets(tenv):
    """:1775 — COALESCE over a GROUPING SETS null-filled column."""
    emps = [
        (100, "Fred", 10, None, None, 40, 25, True, False),
        (110, "Eric", 20, "M", "San Francisco", 3, 80, None, False),
        (110, "John", 40, "M", "Vancouver", 2, None, False, True),
        (120, "Wilma", 20, "F", None, 1, 5, None, True),
        (130, "Alice", 40, "F", "Vancouver", 2, None, False, True),
    ]
    view(tenv, "emps", emps,
         "empno bigint, name string, deptno int, gender string, "
         "city string, empid bigint, age int, slacker boolean, "
         "manager boolean")
    assert run_retract(
        tenv,
        "select gender, city, coalesce(deptno, -1), count(*) as cnt "
        "from emps group by grouping sets ((gender, city), "
        "(gender, city, deptno))",
    ) == sorted([
        "F,Vancouver,-1,1", "F,Vancouver,40,1", "F,null,-1,1",
        "F,null,20,1", "M,San Francisco,-1,1", "M,San Francisco,20,1",
        "M,Vancouver,-1,1", "M,Vancouver,40,1", "null,null,-1,1",
        "null,null,10,1",
    ])


def test_boolean_column_on_grouping_sets(tenv):
    """:1811 — BOOLEAN grouping column on GROUPING SETS."""
    emps = [
        (100, "Fred", 10, None, None, 40, 25, True, False),
        (110, "Eric", 20, "M", "San Francisco", 3, 80, None, False),
        (110, "John", 40, "M", "Vancouver", 2, None, False, True),
        (120, "Wilma", 20, "F", None, 1, 5, None, True),
        (130, "Alice", 40, "F", "Vancouver", 2, None, False, True),
    ]
    view(tenv, "emps", emps,
         "empno bigint, name string, deptno int, gender string, "
         "city string, empid bigint, age int, slacker boolean, "
         "manager boolean")
    assert run_retract(
        tenv,
        "select gender, city, manager, count(*) as cnt from emps "
        "group by grouping sets ((city), (gender, city, manager))",
    ) == sorted([
        "F,Vancouver,true,1", "F,null,true,1", "M,San Francisco,false,1",
        "M,Vancouver,true,1", "null,San Francisco,null,1",
        "null,Vancouver,null,2", "null,null,false,1", "null,null,null,2",
    ])


def test_group_by_array_type(tenv):
    """:1845 — ARRAY column as the grouping key."""
    assert run_retract(
        tenv,
        "SELECT b, sum(a) FROM (VALUES (1, array(1, 2)), "
        "(2, array(1, 2)), (5, array(3, 4))) T(a, b) GROUP BY b",
    ) == sorted(["[1, 2],3", "[3, 4],5"])


def test_distinct_array_type(tenv):
    """:1863 — DISTINCT over an ARRAY column."""
    assert run_retract(
        tenv,
        "SELECT DISTINCT b FROM (VALUES (2, array(1, 2)), "
        "(2, array(2, 3)), (2, array(1, 2)), (5, array(3, 4))) T(a, b)",
    ) == sorted(["[1, 2]", "[2, 3]", "[3, 4]"])


def test_count_distinct_array_type(tenv):
    """:1882 — COUNT(DISTINCT array-column)."""
    assert run_retract(
        tenv,
        "SELECT a, COUNT(DISTINCT b) FROM (VALUES (2, array(1, 2)), "
        "(2, array(2, 3)), (2, array(1, 2)), (5, array(3, 4))) T(a, b) "
        "GROUP BY a",
    ) == sorted(["2,2", "5,1"])


def test_count_star(tenv):
    """:1901"""
    view(tenv, "src", [(2, 15, "Hello"), (8, 11, "Hello world"),
                       (9, 12, "Hello world!")],
         "id bigint, len int, content string")
    assert run_retract(tenv, "select count(*) from src") == ["3"]


def test_lag_agg_function(tenv):
    """:1924 — LAG with explicit nullable/int defaults over a proctime
    (arrival-order) window."""
    view(tenv, "src",
         [(2, 15, "Hello", 0), (8, 11, "Hello world", 1),
          (9, 12, "Hello world!", 2)],
         "id bigint, len int, content string, proctime int")
    rows = flink_rows(tenv.sql(
        "select LAG(len, 1, cast(null as int)) OVER w AS a, "
        "LAG(len, 1, 1) OVER w AS b, LAG(len) OVER w AS c "
        "from src WINDOW w AS (ORDER BY proctime)"
    ))
    assert rows == sorted(["null,1,null", "15,15,15", "11,11,11"])


def test_json_arrayagg_and_json_objectagg_with_other_aggs(tenv):
    """:1956 — JSON_OBJECTAGG(k VALUE v) + JSON_ARRAYAGG with MAX."""
    df = tenv.spark.createDataFrame(
        TUPLE_DATA_5, "d int, e bigint, f int, g string, h bigint"
    ).coalesce(1)
    df.createOrReplaceTempView("Table5")
    assert run_retract(
        tenv,
        "SELECT MAX(d), JSON_OBJECTAGG(g VALUE d), JSON_ARRAYAGG(d), "
        "JSON_ARRAYAGG(g) FROM Table5 WHERE d <= 3",
    ) == [
        '3,{"ABC":3,"BCD":3,"Hallo":1,"Hallo Welt":2,"Hallo Welt wie":2,'
        '"Hallo Welt wie gehts?":3},[1,2,2,3,3,3],["Hallo","Hallo Welt",'
        '"Hallo Welt wie","Hallo Welt wie gehts?","ABC","BCD"]'
    ]


def test_group_json_arrayagg_and_json_objectagg_with_other_aggs(tenv):
    """:1977 — grouped JSON_OBJECTAGG / JSON_ARRAYAGG."""
    df = tenv.spark.createDataFrame(
        TUPLE_DATA_5, "d int, e bigint, f int, g string, h bigint"
    ).coalesce(1)
    df.createOrReplaceTempView("Table5")
    assert run_retract(
        tenv,
        "SELECT d, JSON_OBJECTAGG(g VALUE f), JSON_ARRAYAGG(g), "
        "JSON_ARRAYAGG(f), max(f) FROM Table5 WHERE d <= 3 GROUP BY d",
    ) == sorted([
        '3,{"ABC":4,"BCD":5,"Hallo Welt wie gehts?":3},'
        '["Hallo Welt wie gehts?","ABC","BCD"],[3,4,5],5',
        '1,{"Hallo":0},["Hallo"],[0],0',
        '2,{"Hallo Welt":1,"Hallo Welt wie":2},'
        '["Hallo Welt","Hallo Welt wie"],[1,2],2',
    ])


def test_percentile(tenv):
    """:1999 — PERCENTILE single/multi-quantile, weighted and not."""
    rows = []
    for i in range(10):
        rows += [(i * 2, i + 1, 0), (i * 2, i + 1, 1)]
    for i in range(10):
        rows += [(i * 2 + 1, i + 1, 0), (i * 2 + 1, i + 1, 1)]
    view(tenv, "MyTable", rows, "a int, b int, c int")
    inner = (
        "SELECT c, PERCENTILE(a, 0.5) AS swo, PERCENTILE(a, 0.5, b) AS "
        "sw, PERCENTILE(a, ARRAY(0.5, 0.9, 0.3)) AS mwo, "
        "PERCENTILE(a, ARRAY(0.5, 0.9, 0.3), b) AS mw "
        "FROM MyTable GROUP BY c"
    )
    out = tenv.sql(
        f"SELECT c, swo, sw, mwo[0], mwo[1], mwo[2], mw[0], mw[1], "
        f"mw[2] FROM ({inner})"
    ).collect()
    expected = [9.5, 13.0, 9.5, 17.1, 5.7, 13.0, 18.0, 10.0]
    got = sorted(out, key=lambda r: r[0])
    for i, r in enumerate(got):
        assert r[0] == i
        for j, e in enumerate(expected):
            assert abs(r[j + 1] - e) <= 1e-6 * abs(e)
