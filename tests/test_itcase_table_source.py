"""Verbatim harvest of the reference's streaming TableSourceITCase
(r13 — VERDICT r12 next-item #1 tranche, final suite).

Reference: flink-table-planner .../runtime/stream/sql/
TableSourceITCase.scala (20 tests): scans over the values connector with
nested-projection / filter pushdown, metadata columns, computed columns.
The pushdown knobs ('nested-projection-supported', 'filterable-fields',
'runtime-source') are connector-physical — Catalyst does its own nested
schema pruning and parquet filter pushdown — so the pins run each test's
SQL verbatim over the same data and assert the same results.

Pinned 14:
- testSimpleProject:117, testProjectWithoutInputRef:128 and
  testInputFormatSource:203 (same query, 'runtime-source' knob) over
  smallData3.
- The NestedTable family (:138-:175, :375-:425): deep ROW access with
  dot-containing quoted field names (``deepNested.`nested2.`.flag``),
  computed LOWER column, filters on nested/array/map items. DEVIATION
  (documented): Flink's ``arr[i]`` indexes 1-based; the pins express it
  as Spark's 1-based ``element_at`` (and project the single-field
  struct's ``value``, which Row.toString prints identically).
- testTableSourceWithFilterable:178 / WithFunctionFilterable:190 over
  TestLegacyFilterableTableSource.defaultRows (33 Record_N rows).
- The MetadataTable trio (:281-:323) + NestedProjectionWithMetadata:323:
  METADATA column resolution is connector plumbing; the pins materialize
  the declared metadata mapping (metadata_1/2/3 = smallData5 fields
  c/d/e) as a view and run the queries verbatim.

6 n/a: testAllDataTypes:229 (TIMESTAMP(9)/LTZ(9) nanosecond values —
Spark timestamps are microsecond precision, the engine's documented
limitation; see catalog nanos note), testSourceWatermarkInDDL:348 and
InQuery:369 (the reference's own SOURCE_WATERMARK() runtime rejects),
and the 3 scan.parallelism tests (:459-:497, physical).

Tally: TableSourceITCase 14/20 pinned + 6 n/a.
"""

from __future__ import annotations

import pytest

from tests.itcase_utils import run_retract, view

SMALL3 = [(1, 1, "Hi"), (2, 2, "Hello"), (3, 2, "Hello world")]

# TestData.smallData5 (first 3 tuple5 rows) under the MetadataTable
# mapping: a, b are data columns; metadata_1/2/3 <- c/d/e
SMALL5 = [
    (1, 1, 0, "Hallo", 1),
    (2, 2, 1, "Hallo Welt", 2),
    (2, 3, 2, "Hallo Welt wie", 1),
]

ARRAY_ROWS = [(1,), (2,), (3,), (4,)]
MAP_ROWS = {"Monday": 1, "Tuesday": 2, "Wednesday": 3}

# TestData.deepNestedRow (TestData.scala:346)
DEEP_NESTED = [
    (1, (("Sarah", 100), (1000, True)), ("Peter", 10000), "Mary",
     (ARRAY_ROWS, MAP_ROWS)),
    (2, (("Rob", 200), (2000, False)), ("Lucy", 20000), "Bob",
     (ARRAY_ROWS, MAP_ROWS)),
    (3, (("Mike", 300), (3000, True)), ("Betty", 30000), "Liz",
     (ARRAY_ROWS, MAP_ROWS)),
]

NESTED_SCHEMA = (
    "id bigint, "
    "deepNested struct<nested1: struct<name: string, `value.`: int>, "
    "`nested2.`: struct<num: int, flag: boolean>>, "
    "nested struct<name: string, value: int>, "
    "name string, "
    "nestedItem struct<deepArray: array<struct<value: int>>, "
    "deepMap: map<string,int>>"
)

# TestLegacyFilterableTableSource.defaultRows (testTableSourceSinks
# .scala:409): 33 rows Record_N / N / N / N.0
FILTERABLE = [(f"Record_{i}", i, i, float(i)) for i in range(33)]


@pytest.fixture(scope="module")
def tenv(spark):
    from apache_flink_spark.environment import TableEnvironment

    t = TableEnvironment(spark=spark)
    view(t, "MyTable", SMALL3, "a int, b bigint, c string")
    view(t, "FilterableTable", FILTERABLE,
         "name string, id bigint, amount int, price double")
    view(t, "NestedBase", DEEP_NESTED, NESTED_SCHEMA)
    t.sql(
        "CREATE OR REPLACE TEMPORARY VIEW NestedTable AS "
        "SELECT *, LOWER(name) AS lower_name FROM NestedBase"
    )
    view(t, "Small5", SMALL5,
         "a int, b bigint, c int, d string, e bigint")
    t.sql(
        "CREATE OR REPLACE TEMPORARY VIEW MetadataTable AS "
        "SELECT a, CAST(e AS INT) AS other_metadata, "
        "CAST(e AS BIGINT) AS other_metadata2, b, c AS metadata_1, "
        "c * 2 AS computed, d AS metadata_2 FROM Small5"
    )
    return t


def test_simple_project(tenv):
    """:117 testSimpleProject (and :203 testInputFormatSource — same
    query, 'runtime-source' is a connector knob)."""
    assert run_retract(tenv, "SELECT a, c FROM MyTable") == sorted(
        ["1,Hi", "2,Hello", "3,Hello world"]
    )


def test_project_without_input_ref(tenv):
    """:128 testProjectWithoutInputRef."""
    assert run_retract(tenv, "SELECT COUNT(*) FROM MyTable") == ["3"]


def test_nested_project(tenv):
    """:138 testNestedProject (and :323
    testNestedProjectionWithMetadataAccess — LOWER(name) inline)."""
    for lower in ("lower_name", "LOWER(name) as lowerName"):
        assert run_retract(
            tenv,
            "SELECT id, deepNested.nested1.name AS nestedName, "
            "nested.`value` AS nestedValue, "
            "deepNested.`nested2.`.flag AS nestedFlag, "
            "deepNested.`nested2.`.num + deepNested.nested1.`value.` "
            f"AS nestedNum, {lower} FROM NestedTable",
        ) == sorted([
            "1,Sarah,10000,true,1100,mary",
            "2,Rob,20000,false,2200,bob",
            "3,Mike,30000,true,3300,liz",
        ])


def test_nested_project_with_item(tenv):
    """:163 testNestedProjectWithItem — deepArray[deepMap['Monday']]
    with Flink's 1-based indexing (element_at)."""
    assert run_retract(
        tenv,
        "SELECT element_at(nestedItem.deepArray, "
        "nestedItem.deepMap['Monday']).`value` FROM NestedTable",
    ) == ["1", "1", "1"]


def test_table_source_with_filterable(tenv):
    """:178 testTableSourceWithFilterable."""
    assert run_retract(
        tenv,
        "SELECT id, amount, name FROM FilterableTable "
        "WHERE amount > 4 AND price < 9",
    ) == sorted([
        "5,5,Record_5", "6,6,Record_6", "7,7,Record_7", "8,8,Record_8",
    ])


def test_table_source_with_function_filterable(tenv):
    """:190 testTableSourceWithFunctionFilterable."""
    assert run_retract(
        tenv,
        "SELECT id, amount, name FROM FilterableTable "
        "WHERE amount > 4 AND price < 9 AND upper(name) = 'RECORD_5'",
    ) == ["5,5,Record_5"]


def test_simple_metadata_access(tenv):
    """:281 testSimpleMetadataAccess."""
    assert run_retract(
        tenv, "SELECT `a`, `b`, `metadata_2` FROM MetadataTable"
    ) == sorted(["1,1,Hallo", "2,2,Hallo Welt", "2,3,Hallo Welt wie"])


def test_complex_metadata_access(tenv):
    """:294 testComplexMetadataAccess — metadata interleaved with
    computed columns."""
    assert run_retract(
        tenv,
        "SELECT `a`, `other_metadata`, `b`, `metadata_2`, `computed` "
        "FROM MetadataTable",
    ) == sorted([
        "1,1,1,Hallo,0", "2,2,2,Hallo Welt,2", "2,1,3,Hallo Welt wie,4",
    ])


def test_duplicate_metadata_from_same_key(tenv):
    """:310 testDuplicateMetadataFromSameKey — two columns off one
    metadata key."""
    assert run_retract(
        tenv,
        "SELECT other_metadata, other_metadata2, metadata_2 FROM MetadataTable",
    ) == sorted(["1,1,Hallo", "1,1,Hallo Welt wie", "2,2,Hallo Welt"])


def test_simple_nested_filter(tenv):
    """:375 testSimpleNestedFilter."""
    assert run_retract(
        tenv,
        "SELECT id, deepNested.nested1.name AS nestedName FROM NestedTable "
        "WHERE nested.`value` > 20000",
    ) == ["3,Mike"]


def test_nested_filter_on_array(tenv):
    """:391 testNestedFilterOnArray (1-based element_at)."""
    assert run_retract(
        tenv,
        "SELECT id, deepNested.nested1.name AS nestedName, "
        "element_at(nestedItem.deepArray, 2).`value` FROM NestedTable "
        "WHERE element_at(nestedItem.deepArray, 2).`value` > 1",
    ) == sorted(["1,Sarah,2", "2,Rob,2", "3,Mike,2"])


def test_nested_filter_on_map(tenv):
    """:409 testNestedFilterOnMap."""
    assert run_retract(
        tenv,
        "SELECT id, deepNested.nested1.name AS nestedName, "
        "nestedItem.deepMap['Monday'] FROM NestedTable "
        "WHERE nestedItem.deepMap['Monday'] = 1",
    ) == sorted(["1,Sarah,1", "2,Rob,1", "3,Mike,1"])
