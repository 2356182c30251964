"""Verbatim harvest of the reference's streaming OverAggregateITCase
(r13 — VERDICT r12 next-item #1).

Reference: flink-table/flink-table-planner/src/test/scala/org/apache/
flink/table/planner/runtime/stream/sql/OverAggregateITCase.scala (:line
cited per pin). The suite's TestingAppendSink collects every emitted
over-agg row; late rows are DROPPED by the operator — UNBOUNDED frames
drop at ts <= current watermark (AbstractRowTimeUnboundedPrecedingOver
:151), BOUNDED frames at ts <= the key's lastTriggeringTs (RowTimeRange/
RowsBoundedPrecedingFunction:161 — the largest row timestamp whose timer
has fired). Both reproduced with streaming/arrival.drop_late_rows{,
_bounded} over the tests' exact row/watermark interleavings (the
Left/Right sequences fed through EventTimeProcessOperator).

Tally (29 @TestTemplate methods):
  - 24 pinned verbatim below (proctime = arrival order per the r12
    convention; rowtime ROWS frames order by (rowtime, arrival) — the
    reference's per-timestamp arrival-ordered buffers),
  - 3 covered-by-variant: the two builtin-PROCTIME() duplicates of
    testProcTimeBoundedPartitionedRowsOver (:273/:308 — byte-identical
    SQL and expectations) and the TIMESTAMP_LTZ twin (:1259) of the
    TIMESTAMP distinct-over test (:1195),
  - 1 n/a: testLeadFunction:114 asserts the REFERENCE's limitation
    ("LEAD Function is not supported in stream mode") — this engine
    supports LEAD (a strict superset), so there is no error to pin; the
    batch LEAD surface is oracle-checked in queries/over_windows.py.

Java-UDAF columns (LTCNT = count of values > threshold, CntNullNonNull,
CountPairs) are expressed as their defining expressions inside otherwise
verbatim SQL — noted per pin.

Dialect surface this harvest forced (flink_dialect.py): DISTINCT
aggregates inside OVER windows (SUM/COUNT/MIN/MAX/COLLECT/LISTAGG via
windowed collect_set/collect_list), AVG-over-window argument typing, and
the range-peer LAG semantics pin (Flink's streaming LAG aggregates the
full same-timestamp peer group — LagAggFunction under RANGE frames).
"""

from __future__ import annotations

import pytest

from apache_flink_spark.streaming.arrival import (
    drop_late_rows,
    drop_late_rows_bounded,
)
from tests.itcase_utils import flink_rows, view
from tests.test_itcase_aggregate import CLASS_DATA, TUPLE_DATA_5

# OverAggregateITCase.scala:45 `data` (a, b, c) — CLASS_DATA here is the
# AggregateITCase copy with (ts, int, string); this suite's is (long,
# int, string) with a=1..20
OVER_DATA = [
    (1, 1, "Hello"), (2, 2, "Hello"), (3, 3, "Hello"), (4, 4, "Hello"),
    (5, 5, "Hello"), (6, 6, "Hello"), (7, 7, "Hello World"),
    (8, 8, "Hello World"), (20, 20, "Hello World"),
]

assert CLASS_DATA is not None  # same 9-row shape, different columns


@pytest.fixture(scope="module")
def tenv(spark):
    from apache_flink_spark.environment import TableEnvironment

    return TableEnvironment(spark=spark)


def _rowtime_view(tenv, name, seq, schema_cols, key_fn="unbounded"):
    """Apply the test's exact row/watermark interleaving, register
    survivors with rowtime (ms) and arrival index. key_fn="unbounded"
    uses the unbounded operators' ts <= watermark rule; otherwise the
    bounded operators' per-key lastTriggeringTs rule (key_fn extracts
    the partition key, None = global)."""
    if key_fn == "unbounded":
        survivors = drop_late_rows(seq)
    else:
        survivors = drop_late_rows_bounded(seq, key_fn)
    rows = [payload + (ts, arr) for ts, payload, arr in survivors]
    return view(tenv, name, rows, f"{schema_cols}, rowtime bigint, arr int")


def test_lag_function(tenv):
    """:66 — streaming LAG under a RANGE frame aggregates the whole
    same-timestamp peer group (LagAggFunction): both ts-14000003 rows
    report lag1=4/lag2=3. Expressed over a windowed ordered
    collect_list (Spark's LAG is ROWS-based)."""
    seq = [
        ("row", 14000001, (1, 1, "Hi")),
        ("row", 14000005, (1, 2, "Hi")),
        ("row", 14000002, (1, 3, "Hello")),
        ("row", 14000003, (1, 4, "Hello")),
        ("row", 14000003, (1, 5, "Hello")),
        ("wm", 14000020),
        ("row", 14000021, (1, 6, "Hello world")),
        ("row", 14000022, (1, 7, "Hello world")),
        ("wm", 14000030),
    ]
    _rowtime_view(tenv, "T1", seq, "a int, b bigint, c string")
    out = tenv.sql(
        """
        SELECT a, b, c,
          CASE WHEN size(l) > 1 THEN array_sort(l)[size(l)-2].b END,
          CASE WHEN size(l) > 2 THEN array_sort(l)[size(l)-3].b END,
          COALESCE(
            CASE WHEN size(l) > 2 THEN array_sort(l)[size(l)-3].b END,
            CAST(10086 AS BIGINT))
        FROM (
          SELECT a, b, c,
            collect_list(struct(rowtime, arr, b)) OVER (
              PARTITION BY a ORDER BY rowtime
              RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS l
          FROM T1)
        """
    )
    assert flink_rows(out) == sorted([
        "1,1,Hi,null,null,10086", "1,3,Hello,1,null,10086",
        "1,4,Hello,4,3,3", "1,5,Hello,4,3,3", "1,2,Hi,5,4,4",
        "1,6,Hello world,2,5,5", "1,7,Hello world,6,2,2",
    ])


RANK_EXPECTED = sorted([
    "1,1", "2,1", "2,2", "3,1", "3,2", "3,3", "4,1", "4,2", "4,3",
    "4,4", "5,1", "5,2", "5,3", "5,4", "5,5",
])


def _t5_view(tenv):
    rows = [r + (i,) for i, r in enumerate(TUPLE_DATA_5)]
    view(tenv, "MyTable", rows,
         "a int, b bigint, c int, d string, e bigint, proctime int")


def test_row_number_dense_rank_rank_on_over(tenv):
    """:147 / :177 / :207 — ranking functions over proctime."""
    _t5_view(tenv)
    for fn in ("ROW_NUMBER()", "DENSE_RANK()", "RANK()"):
        out = tenv.sql(
            f"SELECT a, {fn} OVER (PARTITION BY a ORDER BY proctime) "
            "FROM MyTable"
        )
        assert flink_rows(out) == RANK_EXPECTED, fn


def test_proctime_bounded_partitioned_rows_over(tenv):
    """:237 (+ :273/:308 builtin-proctime byte-identical variants)."""
    _t5_view(tenv)
    out = tenv.sql(
        "SELECT a, "
        "SUM(c) OVER (PARTITION BY a ORDER BY proctime "
        "  ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), "
        "MIN(c) OVER (PARTITION BY a ORDER BY proctime "
        "  ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) FROM MyTable"
    )
    assert flink_rows(out) == sorted([
        "1,0,0", "2,1,1", "2,3,1", "3,3,3", "3,7,3", "3,12,3", "4,6,6",
        "4,13,6", "4,21,6", "4,30,6", "5,10,10", "5,21,10", "5,33,10",
        "5,46,10", "5,60,10",
    ])


def test_proctime_bounded_non_partitioned_rows_over(tenv):
    """:343 — first_value/last_value over a bounded non-partitioned
    frame."""
    _t5_view(tenv)
    out = tenv.sql(
        "SELECT a, "
        "first_value(d) OVER (ORDER BY proctime "
        "  ROWS BETWEEN 10 PRECEDING AND CURRENT ROW), "
        "last_value(d) OVER (ORDER BY proctime "
        "  ROWS BETWEEN 10 PRECEDING AND CURRENT ROW), "
        "SUM(c) OVER (ORDER BY proctime "
        "  ROWS BETWEEN 10 PRECEDING AND CURRENT ROW), "
        "MIN(c) OVER (ORDER BY proctime "
        "  ROWS BETWEEN 10 PRECEDING AND CURRENT ROW) FROM MyTable"
    )
    assert flink_rows(out) == sorted([
        "1,Hallo,Hallo,0,0", "2,Hallo,Hallo Welt,1,0",
        "2,Hallo,Hallo Welt wie,3,0",
        "3,Hallo,Hallo Welt wie gehts?,6,0", "3,Hallo,ABC,10,0",
        "3,Hallo,BCD,15,0", "4,Hallo,CDE,21,0", "4,Hallo,DEF,28,0",
        "4,Hallo,EFG,36,0", "4,Hallo,FGH,45,0", "5,Hallo,GHI,55,0",
        "5,Hallo Welt,HIJ,66,1", "5,Hallo Welt wie,IJK,77,2",
        "5,Hallo Welt wie gehts?,JKL,88,3", "5,ABC,KLM,99,4",
    ])


def _over_data_view(tenv):
    rows = [r + (i,) for i, r in enumerate(OVER_DATA)]
    view(tenv, "T1", rows,
         "a bigint, b bigint, c string, proctime int")


def test_proctime_unbounded_partitioned_range_over(tenv):
    """:384 — first_value/last_value/count/sum over RANGE UNBOUNDED."""
    _over_data_view(tenv)
    out = tenv.sql(
        "SELECT c, "
        "first_value(b) OVER (PARTITION BY c ORDER BY proctime "
        "  RANGE UNBOUNDED preceding), "
        "last_value(b) OVER (PARTITION BY c ORDER BY proctime "
        "  RANGE UNBOUNDED preceding), "
        "count(a) OVER (PARTITION BY c ORDER BY proctime "
        "  RANGE UNBOUNDED preceding), "
        "sum(a) OVER (PARTITION BY c ORDER BY proctime "
        "  RANGE UNBOUNDED preceding) from T1"
    )
    assert flink_rows(out) == sorted([
        "Hello World,7,7,1,7", "Hello World,7,8,2,15",
        "Hello World,7,20,3,35", "Hello,1,1,1,1", "Hello,1,2,2,3",
        "Hello,1,3,3,6", "Hello,1,4,4,10", "Hello,1,5,5,15",
        "Hello,1,6,6,21",
    ])


def test_proctime_unbounded_partitioned_rows_over(tenv):
    """:416 — max(NULL) stays null; sum(1) running count."""
    _over_data_view(tenv)
    out = tenv.sql(
        """
        SELECT c, sum1, maxnull
        FROM (
         SELECT c,
          max(cast(null as varchar)) OVER
           (PARTITION BY c ORDER BY proctime ROWS BETWEEN UNBOUNDED preceding AND CURRENT ROW)
           as maxnull,
          sum(1) OVER
           (PARTITION BY c ORDER BY proctime ROWS BETWEEN UNBOUNDED preceding AND CURRENT ROW)
           as sum1
         FROM T1
        )
        """
    )
    assert flink_rows(out) == sorted([
        "Hello World,1,null", "Hello World,2,null", "Hello World,3,null",
        "Hello,1,null", "Hello,2,null", "Hello,3,null", "Hello,4,null",
        "Hello,5,null", "Hello,6,null",
    ])


def test_proctime_unbounded_non_partitioned_range_over(tenv):
    """:456"""
    _over_data_view(tenv)
    out = tenv.sql(
        "SELECT c, "
        "count(a) OVER (ORDER BY proctime RANGE UNBOUNDED preceding), "
        "sum(a) OVER (ORDER BY proctime RANGE UNBOUNDED preceding) "
        "from T1"
    )
    assert flink_rows(out) == sorted([
        "Hello World,7,28", "Hello World,8,36", "Hello World,9,56",
        "Hello,1,1", "Hello,2,3", "Hello,3,6", "Hello,4,10",
        "Hello,5,15", "Hello,6,21",
    ])


def test_proctime_unbounded_non_partitioned_rows_over(tenv):
    """:485 — LISTAGG(DISTINCT ...) inside an OVER window (dialect:
    windowed collect_list + first-occurrence dedup)."""
    _over_data_view(tenv)
    out = tenv.sql(
        "SELECT "
        "listagg(distinct c, '|') "
        "  OVER (ORDER BY proctime ROWS BETWEEN UNBOUNDED preceding AND CURRENT ROW), "
        "count(a) "
        "  OVER (ORDER BY proctime ROWS BETWEEN UNBOUNDED preceding AND CURRENT ROW) "
        "from T1"
    )
    assert flink_rows(out) == sorted([
        "Hello,1", "Hello,2", "Hello,3", "Hello,4", "Hello,5", "Hello,6",
        "Hello|Hello World,7", "Hello|Hello World,8",
        "Hello|Hello World,9",
    ])


RANGE_OVER_SEQ = [
    ("row", 1500, (1, 15, "Hello")), ("row", 1600, (1, 16, "Hello")),
    ("row", 1000, (1, 1, "Hello")), ("row", 2000, (2, 2, "Hello")),
    ("wm", 1000),
    ("row", 2000, (2, 2, "Hello")), ("row", 2000, (2, 3, "Hello")),
    ("row", 3000, (3, 3, "Hello")),
    ("wm", 2000),
    ("row", 4000, (4, 4, "Hello")),
    ("wm", 3000),
    ("row", 5000, (5, 5, "Hello")),
    ("wm", 5000),
    ("row", 6000, (6, 6, "Hello")), ("row", 6500, (6, 65, "Hello")),
    ("wm", 7000),
    ("row", 9000, (6, 9, "Hello")), ("row", 9500, (6, 18, "Hello")),
    ("row", 9000, (6, 9, "Hello")),
    ("wm", 10000),
    ("row", 10000, (7, 7, "Hello World")),
    ("row", 11000, (7, 17, "Hello World")),
    ("row", 11000, (7, 77, "Hello World")),
    ("wm", 12000),
    ("row", 14000, (7, 18, "Hello World")),
    ("wm", 14000),
    ("row", 15000, (8, 8, "Hello World")),
    ("wm", 17000),
    ("row", 20000, (20, 20, "Hello World")),
    ("wm", 19000),
]


def test_rowtime_bounded_partitioned_range_over(tenv):
    """:515 — RANGE INTERVAL '1' SECOND frames over rowtime; same-ts
    peers share the aggregate. LTCNT(a, 4) (Java UDAF: count of a > 4)
    expressed as its defining SUM(CASE) expression."""
    _rowtime_view(tenv, "T1", RANGE_OVER_SEQ, "a bigint, b int, c string",
                  key_fn=lambda p: p[2])
    out = tenv.sql(
        "SELECT c, b, "
        "SUM(CASE WHEN a > 4 THEN 1 ELSE 0 END) OVER (PARTITION BY c "
        "  ORDER BY rowtime RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW), "
        "COUNT(a) OVER (PARTITION BY c ORDER BY rowtime RANGE "
        "  BETWEEN 1000 PRECEDING AND CURRENT ROW), "
        "SUM(a) OVER (PARTITION BY c ORDER BY rowtime RANGE "
        "  BETWEEN 1000 PRECEDING AND CURRENT ROW) FROM T1"
    )
    assert flink_rows(out) == sorted([
        "Hello,1,0,1,1", "Hello,15,0,2,2", "Hello,16,0,3,3",
        "Hello,2,0,6,9", "Hello,3,0,6,9", "Hello,2,0,6,9",
        "Hello,3,0,4,9", "Hello,4,0,2,7", "Hello,5,1,2,9",
        "Hello,6,2,2,11", "Hello,65,2,2,12", "Hello,9,2,2,12",
        "Hello,9,2,2,12", "Hello,18,3,3,18", "Hello World,17,3,3,21",
        "Hello World,7,1,1,7", "Hello World,77,3,3,21",
        "Hello World,18,1,1,7", "Hello World,8,2,2,15",
        "Hello World,20,1,1,20",
    ])


def test_rowtime_bounded_partitioned_rows_over(tenv):
    """:601 — ROWS 2 PRECEDING frames; same-ts rows in arrival order."""
    seq = [
        ("row", 1, (1, 1, "Hello")), ("row", 2, (2, 2, "Hello")),
        ("row", 1, (1, 1, "Hello")), ("row", 2, (2, 2, "Hello")),
        ("row", 2, (2, 2, "Hello")), ("row", 1, (1, 1, "Hello")),
        ("row", 3, (7, 7, "Hello World")),
        ("row", 1, (7, 7, "Hello World")),
        ("row", 1, (7, 7, "Hello World")),
        ("wm", 2),
        ("row", 3, (3, 3, "Hello")), ("row", 4, (4, 4, "Hello")),
        ("row", 5, (5, 5, "Hello")), ("row", 6, (6, 6, "Hello")),
        ("row", 20, (20, 20, "Hello World")),
        ("wm", 6),
        ("row", 8, (8, 8, "Hello World")),
        ("row", 7, (7, 7, "Hello World")),
        ("wm", 20),
    ]
    _rowtime_view(tenv, "T1", seq, "a bigint, b int, c string",
                  key_fn=lambda p: p[2])
    out = tenv.sql(
        "SELECT c, a, "
        "SUM(CASE WHEN a > 4 THEN 1 ELSE 0 END) OVER (PARTITION BY c "
        "  ORDER BY rowtime, arr ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), "
        "COUNT(1) OVER (PARTITION BY c ORDER BY rowtime, arr "
        "  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), "
        "SUM(a) OVER (PARTITION BY c ORDER BY rowtime, arr "
        "  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) FROM T1"
    )
    assert flink_rows(out) == sorted([
        "Hello,1,0,1,1", "Hello,1,0,2,2", "Hello,1,0,3,3",
        "Hello,2,0,3,4", "Hello,2,0,3,5", "Hello,2,0,3,6",
        "Hello,3,0,3,7", "Hello,4,0,3,9", "Hello,5,1,3,12",
        "Hello,6,2,3,15", "Hello World,7,1,1,7", "Hello World,7,2,2,14",
        "Hello World,7,3,3,21", "Hello World,7,3,3,21",
        "Hello World,8,3,3,22", "Hello World,20,3,3,35",
    ])


def test_rowtime_bounded_non_partitioned_range_over(tenv):
    """:672 — non-partitioned RANGE 1s frames (cross-key peers)."""
    _rowtime_view(tenv, "T1", RANGE_OVER_SEQ, "a bigint, b int, c string",
                  key_fn=lambda p: None)
    out = tenv.sql(
        "SELECT c, b, "
        "COUNT(a) OVER (ORDER BY rowtime RANGE BETWEEN 1000 PRECEDING "
        "  AND CURRENT ROW), "
        "SUM(a) OVER (ORDER BY rowtime RANGE BETWEEN 1000 PRECEDING "
        "  AND CURRENT ROW) FROM T1"
    )
    assert flink_rows(out) == sorted([
        "Hello,1,1,1", "Hello,15,2,2", "Hello,16,3,3", "Hello,2,6,9",
        "Hello,3,6,9", "Hello,2,6,9", "Hello,3,4,9", "Hello,4,2,7",
        "Hello,5,2,9", "Hello,6,2,11", "Hello,65,2,12", "Hello,9,2,12",
        "Hello,9,2,12", "Hello,18,3,18", "Hello World,7,4,25",
        "Hello World,17,3,21", "Hello World,77,3,21",
        "Hello World,18,1,7", "Hello World,8,2,15",
        "Hello World,20,1,20",
    ])


def test_rowtime_bounded_non_partitioned_rows_over(tenv):
    """:756 — a LATE row (ts 2 behind watermark 3) is dropped; the
    early ts-20 row sorts last by rowtime."""
    seq = [
        ("row", 2, (2, 2, "Hello")), ("row", 2, (2, 2, "Hello")),
        ("row", 1, (1, 1, "Hello")), ("row", 1, (1, 1, "Hello")),
        ("row", 2, (2, 2, "Hello")), ("row", 1, (1, 1, "Hello")),
        ("row", 20, (20, 20, "Hello World")),  # early row
        ("wm", 3),
        ("row", 2, (2, 2, "Hello")),  # late row -> dropped
        ("row", 3, (3, 3, "Hello")), ("row", 4, (4, 4, "Hello")),
        ("row", 5, (5, 5, "Hello")), ("row", 6, (6, 6, "Hello")),
        ("row", 7, (7, 7, "Hello World")),
        ("wm", 7),
        ("row", 9, (9, 9, "Hello World")),
        ("row", 8, (8, 8, "Hello World")),
        ("row", 8, (8, 8, "Hello World")),
        ("wm", 20),
    ]
    _rowtime_view(tenv, "T1", seq, "a bigint, b int, c string",
                  key_fn=lambda p: None)
    out = tenv.sql(
        "SELECT c, a, "
        "COUNT(a) OVER (ORDER BY rowtime, arr ROWS BETWEEN 2 preceding "
        "  AND CURRENT ROW), "
        "SUM(a) OVER (ORDER BY rowtime, arr ROWS BETWEEN 2 preceding "
        "  AND CURRENT ROW) FROM T1"
    )
    assert flink_rows(out) == sorted([
        "Hello,1,1,1", "Hello,1,2,2", "Hello,1,3,3", "Hello,2,3,4",
        "Hello,2,3,5", "Hello,2,3,6", "Hello,3,3,7", "Hello,4,3,9",
        "Hello,5,3,12", "Hello,6,3,15", "Hello World,7,3,18",
        "Hello World,8,3,21", "Hello World,8,3,23",
        "Hello World,9,3,25", "Hello World,20,3,37",
    ])


UNBOUNDED_RANGE_SEQ = [
    ("row", 14000005, (1, 1, "Hi")),
    ("row", 14000000, (2, 1, "Hello")),
    ("row", 14000002, (1, 1, "Hello")),
    ("row", 14000002, (1, 2, "Hello")),
    ("row", 14000002, (1, 3, "Hello world")),
    ("row", 14000003, (2, 2, "Hello world")),
    ("row", 14000003, (2, 3, "Hello world")),
    ("wm", 14000020),
    ("row", 14000021, (1, 4, "Hello world")),
    ("row", 14000022, (1, 5, "Hello world")),
    ("row", 14000022, (1, 6, "Hello world")),
    ("row", 14000022, (1, 7, "Hello world")),
    ("row", 14000023, (2, 4, "Hello world")),
    ("row", 14000023, (2, 5, "Hello world")),
    ("wm", 14000030),
]


def test_rowtime_unbounded_partitioned_range_over(tenv):
    """:821 — unbounded RANGE frames; AVG(BIGINT) is an integer average
    (the dialect AVG-over-window typing); LTCNT as SUM(CASE)."""
    _rowtime_view(tenv, "T1", UNBOUNDED_RANGE_SEQ,
                  "a int, b bigint, c string")
    frame = ("OVER (PARTITION BY a ORDER BY rowtime RANGE BETWEEN "
             "UNBOUNDED PRECEDING AND CURRENT ROW)")
    out = tenv.sql(
        f"SELECT a, b, c, "
        f"SUM(CASE WHEN b > 4 THEN 1 ELSE 0 END) {frame}, "
        f"SUM(b) {frame}, COUNT(b) {frame}, AVG(b) {frame}, "
        f"MAX(b) {frame}, MIN(b) {frame} FROM T1"
    )
    assert flink_rows(out) == sorted([
        "1,1,Hello,0,6,3,2,3,1", "1,2,Hello,0,6,3,2,3,1",
        "1,3,Hello world,0,6,3,2,3,1", "1,1,Hi,0,7,4,1,3,1",
        "2,1,Hello,0,1,1,1,1,1", "2,2,Hello world,0,6,3,2,3,1",
        "2,3,Hello world,0,6,3,2,3,1", "1,4,Hello world,0,11,5,2,4,1",
        "1,5,Hello world,3,29,8,3,7,1", "1,6,Hello world,3,29,8,3,7,1",
        "1,7,Hello world,3,29,8,3,7,1", "2,4,Hello world,1,15,5,3,5,1",
        "2,5,Hello world,1,15,5,3,5,1",
    ])


def test_rowtime_unbounded_partitioned_rows_over(tenv):
    """:890 — unbounded ROWS frames, out-of-order rowtimes."""
    seq = [
        ("row", 14000005, (1, 1, "Hi")),
        ("row", 14000000, (2, 1, "Hello")),
        ("row", 14000002, (3, 1, "Hello")),
        ("row", 14000003, (1, 2, "Hello")),
        ("row", 14000004, (1, 3, "Hello world")),
        ("row", 14000007, (3, 2, "Hello world")),
        ("row", 14000008, (2, 2, "Hello world")),
        ("wm", 14000010),
        ("row", 14000012, (1, 5, "Hello world")),
        ("row", 14000021, (1, 6, "Hello world")),
        ("row", 14000023, (2, 5, "Hello world")),
        ("wm", 14000020),
        ("row", 14000024, (3, 5, "Hello world")),
        ("row", 14000026, (1, 7, "Hello world")),
        ("row", 14000025, (1, 8, "Hello world")),
        ("row", 14000022, (1, 9, "Hello world")),
        ("wm", 14000030),
    ]
    _rowtime_view(tenv, "T1", seq, "a int, b bigint, c string")
    frame = ("over (partition by a order by rowtime, arr rows between "
             "unbounded preceding and current row)")
    out = tenv.sql(
        f"SELECT a, b, c, "
        f"SUM(CASE WHEN b > 4 THEN 1 ELSE 0 END) {frame}, "
        f"SUM(b) {frame}, count(b) {frame}, avg(b) {frame}, "
        f"max(b) {frame}, min(b) {frame} from T1"
    )
    assert flink_rows(out) == sorted([
        "1,2,Hello,0,2,1,2,2,2", "1,3,Hello world,0,5,2,2,3,2",
        "1,1,Hi,0,6,3,2,3,1", "2,1,Hello,0,1,1,1,1,1",
        "2,2,Hello world,0,3,2,1,2,1", "3,1,Hello,0,1,1,1,1,1",
        "3,2,Hello world,0,3,2,1,2,1", "1,5,Hello world,1,11,4,2,5,1",
        "1,6,Hello world,2,17,5,3,6,1", "1,9,Hello world,3,26,6,4,9,1",
        "1,8,Hello world,4,34,7,4,9,1", "1,7,Hello world,5,41,8,5,9,1",
        "2,5,Hello world,1,8,3,2,5,1", "3,5,Hello world,1,8,3,2,5,1",
    ])


def test_rowtime_unbounded_non_partitioned_range_over(tenv):
    """:962"""
    _rowtime_view(tenv, "T1", UNBOUNDED_RANGE_SEQ,
                  "a int, b bigint, c string")
    frame = ("OVER (ORDER BY rowtime RANGE BETWEEN UNBOUNDED PRECEDING "
             "AND CURRENT ROW)")
    out = tenv.sql(
        f"SELECT a, b, c, SUM(b) {frame}, COUNT(b) {frame}, "
        f"AVG(b) {frame}, MAX(b) {frame}, MIN(b) {frame} FROM T1"
    )
    assert flink_rows(out) == sorted([
        "2,1,Hello,1,1,1,1,1", "1,1,Hello,7,4,1,3,1",
        "1,2,Hello,7,4,1,3,1", "1,3,Hello world,7,4,1,3,1",
        "2,2,Hello world,12,6,2,3,1", "2,3,Hello world,12,6,2,3,1",
        "1,1,Hi,13,7,1,3,1", "1,4,Hello world,17,8,2,4,1",
        "1,5,Hello world,35,11,3,7,1", "1,6,Hello world,35,11,3,7,1",
        "1,7,Hello world,35,11,3,7,1", "2,4,Hello world,44,13,3,7,1",
        "2,5,Hello world,44,13,3,7,1",
    ])


def test_rowtime_unbounded_non_partitioned_rows_over(tenv):
    """:1024 — the commented '// this element will be discard because
    it is late' row (ts 14000008 behind watermark 14000010) is dropped."""
    seq = [
        ("row", 14000005, (1, 1, "Hi")),
        ("row", 14000000, (2, 2, "Hello")),
        ("row", 14000002, (3, 5, "Hello")),
        ("row", 14000003, (1, 3, "Hello")),
        ("row", 14000004, (3, 7, "Hello world")),
        ("row", 14000007, (4, 9, "Hello world")),
        ("row", 14000008, (5, 8, "Hello world")),
        ("wm", 14000010),
        ("row", 14000008, (6, 8, "Hello world")),  # late -> dropped
        ("wm", 14000020),
        ("row", 14000021, (6, 8, "Hello world")),
        ("wm", 14000030),
    ]
    _rowtime_view(tenv, "T1", seq, "a int, b bigint, c string")
    frame = ("OVER (ORDER BY rowtime, arr ROWS BETWEEN UNBOUNDED "
             "PRECEDING AND CURRENT ROW)")
    out = tenv.sql(
        f"SELECT a, b, c, SUM(b) {frame}, COUNT(b) {frame}, "
        f"AVG(b) {frame}, MAX(b) {frame}, MIN(b) {frame} FROM T1"
    )
    assert flink_rows(out) == sorted([
        "2,2,Hello,2,1,2,2,2", "3,5,Hello,7,2,3,5,2",
        "1,3,Hello,10,3,3,5,2", "3,7,Hello world,17,4,4,7,2",
        "1,1,Hi,18,5,3,7,1", "4,9,Hello world,27,6,4,9,1",
        "5,8,Hello world,35,7,5,9,1", "6,8,Hello world,43,8,5,9,1",
    ])


def test_rowtime_unbounded_partitioned_rows_over_2(tenv):
    """:1079 — SIX late elements across two watermarks, all dropped."""
    seq = [
        ("row", 14000005, (1, 1, "Hi")),
        ("row", 14000000, (2, 1, "Hello")),
        ("row", 14000002, (3, 1, "Hello")),
        ("row", 14000003, (1, 2, "Hello")),
        ("row", 14000004, (1, 3, "Hello world")),
        ("row", 14000007, (3, 2, "Hello world")),
        ("row", 14000008, (2, 2, "Hello world")),
        ("wm", 14000010),
        # the next 3 elements are late
        ("row", 14000008, (1, 4, "Hello world")),
        ("row", 14000008, (2, 3, "Hello world")),
        ("row", 14000008, (3, 3, "Hello world")),
        ("row", 14000012, (1, 5, "Hello world")),
        ("wm", 14000020),
        ("row", 14000021, (1, 6, "Hello world")),
        # the next 3 elements are late
        ("row", 14000019, (1, 6, "Hello world")),
        ("row", 14000018, (2, 4, "Hello world")),
        ("row", 14000018, (3, 4, "Hello world")),
        ("row", 14000022, (2, 5, "Hello world")),
        ("row", 14000022, (3, 5, "Hello world")),
        ("row", 14000024, (1, 7, "Hello world")),
        ("row", 14000023, (1, 8, "Hello world")),
        ("row", 14000021, (1, 9, "Hello world")),
        ("wm", 14000030),
    ]
    _rowtime_view(tenv, "T1", seq, "a int, b bigint, c string")
    frame = ("over (partition by a order by rowtime, arr rows between "
             "unbounded preceding and current row)")
    out = tenv.sql(
        f"SELECT a, b, c, SUM(b) {frame}, count(b) {frame}, "
        f"avg(b) {frame}, max(b) {frame}, min(b) {frame} from T1"
    )
    assert flink_rows(out) == sorted([
        "1,2,Hello,2,1,2,2,2", "1,3,Hello world,5,2,2,3,2",
        "1,1,Hi,6,3,2,3,1", "2,1,Hello,1,1,1,1,1",
        "2,2,Hello world,3,2,1,2,1", "3,1,Hello,1,1,1,1,1",
        "3,2,Hello world,3,2,1,2,1", "1,5,Hello world,11,4,2,5,1",
        "1,6,Hello world,17,5,3,6,1", "1,9,Hello world,26,6,4,9,1",
        "1,8,Hello world,34,7,4,9,1", "1,7,Hello world,41,8,5,9,1",
        "2,5,Hello world,8,3,2,5,1", "3,5,Hello world,8,3,2,5,1",
    ])


def test_proctime_distinct_unbounded_partitioned_rows_over(tenv):
    """:1156 — SUM/MIN DISTINCT inside OVER windows (dialect rewrite
    over windowed collect_set)."""
    _t5_view(tenv)
    frame = ("OVER (PARTITION BY a ORDER BY proctime RANGE UNBOUNDED "
             "preceding)")
    out = tenv.sql(
        f"SELECT a, COUNT(e) {frame}, SUM(DISTINCT e) {frame}, "
        f"MIN(DISTINCT e) {frame} FROM MyTable"
    )
    assert flink_rows(out) == sorted([
        "1,1,1,1", "2,1,2,2", "2,2,3,1", "3,1,2,2", "3,2,2,2",
        "3,3,5,2", "4,1,2,2", "4,2,3,1", "4,3,3,1", "4,4,3,1",
        "5,1,1,1", "5,2,4,1", "5,3,4,1", "5,4,6,1", "5,5,6,1",
    ])


def test_timestamp_rowtime_distinct_unbounded_range_with_nulls(tenv):
    """:1195 (+ :1259 TIMESTAMP_LTZ twin) — COUNT(DISTINCT) over windows
    with null values; CntNullNonNull as its defining expression."""
    import datetime
    rows = [
        (datetime.datetime(1970, 1, 1, 0, 0, s), b, c)
        for s, b, c in [
            (1, 1, None), (2, 1, None), (3, 2, None), (4, 1, "Hello"),
            (5, 1, "Hello"), (6, 2, "Hello"), (7, 1, "Hello World"),
            (8, 2, "Hello World"), (9, 2, "Hello World"), (10, 1, None),
        ]
    ]
    view(tenv, "MyTable", rows, "rowtime timestamp, b int, c string")
    frame = "OVER (PARTITION BY b ORDER BY rowtime RANGE UNBOUNDED preceding)"
    out = tenv.sql(
        f"SELECT c, b, COUNT(DISTINCT c) {frame}, "
        f"CONCAT(CAST(size(collect_set(c) {frame}) AS STRING), '|', "
        f"IF(count(*) {frame} > count(c) {frame}, '1', '0')) FROM MyTable"
    )
    assert flink_rows(out) == sorted([
        "null,1,0,0|1", "null,1,0,0|1", "null,2,0,0|1", "null,1,2,2|1",
        "Hello,1,1,1|1", "Hello,1,1,1|1", "Hello,2,1,1|1",
        "Hello World,1,2,2|1", "Hello World,2,2,2|1",
        "Hello World,2,2,2|1",
    ])


def test_proctime_distinct_bounded_partitioned_rows_over(tenv):
    """:1323 — COLLECT(DISTINCT) multiset inside a bounded OVER frame."""
    _t5_view(tenv)
    frame = ("OVER (PARTITION BY a ORDER BY proctime ROWS BETWEEN 3 "
             "PRECEDING AND CURRENT ROW)")
    out = tenv.sql(
        f"SELECT a, SUM(DISTINCT e) {frame}, MIN(DISTINCT e) {frame}, "
        f"COLLECT(DISTINCT e) {frame} FROM MyTable"
    ).collect()
    got = sorted(
        (r[0], r[1], r[2], tuple(sorted(r[3].items()))) for r in out
    )
    expected = sorted([
        (1, 1, 1, ((1, 1),)), (2, 2, 2, ((2, 1),)),
        (2, 3, 1, ((1, 1), (2, 1))), (3, 2, 2, ((2, 1),)),
        (3, 2, 2, ((2, 1),)), (3, 5, 2, ((2, 1), (3, 1))),
        (4, 2, 2, ((2, 1),)), (4, 3, 1, ((1, 1), (2, 1))),
        (4, 3, 1, ((1, 1), (2, 1))), (4, 3, 1, ((1, 1), (2, 1))),
        (5, 1, 1, ((1, 1),)), (5, 4, 1, ((1, 1), (3, 1))),
        (5, 4, 1, ((1, 1), (3, 1))), (5, 6, 1, ((1, 1), (2, 1), (3, 1))),
        (5, 5, 2, ((2, 1), (3, 1))),
    ])
    assert got == expected


def test_proctime_distinct_pair_with_nulls(tenv):
    """:1363 — CountPairs (pairs incl. null fields) as COUNT(1) /
    COUNT(DISTINCT struct) over windows."""
    rows = [
        ("A", None), ("A", None), ("B", None), (None, "Hello"),
        ("A", "Hello"), ("A", "Hello"), (None, "Hello World"),
        (None, "Hello World"), ("A", "Hello World"),
        ("B", "Hello World"),
    ]
    view(tenv, "MyTable", [r + (i,) for i, r in enumerate(rows)],
         "a string, b string, proctime int")
    frame = "OVER (ORDER BY proctime RANGE UNBOUNDED preceding)"
    out = tenv.sql(
        f"SELECT a, b, COUNT(1) {frame}, "
        f"size(collect_set(struct(a, b)) {frame}) FROM MyTable"
    )
    assert flink_rows(out) == sorted([
        "A,null,1,1", "A,null,2,1", "B,null,3,2", "null,Hello,4,3",
        "A,Hello,5,4", "A,Hello,6,4", "null,Hello World,7,5",
        "null,Hello World,8,5", "A,Hello World,9,6",
        "B,Hello World,10,7",
    ])


def test_decimal_sum0(tenv):
    """:1410 — DECIMAL(38,18) running sum keeps scale 18."""
    import decimal
    rows = [(decimal.Decimal(s), i) for i, s in
            enumerate(["1.11", "2.22", "3.33", "4.44"])]
    view(tenv, "T", rows, "d decimal(38,18), proctime int")
    out = tenv.sql(
        "select sum(d) over (ORDER BY proctime rows between unbounded "
        "preceding and current row) from T"
    )
    assert flink_rows(out) == sorted([
        "1.110000000000000000", "3.330000000000000000",
        "6.660000000000000000", "11.100000000000000000",
    ])


def test_percentile_over(tenv):
    """:1439 — PERCENTILE (weighted/multi-quantile) in bounded OVER
    frames, 1e-6 relative tolerance as in the reference."""
    _t5_view(tenv)
    frame = "OVER (ORDER BY proctime ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)"
    inner = (
        f"SELECT proctime, PERCENTILE(b, 0.5) {frame} AS swo, "
        f"PERCENTILE(b, 0.5, a) {frame} AS sw, "
        f"PERCENTILE(b, ARRAY(0.5, 0.9, 0.3)) {frame} AS mwo, "
        f"PERCENTILE(b, ARRAY(0.5, 0.9, 0.3), a) {frame} AS mw "
        f"FROM MyTable"
    )
    out = tenv.sql(
        f"SELECT proctime, swo, sw, mwo[0], mwo[1], mwo[2], mw[0], "
        f"mw[1], mw[2] FROM ({inner})"
    ).collect()
    expected = [
        [1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0],
        [1.5, 2.0, 1.5, 1.9, 1.3, 2.0, 2.0, 1.6],
        [2.0, 2.0, 2.0, 2.8, 1.6, 2.0, 3.0, 2.0],
        [2.5, 3.0, 2.5, 3.7, 1.9, 3.0, 4.0, 2.1],
        [3.5, 4.0, 3.5, 4.7, 2.9, 4.0, 5.0, 3.0],
        [4.5, 5.0, 4.5, 5.7, 3.9, 5.0, 6.0, 4.0],
        [5.5, 6.0, 5.5, 6.7, 4.9, 6.0, 7.0, 5.0],
        [6.5, 7.0, 6.5, 7.7, 5.9, 7.0, 8.0, 6.0],
        [7.5, 8.0, 7.5, 8.7, 6.9, 8.0, 9.0, 7.0],
        [8.5, 8.5, 8.5, 9.7, 7.9, 8.5, 10.0, 8.0],
        [9.5, 10.0, 9.5, 10.7, 8.9, 10.0, 11.0, 9.0],
        [10.5, 11.0, 10.5, 11.7, 9.9, 11.0, 12.0, 10.0],
        [11.5, 12.0, 11.5, 12.7, 10.9, 12.0, 13.0, 11.0],
        [12.5, 12.5, 12.5, 13.7, 11.9, 12.5, 14.0, 12.0],
        [13.5, 13.5, 13.5, 14.7, 12.9, 13.5, 15.0, 13.0],
    ]
    got = sorted(out, key=lambda r: r[0])
    for i, r in enumerate(got):
        for j, e in enumerate(expected[i]):
            assert abs(r[j + 1] - e) <= 1e-6 * abs(e), (i, j, r)
