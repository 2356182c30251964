"""Verbatim harvest of the reference's streaming TemporalJoinITCase
(r13 — VERDICT r12 next-item #1 tranche).

Reference: flink-table-planner .../runtime/stream/sql/
TemporalJoinITCase.scala (22 tests): ``FOR SYSTEM_TIME AS OF`` joins of
an orders changelog against versioned currency tables.

- **14 event-time tests pinned** (:467-:731). The right sides are built
  with production ``changelog.versioned_table`` (+I/+U versions, -U
  dropped, -D tombstones at the delete's own event time) and the
  verbatim SQL runs through ``tenv.sql`` — the temporal_sql rewrite's
  versioned mode (as-of pick by (__version_time, __version_seq), key
  equalities only; residual predicates and the tombstone filter applied
  post-pick). The left orders changelog (PK order_id, updates move
  order 2 to a later order_time, order 6 is inserted then deleted)
  materializes through ``changelog.materialize`` first — the reference's
  upsert sink keyed on order_id retains exactly the final version of
  each order.
- **8 proctime tests n/a** (:338-:440): every one asserts the
  reference's own "Processing-time temporal join is not supported yet."
  TableException. This engine's rewrite accepts the syntax (a superset,
  like the OFFSET/temporal-sort cases in the sort suite) — there is no
  reject to mirror.
- testMiniBatchEventTimeViewTemporalJoin (:731) differs from
  testEventTimeTemporalJoinWithDeduplicateLastView only by the minibatch
  physical knob; both pinned against the same expected.

Dedup views: the reference derives first/last-row versioned views from
an insert-only history with streaming ROW_NUMBER dedup. As version
timelines: keep-LAST's state updates on every insert, so its versions
are ALL insert events (arrival breaks the 08-16T00:02 US-Dollar tie:
102 then 106 — the join picks 106); keep-FIRST's state never changes
after the first row, so its timeline is the first event per key.

Tally: TemporalJoinITCase 14/14 event-time pinned + 8 n/a
(reference-side proctime rejects; this engine accepts the syntax).
"""

from __future__ import annotations

import datetime

import pytest

from pyspark.sql import Window
from pyspark.sql import functions as F

from apache_flink_spark.changelog import (
    ROWKIND_COL,
    materialize,
    versioned_table,
)
from tests.itcase_utils import run_retract


def _ts(s):
    return datetime.datetime.fromisoformat(s)


# TemporalJoinITCase.scala:75 rowTimeOrderData —
# kind[order_id, currency, currency_no, amount, order_time]
ORDERS = [
    ("+I", 1, "Euro", "no1", 12, _ts("2020-08-15T00:01:00")),
    ("+I", 2, "US Dollar", "no1", 1, _ts("2020-08-15T00:02:00")),
    ("+I", 3, "RMB", "no1", 40, _ts("2020-08-15T00:03:00")),
    ("+I", 4, "Euro", "no1", 14, _ts("2020-08-16T00:04:00")),
    ("-U", 2, "US Dollar", "no1", 1, _ts("2020-08-16T00:03:00")),
    ("+U", 2, "US Dollar", "no1", 18, _ts("2020-08-16T00:03:00")),
    ("+I", 5, "RMB", "no1", 40, _ts("2020-08-16T00:03:00")),
    ("+I", 6, "RMB", "no1", 40, _ts("2020-08-16T00:04:00")),
    ("-D", 6, "RMB", "no1", 40, _ts("2020-08-16T00:04:00")),
]

# :88 rowTimeCurrencyDataUsingMetaTime — -U/-D stamped with the NEW
# (meta) time
META_CURRENCY = [
    ("+I", "Euro", "no1", 114, _ts("2020-08-15T00:00:01")),
    ("+I", "US Dollar", "no1", 102, _ts("2020-08-15T00:00:02")),
    ("+I", "Yen", "no1", 1, _ts("2020-08-15T00:00:03")),
    ("+I", "RMB", "no1", 702, _ts("2020-08-15T00:00:04")),
    ("-U", "Euro", "no1", 114, _ts("2020-08-16T00:01:00")),
    ("+U", "Euro", "no1", 118, _ts("2020-08-16T00:01:00")),
    ("-U", "US Dollar", "no1", 102, _ts("2020-08-16T00:02:00")),
    ("+U", "US Dollar", "no1", 106, _ts("2020-08-16T00:02:00")),
    ("-D", "RMB", "no1", 702, _ts("2020-08-16T00:02:00")),
]

# :101 rowTimeCurrencyDataUsingBeforeTime — -U/-D stamped with the OLD
# version's time (the RMB delete therefore lands at 00:00:04, before
# order 3)
BEFORE_CURRENCY = [
    ("+I", "Euro", "no1", 114, _ts("2020-08-15T00:00:01")),
    ("+I", "US Dollar", "no1", 102, _ts("2020-08-15T00:00:02")),
    ("+I", "Yen", "no1", 1, _ts("2020-08-15T00:00:03")),
    ("+I", "RMB", "no1", 702, _ts("2020-08-15T00:00:04")),
    ("-U", "Euro", "no1", 114, _ts("2020-08-15T00:00:01")),
    ("+U", "Euro", "no1", 118, _ts("2020-08-16T00:01:00")),
    ("-U", "US Dollar", "no1", 102, _ts("2020-08-15T00:00:02")),
    ("+U", "US Dollar", "no1", 106, _ts("2020-08-16T00:02:00")),
    ("-D", "RMB", "no1", 702, _ts("2020-08-15T00:00:04")),
]

# :114 upsertSourceCurrencyData — the -D at RMB's own version time
# shadows it (same __version_time, later arrival)
UPSERT_CURRENCY = [
    ("+U", "Euro", "no1", 114, _ts("2020-08-15T00:00:01")),
    ("+U", "US Dollar", "no1", 102, _ts("2020-08-15T00:00:02")),
    ("+U", "Yen", "no1", 1, _ts("2020-08-15T00:00:03")),
    ("+U", "RMB", "no1", 702, _ts("2020-08-15T00:00:04")),
    ("+U", "Euro", "no1", 118, _ts("2020-08-16T00:01:00")),
    ("+U", "US Dollar", "no1", 104, _ts("2020-08-16T00:02:00")),
    ("-D", "RMB", "no1", 702, _ts("2020-08-15T00:00:04")),
]

# :124 rowTimeInsertOnlyCurrencyData (currency_history)
INSERT_ONLY_CURRENCY = [
    ("+I", "Euro", "no1", 114, _ts("2020-08-15T00:00:01")),
    ("+I", "US Dollar", "no1", 102, _ts("2020-08-15T00:00:02")),
    ("+I", "Yen", "no1", 1, _ts("2020-08-15T00:00:03")),
    ("+I", "RMB", "no1", 702, _ts("2020-08-15T00:00:04")),
    ("+I", "Euro", "no1", 118, _ts("2020-08-16T00:01:00")),
    ("+I", "US Dollar", "no1", 102, _ts("2020-08-16T00:02:00")),
    ("+I", "US Dollar", "no1", 106, _ts("2020-08-16T00:02:00")),
]

CURRENCY_SCHEMA = (
    f"{ROWKIND_COL} string, currency string, currency_no string, "
    "rate bigint, currency_time timestamp, __arr bigint"
)


def _versioned_view(spark, data, name):
    df = spark.createDataFrame(
        [r + (i,) for i, r in enumerate(data)], CURRENCY_SCHEMA
    )
    out = versioned_table(df, "currency_time", "__arr")
    out.createOrReplaceTempView(name)
    return out


@pytest.fixture(scope="module")
def tenv(spark):
    from apache_flink_spark.environment import TableEnvironment

    t = TableEnvironment(spark=spark)
    # left side: the orders changelog materialized by its order_id PK
    odf = spark.createDataFrame(
        [r + (i,) for i, r in enumerate(ORDERS)],
        f"{ROWKIND_COL} string, order_id bigint, currency string, "
        "currency_no string, amount bigint, order_time timestamp, "
        "__arr bigint",
    ).withColumn(
        "__val", F.struct("currency", "currency_no", "amount", "order_time")
    )
    orders = materialize(odf, ["order_id"], ["__arr"], "__val").select(
        "order_id", "__val.currency", "__val.currency_no", "__val.amount",
        "__val.order_time",
    )
    orders.createOrReplaceTempView("orders_rowtime")

    _versioned_view(spark, META_CURRENCY, "versioned_currency_with_single_key")
    _versioned_view(spark, META_CURRENCY, "versioned_currency_with_multi_key")
    _versioned_view(spark, BEFORE_CURRENCY, "currency_using_update_before_time")
    _versioned_view(spark, UPSERT_CURRENCY, "upsert_currency")
    # dedup views over the insert-only history (:160/:171): keep-last's
    # version timeline is every insert; keep-first's is the first event
    # per key
    hist = _versioned_view(spark, INSERT_ONLY_CURRENCY, "currency_deduplicated_last_row")
    w = Window.partitionBy("currency").orderBy("__version_time", "__version_seq")
    hist.withColumn("__rn", F.row_number().over(w)).filter(
        F.col("__rn") == 1
    ).drop("__rn").createOrReplaceTempView("currency_deduplicated_first_row")
    return t


SELECT6 = (
    "SELECT o.order_id, o.currency, o.amount, o.order_time, r.rate, "
    "r.currency_time FROM orders_rowtime AS o "
)

EVENT_TIME_INNER = sorted([
    "1,Euro,12,2020-08-15T00:01,114,2020-08-15T00:00:01",
    "2,US Dollar,18,2020-08-16T00:03,106,2020-08-16T00:02",
    "3,RMB,40,2020-08-15T00:03,702,2020-08-15T00:00:04",
    "4,Euro,14,2020-08-16T00:04,118,2020-08-16T00:01",
])


def test_event_time_temporal_join(tenv):
    """:467 testEventTimeTemporalJoin — order 5 hits the RMB tombstone
    (deleted 08-16T00:02) and drops under INNER."""
    assert run_retract(
        tenv,
        SELECT6 + "JOIN versioned_currency_with_single_key "
        "FOR SYSTEM_TIME AS OF o.order_time as r ON o.currency = r.currency",
    ) == EVENT_TIME_INNER


def test_event_time_temporal_join_joinkey_contains_pk(tenv):
    """:485 testEventTimeTemporalJoinThatJoinkeyContainsPk."""
    assert run_retract(
        tenv,
        SELECT6 + "JOIN versioned_currency_with_single_key "
        "FOR SYSTEM_TIME AS OF o.order_time as r "
        "ON o.currency = r.currency AND o.currency_no = r.currency_no",
    ) == EVENT_TIME_INNER


def test_event_time_temporal_join_with_filter(tenv):
    """:503 testEventTimeTemporalJoinWithFilter — join through a view,
    unqualified WHERE on the picked rate."""
    tenv.sql(
        "CREATE OR REPLACE TEMPORARY VIEW v1 AS "
        "SELECT * FROM versioned_currency_with_single_key"
    )
    assert run_retract(
        tenv,
        SELECT6 + "JOIN v1 FOR SYSTEM_TIME AS OF o.order_time as r "
        "ON o.currency = r.currency WHERE rate < 115",
    ) == sorted([
        "1,Euro,12,2020-08-15T00:01,114,2020-08-15T00:00:01",
        "2,US Dollar,18,2020-08-16T00:03,106,2020-08-16T00:02",
    ])


def test_event_time_left_temporal_join(tenv):
    """:521 testEventTimeLeftTemporalJoin — the tombstoned RMB order
    null-extends."""
    assert run_retract(
        tenv,
        SELECT6 + "LEFT JOIN versioned_currency_with_single_key "
        "FOR SYSTEM_TIME AS OF o.order_time as r ON o.currency = r.currency",
    ) == sorted(EVENT_TIME_INNER + ["5,RMB,40,2020-08-16T00:03,null,null"])


def test_event_time_temporal_join_changelog_using_before_time(tenv):
    """:540 testEventTimeTemporalJoinChangelogUsingBeforeTime — the RMB
    delete stamped with the OLD version time lands before order 3, so
    both RMB orders miss."""
    assert run_retract(
        tenv,
        SELECT6 + "LEFT JOIN currency_using_update_before_time "
        "FOR SYSTEM_TIME AS OF o.order_time as r ON o.currency = r.currency",
    ) == sorted([
        "1,Euro,12,2020-08-15T00:01,114,2020-08-15T00:00:01",
        "2,US Dollar,18,2020-08-16T00:03,106,2020-08-16T00:02",
        "3,RMB,40,2020-08-15T00:03,null,null",
        "4,Euro,14,2020-08-16T00:04,118,2020-08-16T00:01",
        "5,RMB,40,2020-08-16T00:03,null,null",
    ])


def test_event_time_left_temporal_join_upsert_source(tenv):
    """:561 testEventTimeLeftTemporalJoinUpsertSource — the -D at RMB's
    own version time shadows the +U (later arrival wins the tie)."""
    assert run_retract(
        tenv,
        SELECT6 + "LEFT JOIN upsert_currency "
        "FOR SYSTEM_TIME AS OF o.order_time as r ON o.currency = r.currency",
    ) == sorted([
        "1,Euro,12,2020-08-15T00:01,114,2020-08-15T00:00:01",
        "2,US Dollar,18,2020-08-16T00:03,104,2020-08-16T00:02",
        "3,RMB,40,2020-08-15T00:03,null,null",
        "4,Euro,14,2020-08-16T00:04,118,2020-08-16T00:01",
        "5,RMB,40,2020-08-16T00:03,null,null",
    ])


def test_event_time_temporal_join_with_multi_keys(tenv):
    """:582 testEventTimeTemporalJoinWithMultiKeys."""
    assert run_retract(
        tenv,
        SELECT6 + "JOIN versioned_currency_with_multi_key "
        "FOR SYSTEM_TIME AS OF o.order_time as r "
        "ON o.currency_no = r.currency_no AND o.currency = r.currency",
    ) == EVENT_TIME_INNER


def test_event_time_temporal_join_with_non_equal_condition(tenv):
    """:600 testEventTimeTemporalJoinWithNonEqualCondition — the
    o.order_id < 5 / r.rate > 102 conjuncts filter the PICKED version
    (order 3's RMB miss comes from the before-time tombstone)."""
    assert run_retract(
        tenv,
        SELECT6 + "JOIN currency_using_update_before_time "
        "FOR SYSTEM_TIME AS OF o.order_time as r "
        "ON o.currency = r.currency and o.currency_no = r.currency_no "
        "and o.order_id < 5 and r.rate > 102",
    ) == sorted([
        "1,Euro,12,2020-08-15T00:01,114,2020-08-15T00:00:01",
        "2,US Dollar,18,2020-08-16T00:03,106,2020-08-16T00:02",
        "4,Euro,14,2020-08-16T00:04,118,2020-08-16T00:01",
    ])


def test_event_time_temporal_join_equal_condition_on_key(tenv):
    """:617 testEventTimeTemporalJoinEqualConditionOnKey — a literal
    equality on the key column is a filter, not a lookup key."""
    assert run_retract(
        tenv,
        SELECT6 + "JOIN currency_using_update_before_time "
        "FOR SYSTEM_TIME AS OF o.order_time as r "
        "ON o.currency = r.currency and o.currency_no = r.currency_no "
        "and o.currency = 'Euro' and r.rate > 102",
    ) == sorted([
        "1,Euro,12,2020-08-15T00:01,114,2020-08-15T00:00:01",
        "4,Euro,14,2020-08-16T00:04,118,2020-08-16T00:01",
    ])


def test_event_time_multi_temporal_join(tenv):
    """:633 testEventTimeMultiTemporalJoin — two as-of sites in one
    query, both LEFT."""
    assert run_retract(
        tenv,
        "SELECT o.order_id, o.currency, o.amount, o.order_time, r.rate, "
        "r.currency_time, r1.rate, r1.currency_time FROM orders_rowtime AS o "
        "LEFT JOIN versioned_currency_with_multi_key "
        "FOR SYSTEM_TIME AS OF o.order_time as r "
        "ON o.currency = r.currency and o.currency_no = r.currency_no "
        "LEFT JOIN versioned_currency_with_single_key "
        "FOR SYSTEM_TIME AS OF o.order_time as r1 ON o.currency = r1.currency",
    ) == sorted([
        "1,Euro,12,2020-08-15T00:01,114,2020-08-15T00:00:01,114,2020-08-15T00:00:01",
        "2,US Dollar,18,2020-08-16T00:03,106,2020-08-16T00:02,106,2020-08-16T00:02",
        "3,RMB,40,2020-08-15T00:03,702,2020-08-15T00:00:04,702,2020-08-15T00:00:04",
        "4,Euro,14,2020-08-16T00:04,118,2020-08-16T00:01,118,2020-08-16T00:01",
        "5,RMB,40,2020-08-16T00:03,null,null,null,null",
    ])


def test_event_time_temporal_join_with_deduplicate_first_view(tenv):
    """:671 testEventTimeTemporalJoinWithDeduplicateFirstView — the
    keep-first view never revises a key's version."""
    assert run_retract(
        tenv,
        SELECT6 + "LEFT JOIN currency_deduplicated_first_row "
        "FOR SYSTEM_TIME AS OF o.order_time as r ON o.currency = r.currency",
    ) == sorted([
        "1,Euro,12,2020-08-15T00:01,114,2020-08-15T00:00:01",
        "2,US Dollar,18,2020-08-16T00:03,102,2020-08-15T00:00:02",
        "3,RMB,40,2020-08-15T00:03,702,2020-08-15T00:00:04",
        "4,Euro,14,2020-08-16T00:04,114,2020-08-15T00:00:01",
        "5,RMB,40,2020-08-16T00:03,702,2020-08-15T00:00:04",
    ])


DEDUP_LAST_EXPECTED = sorted([
    "1,Euro,12,2020-08-15T00:01,114,2020-08-15T00:00:01",
    "2,US Dollar,18,2020-08-16T00:03,106,2020-08-16T00:02",
    "3,RMB,40,2020-08-15T00:03,702,2020-08-15T00:00:04",
    "4,Euro,14,2020-08-16T00:04,118,2020-08-16T00:01",
    "5,RMB,40,2020-08-16T00:03,702,2020-08-15T00:00:04",
])


def test_event_time_temporal_join_with_deduplicate_last_view(tenv):
    """:691 testEventTimeTemporalJoinWithDeduplicateLastView — arrival
    breaks the 08-16T00:02 US-Dollar tie toward 106."""
    assert run_retract(
        tenv,
        SELECT6 + "JOIN currency_deduplicated_last_row "
        "FOR SYSTEM_TIME AS OF o.order_time as r ON o.currency = r.currency",
    ) == DEDUP_LAST_EXPECTED


def test_event_time_left_temporal_join_with_view(tenv):
    """:711 testEventTimeLeftTemporalJoinWithView — a function-call
    conjunct (substr) is a post-pick filter; non-US orders null out."""
    assert run_retract(
        tenv,
        SELECT6 + "LEFT JOIN currency_deduplicated_last_row "
        "FOR SYSTEM_TIME AS OF o.order_time as r "
        "ON o.currency = r.currency AND substr(o.currency, 1, 2) = 'US' ",
    ) == sorted([
        "1,Euro,12,2020-08-15T00:01,null,null",
        "2,US Dollar,18,2020-08-16T00:03,106,2020-08-16T00:02",
        "3,RMB,40,2020-08-15T00:03,null,null",
        "4,Euro,14,2020-08-16T00:04,null,null",
        "5,RMB,40,2020-08-16T00:03,null,null",
    ])


def test_minibatch_event_time_view_temporal_join(tenv):
    """:731 testMiniBatchEventTimeViewTemporalJoin — minibatch is a
    physical knob; same query and expected as the dedup-last pin."""
    assert run_retract(
        tenv,
        SELECT6 + "JOIN currency_deduplicated_last_row "
        "FOR SYSTEM_TIME AS OF o.order_time as r ON o.currency = r.currency",
    ) == DEDUP_LAST_EXPECTED
