"""Changelog inventory — derive, normalize, drop-update-before.

The events table keyed by (user_id, event_type) and ordered by (ts,
event_id) acts as the upsert stream: each new event "updates" the key's
current value, giving a deterministic +I/-U/+U changelog to test against.
"""

from __future__ import annotations

from apache_flink_spark.changelog import (
    derive_changelog,
    drop_update_before,
    materialize,
)
from apache_flink_spark.queries._util import dround, t
from apache_flink_spark.queries.registry import query

from pyspark.sql import functions as F

_CHANGELOG_SQL = """
    WITH base AS (
        SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id, value,
               LAG(value) OVER (PARTITION BY user_id, event_type
                                ORDER BY epoch_us(ts), event_id) AS prev
        FROM events
    )
    SELECT user_id, event_type, ts_us, event_id, '+I' AS __rowkind, value
    FROM base WHERE prev IS NULL
    UNION ALL
    SELECT user_id, event_type, ts_us, event_id, '-U', prev
    FROM base WHERE prev IS NOT NULL
    UNION ALL
    SELECT user_id, event_type, ts_us, event_id, '+U', value
    FROM base WHERE prev IS NOT NULL
"""


def _changelog(spark, sf_dir):
    e = t(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("ts_us"), "event_id", "value"
    )
    return derive_changelog(
        e, ["user_id", "event_type"], ["ts_us", "event_id"], "value"
    )


@query("changelog_derive", oracle=_CHANGELOG_SQL)
def changelog_derive(spark, sf_dir):
    """Emit the +I/-U/+U retraction stream of the keyed events table
    (RowKind.java:31-52 semantics under the __rowkind convention)."""
    return _changelog(spark, sf_dir)


@query(
    "changelog_materialize",
    oracle="""
    SELECT user_id, event_type, ts_us, event_id, value
    FROM (
        SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id, value,
               ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                  ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
        FROM events
    )
    WHERE rn = 1
    """,
)
def changelog_materialize(spark, sf_dir):
    """ChangelogNormalize (StreamExecChangelogNormalize.java:77): collapse
    the changelog back to the latest row per key — round-trips derive ->
    materialize back to the keep-last snapshot."""
    return materialize(
        _changelog(spark, sf_dir),
        ["user_id", "event_type"],
        ["ts_us", "event_id"],
        "value",
    )


@query(
    "changelog_agg_retract",
    oracle="""
    SELECT event_type,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE)
               AS total_value,
           COUNT(*) AS live_keys
    FROM (
        SELECT event_type, value,
               ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                  ORDER BY epoch_us(ts) DESC, event_id DESC)
                   AS rn
        FROM events
    )
    WHERE rn = 1
    GROUP BY event_type
    """,
)
def changelog_agg_retract(spark, sf_dir):
    """Retract-aware aggregation over an updating stream — the reference's
    GroupAggFunction.java calls ``acc.retract(row)`` for -U/-D rowkinds so
    a SUM over a changelog tracks the CURRENT images, not the arrival
    history. Spark-first: fold the rowkind into a +1/-1 weight and run ONE
    hash aggregate of the signed values — sum(weight*value) telescopes to
    the last image per key and sum(weight) to the live-key count.
    Summed as exact DECIMAL so every -U cancels its +I/+U bit-for-bit
    (double addition would leave round-off residue and the count of keys
    would still be right but the sum nondeterministic). One narrow
    map + one shuffle regardless of how many updates each key saw —
    the 100 TB plan is identical to a plain groupBy.
    Oracle derives the same result independently: last image per
    (user_id, event_type), then a plain aggregate."""
    log = _changelog(spark, sf_dir)
    w = F.when(F.col("__rowkind").isin("+I", "+U"), F.lit(1)).otherwise(-1)
    signed = log.select(
        "event_type",
        w.alias("__w"),
        (w * F.col("value").cast("decimal(18,4)")).alias("__wv"),
    )
    return signed.groupBy("event_type").agg(
        dround(F.sum("__wv")).alias("total_value"),
        F.sum("__w").cast("long").alias("live_keys"),
    )


@query(
    "changelog_drop_update_before",
    oracle=f"""
    SELECT * FROM ({_CHANGELOG_SQL})
    WHERE __rowkind <> '-U'
    """,
)
def changelog_drop_update_before(spark, sf_dir):
    """DropUpdateBefore (DropUpdateBeforeFunction.java): strip the retract
    half for upsert-keyed consumers."""
    return drop_update_before(_changelog(spark, sf_dir))
