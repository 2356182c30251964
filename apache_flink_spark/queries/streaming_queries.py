"""Streaming operator inventory — real Structured Streaming executions.

Reference parity (SURVEY.md §2.12 + §2.4/2.5 stream exec nodes): each entry
below runs an actual streaming job (file source -> watermark/state ->
memory sink, drained with availableNow) and returns the final table, so the
driver's DuckDB oracle validates true streaming semantics, not a batch
stand-in:

  - StreamExecGroupAggregate        -> stream_update_group_agg (update mode)
  - StreamExecWindowAggregate       -> stream_tumble_agg (update mode +
                                       foreachBatch upsert sink)
  - session windows (UnalignedWindowTableFunction) -> stream_session_agg
  - StreamExecDeduplicate           -> stream_distinct_keys
  - StreamExecJoin/IntervalJoin     -> stream_stream_join (watermarked,
                                       time-bounded inner join)
  - StreamExecCalc                  -> stream_filter_project

Oracle-determinism: output modes are chosen so the FINAL table is
independent of micro-batch slicing — window/group aggs run in update mode
drained through a foreachBatch upsert log (last-writer-wins per key =
final aggregate, any batching); append-mode entries have
batching-invariant row SETS (stateless projection, inner-join match set,
key-projected dedup).

Scale: identical plans run unbounded on a cluster — state lives in the
state store (RocksDB provider for big keyspaces), watermarks bound the
join/window state exactly as the reference's TimeIntervalJoin state cleanup.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from apache_flink_spark.queries._util import dsum
from apache_flink_spark.queries.registry import query
from apache_flink_spark.streaming.sources import (
    run_to_table,
    run_upsert_to_table,
    stream_table,
)

MIN30 = 1_800_000_000


@query(
    "stream_filter_project",
    oracle="""
    SELECT event_id, user_id, value
    FROM events
    WHERE event_type = 'click' AND value > 50
    """,
)
def stream_filter_project(spark, sf_dir):
    """Stateless streaming calc (StreamExecCalc): filter + project in append
    mode — the row set is batching-invariant by construction."""
    e = stream_table(spark, sf_dir, "events")
    out = e.filter((F.col("event_type") == "click") & (F.col("value") > 50)).select(
        "event_id", "user_id", "value"
    )
    return run_to_table(out, "append")


@query(
    "stream_tumble_agg",
    oracle=f"""
    SELECT (epoch_us(ts) // {600_000_000}) * {600_000_000} AS win_start,
           event_type,
           COUNT(*) AS n_events,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(12,4))), 2) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def stream_tumble_agg(spark, sf_dir):
    """Streaming tumble window aggregation (StreamExecWindowAggregate) with
    an event-time watermark: update output mode + foreachBatch upsert keyed
    on (win_start, event_type), so watermark state eviction stays live
    (reference WindowAggOperator.java:95 purges on watermark exactly so;
    state boundedness pinned by tests/test_stateful_streaming.py)."""
    e = stream_table(spark, sf_dir, "events")
    agg = (
        e.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "10 minutes").alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value").alias("sum_value"),
        )
        .select(
            F.unix_micros("win.start").alias("win_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
    return run_upsert_to_table(agg, ["win_start", "event_type"])


@query(
    "stream_hop_agg",
    oracle=f"""
    SELECT ws AS win_start, event_type,
           COUNT(*) AS n_events
    FROM (
        SELECT e.event_type,
               ((epoch_us(e.ts) // {300_000_000}) - g.range) * {300_000_000} AS ws
        FROM events e CROSS JOIN range(2) g
    )
    GROUP BY 1, 2
    """,
)
def stream_hop_agg(spark, sf_dir):
    """Streaming HOP (sliding) window aggregation — each event lands in
    size/slide = 2 concurrent windows; update mode + upsert sink keeps
    watermark eviction live for every concurrent window."""
    e = stream_table(spark, sf_dir, "events")
    agg = (
        e.withWatermark("ts", "1 hour")
        .groupBy(
            F.window("ts", "10 minutes", "5 minutes").alias("win"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.unix_micros("win.start").alias("win_start"),
            "event_type",
            "n_events",
        )
    )
    return run_upsert_to_table(agg, ["win_start", "event_type"])


@query(
    "stream_cumulate_agg",
    oracle=f"""
    SELECT win_start, win_end, event_type, COUNT(*) AS n_events
    FROM (
        SELECT (epoch_us(ts) // {3_600_000_000}) * {3_600_000_000} AS win_start,
               (epoch_us(ts) // {3_600_000_000}) * {3_600_000_000}
                 + (((epoch_us(ts) % {3_600_000_000}) // {900_000_000}) + 1 + g.range)
                   * {900_000_000} AS win_end,
               event_type
        FROM events CROSS JOIN range(4) g
        WHERE ((epoch_us(ts) % {3_600_000_000}) // {900_000_000}) + 1 + g.range <= 4
    )
    GROUP BY 1, 2, 3
    """,
)
def stream_cumulate_agg(spark, sf_dir):
    """Streaming CUMULATE window (CumulativeSliceAssigner): the explode-
    slices rewrite applied to a STREAM — the narrow slice-generator runs
    pre-shuffle on each micro-batch, then a standard streaming group agg in
    update mode + upsert sink. Proves the custom window rewrite composes
    with Structured Streaming unchanged."""
    e = stream_table(spark, sf_dir, "events")
    hour = 3_600_000_000
    step = 900_000_000
    ep = F.unix_micros("ts")
    start = (ep - (ep % F.lit(hour))).alias("win_start")
    kmin = ((ep % F.lit(hour)) / F.lit(step)).cast("long") + F.lit(1)
    exploded = e.withWatermark("ts", "1 hour").select(
        "event_type",
        start,
        F.explode(F.sequence(kmin, F.lit(4))).alias("k"),
    )
    agg = exploded.groupBy(
        "win_start",
        (F.col("win_start") + F.col("k") * F.lit(step)).alias("win_end"),
        "event_type",
    ).agg(F.count(F.lit(1)).alias("n_events"))
    return run_upsert_to_table(agg, ["win_start", "win_end", "event_type"])


@query(
    "stream_session_agg",
    oracle=f"""
    WITH marked AS (
        SELECT user_id, value, event_id, epoch_us(ts) AS ep,
               CASE WHEN epoch_us(ts)
                         - LAG(epoch_us(ts)) OVER (PARTITION BY user_id
                                                   ORDER BY ts, event_id)
                         > {MIN30}
                         OR LAG(ts) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS new_sess
        FROM events
    ), numbered AS (
        SELECT *, SUM(new_sess) OVER (PARTITION BY user_id
                                      ORDER BY ep, event_id
                                      ROWS UNBOUNDED PRECEDING) AS sess_id
        FROM marked
    ), sess AS (
        SELECT user_id,
               MIN(ep) AS sess_start,
               MAX(ep) AS sess_end,
               COUNT(*) AS n_events
        FROM numbered
        GROUP BY user_id, sess_id
    )
    SELECT user_id, sess_start, n_events
    FROM sess
    """,
)
def stream_session_agg(spark, sf_dir):
    """Streaming session windows (session gap merging — the reference's
    unaligned window operator / UnalignedWindowTableFunction) as a
    RETRACTION-carrying changelog: Spark rejects update mode for its
    built-in session_window (merging windows need retractions), so the
    engine's custom session operator
    (streaming/stateful.py:streaming_session_changelog) emits 'U' upserts
    per affected session and 'D' deletes for keys RETIRED by merges, and
    the changelog sink compacts honoring the deletes — the reference's
    merging-window retract stream end-to-end. Unlike the r4 append-mode
    shape, no oracle-side watermark cutoff exists: open tail sessions are
    in the compacted view with their latest state, so the oracle is the
    plain batch sessionization."""
    from apache_flink_spark.streaming.sources import (
        run_changelog_upsert_to_table,
    )
    from apache_flink_spark.streaming.stateful import (
        streaming_session_changelog,
    )

    e = stream_table(spark, sf_dir, "events")
    stream = e.withWatermark("ts", "1 hour").select(
        "user_id", F.unix_micros("ts").alias("ts_us"), "ts"
    )
    ch = streaming_session_changelog(stream, MIN30)
    final = run_changelog_upsert_to_table(ch, ["user_id", "sess_start"])
    return final.select("user_id", "sess_start", "n_events")


@query(
    "stream_distinct_keys",
    oracle="SELECT DISTINCT user_id, event_type FROM events",
)
def stream_distinct_keys(spark, sf_dir):
    """Streaming deduplicate (StreamExecDeduplicate): dropDuplicates keyed
    state; projecting only the key columns makes the emitted SET equal to
    DISTINCT regardless of which physical row survives per key."""
    e = stream_table(spark, sf_dir, "events")
    out = e.dropDuplicates(["user_id", "event_type"]).select(
        "user_id", "event_type"
    )
    return run_to_table(out, "append")


@query(
    "stream_update_group_agg",
    oracle="""
    SELECT user_id, event_type, COUNT(*) AS n,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(12,4))), 2) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def stream_update_group_agg(spark, sf_dir):
    """Unbounded streaming group aggregation in update mode
    (StreamExecGroupAggregate / GroupAggFunction keyed state): per-key
    running aggregates, updated rows emitted each micro-batch into a
    foreachBatch upsert sink (last-writer-wins per key — batching-
    invariant, unlike a raw update-mode memory sink which would retain
    superseded emissions across batches)."""
    e = stream_table(spark, sf_dir, "events")
    agg = e.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n"), dsum("value").alias("sum_value")
    )
    return run_upsert_to_table(agg, ["user_id", "event_type"])


@query(
    "stream_semi_join",
    oracle="""
    SELECT c.event_id AS click_id, c.user_id, epoch_us(c.ts) AS click_ts
    FROM events c
    WHERE c.event_type = 'click' AND EXISTS (
        SELECT 1 FROM events p
        WHERE p.event_type = 'purchase' AND p.user_id = c.user_id
          AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
    )
    """,
)
def stream_semi_join(spark, sf_dir):
    """Watermarked stream-stream LEFT SEMI join (reference
    StreamingSemiAntiJoinOperator.java:36, semi side): clicks that see at
    least one same-user purchase within 30 minutes. A left row emits exactly
    once on its first match, so the emitted SET equals batch EXISTS —
    batching-invariant. Watermarks + the time bound evict both sides' state
    exactly as the reference's OuterJoinRecordStateView cleanup."""
    clicks, purchases, cond = _click_purchase_sides(spark, sf_dir)
    joined = clicks.join(purchases, cond, "left_semi").select(
        "click_id", "user_id", F.unix_micros("c_ts").alias("click_ts")
    )
    return run_to_table(joined, "append")


@query(
    "stream_anti_join",
    oracle="""
    WITH wm AS (
        SELECT LEAST(
            (SELECT epoch_ms(MAX(ts)) FROM events WHERE event_type = 'click'),
            (SELECT epoch_ms(MAX(ts)) FROM events WHERE event_type = 'purchase')
        ) - 3600000 AS wm_ms
    )
    SELECT c.event_id AS click_id, c.user_id, epoch_us(c.ts) AS click_ts
    FROM events c, wm
    WHERE c.event_type = 'click'
      AND NOT EXISTS (
        SELECT 1 FROM events p
        WHERE p.event_type = 'purchase' AND p.user_id = c.user_id
          AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
      )
      AND epoch_ms(c.ts) + 1800000 < wm.wm_ms
    """,
)
def stream_anti_join(spark, sf_dir):
    """Watermarked stream-stream LEFT ANTI join (reference
    StreamingSemiAntiJoinOperator.java:36, anti side): clicks with NO
    same-user purchase within 30 minutes. An anti row can only emit once the
    watermark proves no future match is possible (its 30-minute window has
    closed below the final GLOBAL watermark — the MIN of both sides' (max
    event-time - 1 hour), Spark's multi-watermark policy), so clicks near
    the stream tail remain in state — the oracle applies the identical
    cutoff. This watermark-gated emission is
    exactly the reference's retraction-free NOT EXISTS on streams.

    Spark rejects stream-stream left_anti outright; the standard rewrite is
    watermarked LEFT OUTER + IS NULL on the right key — the outer join emits
    the null-padded row only when the watermark closes the match window,
    which IS the anti join's emission rule."""
    clicks, purchases, cond = _click_purchase_sides(spark, sf_dir)
    joined = (
        clicks.join(purchases, cond, "left_outer")
        .filter(F.col("purchase_id").isNull())
        .select("click_id", "user_id", F.unix_micros("c_ts").alias("click_ts"))
    )
    return run_to_table(joined, "append")


def _click_purchase_sides(spark, sf_dir):
    """Shared watermarked click/purchase sides + 30-minute join bound."""
    e1 = stream_table(spark, sf_dir, "events")
    e2 = stream_table(spark, sf_dir, "events")
    clicks = (
        e1.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            "user_id",
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "1 hour")
    )
    purchases = (
        e2.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    cond = (
        (F.col("user_id") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 30 MINUTES"))
    )
    return clicks, purchases, cond


@query(
    "stream_stream_join",
    oracle="""
    SELECT c.event_id AS click_id, p.event_id AS purchase_id, c.user_id,
           epoch_us(c.ts) AS click_ts, epoch_us(p.ts) AS purchase_ts
    FROM events c JOIN events p
      ON c.user_id = p.user_id
     AND p.ts >= c.ts
     AND p.ts <= c.ts + INTERVAL 30 MINUTE
    WHERE c.event_type = 'click' AND p.event_type = 'purchase'
    """,
)
def stream_stream_join(spark, sf_dir):
    """Watermarked stream-stream interval join (StreamExecIntervalJoin):
    purchases within 30 minutes after a click by the same user. The range
    condition + watermarks bound both sides' state (Spark derives the
    eviction horizon from the join condition, as the reference's
    TimeIntervalJoin does from its relative windows). Inner join — the match
    set is batching-invariant."""
    e1 = stream_table(spark, sf_dir, "events")
    e2 = stream_table(spark, sf_dir, "events")
    clicks = (
        e1.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            "user_id",
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "1 hour")
    )
    purchases = (
        e2.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    joined = clicks.join(
        purchases,
        (F.col("user_id") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 30 MINUTES")),
    ).select(
        "click_id",
        "purchase_id",
        "user_id",
        F.unix_micros("c_ts").alias("click_ts"),
        F.unix_micros("p_ts").alias("purchase_ts"),
    )
    return run_to_table(joined, "append")


@query(
    "stream_side_outputs",
    oracle="""
    SELECT event_id, user_id,
           CAST(ROUND(value * 100) AS BIGINT) AS value_c,
           CASE WHEN value >= 150 THEN 'high'
                WHEN value >= 50  THEN 'mid'
                ELSE 'low' END AS route
    FROM events
    """,
)
def stream_side_outputs(spark, sf_dir):
    """Side-output fan-out as a driver-checked query (reference
    SideOutputDataStream.java / OutputTag): one streaming source split into
    three value-tier sinks in a single foreachBatch pass (one source read
    per micro-batch), then read back with the route tag. Row routing is
    stateless, so output is batching-invariant — the oracle is the plain
    CASE partition of events. Machinery: streaming/utils.split_to_sinks."""
    from apache_flink_spark.streaming.utils import split_to_sinks

    st = stream_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.round(F.col("value") * 100).cast("long").alias("value_c"),
        "value",
    )
    keep = lambda b: b.select("event_id", "user_id", "value_c")  # noqa: E731
    q, paths = split_to_sinks(
        st,
        {
            "high": ("value >= 150", keep),
            "mid": ("value >= 50 AND value < 150", keep),
            "low": ("value < 50", keep),
        },
    )
    q.awaitTermination()
    out = None
    for route, path in paths.items():
        part = spark.read.parquet(path).withColumn("route", F.lit(route))
        out = part if out is None else out.unionAll(part)
    return out


@query(
    "stream_broadcast_control_join",
    oracle="""
    SELECT e.event_id, e.user_id, e.event_type,
           CAST(ROUND(e.value * 100) AS BIGINT) AS value_c,
           c.max_c,
           CAST(ROUND(e.value * 100) AS BIGINT) = c.max_c AS is_type_peak
    FROM events e
    JOIN (SELECT event_type,
                 MAX(CAST(ROUND(value * 100) AS BIGINT)) AS max_c
          FROM events GROUP BY 1) c USING (event_type)
    """,
)
def stream_broadcast_control_join(spark, sf_dir):
    """Broadcast-state pattern as a driver-checked query (reference
    DataStream.broadcast:337 / BroadcastProcessFunction): every micro-batch
    re-reads a slowly-changing control table and broadcast-joins it — control
    updates land between batches without restarting the stream. Here the
    control (per-event-type max cents) is static for the run, so the output
    is batching-invariant and the oracle is the equivalent batch join.
    Machinery: streaming/utils.broadcast_control_join."""
    import tempfile

    from apache_flink_spark.queries._util import t
    from apache_flink_spark.streaming.utils import broadcast_control_join

    cents = F.round(F.col("value") * 100).cast("long")
    control = (
        t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.max(cents).alias("max_c"))
    )
    ctl_dir = tempfile.mkdtemp(prefix="afs_ctl_") + "/control"
    control.write.mode("overwrite").parquet(ctl_dir)

    st = stream_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", cents.alias("value_c")
    )

    def enrich(batch, ctl):
        return batch.join(ctl, "event_type").select(
            "event_id",
            "user_id",
            "event_type",
            "value_c",
            "max_c",
            (F.col("value_c") == F.col("max_c")).alias("is_type_peak"),
        )

    q, out_path = broadcast_control_join(st, ctl_dir, enrich)
    q.awaitTermination()
    return spark.read.parquet(out_path)


@query(
    "stream_left_outer_join",
    oracle="""
    WITH wm AS (
        SELECT LEAST(
            (SELECT epoch_ms(MAX(ts)) FROM events WHERE event_type = 'click'),
            (SELECT epoch_ms(MAX(ts)) FROM events WHERE event_type = 'purchase')
        ) - 3600000 AS wm_ms
    )
    SELECT c.event_id AS click_id, p.event_id AS purchase_id,
           c.user_id, epoch_us(c.ts) AS click_ts
    FROM events c
    LEFT JOIN events p
      ON p.event_type = 'purchase' AND p.user_id = c.user_id
     AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
    CROSS JOIN wm
    WHERE c.event_type = 'click'
      AND (p.event_id IS NOT NULL
           OR epoch_ms(c.ts) + 1800000 < wm.wm_ms)
    """,
)
def stream_left_outer_join(spark, sf_dir):
    """Watermarked stream-stream LEFT OUTER join (reference StreamExecJoin
    with LeftOuterJoin spec — flink-table-runtime join/stream/): every click
    joined to same-user purchases within 30 minutes; clicks with no match
    emit null-padded ONCE the watermark proves no future purchase can
    arrive. Matched rows emit eagerly; null-padded rows are watermark-gated,
    so clicks whose 30-minute window is still open below the final global
    watermark stay in state — the oracle applies the identical cutoff to
    the unmatched side only. State is evicted by the same watermark: the
    unbounded-state killer is structurally avoided."""
    clicks, purchases, cond = _click_purchase_sides(spark, sf_dir)
    joined = clicks.join(purchases, cond, "left_outer").select(
        "click_id",
        "purchase_id",
        "user_id",
        F.unix_micros("c_ts").alias("click_ts"),
    )
    return run_to_table(joined, "append")


@query(
    "stream_full_outer_join",
    oracle="""
    WITH wm AS (
        SELECT LEAST(
            (SELECT epoch_ms(MAX(ts)) FROM events WHERE event_type = 'click'),
            (SELECT epoch_ms(MAX(ts)) FROM events WHERE event_type = 'purchase')
        ) - 3600000 AS wm_ms
    )
    SELECT c.event_id AS click_id, p.event_id AS purchase_id,
           COALESCE(c.user_id, p.user_id) AS user_id
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    FULL JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON p.user_id = c.user_id
     AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
    CROSS JOIN wm
    WHERE (c.event_id IS NOT NULL AND p.event_id IS NOT NULL)
       OR (p.event_id IS NULL AND epoch_ms(c.ts) + 1800000 < wm.wm_ms)
       OR (c.event_id IS NULL AND epoch_ms(p.ts) < wm.wm_ms)
    """,
)
def stream_full_outer_join(spark, sf_dir):
    """Watermarked stream-stream FULL OUTER join (reference StreamExecJoin,
    FullOuterJoin spec): matches emit eagerly; each side's null-padded rows
    emit once the watermark closes THAT side's match window — a click waits
    out its forward 30-minute purchase window, a purchase waits until the
    click watermark passes its own timestamp (clicks at or before it can no
    longer arrive). The oracle applies both cutoffs to the respective
    unmatched sides."""
    clicks, purchases, cond = _click_purchase_sides(spark, sf_dir)
    joined = clicks.join(purchases, cond, "full_outer").select(
        "click_id",
        "purchase_id",
        F.coalesce(F.col("user_id"), F.col("p_user")).alias("user_id"),
    )
    return run_to_table(joined, "append")


@query(
    "stream_right_outer_join",
    oracle="""
    WITH wm AS (
        SELECT LEAST(
            (SELECT epoch_ms(MAX(ts)) FROM events WHERE event_type = 'click'),
            (SELECT epoch_ms(MAX(ts)) FROM events WHERE event_type = 'purchase')
        ) - 3600000 AS wm_ms
    )
    SELECT c.event_id AS click_id, p.event_id AS purchase_id,
           p.user_id AS p_user
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    RIGHT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON p.user_id = c.user_id
     AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
    CROSS JOIN wm
    WHERE c.event_id IS NOT NULL
       OR epoch_ms(p.ts) < wm.wm_ms
    """,
)
def stream_right_outer_join(spark, sf_dir):
    """Watermarked stream-stream RIGHT OUTER join (reference StreamExecJoin,
    RightOuterJoin spec): the mirror of the left-outer case — purchases with
    no preceding same-user click within 30 minutes emit null-padded once the
    click watermark passes their timestamp."""
    clicks, purchases, cond = _click_purchase_sides(spark, sf_dir)
    joined = clicks.join(purchases, cond, "right_outer").select(
        "click_id", "purchase_id", "p_user"
    )
    return run_to_table(joined, "append")


@query(
    "stream_window_join",
    streaming=True,
    oracle="""
    SELECT c.user_id,
           (epoch_us(c.ts) // 600000000) * 600000000 AS win_start,
           c.event_id AS click_id,
           p.event_id AS purchase_id
    FROM events c JOIN events p
      ON c.user_id = p.user_id
     AND (epoch_us(c.ts) // 600000000) = (epoch_us(p.ts) // 600000000)
    WHERE c.event_type = 'click' AND p.event_type = 'purchase'
    """,
)
def stream_window_join(spark, sf_dir):
    """STREAMING window join (WindowJoinOperator.java — batch twin:
    win_join_same_window): clicks x purchases of the same user inside the
    same 10-minute tumbling window, as a native stream-stream equi-join on
    (user_id, window). Spark's symmetric hash join emits a pair as soon as
    both sides arrived; the watermark's role is pure state eviction —
    windows older than the lag drop from both join states, the exact
    single-window state bound the reference's operator keeps per key.
    Inner join => no emission gating, so the oracle is the full batch
    equivalence with no cutoff."""
    e1 = stream_table(spark, sf_dir, "events")
    e2 = stream_table(spark, sf_dir, "events")
    c = (
        e1.filter(F.col("event_type") == "click")
        .withWatermark("ts", "1 hour")
        .select(
            "user_id",
            F.col("event_id").alias("click_id"),
            F.window("ts", "10 minutes").alias("win"),
        )
    )
    p = (
        e2.filter(F.col("event_type") == "purchase")
        .withWatermark("ts", "1 hour")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.window("ts", "10 minutes").alias("p_win"),
        )
    )
    j = c.join(
        p,
        (F.col("user_id") == F.col("p_user")) & (F.col("win") == F.col("p_win")),
    )
    out = j.select(
        "user_id",
        F.unix_micros(F.col("win.start")).alias("win_start"),
        "click_id",
        "purchase_id",
    )
    return run_to_table(out, "append")


@query(
    "stream_session_changelog_log",
    oracle=f"""
    WITH marked AS (
        SELECT user_id, event_id, epoch_us(ts) AS ep,
               CASE WHEN epoch_us(ts)
                         - LAG(epoch_us(ts)) OVER (PARTITION BY user_id
                                                   ORDER BY ts, event_id)
                         > {MIN30}
                         OR LAG(ts) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS new_sess
        FROM events
    ), numbered AS (
        SELECT *, SUM(new_sess) OVER (PARTITION BY user_id
                                      ORDER BY ep, event_id
                                      ROWS UNBOUNDED PRECEDING) AS sess_id
        FROM marked
    )
    SELECT 'U' AS op, user_id,
           MIN(ep) AS sess_start, MAX(ep) AS sess_end,
           COUNT(*) AS n_events
    FROM numbered
    GROUP BY user_id, sess_id
    """,
    streaming=True,
)
def stream_session_changelog_log(spark, sf_dir):
    """The RAW changelog of the merging-session operator
    (streaming/stateful.py:streaming_session_changelog): 'U' upserts per
    affected session, 'D' tombstones for merge-retired keys. The fixture
    replays as ONE micro-batch (single file), so every session is built
    in place and the log is exactly the final sessionization as 'U' rows
    with zero deletes — which is what the oracle states. The multi-batch
    retraction path is pinned by tests/test_session_changelog.py."""
    from apache_flink_spark.streaming.sources import run_to_table
    from apache_flink_spark.streaming.stateful import (
        streaming_session_changelog,
    )

    e = stream_table(spark, sf_dir, "events")
    stream = e.withWatermark("ts", "1 hour").select(
        "user_id", F.unix_micros("ts").alias("ts_us"), "ts"
    )
    return run_to_table(streaming_session_changelog(stream, MIN30), "append")
