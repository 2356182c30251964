"""Window TVF inventory — tumble / hop / session / cumulate + window rank/dedup.

Reference parity (SURVEY.md §2.5): the FLIP-145 window TVFs
(StreamExecWindowTableFunction / StreamExecWindowAggregate, slice assigners
TumblingSliceAssigner / HoppingSliceAssigner / CumulativeSliceAssigner in
flink-table-runtime .../window/tvf/slicing/SliceAssigners.java) plus the
derived window operators StreamExecWindowRank and StreamExecWindowDeduplicate.

Spark-first: tumble/hop map to the built-in ``window(ts, size[, slide])``
grouping column, session to ``session_window(ts, gap)``. Cumulate has no
Spark builtin — implemented as the SURVEY §7 explode-slices rewrite: each row
generates its remaining slice-ends with ``sequence`` + ``explode`` then a
plain tumble-style aggregation; this is a narrow (no-shuffle) row multiplier
followed by one hash aggregation, identical in shape to Flink's slice-sharing
trick. Window rank/dedup are ``row_number`` over the window struct.

Window bounds cross the oracle boundary as epoch-micros BIGINT
(``unix_micros`` vs DuckDB ``epoch_us``) — both engines align windows to the
1970 epoch, so starts are bit-identical.

Scale: one shuffle per aggregation on (window, key); window structs are just
grouping columns so AQE/partial-agg apply as with any groupBy. The cumulate
explode multiplies rows by at most size/step (4x here) BEFORE the map-side
partial aggregate, which absorbs the blowup — no extra shuffle volume beyond
the distinct (window, key) pairs.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from apache_flink_spark.queries._util import dsum, t
from apache_flink_spark.queries.registry import query

MIN10 = 600_000_000  # 10 minutes in micros
MIN5 = 300_000_000
MIN15 = 900_000_000
MIN30 = 1_800_000_000
HOUR = 3_600_000_000


@query(
    "win_tumble_agg",
    oracle=f"""
    SELECT (epoch_us(ts) // {MIN10}) * {MIN10} AS win_start,
           event_type,
           COUNT(*) AS n_events,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(12,4))), 2) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def win_tumble_agg(spark, sf_dir):
    """TUMBLE window TVF (TumblingSliceAssigner): 10-minute fixed windows."""
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "10 minutes").alias("win"), "event_type")
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


@query(
    "win_hop_agg",
    oracle=f"""
    SELECT ws AS win_start, event_type,
           COUNT(*) AS n_events,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(12,4))), 2) AS DOUBLE) AS sum_value
    FROM (
        SELECT e.event_type, e.value,
               ((epoch_us(e.ts) // {MIN5}) - g.range) * {MIN5} AS ws
        FROM events e CROSS JOIN range(2) g
    )
    GROUP BY 1, 2
    """,
)
def win_hop_agg(spark, sf_dir):
    """HOP window TVF (HoppingSliceAssigner): 10-minute windows sliding by 5
    — every event lands in exactly size/slide = 2 windows."""
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.window("ts", "10 minutes", "5 minutes").alias("win"), "event_type"
        )
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


@query(
    "win_session_agg",
    oracle=f"""
    WITH marked AS (
        SELECT user_id, value, epoch_us(ts) AS ep,
               CASE WHEN epoch_us(ts)
                         - LAG(epoch_us(ts)) OVER (PARTITION BY user_id
                                                   ORDER BY ts, event_id)
                         > {MIN30}
                         OR LAG(ts) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS new_sess
        FROM events
    ), numbered AS (
        SELECT *, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ep
                                      ROWS UNBOUNDED PRECEDING) AS sess_id
        FROM marked
    )
    SELECT user_id,
           MIN(ep) AS sess_start,
           MAX(ep) + {MIN30} AS sess_end,
           COUNT(*) AS n_events,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(12,4))), 2) AS DOUBLE) AS sum_value
    FROM numbered
    GROUP BY user_id, sess_id
    """,
)
def win_session_agg(spark, sf_dir):
    """SESSION window (SessionWindowAssigner / UnalignedWindowTableFunction):
    per-user sessions closed by a 30-minute inactivity gap. Spark's
    ``session_window`` ends at last-event + gap, matching Flink's merge
    semantics; the oracle reproduces it with gaps-and-islands SQL."""
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "30 minutes").alias("win"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value").alias("sum_value"),
        )
        .select(
            "user_id",
            F.unix_micros("win.start").alias("sess_start"),
            F.unix_micros("win.end").alias("sess_end"),
            "n_events",
            "sum_value",
        )
    )


def cumulate_slices(df, ep_col: str, step_us: int, max_us: int):
    """CUMULATE slice assigner (CumulativeSliceAssigner): explode each row
    into every expanding slice of its max-window that contains it — a row at
    offset o into its window belongs to the slices ending at k*step for all
    k > o // step. Adds ``win_start``/``win_end`` (epoch micros); narrow op,
    fan-out <= max/step per row. Property-tested in tests/test_properties.py
    (slice-count + bounds invariants on arbitrary timestamps)."""
    assert max_us % step_us == 0, "max must be a multiple of step"
    n = max_us // step_us
    ep = F.col(ep_col)
    # pmod, not %: Spark's % keeps the dividend's sign, which for pre-1970
    # (negative-epoch) rows would round win_start toward zero instead of
    # flooring — the window wouldn't contain its own row.
    off = F.pmod(ep, F.lit(max_us))
    kmin = (off / F.lit(step_us)).cast("long") + F.lit(1)
    return (
        df.withColumn("win_start", ep - off)
        .withColumn("__k", F.explode(F.sequence(kmin, F.lit(n))))
        .withColumn("win_end", F.col("win_start") + F.col("__k") * F.lit(step_us))
        .drop("__k")
    )


@query(
    "win_cumulate_agg",
    oracle=f"""
    SELECT win_start, win_end, event_type,
           COUNT(*) AS n_events,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(12,4))), 2) AS DOUBLE) AS sum_value
    FROM (
        SELECT (epoch_us(ts) // {HOUR}) * {HOUR} AS win_start,
               (epoch_us(ts) // {HOUR}) * {HOUR}
                 + (((epoch_us(ts) % {HOUR}) // {MIN15}) + 1 + g.range) * {MIN15}
                 AS win_end,
               event_type, value
        FROM events CROSS JOIN range(4) g
        WHERE ((epoch_us(ts) % {HOUR}) // {MIN15}) + 1 + g.range <= 4
    )
    GROUP BY 1, 2, 3
    """,
)
def win_cumulate_agg(spark, sf_dir):
    """CUMULATE window TVF (CumulativeSliceAssigner): 1-hour max window with
    15-minute expanding steps. No Spark builtin — explode-slices rewrite
    (see ``cumulate_slices``), then aggregate like a tumble."""
    e = t(spark, sf_dir, "events")
    exploded = cumulate_slices(
        e.select("event_type", "value", F.unix_micros("ts").alias("ep")),
        "ep",
        MIN15,
        HOUR,
    )
    return (
        exploded.groupBy("win_start", "win_end", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value").alias("sum_value"),
        )
    )


@query(
    "win_rank_topn",
    oracle=f"""
    WITH a AS (
        SELECT (epoch_us(ts) // {HOUR}) * {HOUR} AS win_start, user_id,
               CAST(ROUND(SUM(CAST(value AS DECIMAL(12,4))), 2) AS DOUBLE) AS sum_value
        FROM events
        GROUP BY 1, 2
    )
    SELECT win_start, user_id, sum_value, rn
    FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY win_start
                                     ORDER BY sum_value DESC, user_id) AS rn
        FROM a
    )
    WHERE rn <= 3
    """,
)
def win_rank_topn(spark, sf_dir):
    """Window Top-N (StreamExecWindowRank): top-3 users by summed value per
    tumbling hour. Catalyst pushes the rn<=3 filter into WindowGroupLimit so
    only 3 rows per window survive the sort — the same rank-limit pushdown
    the reference does with FlinkLogicalRankRule."""
    e = t(spark, sf_dir, "events")
    agg = (
        e.groupBy(F.window("ts", "1 hour").alias("win"), "user_id")
        .agg(dsum("value").alias("sum_value"))
        .select(
            F.unix_micros("win.start").alias("win_start"), "user_id", "sum_value"
        )
    )
    w = Window.partitionBy("win_start").orderBy(F.desc("sum_value"), "user_id")
    return agg.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 3)


@query(
    "win_dedup_first",
    oracle=f"""
    SELECT win_start, user_id, event_id, event_type
    FROM (
        SELECT (epoch_us(ts) // {MIN10}) * {MIN10} AS win_start,
               user_id, event_id, event_type,
               ROW_NUMBER() OVER (PARTITION BY (epoch_us(ts) // {MIN10}), user_id
                                  ORDER BY ts, event_id) AS rn
        FROM events
    )
    WHERE rn = 1
    """,
)
def win_dedup_first(spark, sf_dir):
    """Window deduplicate (StreamExecWindowDeduplicate): first event per
    (user, 10-minute window) — row_number()=1 over the window struct."""
    e = t(spark, sf_dir, "events")
    withwin = e.withColumn("win", F.window("ts", "10 minutes"))
    w = Window.partitionBy("win", "user_id").orderBy("ts", "event_id")
    return (
        withwin.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.unix_micros("win.start").alias("win_start"),
            "user_id",
            "event_id",
            "event_type",
        )
    )


@query(
    "win_dedup_last",
    oracle=f"""
    SELECT win_start, user_id, event_id, event_type
    FROM (
        SELECT (epoch_us(ts) // {MIN10}) * {MIN10} AS win_start,
               user_id, event_id, event_type,
               ROW_NUMBER() OVER (PARTITION BY (epoch_us(ts) // {MIN10}), user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    )
    WHERE rn = 1
    """,
)
def win_dedup_last(spark, sf_dir):
    """Window deduplicate keep-LAST (RowTimeWindowDeduplicateOperator —
    the reference plans keepLastRow as well as first): latest event per
    (user, 10-minute window), ties to the largest event_id. Same
    window-group-limit plan shape as win_dedup_first with the sort
    reversed."""
    e = t(spark, sf_dir, "events")
    withwin = e.withColumn("win", F.window("ts", "10 minutes"))
    w = Window.partitionBy("win", "user_id").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        withwin.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.unix_micros("win.start").alias("win_start"),
            "user_id",
            "event_id",
            "event_type",
        )
    )


MIN3 = 180_000_000


@query(
    "win_tumble_offset_agg",
    oracle=f"""
    SELECT ((epoch_us(ts) - {MIN3}) // {MIN10}) * {MIN10} + {MIN3} AS win_start,
           event_type,
           COUNT(*) AS n_events,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(12,4))), 2) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def win_tumble_offset_agg(spark, sf_dir):
    """TUMBLE with a window OFFSET (reference TumblingEventTimeWindows.of(
    size, offset) — flink-runtime windowing assigners): 10-minute windows
    shifted 3 minutes off the epoch alignment, e.g. [:03, :13). Spark's
    ``window()`` startTime parameter is the same knob; the oracle aligns by
    subtracting the offset before flooring."""
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.window("ts", "10 minutes", "10 minutes", "3 minutes").alias("win"),
            "event_type",
        )
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


@query(
    "win_hop_offset_agg",
    oracle=f"""
    SELECT ws AS win_start, event_type,
           COUNT(*) AS n_events,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(12,4))), 2) AS DOUBLE) AS sum_value
    FROM (
        SELECT e.event_type, e.value,
               (((epoch_us(e.ts) - {MIN3}) // {MIN5}) - g.range) * {MIN5} + {MIN3} AS ws
        FROM events e CROSS JOIN range(2) g
    )
    GROUP BY 1, 2
    """,
)
def win_hop_offset_agg(spark, sf_dir):
    """HOP with a window OFFSET (reference SlidingEventTimeWindows.of(size,
    slide, offset)): 10-minute windows sliding by 5, shifted 3 minutes off
    epoch alignment — every event still lands in exactly size/slide = 2
    windows; the oracle subtracts the offset before the slide floor and adds
    it back."""
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.window("ts", "10 minutes", "5 minutes", "3 minutes").alias("win"),
            "event_type",
        )
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


@query(
    "win_session_dynamic_gap",
    oracle=f"""
    WITH e AS (
        SELECT user_id, event_id, epoch_us(ts) AS ep,
               CASE WHEN event_type = 'purchase'
                    THEN {MIN10} * 3 ELSE {MIN10} END AS gap_us
        FROM events
    ), marked AS (
        SELECT user_id, event_id, ep, gap_us,
               CASE WHEN ep > COALESCE(
                        MAX(ep + gap_us) OVER (
                            PARTITION BY user_id ORDER BY ep, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                        -1)
                    THEN 1 ELSE 0 END AS is_start
        FROM e
    ), sess AS (
        SELECT user_id, ep,
               CAST(SUM(is_start) OVER (PARTITION BY user_id
                                        ORDER BY ep, event_id
                                        ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND CURRENT ROW) AS BIGINT)
                   AS sess_id
        FROM marked
    )
    SELECT user_id, sess_id, COUNT(*) AS n_events,
           MIN(ep) AS sess_start, MAX(ep) AS sess_last
    FROM sess GROUP BY user_id, sess_id
    """,
)
def win_session_dynamic_gap(spark, sf_dir):
    """Session windows with a DYNAMIC per-element gap (reference
    SessionWindowTimeGapExtractor.java + EventTimeSessionWindows
    .withDynamicGap): each element extends its session by its own
    gap — purchases hold the session open 30 minutes, everything else
    10. Batch formulation: an event starts a new session when its time
    exceeds the running max of (prev ts + prev gap) — gaps-and-islands
    with a per-row horizon instead of a constant (exactly the window
    MERGE the reference's MergingWindowAssigner performs). Two window
    passes + one aggregate, all on the same (user, time) sort — one
    shuffle total. The constant-gap streaming twin with timers is
    stream_custom_sessions."""
    e = t(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("ep"),
        F.when(F.col("event_type") == "purchase", F.lit(MIN10 * 3))
        .otherwise(F.lit(MIN10))
        .alias("gap_us"),
    )
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("ep", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    marked = e.withColumn(
        "is_start",
        (
            F.col("ep")
            > F.coalesce(
                F.max(F.col("ep") + F.col("gap_us")).over(w_prev), F.lit(-1)
            )
        ).cast("int"),
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("ep", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sess = marked.withColumn("sess_id", F.sum("is_start").over(w_run))
    return sess.groupBy("user_id", "sess_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ep").alias("sess_start"),
        F.max("ep").alias("sess_last"),
    )


@query(
    "win_tumble_late_drop",
    oracle=f"""
    WITH o AS (
      SELECT user_id, event_id, epoch_us(ts) AS ep, value,
             MAX(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ) - {MIN10 // 2} AS wm
      FROM events
    ), kept AS (
      SELECT * FROM o
      WHERE wm IS NULL OR ((ep // {MIN10}) * {MIN10} + {MIN10}) - 1 > wm
    )
    SELECT user_id, (ep // {MIN10}) * {MIN10} AS win_start,
           COUNT(*) AS n_events,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(12,4))), 2) AS DOUBLE)
             AS sum_value
    FROM kept
    GROUP BY user_id, win_start
    """,
)
def win_tumble_late_drop(spark, sf_dir):
    """r13 — tumble window aggregation with the reference's LATE-DATA
    drop (WindowOperator.isWindowLate: an element is dropped from a
    window whose maxTimestamp <= the current watermark; pinned verbatim
    against streaming WindowAggregateITCase.scala:214 in
    tests/test_itcase_window_agg.py). The watermark is the per-split
    bounded-out-of-orderness strategy (rowtime - 5 minutes over the
    split's arrival order) — here per user_id stream, each split's
    running-max prefix scan being ONE window pass over the same keyed
    exchange the aggregation needs anyway (the scale-correct form: a
    global arrival order would serialize the scan; real sources carry
    watermarks per partition/split exactly like this)."""
    e = t(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_micros("ts").alias("ep"), "value"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    win_start = (F.col("ep") - F.col("ep") % MIN10).alias("win_start")
    kept = (
        e.withColumn("wm", F.max("ep").over(w) - (MIN10 // 2))
        .filter(
            F.col("wm").isNull()
            | ((F.col("ep") - F.col("ep") % MIN10) + MIN10 - 1 > F.col("wm"))
        )
    )
    return kept.groupBy("user_id", win_start).agg(
        F.count(F.lit(1)).alias("n_events"),
        dsum("value").alias("sum_value"),
    )
