"""Window TVFs driven from SQL STRINGS through the facade.

Reference parity (SURVEY.md §2.5): Flink SQL's windowing table functions —
``TABLE(TUMBLE|HOP|CUMULATE(TABLE t, DESCRIPTOR(ts), ...))`` — planned into
StreamExecWindowAggregate. The DataFrame twins live in
queries/event_windows.py; these SQL-string queries prove the syntax path
(apache_flink_spark/window_tvf.py rewrite -> spark.sql), sharing the same
exact oracles. Window bounds cross the oracle boundary as epoch micros.
"""

from __future__ import annotations

from apache_flink_spark.queries.event_windows import HOUR, MIN5, MIN10, MIN15, MIN30
from apache_flink_spark.queries.registry import query


def _tenv(spark, sf_dir):
    from apache_flink_spark.environment import TableEnvironment

    tenv = TableEnvironment(spark=spark)
    tenv.use_data_dir(sf_dir)
    return tenv


@query(
    "tvf_tumble_agg",
    oracle=f"""
    SELECT (epoch_us(ts) // {MIN10}) * {MIN10} AS win_start,
           event_type,
           COUNT(*) AS n_events,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(12,4))), 2) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def tvf_tumble_agg(spark, sf_dir):
    """TUMBLE TVF from a SQL string (reference window TVF syntax ->
    window_tvf.py rewrite -> Spark's builtin window())."""
    return _tenv(spark, sf_dir).sql(
        """
        SELECT unix_micros(window_start) AS win_start, event_type,
               COUNT(*) AS n_events,
               CAST(ROUND(SUM(CAST(value AS DECIMAL(12,4))), 2) AS DOUBLE)
                   AS sum_value
        FROM TABLE(TUMBLE(TABLE events, DESCRIPTOR(ts), INTERVAL '10' MINUTES))
        GROUP BY 1, 2
        """
    )


@query(
    "tvf_hop_agg",
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
def tvf_hop_agg(spark, sf_dir):
    """HOP TVF from a SQL string — 10-minute windows sliding by 5; the
    rewrite's projection-position window() fans each row into its
    size/slide = 2 windows."""
    return _tenv(spark, sf_dir).sql(
        """
        SELECT unix_micros(window_start) AS win_start, event_type,
               COUNT(*) AS n_events,
               CAST(ROUND(SUM(CAST(value AS DECIMAL(12,4))), 2) AS DOUBLE)
                   AS sum_value
        FROM TABLE(HOP(TABLE events, DESCRIPTOR(ts),
                       INTERVAL '5' MINUTES, INTERVAL '10' MINUTES))
        GROUP BY 1, 2
        """
    )


@query(
    "tvf_cumulate_agg",
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
def tvf_cumulate_agg(spark, sf_dir):
    """CUMULATE TVF from a SQL string — 1-hour max window, 15-minute
    expanding steps; the rewrite applies the same explode-slices expansion
    as the DataFrame cumulate operator."""
    return _tenv(spark, sf_dir).sql(
        """
        SELECT unix_micros(window_start) AS win_start,
               unix_micros(window_end) AS win_end, event_type,
               COUNT(*) AS n_events,
               CAST(ROUND(SUM(CAST(value AS DECIMAL(12,4))), 2) AS DOUBLE)
                   AS sum_value
        FROM TABLE(CUMULATE(TABLE events, DESCRIPTOR(ts),
                            INTERVAL '15' MINUTES, INTERVAL '1' HOUR))
        GROUP BY 1, 2, 3
        """
    )


@query(
    "gw_session_agg",
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
def gw_session_agg(spark, sf_dir):
    """SESSION group window from a SQL string (reference legacy group-window
    syntax — GROUP BY SESSION(ts, gap) with SESSION_START/SESSION_END
    selectors, validated by LogicalWindowAggregate planning): rewritten to
    Spark's merging session_window expression. This closes the SQL-string
    session gap the TVF form cannot express."""
    return _tenv(spark, sf_dir).sql(
        """
        SELECT user_id,
               unix_micros(SESSION_START(ts, INTERVAL '30' MINUTES))
                   AS sess_start,
               unix_micros(SESSION_END(ts, INTERVAL '30' MINUTES)) AS sess_end,
               COUNT(*) AS n_events,
               CAST(ROUND(SUM(CAST(value AS DECIMAL(12,4))), 2) AS DOUBLE)
                   AS sum_value
        FROM events
        GROUP BY user_id, SESSION(ts, INTERVAL '30' MINUTES)
        """
    )


@query(
    "tvf_session_agg",
    oracle=f"""
    WITH marked AS (
        SELECT user_id, value, epoch_us(ts) AS ep,
               CASE WHEN epoch_us(ts)
                         - LAG(epoch_us(ts)) OVER (PARTITION BY user_id
                                                   ORDER BY ts)
                         > {MIN30}
                         OR LAG(ts) OVER (PARTITION BY user_id
                                          ORDER BY ts) IS NULL
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
           COUNT(*) AS n_events
    FROM numbered
    GROUP BY user_id, sess_id
    """,
)
def tvf_session_agg(spark, sf_dir):
    """SESSION window TVF from a SQL string (Flink 1.17+ syntax,
    reference UnalignedWindowTableFunction): ``SESSION(TABLE events
    PARTITION BY user_id, DESCRIPTOR(ts), INTERVAL '30' MINUTES)``
    rewritten to a gaps-and-islands subquery (window_tvf.py) — closes the
    r1-r3 'SESSION TVF not expressible' subset gap; the legacy
    group-window twin is gw_session_agg."""
    return _tenv(spark, sf_dir).sql(
        """
        SELECT user_id,
               unix_micros(window_start) AS sess_start,
               unix_micros(window_end) AS sess_end,
               COUNT(*) AS n_events
        FROM TABLE(SESSION(TABLE events PARTITION BY user_id,
                           DESCRIPTOR(ts), INTERVAL '30' MINUTES))
        GROUP BY user_id, window_start, window_end
        """
    )


@query(
    "tvf_raw_expand",
    oracle=f"""
    SELECT e.event_id, e.event_type,
           ((epoch_us(e.ts) // {MIN5}) - g.range) * {MIN5} AS win_start,
           ((epoch_us(e.ts) // {MIN5}) - g.range) * {MIN5} + {MIN10} AS win_end,
           ((epoch_us(e.ts) // {MIN5}) - g.range) * {MIN5} + {MIN10} - 1000
               AS win_time
    FROM events e CROSS JOIN range(2) g
    WHERE e.event_id % 7 = 0
    """,
)
def tvf_raw_expand(spark, sf_dir):
    """RAW window TVF expansion (r13 — WindowTableFunctionITCase.scala:230
    testHopWindow): the TVF with no aggregate on top emits every
    (row, window) pair plus the window_time attribute (window_end - 1ms,
    flink-table-runtime WindowTableFunctionOperatorBase). Stateless
    per-row fan-out — the plan is a projection + explode-free window()
    fanout, no exchange at all."""
    return _tenv(spark, sf_dir).sql(
        """
        SELECT event_id, event_type,
               unix_micros(window_start) AS win_start,
               unix_micros(window_end) AS win_end,
               unix_micros(window_time) AS win_time
        FROM TABLE(HOP(TABLE events, DESCRIPTOR(ts),
                       INTERVAL '5' MINUTES, INTERVAL '10' MINUTES))
        WHERE event_id % 7 = 0
        """
    )
