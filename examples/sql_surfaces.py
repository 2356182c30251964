#!/usr/bin/env python3
"""End-to-end tour of the Flink-SQL-only surfaces this engine compiles.

A SQL-string user of the reference can run these verbatim shapes here:
MATCH_RECOGNIZE (quantifier bounds, WITHIN, alternation, reluctant
quantifiers, PREV/NEXT navigation, SKIP TO var), window TVFs
(TUMBLE/HOP/CUMULATE/SESSION), legacy group windows (incl. SESSION),
FOR SYSTEM_TIME AS OF temporal joins, and CDC format replay.

Usage: python examples/sql_surfaces.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from apache_flink_spark import TableEnvironment  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"


def main() -> None:
    tenv = TableEnvironment.create(sf_dir=SF_DIR)
    tenv.create_view(
        "events_ep",
        tenv.sql(
            "SELECT user_id, event_id, event_type, value,"
            " unix_micros(ts) AS ep, ts FROM events"
        ),
    )

    print("== MATCH_RECOGNIZE: click then 1+ purchases within 24h ==")
    tenv.sql(
        """
        SELECT user_id, click_id, n_purchases
        FROM events_ep MATCH_RECOGNIZE (
            PARTITION BY user_id ORDER BY ep, event_id
            MEASURES A.event_id AS click_id, COUNT(B.*) AS n_purchases
            ONE ROW PER MATCH AFTER MATCH SKIP PAST LAST ROW
            PATTERN (A B+) WITHIN INTERVAL '24' HOURS
            DEFINE A AS A.event_type = 'click', B AS B.event_type = 'purchase'
        ) ORDER BY user_id, click_id
        """
    ).show(5, truncate=False)

    print("== Window TVF: hourly tumble ==")
    tenv.sql(
        """
        SELECT window_start, event_type, COUNT(*) AS n
        FROM TABLE(TUMBLE(TABLE events, DESCRIPTOR(ts), INTERVAL '1' HOUR))
        GROUP BY 1, 2 ORDER BY 1, 2
        """
    ).show(5, truncate=False)

    print("== Legacy group window: 30-minute sessions ==")
    tenv.sql(
        """
        SELECT user_id,
               SESSION_START(ts, INTERVAL '30' MINUTES) AS sess_start,
               COUNT(*) AS n
        FROM events
        GROUP BY user_id, SESSION(ts, INTERVAL '30' MINUTES)
        ORDER BY sess_start LIMIT 5
        """
    ).show(truncate=False)

    print("== Temporal join: each click's latest preceding view ==")
    tenv.create_view(
        "clicks", tenv.sql("SELECT * FROM events WHERE event_type = 'click'")
    )
    tenv.create_view(
        "views", tenv.sql("SELECT * FROM events WHERE event_type = 'view'")
    )
    tenv.sql(
        """
        SELECT c.user_id, c.event_id AS click_id, v.event_id AS view_id
        FROM clicks c
        LEFT JOIN views FOR SYSTEM_TIME AS OF c.ts AS v
          ON v.user_id = c.user_id
        ORDER BY c.user_id, click_id LIMIT 5
        """
    ).show(truncate=False)

    print("== SESSION window TVF (1.17+ syntax) ==")
    tenv.sql(
        """
        SELECT user_id, window_start, COUNT(*) AS n
        FROM TABLE(SESSION(TABLE events PARTITION BY user_id,
                           DESCRIPTOR(ts), INTERVAL '30' MINUTES))
        GROUP BY user_id, window_start, window_end
        ORDER BY window_start LIMIT 5
        """
    ).show(truncate=False)

    print("== MATCH_RECOGNIZE: the Ticker V with PREV + SKIP TO LAST ==")
    tenv.create_view(
        "priced",
        tenv.sql(
            "SELECT user_id, event_id, CAST(round(value * 100) AS BIGINT)"
            " AS value_c, unix_micros(ts) AS ep FROM events"
        ),
    )
    tenv.sql(
        """
        SELECT user_id, strt_id, n_down, n_up FROM priced MATCH_RECOGNIZE (
            PARTITION BY user_id ORDER BY ep, event_id
            MEASURES STRT.event_id AS strt_id, COUNT(DOWN.*) AS n_down,
                     COUNT(UP.*) AS n_up
            AFTER MATCH SKIP TO LAST UP
            PATTERN (STRT DOWN+ UP+)
            DEFINE DOWN AS DOWN.value_c < PREV(DOWN.value_c),
                   UP AS UP.value_c > PREV(UP.value_c)
        ) ORDER BY user_id, strt_id LIMIT 5
        """
    ).show(truncate=False)

    print("== CDC: replay a debezium stream into its last image ==")
    from apache_flink_spark.queries.cdc_queries import cdc_debezium_materialize

    cdc_debezium_materialize(tenv.spark, SF_DIR).orderBy(
        "user_id", "event_type"
    ).show(5, truncate=False)

    print("ok")


if __name__ == "__main__":
    main()
