"""Process Table Functions driven from SQL strings through the facade.

Reference parity: FLIP-440 ``ProcessTableFunction`` (flink-table-common)
and its table-argument call syntax — ``f(input => TABLE t PARTITION BY k
ORDER BY ts, arg => v)``. Compiled by apache_flink_spark/ptf.py:
set semantics -> groupBy().applyInPandas (one shuffle on the partition
keys, Arrow-batched, key columns auto-prepended like the reference);
row semantics -> mapInPandas (zero shuffle).

Determinism: the set-semantics PTF orders by (ts, event_id) so ties are
total; timestamps cross the PTF as exact int64 micros; the row-semantics
score is exact integer arithmetic.
"""

from __future__ import annotations

from apache_flink_spark.ptf import register_ptf
from apache_flink_spark.queries.registry import query


def _tenv(spark, sf_dir):
    from apache_flink_spark.environment import TableEnvironment

    tenv = TableEnvironment(spark=spark)
    tenv.use_data_dir(sf_dir)
    return tenv


def _gap_seq(keys, pdf):
    """Per-user event sequencing: emit (event_id, seq, gap_us) — the
    classic PTF example (FLIP-440's per-key custom operator): a running
    index and the time gap to the previous event of the SAME key."""
    import pandas as pd

    us = pdf["ts"].astype("int64") // 1000
    return pd.DataFrame(
        {
            "event_id": pdf["event_id"].to_numpy(),
            "seq": range(1, len(pdf) + 1),
            "gap_us": (us - us.shift()).astype("Int64"),
        }
    )


def _char_score(pdf, weight=1):
    """Row-semantics PTF: per-row exact-integer text score; rows below
    64 chars are FILTERED (a PTF may emit 0..n rows per input row)."""
    import pandas as pd

    n = pdf["text"].str.len()
    a = pdf["text"].str.count("a")
    out = pd.DataFrame(
        {
            "doc_id": pdf["doc_id"].to_numpy(),
            "score": (n + weight * a).astype("int64"),
        }
    )
    return out[n.to_numpy() >= 64]


register_ptf("ptf_gap_seq", _gap_seq, "event_id bigint, seq int, gap_us bigint")
register_ptf(
    "ptf_char_score", _char_score, "doc_id bigint, score bigint",
    semantics="row",
)


@query(
    "ptf_set_semantics_gaps",
    oracle="""
    WITH s AS (
        SELECT user_id, event_id,
               ROW_NUMBER() OVER w AS seq,
               epoch_us(ts) - LAG(epoch_us(ts)) OVER w AS gap_us
        FROM events
        WHERE user_id < 40
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id, COUNT(*) AS n_events, MAX(seq) AS max_seq,
           MAX(gap_us) AS max_gap_us, MIN(gap_us) AS min_gap_us,
           CAST(SUM(gap_us) AS BIGINT) AS sum_gap_us
    FROM s
    GROUP BY user_id
    """,
)
def ptf_set_semantics_gaps(spark, sf_dir):
    """Set-semantics PTF from the SQL call syntax: per-user ordered
    sequencing + inter-event gaps, then a plain SQL rollup over the
    PTF's output — proving the rewritten view composes with ordinary
    SQL. The PTF itself is ONE applyInPandas behind a shuffle on
    user_id; the rollup is a second (tiny) aggregate."""
    tenv = _tenv(spark, sf_dir)
    tenv.sql(
        "CREATE OR REPLACE TEMPORARY VIEW events_small AS "
        "SELECT * FROM events WHERE user_id < 40"
    )
    return tenv.sql(
        """
        SELECT user_id, COUNT(*) AS n_events, MAX(seq) AS max_seq,
               MAX(gap_us) AS max_gap_us, MIN(gap_us) AS min_gap_us,
               SUM(gap_us) AS sum_gap_us
        FROM ptf_gap_seq(input => TABLE events_small
                         PARTITION BY user_id ORDER BY ts, event_id)
        GROUP BY user_id
        """
    )


@query(
    "ptf_row_semantics_score",
    oracle="""
    SELECT doc_id,
           LENGTH(text)
           + 3 * (LENGTH(text) - LENGTH(REPLACE(text, 'a', ''))) AS score
    FROM documents
    WHERE LENGTH(text) >= 64
    """,
)
def ptf_row_semantics_score(spark, sf_dir):
    """Row-semantics PTF (TABLE_AS_ROW): a per-row exact-integer score
    with PTF-side filtering — mapInPandas, zero shuffle, no key
    argument. The named scalar argument crosses the SQL surface."""
    return _tenv(spark, sf_dir).sql(
        "SELECT doc_id, score "
        "FROM ptf_char_score(input => TABLE documents, weight => 3)"
    )
