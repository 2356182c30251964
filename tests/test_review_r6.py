"""Regression pins for the round-6 code-review findings."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_3vl_or_short_circuits_guarded_division(spark):
    """Finding #2: `guard OR expr/maybe_zero` must short-circuit like the
    reference's generated Java || — not evaluate both sides eagerly and
    turn the TRUE into FALSE via the error handler."""
    from apache_flink_spark.match_recognize import sql_with_match_recognize

    spark.createDataFrame(
        [(1, 1, 0.0), (1, 2, 5.0)], "uid long, seq long, x double"
    ).createOrReplaceTempView("tvl_g")
    out = sql_with_match_recognize(
        spark,
        """
        SELECT * FROM tvl_g MATCH_RECOGNIZE (
          PARTITION BY uid ORDER BY seq
          MEASURES LAST(B.seq) AS b_seq
          ONE ROW PER MATCH
          AFTER MATCH SKIP PAST LAST ROW
          PATTERN (A B)
          DEFINE A AS A.x = 0,
                 B AS LAST(A.x) = 0 OR B.x / LAST(A.x) > 1
        )
        """,
    ).collect()
    # guard is TRUE (LAST(A.x)=0) -> the division must never run; match emits
    assert [r.b_seq for r in out] == [2]


def test_streaming_mr_measures_partition_column(spark):
    """Finding #1: MEASURES navigating the PARTITION BY column must work
    (constant per group), not KeyError inside the state handler."""
    import pandas as pd

    from apache_flink_spark.streaming.match_stream import (
        streaming_match_recognize,
    )
    from apache_flink_spark.streaming.sources import run_to_table

    src = spark.createDataFrame(
        pd.DataFrame(
            {
                "user_id": [1, 1, 9],
                "event_id": [11, 12, 98],
                "kind": ["a", "b", "a"],
                "ts": pd.to_datetime(
                    [
                        "2024-01-01 10:00:00",
                        "2024-01-01 10:05:00",
                        "2024-01-03 00:00:00",
                    ]
                ),
            }
        )
    )
    import tempfile

    d = tempfile.mkdtemp()
    src.write.mode("overwrite").parquet(d)
    stream = (
        spark.readStream.schema(src.schema).parquet(d)
        .withWatermark("ts", "1 hour")
        .select(
            "user_id", "event_id", "kind",
            F.unix_micros("ts").alias("ep"), "ts",
        )
    )
    out = streaming_match_recognize(
        stream,
        """
        PARTITION BY user_id
        ORDER BY ep, event_id
        MEASURES FIRST(A.user_id) AS uid, B.event_id AS b_id
        ONE ROW PER MATCH
        AFTER MATCH SKIP PAST LAST ROW
        PATTERN (A B)
        DEFINE A AS A.kind = 'a', B AS B.kind = 'b'
        """,
    )
    rows = run_to_table(out, "append").collect()
    assert {(r.uid, r.b_id) for r in rows} == {(1, 12)}


def test_streaming_mr_multi_tiebreak_limit(spark):
    """r9 updates the r6 pin: multiple tie-breaks are now SUPPORTED
    (extra sort keys ride per-query carry columns — see
    test_match_stream.test_streaming_multi_tiebreak_order); only the
    >4-extras cap still rejects loudly."""
    from apache_flink_spark.match_recognize import MatchRecognizeError
    from apache_flink_spark.streaming.match_stream import (
        streaming_match_recognize,
    )

    stream = (
        spark.readStream.format("rate").load()
        .withWatermark("timestamp", "1 second")
        .select(
            F.col("value").alias("user_id"),
            F.col("value").alias("a"),
            F.col("value").alias("b"),
            F.col("value").alias("c"),
            F.col("value").alias("d"),
            F.col("value").alias("e2"),
            F.col("value").alias("f2"),
            F.unix_micros("timestamp").alias("ep"),
            F.col("timestamp").alias("ts"),
        )
    )
    # three-key ordering compiles fine now
    streaming_match_recognize(
        stream,
        """
        PARTITION BY user_id
        ORDER BY ep, a, b
        MEASURES LAST(A.ep) AS e
        ONE ROW PER MATCH
        AFTER MATCH SKIP PAST LAST ROW
        PATTERN (A)
        DEFINE A AS A.a >= 0
        """,
    )
    with pytest.raises(MatchRecognizeError, match="FOUR tie-break"):
        streaming_match_recognize(
            stream,
            """
            PARTITION BY user_id
            ORDER BY ep, a, b, c, d, e2, f2
            MEASURES LAST(A.ep) AS e
            ONE ROW PER MATCH
            AFTER MATCH SKIP PAST LAST ROW
            PATTERN (A)
            DEFINE A AS A.a >= 0
            """,
        )


def test_mt_dispatch_ignores_literal_mention(spark):
    """Finding #8: 'materialized table' inside a string literal must not
    divert an ordinary query to the MT manager."""
    from apache_flink_spark.environment import TableEnvironment

    tenv = TableEnvironment(spark=spark, sf_dir=SF)
    rows = tenv.sql(
        "SELECT 'materialized table' AS kind, count(*) AS n FROM region"
    ).collect()
    assert rows[0].kind == "materialized table" and rows[0].n == 5


def test_mt_continuous_partitioned_layout(spark, tmp_path):
    """Finding #5: CONTINUOUS sinks keep the PARTITIONED BY layout, so a
    later partition refresh composes with the incremental snapshots."""
    from apache_flink_spark.environment import TableEnvironment

    tenv = TableEnvironment(spark=spark, sf_dir=SF)
    src = str(tmp_path / "psrc")
    spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20)], "id int, grp string, v int"
    ).coalesce(1).write.mode("overwrite").parquet(src)
    tenv.sql(
        f"CREATE OR REPLACE TEMPORARY VIEW psrc AS "
        f"SELECT * FROM parquet.`{src}`"
    )
    mgr = tenv.materialized_tables
    mgr.register_stream_source("psrc", src)
    tenv.sql(
        "CREATE MATERIALIZED TABLE mt_pl PARTITIONED BY (grp) "
        "FRESHNESS = INTERVAL '1' SECOND REFRESH_MODE = CONTINUOUS "
        "AS SELECT id, v, grp FROM psrc"
    )
    try:
        import os

        snap = mgr.tables["mt_pl"].current_path
        assert any(e.startswith("grp=") for e in os.listdir(snap)), (
            os.listdir(snap)
        )
        got = {(r.grp, r.v) for r in tenv.sql("SELECT grp, v FROM mt_pl").collect()}
        assert got == {("a", 10), ("b", 20)}
    finally:
        mgr.drop("mt_pl")


def test_upsert_sink_rejects_op_column(spark):
    from apache_flink_spark.streaming.sources import run_upsert_to_table

    df = (
        spark.readStream.format("rate").load()
        .select(F.col("value").alias("k"), F.lit("x").alias("op"))
    )
    with pytest.raises(ValueError, match="protocol column"):
        run_upsert_to_table(df, ["k"], "review7")


def test_join_lateral_version_fallback_collision(spark):
    from apache_flink_spark.table_api import Table

    import pandas as pd

    probe = Table(
        spark.createDataFrame(
            pd.DataFrame(
                {
                    "k": [1],
                    "ts": pd.to_datetime(["2024-01-01"]),
                    "ts_version": [1],
                }
            )
        )
    )
    rates = Table(
        spark.createDataFrame(
            pd.DataFrame(
                {
                    "k": [1],
                    "ts": pd.to_datetime(["2024-01-01"]),
                    "rate": [2.0],
                }
            )
        )
    )
    fn = rates.create_temporal_table_function("ts", "k")
    with pytest.raises(ValueError, match="version-time output column"):
        probe.join_lateral(fn("ts"), "k")
