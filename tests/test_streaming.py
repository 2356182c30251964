"""Streaming-layer tests beyond the oracle gate: source builders, bounded
runner semantics, rate source (reference datagen equivalent)."""

from __future__ import annotations

from pyspark.sql import functions as F

from apache_flink_spark.streaming import rate_source, run_to_table, stream_table


def test_stream_table_matches_batch_schema(spark, sf_dir):
    st = stream_table(spark, sf_dir, "events")
    assert st.isStreaming
    batch = spark.read.parquet(f"{sf_dir}/events.parquet")
    assert set(st.columns) == set(batch.columns)
    # ts must be a proper timestamp after nanos normalization on both paths.
    assert dict(st.dtypes)["ts"] == "timestamp"


def test_bounded_run_equals_batch(spark, sf_dir):
    st = stream_table(spark, sf_dir, "events")
    got = run_to_table(
        st.filter(F.col("event_type") == "signup").select("event_id"), "append"
    )
    want = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .filter(F.col("event_type") == "signup")
        .select("event_id")
    )
    assert sorted(r.event_id for r in got.collect()) == sorted(
        r.event_id for r in want.collect()
    )


def test_rate_source_produces_rows(spark):
    """Datagen-source parity (DataGeneratorSource.java:95): the rate source
    yields (timestamp, value) rows at the configured rate."""
    df = rate_source(spark, rows_per_second=500)
    assert df.isStreaming
    assert dict(df.dtypes) == {"timestamp": "timestamp", "value": "bigint"}
    q = (
        df.writeStream.format("memory")
        .queryName("rate_smoke")
        .outputMode("append")
        .trigger(processingTime="250 milliseconds")
        .start()
    )
    try:
        import time

        deadline = time.time() + 15
        while time.time() < deadline:
            if spark.table("rate_smoke").count() > 0:
                break
            time.sleep(0.25)
        assert spark.table("rate_smoke").count() > 0
    finally:
        q.stop()


def test_socket_source(spark):
    """Socket text source parity (socketTextStream:1453): feed lines over a
    loopback socket, assert they arrive as rows."""
    import socket
    import threading
    import time

    from apache_flink_spark.streaming import sources as S

    server = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    server.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    server.bind(("127.0.0.1", 0))
    port = server.getsockname()[1]
    server.listen(1)

    def serve():
        conn, _ = server.accept()
        with conn:
            for i in range(5):
                conn.sendall(f"line-{i}\n".encode())
                time.sleep(0.05)
            time.sleep(8)

    t = threading.Thread(target=serve, daemon=True)
    t.start()

    df = S.socket_source(spark, "127.0.0.1", port)
    assert df.isStreaming and df.columns == ["value"]
    q = (
        df.writeStream.format("memory")
        .queryName("socket_smoke")
        .outputMode("append")
        .trigger(processingTime="250 milliseconds")
        .start()
    )
    try:
        deadline = time.time() + 20
        while time.time() < deadline:
            if spark.table("socket_smoke").count() >= 5:
                break
            time.sleep(0.25)
        got = {r.value for r in spark.table("socket_smoke").collect()}
        assert {f"line-{i}" for i in range(5)} <= got
    finally:
        q.stop()
        server.close()
