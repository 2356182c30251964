"""io.py format surface: orc roundtrip + the documented avro gate."""

from __future__ import annotations

import pytest

from apache_flink_spark import io


def test_orc_roundtrip(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/region.parquet")
    path = io.temp_sink_dir("orc")
    io.write_orc(df, path)
    back = io.read_orc(spark, path)
    assert sorted(r.r_name for r in back.collect()) == sorted(
        r.r_name for r in df.collect()
    )


def test_avro_roundtrip_any_backend(spark, sf_dir):
    """write_avro/read_avro work with or without the spark-avro jar: the
    pure-Python pyavro datasource is the fallback (formats/avro_format.py),
    so avro is a first-class format in this environment too."""
    df = spark.read.parquet(f"{sf_dir}/region.parquet")
    path = io.temp_sink_dir("avro")
    io.write_avro(df, path)
    back = io.read_avro(spark, path)
    assert back.schema == df.schema
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_kafka_gate_raises_actionable_hint(spark):
    """Kafka connector surface (flink-connector-kafka parity): the
    container ships no kafka jar, so both directions must fail with the
    deploy hint, not Spark's generic datasource lookup error."""
    import pytest

    from apache_flink_spark import io

    with pytest.raises(NotImplementedError, match="spark-sql-kafka"):
        io.read_kafka_stream(spark, "localhost:9092", "events")
    with pytest.raises(NotImplementedError, match="spark-sql-kafka"):
        io.write_kafka_stream(
            spark.readStream.format("rate").load().selectExpr(
                "CAST(value AS STRING) AS value"
            ),
            "localhost:9092",
            "events",
            "/tmp/kckpt",
        )
