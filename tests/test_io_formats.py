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


def test_avro_gated_when_jar_absent(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/region.parquet")
    if io._avro_available(spark):
        path = io.temp_sink_dir("avro")
        io.write_avro(df, path)
        assert io.read_avro(spark, path).count() == df.count()
    else:
        with pytest.raises(NotImplementedError, match="spark-avro"):
            io.write_avro(df, io.temp_sink_dir("avro"))
        with pytest.raises(NotImplementedError, match="spark-avro"):
            io.read_avro(spark, "/nonexistent")
