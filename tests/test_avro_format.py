"""Pure-Python Avro codec + pyavro datasource tests.

Spec references are to the public Avro 1.11 specification (binary encoding
+ object container files); known-bytes vectors come from the spec's own
examples.
"""

from __future__ import annotations

import datetime as dt
import decimal
import os

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql import types as T

from apache_flink_spark.formats import avro_format as A


# ---------------------------------------------------------------- primitives


def test_zigzag_spec_vectors():
    # table straight from the Avro spec
    assert [A.zigzag_encode(n) for n in (0, -1, 1, -2, 2)] == [0, 1, 2, 3, 4]
    assert A.zigzag_encode(2147483647) == 4294967294
    assert A.zigzag_encode(-2147483648) == 4294967295


def test_varint_known_bytes():
    for n, b in [(0, b"\x00"), (1, b"\x02"), (-1, b"\x01"), (64, b"\x80\x01"),
                 (-64, b"\x7f"), (8192, b"\x80\x80\x01")]:
        out = bytearray()
        A.write_long(out, n)
        assert bytes(out) == b, (n, bytes(out))
        assert A.Bin(bytes(out)).read_long() == n


@given(st.integers(min_value=-(2**63), max_value=2**63 - 1))
@settings(max_examples=300, deadline=None)
def test_long_roundtrip(n):
    out = bytearray()
    A.write_long(out, n)
    r = A.Bin(bytes(out))
    assert r.read_long() == n
    assert r.pos == len(out)  # consumed exactly


def test_string_encoding_spec_example():
    # spec: "foo" -> 06 66 6f 6f
    out = bytearray()
    A.write_string(out, "foo")
    assert bytes(out) == b"\x06foo"


# ------------------------------------------------------------- schema bridge


FULL_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("name", T.StringType(), True),
        T.StructField("flag", T.BooleanType(), True),
        T.StructField("score", T.DoubleType(), True),
        T.StructField("f32", T.FloatType(), True),
        T.StructField("raw", T.BinaryType(), True),
        T.StructField("d", T.DateType(), True),
        T.StructField("ts", T.TimestampNTZType(), True),
        T.StructField("dec", T.DecimalType(12, 2), True),
        T.StructField("arr", T.ArrayType(T.LongType(), True), True),
        T.StructField("m", T.MapType(T.StringType(), T.StringType(), True), True),
        T.StructField(
            "nested",
            T.StructType([T.StructField("a", T.IntegerType(), True)]),
            True,
        ),
    ]
)


def test_schema_bridge_roundtrips():
    assert A.avro_to_spark(A.spark_to_avro(FULL_SCHEMA)) == FULL_SCHEMA


def test_schema_bridge_rejects_non_string_map_keys():
    bad = T.StructType(
        [T.StructField("m", T.MapType(T.LongType(), T.StringType()), True)]
    )
    with pytest.raises(NotImplementedError, match="string keys"):
        A.spark_to_avro(bad)


# ------------------------------------------------------------ container file


ROWS = [
    (
        1, "hello", True, 3.5, 1.25, b"\x00\x01", dt.date(2024, 1, 2),
        dt.datetime(2024, 1, 2, 3, 4, 5, 123456), decimal.Decimal("1234.56"),
        [1, 2, None], {"k": "v", "x": None}, (7,),
    ),
    (2, None, None, None, None, None, None, None, None, [], {}, None),
    (
        -5, "", False, -1e300, 0.0, b"", dt.date(1969, 12, 31),
        dt.datetime(1969, 12, 31, 23, 59, 59), decimal.Decimal("-0.01"),
        None, None, (None,),
    ),
]


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_container_roundtrip(tmp_path, codec):
    av = A.spark_to_avro(FULL_SCHEMA)
    p = str(tmp_path / "t.avro")
    assert A.write_container(p, av, ROWS, codec=codec) == len(ROWS)
    assert A.avro_to_spark(A.read_container_schema(p)) == FULL_SCHEMA
    back = list(A.read_container(p))
    assert len(back) == len(ROWS)
    for orig, got in zip(ROWS, back):
        for i, (o, g) in enumerate(zip(orig, got)):
            if isinstance(o, float):
                assert o == pytest.approx(g), (i, o, g)
            else:
                assert o == g, (i, o, g)


def test_container_multi_block(tmp_path):
    schema = T.StructType([T.StructField("v", T.LongType(), False)])
    av = A.spark_to_avro(schema)
    p = str(tmp_path / "big.avro")
    n = A._BLOCK_ROWS * 2 + 17  # forces 3 blocks
    A.write_container(p, av, ((i,) for i in range(n)))
    assert [r[0] for r in A.read_container(p)] == list(range(n))


def test_bad_magic_rejected(tmp_path):
    p = tmp_path / "bad.avro"
    p.write_bytes(b"NOPE" + b"\x00" * 32)
    with pytest.raises(ValueError, match="magic"):
        list(A.read_container(str(p)))


def test_enum_and_fixed_decode():
    # foreign-file features with no Spark write-side type: decode-only
    enum_sch = {"type": "enum", "name": "e", "symbols": ["A", "B", "C"]}
    out = bytearray()
    A.write_long(out, 2)
    assert A.make_decoder(enum_sch)(A.Bin(bytes(out))) == "C"
    fixed_sch = {"type": "fixed", "name": "f", "size": 3}
    assert A.make_decoder(fixed_sch)(A.Bin(b"abc")) == b"abc"


# -------------------------------------------------------------- spark e2e


def test_pyavro_datasource_roundtrip(spark, sf_dir, tmp_path):
    A.register(spark)
    df = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate")
    )
    path = str(tmp_path / "orders_avro")
    df.repartition(3).write.format("pyavro").mode("overwrite").save(path)
    parts = [f for f in os.listdir(path) if f.endswith(".avro")]
    assert len(parts) == 3  # one container file per partition
    back = spark.read.format("pyavro").load(path)
    assert back.schema == df.schema
    a = sorted(map(tuple, df.collect()))
    b = sorted(map(tuple, back.collect()))
    assert a == b


def test_pyavro_overwrite_replaces(spark, tmp_path):
    A.register(spark)
    path = str(tmp_path / "ow")
    one = spark.range(5).select(F.col("id"))
    two = spark.range(3).select(F.col("id"))
    one.coalesce(1).write.format("pyavro").mode("overwrite").save(path)
    two.coalesce(1).write.format("pyavro").mode("overwrite").save(path)
    assert spark.read.format("pyavro").load(path).count() == 2 + 1
