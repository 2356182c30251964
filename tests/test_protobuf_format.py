"""Pure-Python protobuf wire-format codec tests.

Known-bytes vectors come from the public protobuf encoding documentation
(the Test1/Test2/Test3 examples and the packed-repeated example).
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql import types as T

from apache_flink_spark.formats import protobuf_format as P

T1 = {"name": "Test1", "fields": {1: ("a", "int32")}}
T2 = {"name": "Test2", "fields": {2: ("b", "string")}}


def test_spec_known_bytes():
    assert P.encode_message(T1, {"a": 150}) == b"\x08\x96\x01"
    assert P.encode_message(T2, {"b": "testing"}) == bytes.fromhex(
        "120774657374696e67"
    )
    t3 = {"name": "Test3", "fields": {3: ("c", T1)}}
    assert P.encode_message(t3, {"c": {"a": 150}}) == bytes.fromhex("1a03089601")
    assert P.decode_message(t3, bytes.fromhex("1a03089601")) == {"c": {"a": 150}}


def test_packed_repeated_decode():
    # docs example: repeated int32 f = 4 with [3, 270, 86942]
    dp = {"name": "P", "fields": {4: ("f", "repeated int32")}}
    assert P.decode_message(dp, bytes.fromhex("2206038e029ea705")) == {
        "f": [3, 270, 86942]
    }


def test_unknown_fields_skipped():
    du = {"name": "U", "fields": {2: ("b", "string")}}
    mixed = (
        P.encode_message(T1, {"a": 150})  # field 1: unknown to du
        + P.encode_message(
            {"name": "X", "fields": {9: ("d", "double")}}, {"d": 1.0}
        )  # fixed64: unknown
        + P.encode_message(T2, {"b": "x"})
    )
    assert P.decode_message(du, mixed) == {"b": "x"}


def test_last_one_wins_for_scalars():
    two = P.encode_message(T1, {"a": 1}) + P.encode_message(T1, {"a": 2})
    assert P.decode_message(T1, two) == {"a": 2}


@given(st.integers(min_value=-(2**63), max_value=2**63 - 1))
@settings(max_examples=200, deadline=None)
def test_int64_roundtrip(v):
    d = {"name": "N", "fields": {1: ("v", "int64")}}
    assert P.decode_message(d, P.encode_message(d, {"v": v}))["v"] == v


@given(st.integers(min_value=-(2**63), max_value=2**63 - 1))
@settings(max_examples=200, deadline=None)
def test_sint64_roundtrip(v):
    d = {"name": "S", "fields": {1: ("v", "sint64")}}
    assert P.decode_message(d, P.encode_message(d, {"v": v}))["v"] == v
    assert P.encode_message(d, {"v": -1}) == b"\x08\x01"  # zigzag spot check


def test_fixed_and_float_types():
    d = {
        "name": "F",
        "fields": {
            1: ("d", "double"),
            2: ("f", "float"),
            3: ("x", "fixed32"),
            4: ("y", "sfixed64"),
            5: ("u", "uint64"),
            6: ("b", "bool"),
        },
    }
    v = {"d": -1.5, "f": 0.25, "x": 4000000000, "y": -12345,
         "u": 2**64 - 1, "b": True}
    assert P.decode_message(d, P.encode_message(d, v)) == v


def test_repeated_nested_message():
    line = {"name": "Line", "fields": {1: ("q", "int32")}}
    d = {"name": "Order", "fields": {1: ("lines", "repeated", line)}}
    v = {"lines": [{"q": 1}, {"q": 2}, {"q": 3}]}
    assert P.decode_message(d, P.encode_message(d, v)) == v


def test_descriptor_schema():
    line = {"name": "Line", "fields": {1: ("q", "int32")}}
    d = {
        "name": "M",
        "fields": {
            1: ("k", "int64"),
            2: ("s", "string"),
            3: ("tags", "repeated string"),
            4: ("line", line),
        },
    }
    sch = P.descriptor_schema(d)
    assert sch == T.StructType(
        [
            T.StructField("k", T.LongType(), True),
            T.StructField("s", T.StringType(), True),
            T.StructField("tags", T.ArrayType(T.StringType(), False), True),
            T.StructField(
                "line",
                T.StructType([T.StructField("q", T.IntegerType(), True)]),
                True,
            ),
        ]
    )


def test_unsupported_type_is_loud():
    with pytest.raises(NotImplementedError, match="map<"):
        P.descriptor_schema(
            {"name": "B", "fields": {1: ("m", "map<string,string>")}}
        )


def test_spark_column_roundtrip(spark):
    desc = {
        "name": "Item",
        "fields": {
            1: ("okey", "int64"),
            2: ("status", "string"),
            3: ("price", "double"),
            4: ("tags", "repeated string"),
            5: ("line", {"name": "Line",
                         "fields": {1: ("qty", "int32"), 2: ("note", "string")}}),
        },
    }
    df = spark.createDataFrame(
        [
            (1, (11, "O", 1.5, ["a", "b"], (3, "hi"))),
            (2, (22, None, None, [], None)),
        ],
        "id long, payload struct<okey:long, status:string, price:double,"
        " tags:array<string>, line:struct<qty:int,note:string>>",
    )
    wire = P.to_protobuf_py(df, "payload", desc)
    assert wire.schema["payload"].dataType == T.BinaryType()
    back = P.from_protobuf_py(wire, "payload", desc).orderBy("id").collect()
    assert back[0]["payload"]["okey"] == 11
    assert back[0]["payload"]["tags"] == ["a", "b"]
    assert back[0]["payload"]["line"]["qty"] == 3
    assert back[1]["payload"]["status"] is None
    assert back[1]["payload"]["line"] is None
