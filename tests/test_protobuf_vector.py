"""Vectorized protobuf wire codec (formats/protobuf_vector.py) vs row codec.

The vector encode must be BYTE-IDENTICAL to the spec-exact row encoder
(fields in tag order, proto3 absent-field omission) and the vector decode
must agree with the row decoder on adversarial inputs — including messages
the vector encoder did not write (unknown fields, out-of-order tags,
duplicate tags)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from apache_flink_spark.formats import protobuf_format as P
from apache_flink_spark.formats import protobuf_vector as PV
from pyspark.sql.pandas.types import to_arrow_type

DESC = {
    "name": "Order",
    "fields": {
        1: ("okey", "int64"),
        2: ("status", "string"),
        3: (
            "money",
            {
                "name": "Money",
                "fields": {1: ("price", "double"), 2: ("cur", "string")},
            },
        ),
        4: ("neg", "sint64"),
        5: ("flag", "bool"),
        6: ("f32", "float"),
        7: ("fx", "fixed64"),
        8: ("raw", "bytes"),
    },
}


def _rows(n=5000, seed=5):
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        r = {}
        if rng.random() > 0.1:
            r["okey"] = int(rng.integers(-(2**40), 2**40))
        if rng.random() > 0.1:
            r["status"] = "st_%d" % (i % 7) + ("é☃" if i % 11 == 0 else "")
        if rng.random() > 0.2:
            m = {}
            if rng.random() > 0.1:
                m["price"] = float(rng.normal() * 100)
            if rng.random() > 0.3:
                m["cur"] = "USD"
            r["money"] = m
        if rng.random() > 0.5:
            r["neg"] = int(rng.integers(-(10**6), 10**6))
        if rng.random() > 0.5:
            r["flag"] = bool(rng.random() < 0.5)
        if rng.random() > 0.5:
            r["f32"] = float(np.float32(rng.normal()))
        if rng.random() > 0.5:
            r["fx"] = int(rng.integers(0, 2**50))
        if rng.random() > 0.6:
            r["raw"] = bytes(rng.integers(0, 256, int(rng.integers(0, 9)), dtype=np.uint8))
        rows.append(r)
    return rows


def _struct_array(rows):
    at = to_arrow_type(P.descriptor_schema(DESC))
    full = [
        {
            "okey": r.get("okey"),
            "status": r.get("status"),
            "money": (
                {
                    "price": r["money"].get("price"),
                    "cur": r["money"].get("cur"),
                }
                if "money" in r
                else None
            ),
            "neg": r.get("neg"),
            "flag": r.get("flag"),
            "f32": r.get("f32"),
            "fx": r.get("fx"),
            "raw": r.get("raw"),
        }
        for r in rows
    ]
    return pa.array(full, type=at)


def test_encode_byte_identical():
    rows = _rows()
    wire_row = [P.encode_message(DESC, r) for r in rows]
    wire_vec = PV.encode_column(_struct_array(rows), DESC).to_pylist()
    assert wire_row == wire_vec


def test_decode_matches_row_codec():
    rows = _rows(seed=9)
    wire = [P.encode_message(DESC, r) for r in rows]
    col = pa.array(wire, type=pa.large_binary())
    dec_vec = PV.decode_column(col, DESC).to_pylist()
    for got, b in zip(dec_vec, wire):
        want = P.decode_message(DESC, b)
        for k, v in want.items():
            g = got[k]
            if isinstance(v, dict) and g is not None:
                g = dict(g)
            if isinstance(v, float) and v == v and g is not None:
                assert abs(v - g) < 1e-6 or v == g, (k, v, g)
            else:
                assert g == v, (k, v, g)


def test_decode_foreign_bytes():
    """Unknown fields, duplicate tags (last wins), out-of-order tags."""
    # field 99 unknown (varint), okey twice, status after money
    msg = bytearray()
    P._write_varint(msg, 99 << 3 | 0)
    P._write_varint(msg, 12345)
    P._write_varint(msg, 1 << 3 | 0)
    P._write_varint(msg, 7)
    inner = bytearray()
    P._write_varint(inner, 1 << 3 | 1)
    import struct

    inner += struct.pack("<d", 2.5)
    P._write_varint(msg, 3 << 3 | 2)
    P._write_varint(msg, len(inner))
    msg += inner
    P._write_varint(msg, 2 << 3 | 2)
    P._write_varint(msg, 2)
    msg += b"OK"
    P._write_varint(msg, 1 << 3 | 0)
    P._write_varint(msg, 42)  # duplicate okey: last one wins
    col = pa.array([bytes(msg)], type=pa.large_binary())
    got = PV.decode_column(col, DESC).to_pylist()[0]
    want = P.decode_message(DESC, bytes(msg))
    assert got["okey"] == want["okey"] == 42
    assert got["status"] == "OK"
    assert dict(got["money"]) == {"price": 2.5, "cur": None}


def test_vector_ok_boundaries():
    # repeated SCALARS are vectorized (r5); repeated MESSAGES are not
    assert PV.vector_ok(
        {"name": "R", "fields": {1: ("xs", "repeated int64")}}
    )
    assert not PV.vector_ok(
        {
            "name": "R",
            "fields": {
                1: ("ms", "repeated", {"name": "M", "fields": {1: ("x", "int64")}})
            },
        }
    )
    assert PV.vector_ok(DESC)


REP_DESC = {
    "name": "R",
    "fields": {
        1: ("xs", "repeated int64"),
        2: ("name", "string"),
        3: ("fs", "repeated float"),
        4: ("ss", "repeated string"),
        5: ("zz", "repeated sint64"),
    },
}


def _rep_rows(n=1500, seed=7):
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        r = {}
        if rng.random() > 0.2:
            r["xs"] = [int(x) for x in rng.integers(-(10**6), 10**6, rng.integers(0, 5))]
        if rng.random() > 0.3:
            r["name"] = "n%d" % i
        if rng.random() > 0.5:
            r["fs"] = [float(np.float32(x)) for x in rng.normal(size=rng.integers(0, 4))]
        if rng.random() > 0.5:
            r["ss"] = ["s%d" % j for j in range(rng.integers(0, 3))]
        if rng.random() > 0.5:
            r["zz"] = [int(x) for x in rng.integers(-100, 100, rng.integers(0, 3))]
        rows.append(r)
    return rows


def _rep_struct(rows):
    at = to_arrow_type(P.descriptor_schema(REP_DESC))
    return pa.array(
        [
            {k: r.get(k) for k in ("xs", "name", "fs", "ss", "zz")}
            for r in rows
        ],
        type=at,
    )


def test_repeated_encode_byte_identical():
    rows = _rep_rows()
    wire_row = [P.encode_message(REP_DESC, r) for r in rows]
    wire_vec = PV.encode_column(_rep_struct(rows), REP_DESC).to_pylist()
    assert wire_row == wire_vec


def test_repeated_decode_matches_row_codec():
    rows = _rep_rows(seed=13)
    wire = [P.encode_message(REP_DESC, r) for r in rows]
    got = PV.decode_column(
        pa.array(wire, type=pa.large_binary()), REP_DESC
    ).to_pylist()
    for g, b in zip(got, wire):
        w = P.decode_message(REP_DESC, b)
        for k in ("xs", "ss", "zz"):
            assert (g[k] or []) == (w[k] or [])
        fw, fg = w["fs"] or [], g["fs"] or []
        assert len(fw) == len(fg)
        assert all(abs(x - y) < 1e-6 for x, y in zip(fw, fg))


def test_repeated_packed_foreign_decode():
    """PACKED runs (LEN wire type for scalar fields — what protoc emits by
    default) decode identically to the row codec even though the engine
    writes unpacked."""
    import struct

    msg = bytearray()
    P._write_varint(msg, 1 << 3 | 2)
    inner = bytearray()
    for v in (5, 300, 2**40):
        P._write_varint(inner, v)
    P._write_varint(msg, len(inner))
    msg += inner
    P._write_varint(msg, 3 << 3 | 2)
    fl = struct.pack("<3f", 1.5, -2.25, 9.0)
    P._write_varint(msg, len(fl))
    msg += fl
    got = PV.decode_column(
        pa.array([bytes(msg)], type=pa.large_binary()), REP_DESC
    ).to_pylist()[0]
    want = P.decode_message(REP_DESC, bytes(msg))
    assert got["xs"] == want["xs"] == [5, 300, 2**40]
    assert [round(x, 4) for x in got["fs"]] == [1.5, -2.25, 9.0]


def test_empty_and_null_messages():
    col = pa.array([b"", None, b""], type=pa.large_binary())
    out = PV.decode_column(col, DESC)
    lst = out.to_pylist()
    assert lst[1] is None
    assert lst[0]["okey"] is None and lst[2]["status"] is None
    # empty encode side: all-null struct rows -> empty messages
    sa = _struct_array([{}, {}])
    wire = PV.encode_column(sa, DESC).to_pylist()
    assert wire == [b"", b""]
