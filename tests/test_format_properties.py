"""Property tests: random schemas/values round-trip through the avro and
protobuf codecs (hypothesis-driven, no Spark session needed).

The unit tests pin spec vectors; these fuzz the schema space — nullable
unions, nesting, arrays/maps, every scalar — so a codec bug off the happy
path (sign handling, length prefixes, block boundaries) falls out here.
"""

from __future__ import annotations

import datetime as dt
import math

from hypothesis import given, settings
from hypothesis import strategies as st

from apache_flink_spark.formats import avro_format as A
from apache_flink_spark.formats import protobuf_format as P

# ------------------------------------------------------------------- avro


_AVRO_SCALARS = {
    "boolean": st.booleans(),
    "int": st.integers(-(2**31), 2**31 - 1),
    "long": st.integers(-(2**63), 2**63 - 1),
    "float": st.floats(width=32, allow_nan=False),
    "double": st.floats(allow_nan=False),
    "string": st.text(max_size=40),
    "bytes": st.binary(max_size=40),
}


@st.composite
def avro_schema_and_value(draw, depth=2):
    """A random (schema, matching value) pair."""
    kinds = list(_AVRO_SCALARS) + (
        ["array", "map", "record", "nullable"] if depth > 0 else []
    )
    kind = draw(st.sampled_from(kinds))
    if kind in _AVRO_SCALARS:
        return kind, draw(_AVRO_SCALARS[kind])
    if kind == "nullable":
        inner_s, inner_v = draw(avro_schema_and_value(depth=depth - 1))
        if isinstance(inner_s, list):  # no union-in-union
            return inner_s, inner_v
        v = draw(st.one_of(st.none(), st.just(inner_v)))
        return ["null", inner_s], v
    if kind == "array":
        item_s, item_v = draw(avro_schema_and_value(depth=depth - 1))
        n = draw(st.integers(0, 5))
        return {"type": "array", "items": item_s}, [item_v] * n
    if kind == "map":
        val_s, val_v = draw(avro_schema_and_value(depth=depth - 1))
        keys = draw(st.lists(st.text(max_size=8), max_size=4, unique=True))
        return {"type": "map", "values": val_s}, {k: val_v for k in keys}
    # record
    n_fields = draw(st.integers(1, 4))
    fields, values = [], []
    for i in range(n_fields):
        f_s, f_v = draw(avro_schema_and_value(depth=depth - 1))
        fields.append({"name": f"f{i}", "type": f_s})
        values.append(f_v)
    return (
        {"type": "record", "name": f"r{depth}", "fields": fields},
        tuple(values),
    )


def _approx_eq(a, b):
    if isinstance(a, float) and isinstance(b, float):
        return a == b or math.isclose(a, b, rel_tol=1e-6, abs_tol=1e-30)
    if isinstance(a, (list, tuple)) and isinstance(b, (list, tuple)):
        return len(a) == len(b) and all(_approx_eq(x, y) for x, y in zip(a, b))
    if isinstance(a, dict) and isinstance(b, dict):
        return a.keys() == b.keys() and all(
            _approx_eq(a[k], b[k]) for k in a
        )
    return a == b


@given(avro_schema_and_value())
@settings(max_examples=300, deadline=None)
def test_avro_encoder_decoder_roundtrip(sv):
    schema, value = sv
    out = bytearray()
    A.make_encoder(schema)(value, out)
    r = A.Bin(bytes(out))
    got = A.make_decoder(schema)(r)
    assert r.pos == len(out), "decoder must consume exactly what was written"
    assert _approx_eq(got, value), (schema, value, got)


@given(
    st.lists(
        st.tuples(
            st.integers(-(2**63), 2**63 - 1),
            st.one_of(st.none(), st.text(max_size=20)),
            st.dates(dt.date(1, 1, 1), dt.date(9999, 12, 31)),
        ),
        max_size=50,
    ),
    st.sampled_from(["null", "deflate"]),
)
@settings(max_examples=60, deadline=None)
def test_avro_container_roundtrip_random_rows(rows, codec):
    import os
    import tempfile

    schema = {
        "type": "record",
        "name": "r",
        "fields": [
            {"name": "a", "type": "long"},
            {"name": "b", "type": ["null", "string"]},
            {"name": "c", "type": {"type": "int", "logicalType": "date"}},
        ],
    }
    fd, p = tempfile.mkstemp(suffix=".avro")
    os.close(fd)
    try:
        assert A.write_container(p, schema, rows, codec=codec) == len(rows)
        assert list(A.read_container(p)) == [tuple(r) for r in rows]
    finally:
        os.unlink(p)


# ---------------------------------------------------------------- protobuf


_PB_SCALARS = {
    "int32": st.integers(-(2**31), 2**31 - 1),
    "int64": st.integers(-(2**63), 2**63 - 1),
    "uint64": st.integers(0, 2**64 - 1),
    "sint32": st.integers(-(2**31), 2**31 - 1),
    "sint64": st.integers(-(2**63), 2**63 - 1),
    "bool": st.booleans(),
    "double": st.floats(allow_nan=False),
    "float": st.floats(width=32, allow_nan=False),
    "fixed32": st.integers(0, 2**32 - 1),
    "sfixed32": st.integers(-(2**31), 2**31 - 1),
    "fixed64": st.integers(0, 2**64 - 1),
    "sfixed64": st.integers(-(2**63), 2**63 - 1),
    "string": st.text(max_size=30),
    "bytes": st.binary(max_size=30),
}


@st.composite
def pb_descriptor_and_value(draw, depth=1):
    n_fields = draw(st.integers(1, 5))
    nums = draw(
        st.lists(
            st.integers(1, 200), min_size=n_fields, max_size=n_fields,
            unique=True,
        )
    )
    fields, value = {}, {}
    for i, num in enumerate(nums):
        name = f"f{i}"
        choice = draw(
            st.sampled_from(
                list(_PB_SCALARS)
                + (["message", "repeated_msg"] if depth > 0 else [])
                + ["repeated_scalar", "absent"]
            )
        )
        if choice == "message":
            sub_d, sub_v = draw(pb_descriptor_and_value(depth=depth - 1))
            fields[num] = (name, sub_d)
            value[name] = sub_v
        elif choice == "repeated_msg":
            sub_d, sub_v = draw(pb_descriptor_and_value(depth=depth - 1))
            fields[num] = (name, "repeated", sub_d)
            value[name] = [sub_v] * draw(st.integers(0, 3))
        elif choice == "repeated_scalar":
            base = draw(st.sampled_from(list(_PB_SCALARS)))
            fields[num] = (name, f"repeated {base}")
            value[name] = draw(st.lists(_PB_SCALARS[base], max_size=4))
        elif choice == "absent":
            base = draw(st.sampled_from(list(_PB_SCALARS)))
            fields[num] = (name, base)
            value[name] = None
        else:
            fields[num] = (name, choice)
            value[name] = draw(_PB_SCALARS[choice])
    return {"name": f"M{depth}", "fields": fields}, value


def _pb_normalize(desc, v):
    """Expected decode image of an encoded value: absent scalars -> None,
    absent repeated -> [], floats pass through struct f32."""
    import struct as _s

    out = {}
    for num, spec in desc["fields"].items():
        name, base, repeated, nested = P._parse_field_full(spec)
        val = v.get(name)
        if repeated:
            items = val or []
            if base == "message":
                out[name] = [_pb_normalize(nested, x) for x in items]
            elif base == "float":
                out[name] = [_s.unpack("<f", _s.pack("<f", x))[0] for x in items]
            else:
                out[name] = list(items)
        elif base == "message":
            out[name] = _pb_normalize(nested, val) if val is not None else None
        elif base == "float" and val is not None:
            out[name] = _s.unpack("<f", _s.pack("<f", val))[0]
        else:
            out[name] = val
    return out


@given(pb_descriptor_and_value())
@settings(max_examples=300, deadline=None)
def test_protobuf_roundtrip_random_descriptors(dv):
    desc, value = dv
    wire = P.encode_message(desc, {k: v for k, v in value.items() if v is not None})
    got = P.decode_message(desc, wire)
    assert got == _pb_normalize(desc, value), (desc, value, wire.hex(), got)
