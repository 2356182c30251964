"""Protobuf wire-format codec, pure Python, as Arrow-batched column codecs.

Reference parity: flink-formats/flink-protobuf (PbFormatFactory /
PbRowDataDeserializationSchema) decodes protobuf-encoded binary payloads
into rows given a compiled message descriptor. Spark's twin
(``from_protobuf`` in the spark-protobuf jar) is absent here, so this
module implements the public protobuf encoding spec directly — varints,
zigzag sints, little-endian fixed32/64, length-delimited strings/bytes/
messages, packed and unpacked repeated fields, unknown-field skipping —
and exposes it as pandas-UDF column transforms:

    from_protobuf_py(df, "payload", DESCRIPTOR)   # binary -> struct
    to_protobuf_py(df, "payload", DESCRIPTOR)     # struct -> binary

Descriptors are plain dicts (the information content of a .proto message,
no protoc needed):

    ORDER = {
        "name": "Order",
        "fields": {
            1: ("order_key", "int64"),
            2: ("status", "string"),
            3: ("price", "double"),
            4: ("tags", "repeated string"),
            5: ("line", {"name": "Line", "fields": {...}}),  # nested message
        },
    }

Scale story: encoding/decoding run inside ``mapInPandas``-style pandas
UDFs — Arrow-batched, executor-parallel, payload bytes never touch the
driver. The per-row Python cost is the same order as the reference's
per-record ``PbCodegenDeserializer`` without codegen; for the 100 TB hot
path parquet remains the storage format and protobuf exists for wire
interchange at the edges, exactly as in the reference.
"""

from __future__ import annotations

import struct

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_WT_VARINT, _WT_FIXED64, _WT_LEN, _WT_FIXED32 = 0, 1, 2, 5

_SCALAR_WIRETYPE = {
    "int32": _WT_VARINT,
    "int64": _WT_VARINT,
    "uint32": _WT_VARINT,
    "uint64": _WT_VARINT,
    "sint32": _WT_VARINT,
    "sint64": _WT_VARINT,
    "bool": _WT_VARINT,
    "enum": _WT_VARINT,
    "fixed64": _WT_FIXED64,
    "sfixed64": _WT_FIXED64,
    "double": _WT_FIXED64,
    "fixed32": _WT_FIXED32,
    "sfixed32": _WT_FIXED32,
    "float": _WT_FIXED32,
    "string": _WT_LEN,
    "bytes": _WT_LEN,
}

_SPARK_TYPE = {
    "int32": T.IntegerType(),
    "sint32": T.IntegerType(),
    "sfixed32": T.IntegerType(),
    "uint32": T.LongType(),
    "fixed32": T.LongType(),
    "int64": T.LongType(),
    "sint64": T.LongType(),
    "sfixed64": T.LongType(),
    "uint64": T.LongType(),  # caveat: >2^63-1 wraps (same as spark-protobuf)
    "fixed64": T.LongType(),
    "bool": T.BooleanType(),
    "enum": T.IntegerType(),
    "double": T.DoubleType(),
    "float": T.FloatType(),
    "string": T.StringType(),
    "bytes": T.BinaryType(),
}


# ---------------------------------------------------------------- primitives


def _write_varint(out: bytearray, n: int) -> None:
    n &= 0xFFFFFFFFFFFFFFFF  # two's-complement 64-bit, spec-exact
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    shift = acc = 0
    while True:
        b = buf[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            return acc, pos
        shift += 7


def _to_signed64(n: int) -> int:
    return n - (1 << 64) if n >= (1 << 63) else n


def _to_signed32(n: int) -> int:
    n &= 0xFFFFFFFF
    return n - (1 << 32) if n >= (1 << 31) else n


def _zigzag_enc(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _zigzag_dec(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


# ----------------------------------------------------------- field metadata


def _parse_field(spec):
    """('name', 'repeated? type') or ('name', {...nested...}) ->
    (name, base_type, repeated, nested_desc)."""
    name, ftype = spec
    if isinstance(ftype, dict):
        return name, "message", False, ftype
    parts = ftype.split()
    repeated = parts[0] == "repeated"
    base = parts[-1]
    if isinstance(base, str) and base not in _SCALAR_WIRETYPE:
        raise NotImplementedError(f"protobuf type {base!r} (field {name})")
    return name, base, repeated, None


def _parse_field_full(spec):
    """Like _parse_field but also allows ('name', 'repeated', {...})
    3-tuples for repeated nested messages."""
    if len(spec) == 3:
        name, label, nested = spec
        if label != "repeated" or not isinstance(nested, dict):
            raise ValueError(f"bad field spec {spec}")
        return name, "message", True, nested
    return _parse_field(spec)


def descriptor_schema(desc: dict) -> T.StructType:
    """Spark StructType for a message descriptor (all fields nullable —
    proto3 fields are optional on the wire)."""
    fields = []
    for _num, spec in sorted(desc["fields"].items()):
        name, base, repeated, nested = _parse_field_full(spec)
        inner = descriptor_schema(nested) if base == "message" else _SPARK_TYPE[base]
        fields.append(
            T.StructField(
                name, T.ArrayType(inner, False) if repeated else inner, True
            )
        )
    return T.StructType(fields)


# ------------------------------------------------------------------- encode


def _compiled(desc: dict) -> list[tuple]:
    """Field metadata parsed ONCE per descriptor (cached in the dict itself
    under a reserved key — descriptors are plain dicts, so self-caching
    avoids re-parsing per row in the UDF hot loop)."""
    cached = desc.get("__compiled__")
    if cached is None:
        cached = [
            (num, *_parse_field_full(spec))
            for num, spec in sorted(desc["fields"].items())
        ]
        desc["__compiled__"] = cached
    return cached


def encode_message(desc: dict, value: dict) -> bytes:
    out = bytearray()
    _encode_into(desc, value, out)
    return bytes(out)


def _encode_into(desc: dict, value: dict, out: bytearray) -> None:
    for num, name, base, repeated, nested in _compiled(desc):
        v = value.get(name)
        if v is None:
            continue  # absent field: nothing on the wire (proto3 semantics)
        items = v if repeated else [v]
        for item in items:
            if base == "message":
                inner = bytearray()
                _encode_into(nested, item, inner)
                _write_varint(out, num << 3 | _WT_LEN)
                _write_varint(out, len(inner))
                out += inner
                continue
            wt = _SCALAR_WIRETYPE[base]
            _write_varint(out, num << 3 | wt)
            if base in ("int32", "int64", "uint32", "uint64", "enum"):
                _write_varint(out, int(item))
            elif base in ("sint32", "sint64"):
                _write_varint(out, _zigzag_enc(int(item)))
            elif base == "bool":
                _write_varint(out, 1 if item else 0)
            elif base == "double":
                out += struct.pack("<d", item)
            elif base == "float":
                out += struct.pack("<f", item)
            elif base in ("fixed64", "sfixed64"):
                out += struct.pack("<q" if base == "sfixed64" else "<Q",
                                   int(item) & 0xFFFFFFFFFFFFFFFF
                                   if base == "fixed64" else int(item))
            elif base in ("fixed32", "sfixed32"):
                out += struct.pack("<i" if base == "sfixed32" else "<I",
                                   int(item) & 0xFFFFFFFF
                                   if base == "fixed32" else int(item))
            elif base == "string":
                b = item.encode("utf-8")
                _write_varint(out, len(b))
                out += b
            elif base == "bytes":
                b = bytes(item)
                _write_varint(out, len(b))
                out += b


# ------------------------------------------------------------------- decode


def _decode_scalar(base: str, wt: int, buf: bytes, pos: int):
    if wt == _WT_VARINT:
        raw, pos = _read_varint(buf, pos)
        if base in ("sint32", "sint64"):
            return _zigzag_dec(raw), pos
        if base == "bool":
            return bool(raw), pos
        if base in ("int32", "int64"):
            return _to_signed64(raw), pos
        return raw, pos  # uint*/enum
    if wt == _WT_FIXED64:
        fmt = "<q" if base == "sfixed64" else ("<d" if base == "double" else "<Q")
        return struct.unpack_from(fmt, buf, pos)[0], pos + 8
    if wt == _WT_FIXED32:
        fmt = "<i" if base == "sfixed32" else ("<f" if base == "float" else "<I")
        return struct.unpack_from(fmt, buf, pos)[0], pos + 4
    raise ValueError(f"wire type {wt} is not scalar for {base}")


def _skip(wt: int, buf: bytes, pos: int) -> int:
    if wt == _WT_VARINT:
        _, pos = _read_varint(buf, pos)
        return pos
    if wt == _WT_FIXED64:
        return pos + 8
    if wt == _WT_LEN:
        n, pos = _read_varint(buf, pos)
        return pos + n
    if wt == _WT_FIXED32:
        return pos + 4
    raise ValueError(f"cannot skip unknown wire type {wt}")


def decode_message(desc: dict, buf: bytes) -> dict:
    fields = desc.get("__field_index__")
    if fields is None:
        fields = {
            num: (name, base, repeated, nested)
            for num, name, base, repeated, nested in _compiled(desc)
        }
        desc["__field_index__"] = fields
    out: dict = {}
    for num, (name, _b, repeated, _n) in fields.items():
        if repeated:
            out[name] = []
        else:
            out[name] = None
    pos = 0
    n = len(buf)
    while pos < n:
        tag, pos = _read_varint(buf, pos)
        num, wt = tag >> 3, tag & 7
        meta = fields.get(num)
        if meta is None:
            pos = _skip(wt, buf, pos)  # unknown field: spec-mandated skip
            continue
        name, base, repeated, nested = meta
        if base == "message":
            ln, pos = _read_varint(buf, pos)
            item = decode_message(nested, buf[pos : pos + ln])
            pos += ln
        elif wt == _WT_LEN and base in ("string", "bytes"):
            ln, pos = _read_varint(buf, pos)
            raw = buf[pos : pos + ln]
            pos += ln
            item = raw.decode("utf-8") if base == "string" else bytes(raw)
        elif wt == _WT_LEN:
            # packed repeated scalars: one length-delimited run of values
            ln, pos = _read_varint(buf, pos)
            end = pos + ln
            swt = _SCALAR_WIRETYPE[base]
            while pos < end:
                item, pos = _decode_scalar(base, swt, buf, pos)
                out[name].append(item)
            continue
        else:
            item, pos = _decode_scalar(base, wt, buf, pos)
        if repeated:
            out[name].append(item)
        else:
            out[name] = item  # last one wins, per spec
    return out


# ------------------------------------------------------------ spark surface


def _present(v) -> bool:
    # None or float NaN (pandas' null for numeric columns) means absent
    if v is None:
        return False
    if isinstance(v, float) and v != v:
        return False
    return True


def _clean_record(rec: dict) -> dict:
    return {k: v for k, v in rec.items() if _present(v)}


def to_protobuf_py(df: DataFrame, struct_col: str, desc: dict):
    """Struct column -> protobuf-encoded binary column (same name).
    Arrow-batched; runs on executors. (Struct-typed pandas-UDF input
    arrives as a pandas DataFrame, one column per struct field.)"""

    @F.pandas_udf(T.BinaryType())
    def enc(s: pd.DataFrame) -> pd.Series:
        recs = s.to_dict("records")
        return pd.Series(
            [encode_message(desc, _clean_record(r)) for r in recs]
        )

    return df.withColumn(struct_col, enc(F.col(struct_col)))


def from_protobuf_py(df: DataFrame, bin_col: str, desc: dict):
    """Protobuf binary column -> struct column (same name), schema derived
    from the descriptor. Arrow-batched; runs on executors."""
    schema = descriptor_schema(desc)
    names = [f.name for f in schema.fields]

    @F.pandas_udf(schema)
    def dec(s: pd.Series) -> pd.DataFrame:
        rows = [decode_message(desc, bytes(b)) for b in s]
        return pd.DataFrame(
            {name: [r.get(name) for r in rows] for name in names}
        )

    return df.withColumn(bin_col, dec(F.col(bin_col)))


def _replaced_schema(df: DataFrame, col: str, dtype: T.DataType) -> T.StructType:
    return T.StructType(
        [
            T.StructField(col, dtype, True) if f.name == col else f
            for f in df.schema.fields
        ]
    )


def to_protobuf_arrow(df: DataFrame, struct_col: str, desc: dict):
    """Struct column -> protobuf binary column through the VECTORIZED wire
    codec (formats/protobuf_vector.py): mapInArrow hands whole RecordBatches
    so no per-row Python objects exist on either side. Falls back to the
    pandas-UDF row lane only for descriptors with repeated NESTED
    MESSAGES (repeated scalars/strings are vectorized)."""
    from apache_flink_spark.formats import protobuf_vector as PVec

    if not PVec.vector_ok(desc):
        return to_protobuf_py(df, struct_col, desc)
    out_schema = _replaced_schema(df, struct_col, T.BinaryType())
    idx = df.columns.index(struct_col)
    sjson = out_schema.json()
    dcopy = {k: v for k, v in desc.items() if not k.startswith("__")}

    def conv(batches):
        import json as _json

        import pyarrow as pa
        import pyarrow.compute as pa_pc
        from pyspark.sql.pandas.types import to_arrow_schema

        from apache_flink_spark.formats import protobuf_vector as PV

        arrow_schema = to_arrow_schema(T.StructType.fromJson(_json.loads(sjson)))
        for b in batches:
            cols = list(b.columns)
            cols[idx] = pa_pc.cast(
                PV.encode_column(cols[idx], dcopy), arrow_schema.field(idx).type
            )
            yield pa.RecordBatch.from_arrays(cols, schema=arrow_schema)

    return df.mapInArrow(conv, out_schema)


def from_protobuf_arrow(df: DataFrame, bin_col: str, desc: dict):
    """Protobuf binary column -> struct column through the VECTORIZED wire
    codec; same fallback rule as :func:`to_protobuf_arrow`."""
    from apache_flink_spark.formats import protobuf_vector as PVec

    if not PVec.vector_ok(desc):
        return from_protobuf_py(df, bin_col, desc)
    out_schema = _replaced_schema(df, bin_col, descriptor_schema(desc))
    idx = df.columns.index(bin_col)
    sjson = out_schema.json()
    dcopy = {k: v for k, v in desc.items() if not k.startswith("__")}

    def conv(batches):
        import json as _json

        import pyarrow as pa
        import pyarrow.compute as pa_pc
        from pyspark.sql.pandas.types import to_arrow_schema

        from apache_flink_spark.formats import protobuf_vector as PV

        arrow_schema = to_arrow_schema(T.StructType.fromJson(_json.loads(sjson)))
        for b in batches:
            cols = list(b.columns)
            cols[idx] = pa_pc.cast(
                PV.decode_column(cols[idx], dcopy), arrow_schema.field(idx).type
            )
            yield pa.RecordBatch.from_arrays(cols, schema=arrow_schema)

    return df.mapInArrow(conv, out_schema)
