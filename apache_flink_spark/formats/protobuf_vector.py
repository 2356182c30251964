"""Vectorized (numpy/Arrow) protobuf wire codec for non-repeated messages.

Companion to protobuf_format.py (the spec-exact row codec, flink-protobuf
PbFormatFactory parity): encodes/decodes whole Arrow batches without a
per-row Python loop. Descriptors with repeated fields fall back to the row
codec (``vector_ok``).

ENCODE mirrors formats/avro_vector.py's segment scheme: each present field
contributes a constant tag-varint segment plus a value segment (zigzag/plain
varints in <=10 vectorized 7-bit-group passes, fixed32/64 slabs, Arrow
string buffers reused as-is); absent (null) fields contribute zero-length
segments (proto3: nothing on the wire). Nested messages encode depth-first —
the child's assembled per-row buffers become one length-delimited segment of
the parent. One gather-scatter interleaves all segments row-major, and the
per-row lengths become the offsets of the output LargeBinary column.

DECODE needs no boundary discovery (the binary column's offsets ARE the row
boundaries — unlike the avro block case): all rows parse in lockstep over
the concatenated buffer. Each step reads every active row's tag varint at
once, groups rows by tag value (a handful of groups: messages share field
order), and decodes/skips that field vectorized. "Last one wins" and
unknown-field skipping follow the spec. Nested message fields record their
(start, end) extents and recurse over those regions, building Arrow
StructArrays bottom-up.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from apache_flink_spark.formats.avro_vector import (
    _next_clear,
    _gather_segments,
    _varint_encode,
    _varint_at,
    _zigzag_dec as _zz_dec_arr,
)
from apache_flink_spark.formats.protobuf_format import (
    _SCALAR_WIRETYPE,
    _WT_FIXED32,
    _WT_FIXED64,
    _WT_LEN,
    _WT_VARINT,
    _compiled,
    descriptor_schema,
)

__all__ = ["vector_ok", "encode_column", "decode_column"]

_U = np.uint64


def vector_ok(desc: dict) -> bool:
    """True when every field (recursively) is non-repeated and of a
    supported base type — the vectorized lanes handle exactly these."""
    try:
        for _num, _name, base, repeated, nested in _compiled(desc):
            if repeated:
                return False
            if base == "message":
                if not vector_ok(nested):
                    return False
            elif base not in _SCALAR_WIRETYPE:
                return False
    except (NotImplementedError, ValueError):
        return False
    return True


# ---------------------------------------------------------------------------
# Encode
# ---------------------------------------------------------------------------


def _const_varint(n: int) -> np.ndarray:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return np.frombuffer(bytes(out), np.uint8)


def _zigzag_enc_arr(v: np.ndarray) -> np.ndarray:
    v = v.astype(np.int64, copy=False)
    return (np.left_shift(v, 1) ^ np.right_shift(v, 63)).view(_U)


def _int64_of(col: pa.Array) -> np.ndarray:
    if not pa.types.is_int64(col.type):
        col = pc.cast(col, pa.int64())
    return np.asarray(col.fill_null(0))


def _binary_parts(col: pa.Array):
    lb = pc.cast(col, pa.large_binary())
    lb = pc.fill_null(lb, b"")
    buffers = lb.buffers()
    offsets = np.frombuffer(buffers[1], np.int64, len(lb) + 1, lb.offset * 8)
    data = (
        np.frombuffer(buffers[2], np.uint8)
        if buffers[2] is not None
        else np.empty(0, np.uint8)
    )
    return offsets, data


def _masked_varint_segment(z: np.ndarray, valid: np.ndarray, n: int):
    buf, lens = _varint_encode(z[valid])
    full = np.zeros(n, np.int64)
    full[valid] = lens
    return buf, full


def _encode_segments(desc: dict, fields: dict, parent_valid: np.ndarray, n: int):
    """fields: name -> pa.Array. Returns (row-major buffer, per-row len)."""
    segments: list[tuple[np.ndarray, np.ndarray]] = []
    for num, name, base, _rep, nested in _compiled(desc):
        col = fields[name]
        valid = parent_valid & ~np.asarray(col.is_null())
        if not valid.any():
            continue
        wt = _WT_LEN if base == "message" else _SCALAR_WIRETYPE[base]
        tag = _const_varint(num << 3 | wt)
        tag_lens = np.where(valid, len(tag), 0).astype(np.int64)
        segments.append((np.tile(tag, int(valid.sum())), tag_lens))
        if base == "message":
            inner_fields = {
                f: col.field(i) for i, f in enumerate(
                    ft.name for ft in col.type
                )
            }
            ibuf, ilens = _encode_segments(nested, inner_fields, valid, n)
            lbuf, llens = _masked_varint_segment(ilens.view(_U), valid, n)
            segments.append((lbuf, llens))
            segments.append((ibuf, np.where(valid, ilens, 0)))
        elif base in ("int32", "int64", "uint32", "uint64", "enum", "bool"):
            v = _int64_of(col).view(_U)  # two's-complement varint
            if base == "bool":
                v = (v != 0).astype(_U)
            segments.append(_masked_varint_segment(v, valid, n))
        elif base in ("sint32", "sint64"):
            segments.append(
                _masked_varint_segment(_zigzag_enc_arr(_int64_of(col)), valid, n)
            )
        elif base in ("double", "float"):
            dt = "<f8" if base == "double" else "<f4"
            size = 8 if base == "double" else 4
            vals = np.asarray(col.fill_null(0.0), dtype=dt)[valid]
            segments.append(
                (
                    np.frombuffer(vals.tobytes(), np.uint8),
                    np.where(valid, size, 0).astype(np.int64),
                )
            )
        elif base in ("fixed64", "sfixed64", "fixed32", "sfixed32"):
            size = 8 if base.endswith("64") else 4
            dt = "<i8" if size == 8 else "<i4"
            vals = _int64_of(col)[valid].astype(dt)
            segments.append(
                (
                    np.frombuffer(vals.tobytes(), np.uint8),
                    np.where(valid, size, 0).astype(np.int64),
                )
            )
        elif base in ("string", "bytes"):
            offsets, data = _binary_parts(col)
            lens = np.diff(offsets)
            lens = np.where(valid, lens, 0)
            payload = _gather_segments(data, (offsets[:-1]).astype(np.int64), lens)
            segments.append(
                _masked_varint_segment(lens.view(_U), valid, n)
            )
            segments.append((payload, lens.astype(np.int64)))
        else:  # pragma: no cover - vector_ok filters these
            raise NotImplementedError(base)
    row_len = np.zeros(n, np.int64)
    for _, lens in segments:
        row_len += lens
    out = np.empty(int(row_len.sum()), np.uint8)
    run = np.cumsum(row_len) - row_len
    for buf, lens in segments:
        if len(buf):
            dst_starts = np.cumsum(lens) - lens
            idx = np.repeat(run - dst_starts, lens) + np.arange(len(buf))
            out[idx] = buf
        run = run + lens
    return out, row_len


def encode_column(struct_col: pa.Array, desc: dict) -> pa.Array:
    """StructArray -> LargeBinaryArray of per-row protobuf messages.
    Null struct rows encode as empty messages (parity with the row lane's
    empty dict)."""
    if isinstance(struct_col, pa.ChunkedArray):
        struct_col = struct_col.combine_chunks()
    n = len(struct_col)
    parent_valid = ~np.asarray(struct_col.is_null())
    fields = {
        f.name: struct_col.field(i) for i, f in enumerate(struct_col.type)
    }
    buf, row_len = _encode_segments(desc, fields, parent_valid, n)
    offsets = np.concatenate(([0], np.cumsum(row_len)))
    return pa.Array.from_buffers(
        pa.large_binary(),
        n,
        [None, pa.py_buffer(offsets.tobytes()), pa.py_buffer(buf.tobytes())],
    )


# ---------------------------------------------------------------------------
# Decode
# ---------------------------------------------------------------------------


def _to_arrow(base: str, raw: np.ndarray, valid: np.ndarray, nested_cols):
    mask = None if valid.all() else ~valid
    if base in ("int32", "int64"):
        return pa.array(raw.view(np.int64), mask=mask)
    if base in ("sint32", "sint64"):
        return pa.array(_zz_dec_arr(raw.view(_U)), mask=mask)
    if base in ("uint32", "uint64", "enum"):
        return pa.array(raw.view(np.int64), mask=mask)
    if base == "bool":
        return pa.array(raw != 0, mask=mask)
    if base == "double":
        return pa.array(raw.view(np.float64), mask=mask)
    if base == "float":
        return pa.array(
            raw.astype(np.uint32).view(np.float32), mask=mask
        )
    if base in ("fixed64", "sfixed64", "fixed32", "sfixed32"):
        return pa.array(raw.view(np.int64), mask=mask)
    raise NotImplementedError(base)  # pragma: no cover


def _decode_regions(desc: dict, arr: np.ndarray, nc, starts, ends):
    """Decode one message per (starts[i], ends[i]) region. Returns
    (dict name -> pa.Array, valid-region count stays len(starts))."""
    n = len(starts)
    meta = {num: (name, base, nested) for num, name, base, _r, nested in _compiled(desc)}
    # storage: raw uint64 slots + presence; strings/messages keep extents
    raw = {name: np.zeros(n, _U) for _, (name, b, _x) in meta.items() if b not in ("string", "bytes", "message")}
    ext = {
        name: (np.zeros(n, np.int64), np.zeros(n, np.int64))
        for _, (name, b, _x) in meta.items()
        if b in ("string", "bytes", "message")
    }
    present = {name: np.zeros(n, bool) for _, (name, _b, _x) in meta.items()}
    pos = starts.astype(np.int64).copy()
    endsl = ends.astype(np.int64)
    guard = 0
    while True:
        active = np.flatnonzero(pos < endsl)
        if not len(active):
            break
        guard += 1
        if guard > 10_000:
            raise ValueError("protobuf decode: runaway field loop")
        tags, nxt = _varint_at(arr, nc, pos[active])
        for t in np.unique(tags):
            sel = tags == t
            rows = active[sel]
            p = nxt[sel]
            num, wt = int(t) >> 3, int(t) & 7
            m = meta.get(num)
            base = m[1] if m else None
            if wt == _WT_VARINT:
                vals, after = _varint_at(arr, nc, p)
                if m and base not in ("string", "bytes", "message"):
                    raw[m[0]][rows] = vals
                    present[m[0]][rows] = True
                pos[rows] = after
            elif wt == _WT_FIXED64:
                if m and base not in ("string", "bytes", "message"):
                    b8 = arr[p[:, None] + np.arange(8)] if len(p) else np.empty((0, 8), np.uint8)
                    raw[m[0]][rows] = np.ascontiguousarray(b8).view("<u8").ravel()
                    present[m[0]][rows] = True
                pos[rows] = p + 8
            elif wt == _WT_FIXED32:
                if m and base not in ("string", "bytes", "message"):
                    b4 = arr[p[:, None] + np.arange(4)] if len(p) else np.empty((0, 4), np.uint8)
                    v32 = np.ascontiguousarray(b4).view("<u4").ravel()
                    if base in ("sfixed32",):
                        raw[m[0]][rows] = v32.view(np.int32).astype(np.int64).view(_U)
                    else:
                        raw[m[0]][rows] = v32.astype(_U)
                    present[m[0]][rows] = True
                pos[rows] = p + 4
            elif wt == _WT_LEN:
                lns, after = _varint_at(arr, nc, p)
                ln = lns.view(np.int64)
                if (ln < 0).any() or (after + ln > endsl[rows]).any():
                    raise ValueError("protobuf decode: extent past message end")
                if m and base in ("string", "bytes", "message"):
                    ext[m[0]][0][rows] = after
                    ext[m[0]][1][rows] = after + ln
                    present[m[0]][rows] = True
                pos[rows] = after + ln
            else:
                raise ValueError(f"protobuf decode: wire type {wt}")
    out = {}
    for _num, (name, base, nested) in meta.items():
        valid = present[name]
        if base in ("string", "bytes"):
            s, e = ext[name]
            lens = np.where(valid, e - s, 0)
            payload = _gather_segments(arr, s, lens)
            offsets = np.concatenate(([0], np.cumsum(lens)))
            validity = (
                None
                if valid.all()
                else pa.py_buffer(np.packbits(valid, bitorder="little").tobytes())
            )
            lb = pa.Array.from_buffers(
                pa.large_binary(),
                n,
                [validity, pa.py_buffer(offsets.tobytes()), pa.py_buffer(payload.tobytes())],
            )
            out[name] = pc.cast(
                lb, pa.large_string() if base == "string" else pa.large_binary()
            )
        elif base == "message":
            s, e = ext[name]
            vs = np.flatnonzero(valid)
            children = _decode_regions(nested, arr, nc, s[vs], e[vs])
            # scatter child rows back to parent positions
            full_children = []
            names = []
            for cname, carr in children.items():
                names.append(cname)
                if len(vs):
                    idx = np.full(n, -1, np.int64)
                    idx[vs] = np.arange(len(vs))
                    taken = carr.take(
                        pa.array(np.where(idx >= 0, idx, 0), type=pa.int64())
                    )
                    # null out non-present parents via if_else
                    taken = pc.if_else(
                        pa.array(valid), taken, pa.nulls(n, taken.type)
                    )
                else:
                    taken = pa.nulls(n, carr.type)
                full_children.append(taken)
            mask_arr = pa.array(~valid)
            out[name] = pa.StructArray.from_arrays(
                full_children, names, mask=mask_arr
            )
        else:
            out[name] = _to_arrow(base, raw[name], valid, None)
    return out


def decode_column(bin_col: pa.Array, desc: dict) -> pa.StructArray:
    """LargeBinary/Binary column of protobuf messages -> StructArray with
    the descriptor's schema (absent fields null, last-one-wins, unknown
    fields skipped)."""
    if isinstance(bin_col, pa.ChunkedArray):
        bin_col = bin_col.combine_chunks()
    offsets, data = _binary_parts(bin_col)
    nc = _next_clear(data) if len(data) else np.empty(0, np.int64)
    cols = _decode_regions(
        desc, data, nc, offsets[:-1].astype(np.int64), offsets[1:].astype(np.int64)
    )
    schema = descriptor_schema(desc)
    names = [f.name for f in schema.fields]
    null_rows = np.asarray(bin_col.is_null())
    mask = pa.array(null_rows) if null_rows.any() else None
    return pa.StructArray.from_arrays(
        [cols[name] for name in names], names,
        mask=mask,
    )
