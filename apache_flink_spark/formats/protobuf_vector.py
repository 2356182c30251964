"""Vectorized (numpy/Arrow) protobuf wire codec.

Companion to protobuf_format.py (the spec-exact row codec, flink-protobuf
PbFormatFactory parity): encodes/decodes whole Arrow batches without a
per-row Python loop. Repeated SCALAR/string fields are vectorized too
(unpacked encode for row-codec byte parity; both packed and unpacked
decode); only repeated nested messages fall back to the row codec
(``vector_ok``).

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
    """True when every field (recursively) is of a supported base type.
    Repeated SCALAR/string fields are vectorized (r5 — unpacked encode for
    row-codec byte parity, packed+unpacked decode); repeated nested
    messages stay on the row codec."""
    try:
        for _num, _name, base, repeated, nested in _compiled(desc):
            if base == "message":
                if repeated or not vector_ok(nested):
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


def _assemble(segments, n: int):
    """Interleave (buf, per-row len) segments row-major."""
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


def _scalar_value_segments(base: str, col: pa.Array, valid, n: int):
    """Value segments (no tag) for one scalar/string occurrence per slot.
    ``col`` may be a top-level column or a list child; ``valid`` masks the
    slots that are present."""
    if base in ("int32", "int64", "uint32", "uint64", "enum", "bool"):
        v = _int64_of(col).view(_U)
        if base == "bool":
            v = (v != 0).astype(_U)
        return [_masked_varint_segment(v, valid, n)]
    if base in ("sint32", "sint64"):
        return [_masked_varint_segment(_zigzag_enc_arr(_int64_of(col)), valid, n)]
    if base in ("double", "float"):
        dt = "<f8" if base == "double" else "<f4"
        size = 8 if base == "double" else 4
        vals = np.asarray(col.fill_null(0.0), dtype=dt)[valid]
        return [
            (
                np.frombuffer(vals.tobytes(), np.uint8),
                np.where(valid, size, 0).astype(np.int64),
            )
        ]
    if base in ("fixed64", "sfixed64", "fixed32", "sfixed32"):
        size = 8 if base.endswith("64") else 4
        dt = "<i8" if size == 8 else "<i4"
        vals = _int64_of(col)[valid].astype(dt)
        return [
            (
                np.frombuffer(vals.tobytes(), np.uint8),
                np.where(valid, size, 0).astype(np.int64),
            )
        ]
    if base in ("string", "bytes"):
        offsets, data = _binary_parts(col)
        lens = np.diff(offsets)
        lens = np.where(valid, lens, 0)
        payload = _gather_segments(data, (offsets[:-1]).astype(np.int64), lens)
        return [
            _masked_varint_segment(lens.view(_U), valid, n),
            (payload, lens.astype(np.int64)),
        ]
    raise NotImplementedError(base)  # pragma: no cover


_CHILD_ARROW = {
    "float": pa.float32(),
    "double": pa.float64(),
    "string": pa.large_string(),
    "bytes": pa.large_binary(),
}


def _encode_repeated(base: str, col: pa.Array, valid, n: int, tag: np.ndarray):
    """One segment holding the UNPACKED wire bytes of a repeated scalar
    field: per item tag + value, items in list order (row-codec parity —
    proto3 parsers accept unpacked for packed-default fields)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    child_t = _CHILD_ARROW.get(base, pa.int64())
    lc = pc.cast(col, pa.large_list(child_t))
    buffers = lc.buffers()
    offsets = np.frombuffer(buffers[1], np.int64, len(lc) + 1, lc.offset * 8)
    counts_raw = np.diff(offsets)
    counts = np.where(valid, counts_raw, 0)
    # keep only present rows' items, in row-major order
    keep = np.repeat(valid, counts_raw)
    items = lc.values.take(
        pa.array(
            np.repeat(offsets[:-1], counts_raw)
            + (np.arange(int(counts_raw.sum())) - np.repeat(
                np.cumsum(counts_raw) - counts_raw, counts_raw))
        )
    ) if len(keep) else lc.values.slice(0, 0)
    if len(keep) and not keep.all():
        items = items.filter(pa.array(keep))
    m = len(items)
    ones = np.ones(m, bool)
    item_segs = [(np.tile(tag, m), np.full(m, len(tag), np.int64))]
    item_segs += _scalar_value_segments(base, items, ones, m)
    ibuf, item_lens = _assemble(item_segs, m)
    cs = np.concatenate(([0], np.cumsum(item_lens)))
    item_offsets = np.concatenate(([0], np.cumsum(counts)))
    row_lens = cs[item_offsets[1:]] - cs[item_offsets[:-1]]
    return ibuf, row_lens.astype(np.int64)


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
        if _rep:
            # repeated scalar: the whole field is one pre-assembled
            # per-item-interleaved segment (no leading per-row tag)
            segments.append(_encode_repeated(base, col, valid, n, tag))
            continue
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
        else:
            segments.extend(_scalar_value_segments(base, col, valid, n))
    return _assemble(segments, n)


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


def _build_repeated(arr: np.ndarray, base: str, chunks, n: int) -> pa.Array:
    """Assemble a repeated field's accumulated occurrences into a
    LargeListArray. chunks: list of (rows, uint64 values) for scalars, or
    (rows, payload starts, payload lens) for string/bytes — appended in
    processing order, so a STABLE sort by row restores per-row item
    order. Rows with no occurrences yield empty lists (proto3: absent
    repeated == empty)."""
    item_t = _CHILD_ARROW.get(base)
    if base in ("string", "bytes"):
        if chunks:
            rows = np.concatenate([c[0] for c in chunks])
            starts = np.concatenate([c[1] for c in chunks])
            lens = np.concatenate([c[2] for c in chunks])
        else:
            rows = np.empty(0, np.int64)
            starts = np.empty(0, np.int64)
            lens = np.empty(0, np.int64)
        order = np.argsort(rows, kind="stable")
        rows, starts, lens = rows[order], starts[order], lens[order]
        payload = _gather_segments(arr, starts, lens)
        item_offsets = np.concatenate(([0], np.cumsum(lens)))
        items = pa.Array.from_buffers(
            pa.large_binary(),
            len(rows),
            [None, pa.py_buffer(item_offsets.tobytes()),
             pa.py_buffer(payload.tobytes())],
        )
        if base == "string":
            items = pc.cast(items, pa.large_string())
    else:
        if chunks:
            rows = np.concatenate([c[0] for c in chunks])
            vals = np.concatenate([c[1] for c in chunks])
        else:
            rows = np.empty(0, np.int64)
            vals = np.empty(0, _U)
        order = np.argsort(rows, kind="stable")
        rows, vals = rows[order], vals[order]
        items = _to_arrow(base, vals, np.ones(len(vals), bool), None)
        if item_t is not None and items.type != item_t:
            items = pc.cast(items, item_t)
    counts = np.bincount(rows, minlength=n) if len(rows) else np.zeros(n, np.int64)
    offsets = np.concatenate(([0], np.cumsum(counts.astype(np.int64))))
    return pa.LargeListArray.from_arrays(
        pa.array(offsets, type=pa.int64()), items
    )


def _fixed_u64(arr: np.ndarray, p: np.ndarray, size: int, base) -> np.ndarray:
    if not len(p):
        return np.empty(0, _U)
    raw = np.ascontiguousarray(arr[p[:, None] + np.arange(size)])
    if size == 8:
        return raw.view("<u8").ravel()
    v32 = raw.view("<u4").ravel()
    if base == "sfixed32":
        return v32.view(np.int32).astype(np.int64).view(_U)
    return v32.astype(_U)


def _decode_regions(desc: dict, arr: np.ndarray, nc, starts, ends):
    """Decode one message per (starts[i], ends[i]) region. Returns
    (dict name -> pa.Array, valid-region count stays len(starts))."""
    n = len(starts)
    meta = {
        num: (name, base, rep, nested)
        for num, name, base, rep, nested in _compiled(desc)
    }
    # storage: raw uint64 slots + presence; strings/messages keep extents;
    # repeated fields ACCUMULATE (rows, values/extents) per occurrence in
    # processing order — a stable row sort at the end restores per-row
    # item order.
    raw = {
        name: np.zeros(n, _U)
        for _, (name, b, r, _x) in meta.items()
        if not r and b not in ("string", "bytes", "message")
    }
    ext = {
        name: (np.zeros(n, np.int64), np.zeros(n, np.int64))
        for _, (name, b, r, _x) in meta.items()
        if not r and b in ("string", "bytes", "message")
    }
    rep_vals: dict[str, list] = {
        name: [] for _, (name, _b, r, _x) in meta.items() if r
    }
    # presence only matters for non-repeated fields (absent repeated ==
    # empty list by construction)
    present = {
        name: np.zeros(n, bool)
        for _, (name, _b, r, _x) in meta.items()
        if not r
    }
    pos = starts.astype(np.int64).copy()
    endsl = ends.astype(np.int64)
    while True:
        active = np.flatnonzero(pos < endsl)
        if not len(active):
            break
        tags, nxt = _varint_at(arr, nc, pos[active])
        # termination: every iteration must strictly advance every active
        # row (a tag consumes >= 1 byte), so the loop is bounded by the
        # message byte length — no arbitrary occurrence cap (a 150k-item
        # unpacked repeated field is VALID input, not a runaway).
        if not (nxt > pos[active]).all():
            raise ValueError("protobuf decode: non-advancing tag position")
        for t in np.unique(tags):
            sel = tags == t
            rows = active[sel]
            p = nxt[sel]
            num, wt = int(t) >> 3, int(t) & 7
            m = meta.get(num)
            name, base, rep = (m[0], m[1], m[2]) if m else (None, None, False)
            scalar = m and base not in ("string", "bytes", "message")
            if wt == _WT_VARINT:
                vals, after = _varint_at(arr, nc, p)
                if scalar:
                    if rep:
                        rep_vals[name].append((rows, vals))
                    else:
                        raw[name][rows] = vals
                        present[name][rows] = True
                pos[rows] = after
            elif wt in (_WT_FIXED64, _WT_FIXED32):
                size = 8 if wt == _WT_FIXED64 else 4
                if scalar:
                    vals = _fixed_u64(arr, p, size, base)
                    if rep:
                        rep_vals[name].append((rows, vals))
                    else:
                        raw[name][rows] = vals
                        present[name][rows] = True
                pos[rows] = p + size
            elif wt == _WT_LEN:
                lns, after = _varint_at(arr, nc, p)
                ln = lns.view(np.int64)
                if (ln < 0).any() or (after + ln > endsl[rows]).any():
                    raise ValueError("protobuf decode: extent past message end")
                if m and rep and scalar:
                    # PACKED run of scalar values
                    swt = _SCALAR_WIRETYPE[base]
                    if swt in (_WT_FIXED64, _WT_FIXED32):
                        size = 8 if swt == _WT_FIXED64 else 4
                        if (ln % size != 0).any():
                            raise ValueError(
                                "protobuf decode: packed fixed run misaligned"
                            )
                        counts = ln // size
                        srcs = _gather_segments(arr, after, ln)
                        grouped = np.ascontiguousarray(srcs).reshape(-1, size)
                        vals = _fixed_u64(
                            np.ascontiguousarray(grouped).ravel(),
                            np.arange(0, len(grouped) * size, size),
                            size,
                            base,
                        )
                        rep_vals[name].append((np.repeat(rows, counts), vals))
                    else:
                        rp = after.copy()
                        run_end = after + ln
                        while True:
                            alive = np.flatnonzero(rp < run_end)
                            if not len(alive):
                                break
                            v, rnxt = _varint_at(arr, nc, rp[alive])
                            rep_vals[name].append((rows[alive], v))
                            rp[alive] = rnxt
                elif m and rep:  # repeated string/bytes occurrence
                    rep_vals[name].append((rows, after, ln))
                elif m and base in ("string", "bytes", "message"):
                    ext[name][0][rows] = after
                    ext[name][1][rows] = after + ln
                    present[name][rows] = True
                pos[rows] = after + ln
            else:
                raise ValueError(f"protobuf decode: wire type {wt}")
    out = {}
    for _num, (name, base, rep, nested) in meta.items():
        if rep:
            out[name] = _build_repeated(arr, base, rep_vals[name], n)
            continue
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
