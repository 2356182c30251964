"""Vectorized (numpy) Avro binary block codec for FLAT record schemas.

The row-at-a-time closure codec in avro_format.py is spec-complete but
Python-speed (~100k rows/s/core) — the one "weak at scale" item left on the
format path. This module encodes/decodes whole Arrow batches with numpy
array ops (~10-40x faster), producing byte-identical spec output; schemas
with nested arrays/maps/records fall back to the closure codec.

Reference parity: flink-avro's AvroRowDataSerializationSchema encodes on the
JVM; this is the Python-runtime equivalent of "stay out of the per-row
interpreter loop" (SURVEY.md §2.1 formats row).

How the vectorization works
---------------------------
ENCODE: every field contributes byte "segments" — (contiguous row-major
buffer, per-row length) pairs: the union-branch prefix byte, a zigzag-varint
buffer (lengths computed by threshold compares, bytes filled in <=10
vectorized passes over 7-bit groups), fixed 4/8-byte little-endian slabs, or
an Arrow string/bytes buffer reused as-is. Segments interleave into the
row-major block with one gather-scatter (`np.repeat` of destination starts +
intra-segment aranges).

DECODE: within one container block the row boundaries are unknown until
parsed (varints and length-prefixed strings), which forces one sequential
pass — but that pass only SKIPS: with a precomputed next-clear-high-bit
array a varint is hopped in one list lookup, fixed types jump by size, and
no value except string lengths is ever materialized (~10 plain-int Python
ops per row, ~4x cheaper than decoding). With the row starts known, every
field of every row is then extracted in vectorized lockstep: union bytes
and fixed values via array gathers, varints via <=10 7-bit-group passes,
and string columns become Arrow LargeBinary buffers directly (no per-value
Python objects). A block that fails the end-position validation raises
BlockDecodeError and the caller falls back to the closure codec.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = [
    "vector_ok",
    "encode_block",
    "decode_block",
    "BlockDecodeError",
]

_U = np.uint64
_MASK7 = _U(0x7F)


class BlockDecodeError(ValueError):
    """Block failed vectorized structural validation; use the row codec."""


# ---------------------------------------------------------------------------
# Field plan: normalize the avro schema into flat (nullable, kind) entries
# ---------------------------------------------------------------------------

# kind -> (fixed byte size or None)
_FIXED = {"double": 8, "float": 4, "boolean": 1}
_VARINT_KINDS = {
    "long",
    "int",
    "date",
    "timestamp-micros",
    "timestamp-millis",
    "local-timestamp-micros",
    "local-timestamp-millis",
    "time-micros",
    "time-millis",
}
_LEN_KINDS = {"string", "bytes"}
# Arrays of NON-NULL fixed-width floats/doubles (the embedding-column
# shape): single-block spec encoding, fixed per-item stride.
_ARRAY_KINDS = {"array-f4": ("float", 4), "array-f8": ("double", 8)}


def _kind(sch):
    """Return the flat kind string for one (non-union) avro type, or None."""
    if isinstance(sch, str):
        if sch in _FIXED or sch in _VARINT_KINDS or sch in _LEN_KINDS:
            return sch
        return None
    if isinstance(sch, dict):
        logical = sch.get("logicalType")
        if logical in _VARINT_KINDS:
            return logical
        if logical == "decimal":
            return None  # scale semantics stay on the closure codec
        t = sch.get("type")
        if t == "array":
            items = _kind(sch.get("items"))
            if items == "float":
                return "array-f4"
            if items == "double":
                return "array-f8"
            return None  # nullable/varint items: closure codec
        if isinstance(t, str) and (
            t in _FIXED or t in _VARINT_KINDS or t in _LEN_KINDS
        ):
            return t
    return None


def _plan(avro_record: dict):
    """[(name, nullable, null_branch, kind)] or None if unsupported."""
    if not isinstance(avro_record, dict) or avro_record.get("type") != "record":
        return None
    plan = []
    for f in avro_record["fields"]:
        sch = f["type"]
        nullable, null_branch = False, -1
        if isinstance(sch, list):
            if len(sch) != 2 or "null" not in sch:
                return None
            nullable = True
            null_branch = sch.index("null")
            sch = sch[1 - null_branch]
        k = _kind(sch)
        if k is None:
            return None
        plan.append((f["name"], nullable, null_branch, k))
    return plan


def vector_ok(avro_record: dict) -> bool:
    return _plan(avro_record) is not None


# ---------------------------------------------------------------------------
# varint / zigzag primitives (array in, array out)
# ---------------------------------------------------------------------------


def _zigzag_enc(v: np.ndarray) -> np.ndarray:
    v = v.astype(np.int64, copy=False)
    return (np.left_shift(v, 1) ^ np.right_shift(v, 63)).view(_U)


def _zigzag_dec(z: np.ndarray) -> np.ndarray:
    half = (z >> _U(1)).view(np.int64)
    sign = -((z & _U(1)).view(np.int64))
    return half ^ sign


def _varint_encode(z: np.ndarray):
    """uint64 array -> (row-major byte buffer, per-value byte length)."""
    n = np.ones(z.shape, np.int64)
    for k in range(1, 10):
        n += z >= _U(1 << (7 * k))
    if not len(z):
        return np.empty(0, np.uint8), n
    ends = np.cumsum(n)
    starts = ends - n
    out = np.empty(int(ends[-1]), np.uint8)
    for g in range(10):
        m = n > g
        if not m.any():
            break
        b = ((z[m] >> _U(7 * g)) & _MASK7).astype(np.uint8)
        b |= ((g < n[m] - 1).astype(np.uint8)) << 7
        out[starts[m] + g] = b
    return out, n


def _next_clear(arr: np.ndarray) -> np.ndarray:
    """nc[i] = smallest j >= i with arr[j] < 128 (varint terminator), or
    len(arr)+63 past the last one. One reverse cumulative-min pass — O(n),
    no per-lookup search."""
    n = len(arr)
    idxs = np.where(arr < 128, np.arange(n, dtype=np.int64), np.int64(n + 63))
    return np.minimum.accumulate(idxs[::-1])[::-1]


def _varint_at(arr: np.ndarray, nc: np.ndarray, pos: np.ndarray):
    """Decode varints starting at each `pos`. Returns (uint64 values,
    position after). `nc` = _next_clear(arr); garbage positions clip
    harmlessly (used by the structural chase on hypothetical offsets)."""
    n = len(arr)
    p = np.minimum(pos, n - 1)
    ends = np.minimum(nc[p], n - 1)
    nb = np.clip(ends - p + 1, 1, 10)
    val = np.zeros(len(pos), _U)
    shift = _U(0)
    for g in range(10):
        if not (nb > g).any():
            break
        b = arr[np.minimum(p + g, n - 1)].astype(_U)
        val |= np.where(nb > g, (b & _MASK7) << shift, _U(0))
        shift += _U(7)
    return val, ends + 1


def _gather_segments(src: np.ndarray, starts: np.ndarray, lens: np.ndarray):
    """Concatenate src[starts[i] : starts[i]+lens[i]] row-major."""
    total = int(lens.sum())
    if not total:
        return np.empty(0, np.uint8)
    dst_starts = np.cumsum(lens) - lens
    idx = np.repeat(starts - dst_starts, lens) + np.arange(total)
    return src[idx]


# ---------------------------------------------------------------------------
# Encode: Arrow RecordBatch -> avro binary block body
# ---------------------------------------------------------------------------


def _col_int64(col: pa.Array, kind: str) -> np.ndarray:
    """Column as int64 numpy (epoch in the avro logical unit); nulls -> 0."""
    t = col.type
    if pa.types.is_timestamp(t):
        unit = "ms" if kind.endswith("millis") else "us"
        col = pc.cast(col, pa.timestamp(unit, tz=t.tz))
        col = pc.cast(col, pa.int64())
    elif pa.types.is_date(t):
        col = pc.cast(col, pa.int32())
        col = pc.cast(col, pa.int64())
    elif not pa.types.is_int64(t):
        col = pc.cast(col, pa.int64())
    return np.asarray(col.fill_null(0))


def _string_parts(col: pa.Array):
    """(offsets int64 len n+1, data uint8) for a string/binary column."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    lb = pc.cast(col, pa.large_binary())
    lb = pc.fill_null(lb, b"")  # null slots must have zero extent
    buffers = lb.buffers()
    offsets = np.frombuffer(buffers[1], np.int64, len(lb) + 1, lb.offset * 8)
    data = (
        np.frombuffer(buffers[2], np.uint8)
        if buffers[2] is not None
        else np.empty(0, np.uint8)
    )
    return offsets, data


def _list_parts(col: pa.Array, kind: str):
    """(per-row item counts, per-row byte starts, all item bytes) for a
    list column of non-null float/double items. The caller gathers the
    row-major payload with the null rows masked to zero length (a null
    slot MAY carry a nonzero extent in Arrow)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    item = pa.float32() if kind == "array-f4" else pa.float64()
    size = _ARRAY_KINDS[kind][1]
    lc = pc.cast(col, pa.large_list(item))
    buffers = lc.buffers()
    offsets = np.frombuffer(buffers[1], np.int64, len(lc) + 1, lc.offset * 8)
    dt = "<f4" if kind == "array-f4" else "<f8"
    allbytes = np.frombuffer(
        np.ascontiguousarray(np.asarray(lc.values), dtype=dt).tobytes(),
        np.uint8,
    )
    return (
        np.diff(offsets).astype(np.int64),
        (offsets[:-1] * size).astype(np.int64),
        allbytes,
    )


def encode_block(batch: pa.RecordBatch, avro_record: dict) -> bytes:
    """Encode one Arrow batch as the (uncompressed) avro block body."""
    plan = _plan(avro_record)
    if plan is None:
        raise BlockDecodeError("schema unsupported by vector codec")
    nrows = batch.num_rows
    ones = np.ones(nrows, np.int64)
    segments: list[tuple[np.ndarray, np.ndarray]] = []
    for i, (_, nullable, null_branch, kind) in enumerate(plan):
        col = batch.column(i)
        valid = ~np.asarray(col.is_null())
        if nullable:
            pref = np.where(
                valid, np.uint8((1 - null_branch) * 2), np.uint8(null_branch * 2)
            )
            segments.append((pref, ones))
        if kind in _VARINT_KINDS:
            v = _col_int64(col, kind)[valid]
            buf, lens = _varint_encode(_zigzag_enc(v))
            full = np.zeros(nrows, np.int64)
            full[valid] = lens
            segments.append((buf, full))
        elif kind in _FIXED:
            size = _FIXED[kind]
            if kind == "boolean":
                vals = np.asarray(col.fill_null(False)).astype(np.uint8)[valid]
                buf = vals
            else:
                dt = "<f8" if kind == "double" else "<f4"
                vals = np.asarray(col.fill_null(0.0), dtype=dt)[valid]
                buf = np.frombuffer(vals.tobytes(), np.uint8)
            segments.append((buf, np.where(valid, size, 0).astype(np.int64)))
        elif kind in _ARRAY_KINDS:
            size = _ARRAY_KINDS[kind][1]
            counts_raw, byte_starts, allbytes = _list_parts(col, kind)
            counts = np.where(valid, counts_raw, 0)
            flat = _gather_segments(allbytes, byte_starts, counts * size)
            # spec single-block form (row-codec parity): for non-empty
            # arrays varint(count) + items; ALWAYS the 0x00 terminator.
            nz = valid & (counts > 0)
            cbuf, clens = _varint_encode(_zigzag_enc(counts[nz]))
            cfull = np.zeros(nrows, np.int64)
            cfull[nz] = clens
            segments.append((cbuf, cfull))
            segments.append((flat, counts * size))
            segments.append(
                (
                    np.zeros(int(valid.sum()), np.uint8),
                    np.where(valid, 1, 0).astype(np.int64),
                )
            )
        else:  # string / bytes
            offsets, data = _string_parts(col)
            lens = np.diff(offsets)
            payload = data[offsets[0] : offsets[-1]]
            lenbuf, lenlens = _varint_encode(_zigzag_enc(lens[valid]))
            lfull = np.zeros(nrows, np.int64)
            lfull[valid] = lenlens
            segments.append((lenbuf, lfull))
            segments.append((payload, lens))
    row_len = np.zeros(nrows, np.int64)
    for _, lens in segments:
        row_len += lens
    row_starts = np.cumsum(row_len) - row_len
    out = np.empty(int(row_len.sum()), np.uint8)
    run = row_starts
    for buf, lens in segments:
        if len(buf):
            dst_starts = np.cumsum(lens) - lens
            idx = np.repeat(run - dst_starts, lens) + np.arange(len(buf))
            out[idx] = buf
        run = run + lens
    return out.tobytes()


# ---------------------------------------------------------------------------
# Decode: avro block body -> Arrow arrays
# ---------------------------------------------------------------------------


def _row_starts(arr: np.ndarray, nc: np.ndarray, plan, count: int):
    """Row-boundary skip pass: fields are SKIPPED, never decoded — a varint
    ends at the next clear-high-bit byte (one `nc` list lookup), fixed types
    jump by size, and only string/bytes lengths get a tiny per-value varint
    reconstruction. ~10 plain-int Python ops per row; every downstream value
    decode is vectorized over these starts. Validates that the skip lands
    exactly on the block end (else the block is structurally off and the
    caller falls back to the closure codec)."""
    n = len(arr)
    al = arr.tolist()
    ncl = nc.tolist()
    # (null_branch_byte or -1,
    #  category 0=varint/1=fixed/2=len-prefixed/3=fixed-item array, size)
    def _cat(kind):
        if kind in _VARINT_KINDS:
            return 0
        if kind in _FIXED:
            return 1
        if kind in _ARRAY_KINDS:
            return 3
        return 2

    fast = [
        (
            null_branch * 2 if nullable else -1,
            _cat(kind),
            _ARRAY_KINDS[kind][1] if kind in _ARRAY_KINDS
            else _FIXED.get(kind, 0),
        )
        for _, nullable, null_branch, kind in plan
    ]
    starts = np.empty(count, np.int64)
    pos = 0
    try:
        for i in range(count):
            if pos >= n:
                raise BlockDecodeError("row skip ran past block end")
            starts[i] = pos
            for nullbyte, cat, size in fast:
                if nullbyte >= 0:
                    b = al[pos]
                    pos += 1
                    if b == nullbyte:
                        continue
                if cat == 0:
                    pos = ncl[pos] + 1
                elif cat == 1:
                    pos += size
                elif cat == 3:
                    # array blocks: varint count (negative => byte-size
                    # prefixed block) until the 0 terminator
                    while True:
                        e = ncl[pos]
                        z = 0
                        shift = 0
                        for j in range(pos, e + 1):
                            z |= (al[j] & 0x7F) << shift
                            shift += 7
                        cnt = (z >> 1) ^ -(z & 1)
                        pos = e + 1
                        if cnt == 0:
                            break
                        if cnt < 0:
                            e2 = ncl[pos]
                            z2 = 0
                            shift = 0
                            for j in range(pos, e2 + 1):
                                z2 |= (al[j] & 0x7F) << shift
                                shift += 7
                            blk_size = (z2 >> 1) ^ -(z2 & 1)
                            if blk_size < 0:
                                # ADVICE r5: a corrupt negative byte-size
                                # would move pos BACKWARD and cycle forever
                                raise BlockDecodeError(
                                    "negative array-block byte size "
                                    f"{blk_size} at {pos}"
                                )
                            pos = e2 + 1 + blk_size
                        else:
                            pos += cnt * size
                else:
                    e = ncl[pos]
                    z = 0
                    shift = 0
                    for j in range(pos, e + 1):
                        z |= (al[j] & 0x7F) << shift
                        shift += 7
                    blen = (z >> 1) ^ -(z & 1)
                    if blen < 0:  # ADVICE r5: no backward jumps
                        raise BlockDecodeError(
                            f"negative bytes/string length {blen} at {pos}"
                        )
                    pos = e + 1 + blen
    except IndexError as ex:  # ncl[pos] with pos past the last terminator
        raise BlockDecodeError(f"row skip out of range: {ex}") from ex
    if pos != n:
        raise BlockDecodeError(f"row skip ended at {pos}, block len {n}")
    return starts


def decode_block(body: bytes, count: int, avro_record: dict) -> list[pa.Array]:
    """Decode one block body into Arrow arrays (one per field), in avro
    field order. Raises BlockDecodeError on structural mismatch."""
    plan = _plan(avro_record)
    if plan is None:
        raise BlockDecodeError("schema unsupported by vector codec")
    arr = np.frombuffer(body, np.uint8)
    if count == 0:
        return [_typed_empty(kind) for _, _, _, kind in plan]
    nc = _next_clear(arr)
    pos = _row_starts(arr, nc, plan, count).copy()
    out: list[pa.Array] = []
    for _, nullable, null_branch, kind in plan:
        if nullable:
            valid = arr[pos] != np.uint8(null_branch * 2)
            pos = pos + 1
        else:
            valid = np.ones(count, bool)
        mask = None if valid.all() else ~valid
        vp = pos[valid]
        if kind in _VARINT_KINDS:
            z, nxt = _varint_at(arr, nc, vp)
            v = _zigzag_dec(z)
            full = np.zeros(count, np.int64)
            full[valid] = v
            out.append(_typed_int(full, mask, kind))
            pos[valid] = nxt
        elif kind == "boolean":
            full = np.zeros(count, bool)
            full[valid] = arr[vp] != 0
            out.append(pa.array(full, mask=mask))
            pos[valid] = vp + 1
        elif kind in ("double", "float"):
            size = _FIXED[kind]
            dt = "<f8" if kind == "double" else "<f4"
            raw = arr[vp[:, None] + np.arange(size)] if len(vp) else np.empty(
                (0, size), np.uint8
            )
            vals = np.ascontiguousarray(raw).view(dt).ravel()
            full = np.zeros(count, dt)
            full[valid] = vals
            out.append(pa.array(full, mask=mask))
            pos[valid] = vp + size
        elif kind in _ARRAY_KINDS:
            size = _ARRAY_KINDS[kind][1]
            dt = "<f4" if kind == "array-f4" else "<f8"
            # per-row block walk (usually exactly one block + terminator);
            # item payloads then gather vectorized
            al = arr.tolist()
            ncl = nc.tolist()
            seg_starts: list[int] = []
            seg_lens: list[int] = []
            row_counts = np.zeros(count, np.int64)
            new_pos = pos.copy()
            for ri in np.flatnonzero(valid):
                p0 = int(pos[ri])
                total_items = 0
                while True:
                    prev_p0 = p0  # ADVICE r5: enforce monotonic progress
                    e = ncl[p0]
                    z = 0
                    shift = 0
                    for j in range(p0, e + 1):
                        z |= (al[j] & 0x7F) << shift
                        shift += 7
                    cnt = (z >> 1) ^ -(z & 1)
                    p0 = e + 1
                    if cnt == 0:
                        break
                    if cnt < 0:
                        # size-prefixed block: skip the byte-size varint
                        e2 = ncl[p0]
                        p0 = e2 + 1
                        cnt = -cnt
                    seg_starts.append(p0)
                    seg_lens.append(cnt * size)
                    total_items += cnt
                    p0 += cnt * size
                    if p0 > len(arr):
                        raise BlockDecodeError("array block past block end")
                    if p0 <= prev_p0:
                        raise BlockDecodeError(
                            f"array-block walk stalled at {p0} (was "
                            f"{prev_p0}) — corrupt block"
                        )
                row_counts[ri] = total_items
                new_pos[ri] = p0
            flat = _gather_segments(
                arr,
                np.asarray(seg_starts, np.int64),
                np.asarray(seg_lens, np.int64),
            )
            values = pa.Array.from_buffers(
                pa.float32() if kind == "array-f4" else pa.float64(),
                int(row_counts.sum()),
                [None, pa.py_buffer(flat.tobytes())],
            )
            offsets = np.concatenate(([0], np.cumsum(row_counts)))
            validity = (
                None
                if mask is None
                else pa.py_buffer(np.packbits(valid, bitorder="little").tobytes())
            )
            out.append(
                pa.Array.from_buffers(
                    pa.large_list(values.type),
                    count,
                    [validity, pa.py_buffer(offsets.tobytes())],
                    children=[values],
                )
            )
            pos = new_pos
        else:  # string / bytes
            z, nxt = _varint_at(arr, nc, vp)
            ln = _zigzag_dec(z)
            if (ln < 0).any() or (nxt + ln > len(arr)).any():
                raise BlockDecodeError("string extent past block end")
            payload = _gather_segments(arr, nxt, ln)
            lens_full = np.zeros(count, np.int64)
            lens_full[valid] = ln
            offsets = np.concatenate(([0], np.cumsum(lens_full)))
            validity = (
                None
                if mask is None
                else pa.py_buffer(np.packbits(valid, bitorder="little").tobytes())
            )
            lb = pa.Array.from_buffers(
                pa.large_binary(),
                count,
                [validity, pa.py_buffer(offsets.tobytes()), pa.py_buffer(payload.tobytes())],
            )
            out.append(
                pc.cast(lb, pa.large_string() if kind == "string" else pa.large_binary())
            )
            pos[valid] = nxt + ln
    return out


def _typed_int(full: np.ndarray, mask, kind: str) -> pa.Array:
    a = pa.array(full, mask=mask)
    if kind == "int":
        return pc.cast(a, pa.int32())
    if kind == "date":
        return pc.cast(pc.cast(a, pa.int32()), pa.date32())
    if kind == "timestamp-micros":
        return pc.cast(a, pa.timestamp("us", tz="UTC"))
    if kind == "timestamp-millis":
        return pc.cast(pc.cast(a, pa.timestamp("ms", tz="UTC")), pa.timestamp("us", tz="UTC"))
    if kind == "local-timestamp-micros":
        return pc.cast(a, pa.timestamp("us"))
    if kind == "local-timestamp-millis":
        return pc.cast(pc.cast(a, pa.timestamp("ms")), pa.timestamp("us"))
    if kind in ("time-micros", "time-millis"):
        return a  # surfaced as long (parity with avro_to_spark)
    return a  # long


def _typed_empty(kind: str) -> pa.Array:
    if kind in _ARRAY_KINDS:
        item = pa.float32() if kind == "array-f4" else pa.float64()
        return pa.array([], type=pa.large_list(item))
    return _typed_int(np.empty(0, np.int64), None, kind) if (
        kind in _VARINT_KINDS
    ) else (
        pa.array(np.empty(0, bool))
        if kind == "boolean"
        else pa.array(np.empty(0, "<f8" if kind == "double" else "<f4"))
        if kind in ("double", "float")
        else pa.array([], type=pa.large_string() if kind == "string" else pa.large_binary())
    )
