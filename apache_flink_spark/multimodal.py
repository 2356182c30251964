"""Multimodal column support — opaque binary payloads + typed metadata +
Pandas-UDF decode plumbing.

North-star addition (task brief): image/audio/video are modeled as
``binary`` columns with a typed metadata struct; decode / feature-extract /
resize / frame-sample run as Arrow-batched ``mapInPandas`` stages.
``decode_media`` decodes PPM (P6) and 24-bit BMP NATIVELY, and
``decode_wav`` decodes 16-bit PCM WAV (pure numpy/struct — public formats,
no codec libraries), exercised end-to-end by mm_decode_real_codec and
mm_audio_features; jpeg/png/compressed-audio/video need PIL/ffmpeg/librosa,
which are NOT in this container, and raise loudly —
``fake_decode_features`` is the deterministic stand-in those paths use so
the plumbing stays oracle-tested.

Scale: payload bytes never leave the executor — mapInPandas streams Arrow
batches partition-locally; metadata-only queries prune the binary column at
the parquet scan (keep payloads in a separate column/file group in a real
layout so pruning skips the heavy bytes entirely).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Schema of the media table derived from the documents fixture.
MEDIA_SCHEMA = (
    "doc_id long, media_type string, payload binary, "
    "meta struct<n_bytes: long, format: string>"
)

DECODE_OUT_SCHEMA = "doc_id long, width int, height int, n_frames int"


def media_table(spark, sf_dir: str) -> DataFrame:
    """Synthesize the multimodal table: the document text bytes act as the
    opaque payload (deterministic; real pipelines read image/audio bytes).
    media_type cycles by doc_id; metadata is a typed struct."""
    from apache_flink_spark.catalog import table

    d = table(spark, sf_dir, "documents")
    payload = F.encode("text", "utf-8")
    return d.select(
        "doc_id",
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("media_type"),
        payload.alias("payload"),
        F.struct(
            F.octet_length(payload).cast("long").alias("n_bytes"),
            F.lit("raw").alias("format"),
        ).alias("meta"),
    )


def decode_media(payload: bytes, media_type: str | None = None):
    """Real codec entry point. PPM (P6) and BMP (24-bit BI_RGB) decode
    natively (pure numpy, public formats, no codec libraries needed);
    other formats (jpeg/png/audio/video) still need PIL/ffmpeg/librosa,
    which are not installed in this container, and raise loudly.

    Returns (width, height, n_pixels, total_luma_milli) where
    total_luma_milli is the exact integer sum over pixels of
    299*R + 587*G + 114*B (Rec.601 luma in per-mille fixed point — kept
    as a SUM, not a mean, so the value is division-free and bit-exact
    across engines)."""
    if payload[:2] == b"P6":
        return _features(*decode_ppm(payload))
    if payload[:2] == b"BM":
        return _features(*decode_bmp(payload))
    raise NotImplementedError(
        "only PPM(P6)/BMP(24-bit) decode natively; other media codecs "
        "(PIL/ffmpeg) are not available in this container — use "
        "fake_decode_features for the deterministic stub"
    )


def _features(width: int, height: int, rgb) -> tuple[int, int, int, int]:
    import numpy as np

    px = rgb.astype(np.int64)
    total = int(
        (299 * px[:, :, 0] + 587 * px[:, :, 1] + 114 * px[:, :, 2]).sum()
    )
    return (width, height, width * height, total)


def encode_ppm(width: int, height: int, rgb) -> bytes:
    """Binary PPM (P6, maxval 255): ASCII header + raw RGB rows
    (netpbm public spec)."""
    import numpy as np

    return f"P6\n{width} {height}\n255\n".encode() + np.ascontiguousarray(
        rgb, dtype=np.uint8
    ).tobytes()


def decode_ppm(data: bytes):
    """Parse P6: header tokens (whitespace/comment separated) then raw
    RGB. Returns (width, height, HxWx3 uint8 array)."""
    import numpy as np

    if data[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    # Tokenize the header: magic, width, height, maxval; '#' comments run
    # to end-of-line; a single whitespace byte separates maxval from data.
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":
            while pos < len(data) and data[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(data[start:pos]))
    pos += 1  # the single whitespace after maxval
    width, height, maxval = tokens
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval {maxval} (only 255)")
    n = width * height * 3
    raw = data[pos : pos + n]
    if len(raw) != n:
        raise ValueError("truncated PPM pixel data")
    return width, height, np.frombuffer(raw, dtype=np.uint8).reshape(
        height, width, 3
    )


def encode_bmp(width: int, height: int, rgb) -> bytes:
    """24-bit uncompressed BMP (BITMAPINFOHEADER, BI_RGB): BGR pixel
    order, rows bottom-up, each row padded to a 4-byte boundary
    (public Windows DIB spec)."""
    import struct

    import numpy as np

    row_size = (3 * width + 3) // 4 * 4
    img_size = row_size * height
    px = np.ascontiguousarray(rgb, dtype=np.uint8)
    body = bytearray()
    for y in range(height - 1, -1, -1):  # bottom-up
        row = px[y, :, ::-1].tobytes()  # RGB -> BGR
        body += row + b"\x00" * (row_size - len(row))
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + img_size, 0, 0, 14 + 40
    ) + struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, img_size, 2835, 2835, 0, 0
    )
    return bytes(header) + bytes(body)


def decode_bmp(data: bytes):
    """Parse 24-bit BI_RGB BMP. Returns (width, height, HxWx3 uint8 RGB,
    top-down)."""
    import struct

    import numpy as np

    if data[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (data_offset,) = struct.unpack_from("<I", data, 10)
    header_size, width, height = struct.unpack_from("<Iii", data, 14)
    (bpp,) = struct.unpack_from("<H", data, 28)
    (compression,) = struct.unpack_from("<I", data, 30)
    if bpp != 24 or compression != 0:
        raise NotImplementedError(
            f"only 24-bit BI_RGB BMP supported (got {bpp}bpp, "
            f"compression={compression})"
        )
    bottom_up = height > 0
    height = abs(height)
    row_size = (3 * width + 3) // 4 * 4
    rows = []
    for r in range(height):
        off = data_offset + r * row_size
        row = np.frombuffer(data, dtype=np.uint8, count=3 * width, offset=off)
        rows.append(row.reshape(width, 3)[:, ::-1])  # BGR -> RGB
    px = np.stack(rows[::-1] if bottom_up else rows)
    return width, height, px


def encode_wav(sample_rate: int, samples) -> bytes:
    """PCM 16-bit WAV (public RIFF/WAVE spec): ``RIFF`` header, ``fmt ``
    chunk (format 1 = integer PCM), ``data`` chunk. ``samples`` is an
    int16 array of shape (n,) mono or (n, channels)."""
    import struct

    import numpy as np

    px = np.asarray(samples, dtype=np.int16)
    channels = 1 if px.ndim == 1 else px.shape[1]
    body = np.ascontiguousarray(px).tobytes()  # interleaved little-endian
    block_align = channels * 2
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, sample_rate * block_align,
        block_align, 16,
    )
    chunks = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(body)) + body
    )
    return b"RIFF" + struct.pack("<I", len(chunks)) + chunks


def decode_wav(data: bytes):
    """Parse a PCM 16-bit WAV by walking RIFF chunks (unknown chunks like
    LIST/INFO are skipped per spec; chunks are word-aligned). Returns
    (sample_rate, channels, int16 array of shape (n, channels))."""
    import struct

    import numpy as np

    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, raw = 12, None, None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body_at = pos + 8
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", data, body_at)
        elif cid == b"data":
            raw = data[body_at : body_at + size]
        pos = body_at + size + (size & 1)  # chunks are 2-byte aligned
    if fmt is None or raw is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, channels, sample_rate, _br, _ba, bits = fmt
    if audio_format != 1 or bits != 16:
        raise NotImplementedError(
            f"only 16-bit integer PCM supported (format={audio_format}, "
            f"bits={bits})"
        )
    px = np.frombuffer(raw, dtype="<i2").reshape(-1, channels)
    return sample_rate, channels, px


def audio_features(payload: bytes) -> tuple[int, int, int, int]:
    """Decode a WAV payload to division-free integer features:
    (sample_rate, n_samples, sum_abs_amplitude, peak_amplitude) — sums and
    maxima over all channels, exact across engines (no float RMS)."""
    import numpy as np

    sample_rate, _channels, px = decode_wav(payload)
    a = np.abs(px.astype(np.int64))
    return (sample_rate, px.shape[0], int(a.sum()), int(a.max(initial=0)))


def fake_decode_features(payload: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for decode: derives (width, height, n_frames)
    from the payload bytes so the distributed plumbing is verifiable."""
    return (
        payload[0] % 64 + 1,
        payload[1] % 64 + 1,
        len(payload) % 16 + 1,
    )


REAL_DECODE_SCHEMA = (
    "doc_id long, width int, height int, n_pixels long, total_luma_milli long"
)


def synth_images(docs: DataFrame) -> DataFrame:
    """Deterministic image fixtures, generated EXECUTOR-SIDE (payload bytes
    never touch the driver): per doc, a (doc_id%16+1) x (doc_id%8+1) image
    with an R gradient ((doc_id+i)%256 over pixel index i) and solid G/B
    channels, encoded PPM for even doc_ids and BMP for odd — both real
    wire formats, so the decode stage reads actual headers, padding, and
    channel order."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                w, h = doc_id % 16 + 1, doc_id % 8 + 1
                i = np.arange(w * h, dtype=np.int64)
                rgb = np.stack(
                    [
                        ((doc_id + i) % 256).astype(np.uint8),
                        np.full(w * h, (doc_id * 7) % 256, np.uint8),
                        np.full(w * h, (doc_id * 13) % 256, np.uint8),
                    ],
                    axis=1,
                ).reshape(h, w, 3)
                enc = encode_ppm if doc_id % 2 == 0 else encode_bmp
                payloads.append(enc(w, h, rgb))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    return docs.select("doc_id").mapInPandas(gen, "doc_id long, payload binary")


def decode_real_features(media: DataFrame) -> DataFrame:
    """The REAL decode stage: sniffs each payload's magic bytes and runs
    the native PPM/BMP parser (decode_media). Same 100 TB shape as
    decode_features — partition-local Arrow batches, no shuffle, binary in
    / small features out."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                (int(d), *decode_media(bytes(p)))
                for d, p in zip(pdf["doc_id"], pdf["payload"])
            ]
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "width", "height", "n_pixels", "total_luma_milli",
                ],
            )

    return media.mapInPandas(run, REAL_DECODE_SCHEMA)


AUDIO_DECODE_SCHEMA = (
    "doc_id long, sample_rate int, n_samples int, sum_abs long, peak int"
)


def synth_audio(docs: DataFrame) -> DataFrame:
    """Deterministic WAV fixtures, generated EXECUTOR-SIDE: per doc, mono
    16-bit PCM at 8/12/16 kHz (by doc_id%3) with doc_id%100+50 samples of
    the integer waveform (doc_id*31 + i*17) % 2048 - 1024 — closed-form, so
    a SQL oracle can recompute every feature without touching audio."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                rate = 8000 + (doc_id % 3) * 4000
                n = doc_id % 100 + 50
                i = np.arange(n, dtype=np.int64)
                wave = ((doc_id * 31 + i * 17) % 2048 - 1024).astype(np.int16)
                payloads.append(encode_wav(rate, wave))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    return docs.select("doc_id").mapInPandas(gen, "doc_id long, payload binary")


def decode_audio_features(media: DataFrame) -> DataFrame:
    """mapInPandas WAV decode stage: same 100 TB shape as the image path —
    partition-local Arrow batches, no shuffle, binary in / tiny features
    out."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                (int(d), *audio_features(bytes(p)))
                for d, p in zip(pdf["doc_id"], pdf["payload"])
            ]
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "sample_rate", "n_samples", "sum_abs", "peak"],
            )

    return media.mapInPandas(run, AUDIO_DECODE_SCHEMA)


def decode_features(media: DataFrame) -> DataFrame:
    """mapInPandas decode stage: Arrow batches in, feature rows out.

    This is the real 100 TB-shaped operator: per-partition, batch-at-a-time,
    no shuffle, binary column consumed and dropped on output (decoded
    features are ~10^3x smaller than payloads)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [fake_decode_features(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": [f[0] for f in feats],
                    "height": [f[1] for f in feats],
                    "n_frames": [f[2] for f in feats],
                }
            )

    return media.mapInPandas(run, DECODE_OUT_SCHEMA)
