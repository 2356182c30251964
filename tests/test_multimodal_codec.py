"""Native PPM/BMP codec unit tests (pure numpy, no Spark needed for most).

The registered mm_decode_real_codec query pins the distributed
end-to-end path against the DuckDB oracle; these pin the parser edge
cases: round-trips, BMP row padding, bottom-up order, PPM header
comments, truncation, and the loud unsupported-format gate.
"""

from __future__ import annotations

import numpy as np
import pytest

from apache_flink_spark.multimodal import (
    decode_bmp,
    decode_media,
    decode_ppm,
    encode_bmp,
    encode_ppm,
)


def _img(w, h, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


@pytest.mark.parametrize("w,h", [(1, 1), (3, 2), (16, 8), (5, 7)])
def test_ppm_roundtrip(w, h):
    img = _img(w, h, seed=w * 100 + h)
    got_w, got_h, got = decode_ppm(encode_ppm(w, h, img))
    assert (got_w, got_h) == (w, h)
    np.testing.assert_array_equal(got, img)


@pytest.mark.parametrize("w,h", [(1, 1), (3, 2), (16, 8), (5, 7)])
def test_bmp_roundtrip(w, h):
    """Widths 1/3/5 force nonzero row padding (3w not divisible by 4)."""
    img = _img(w, h, seed=w * 100 + h)
    got_w, got_h, got = decode_bmp(encode_bmp(w, h, img))
    assert (got_w, got_h) == (w, h)
    np.testing.assert_array_equal(got, img)


def test_bmp_bottom_up_and_bgr():
    """Hand-check byte layout: 1x2 image, rows stored bottom-up as BGR."""
    img = np.array([[[10, 20, 30]], [[40, 50, 60]]], dtype=np.uint8)
    data = encode_bmp(1, 2, img)
    body = data[54:]  # 14 file header + 40 info header
    # first stored row = BOTTOM image row (40,50,60) as BGR + 1-byte pad
    assert body[:3] == bytes([60, 50, 40])
    assert body[4:7] == bytes([30, 20, 10])
    _, _, got = decode_bmp(data)
    np.testing.assert_array_equal(got, img)


def test_ppm_header_comments():
    img = _img(2, 2)
    data = encode_ppm(2, 2, img)
    commented = b"P6\n# a comment\n2 2\n# another\n255\n" + data.split(b"\n", 3)[3]
    got_w, got_h, got = decode_ppm(commented)
    assert (got_w, got_h) == (2, 2)
    np.testing.assert_array_equal(got, img)


def test_ppm_truncated_raises():
    data = encode_ppm(4, 4, _img(4, 4))
    with pytest.raises(ValueError, match="truncated"):
        decode_ppm(data[:-5])


def test_decode_media_features_exact():
    img = np.zeros((2, 2, 3), dtype=np.uint8)
    img[:, :, 0] = 100  # R
    img[:, :, 1] = 50  # G
    img[:, :, 2] = 200  # B
    w, h, n, luma = decode_media(encode_ppm(2, 2, img))
    assert (w, h, n) == (2, 2, 4)
    assert luma == 4 * (299 * 100 + 587 * 50 + 114 * 200)
    # identical features regardless of container format
    assert decode_media(encode_bmp(2, 2, img)) == (w, h, n, luma)


def test_decode_media_unknown_format_raises():
    with pytest.raises(NotImplementedError, match="PIL/ffmpeg"):
        decode_media(b"\x89PNG\r\n\x1a\n....")


def test_bmp_unsupported_bpp_raises():
    data = bytearray(encode_bmp(2, 2, _img(2, 2)))
    data[28] = 8  # claim 8bpp
    with pytest.raises(NotImplementedError, match="24-bit"):
        decode_bmp(bytes(data))


# ----------------------------------------------------------------- WAV codec


def test_wav_roundtrip_mono():
    from apache_flink_spark.multimodal import decode_wav, encode_wav

    wave = np.array([0, 1, -1, 32767, -32768, 123], dtype=np.int16)
    rate, ch, back = decode_wav(encode_wav(8000, wave))
    assert (rate, ch) == (8000, 1)
    assert back.shape == (6, 1)
    assert np.array_equal(back[:, 0], wave)


def test_wav_roundtrip_stereo():
    from apache_flink_spark.multimodal import decode_wav, encode_wav

    rng = np.random.default_rng(7)
    wave = rng.integers(-32768, 32768, size=(100, 2), dtype=np.int16)
    rate, ch, back = decode_wav(encode_wav(44100, wave))
    assert (rate, ch) == (44100, 2)
    assert np.array_equal(back, wave)


def test_wav_skips_unknown_chunks():
    """Foreign chunks (LIST/INFO metadata) must be walked over per the RIFF
    spec, including the odd-size word-alignment pad."""
    import struct

    from apache_flink_spark.multimodal import decode_wav, encode_wav

    wave = np.array([5, -5, 7], dtype=np.int16)
    raw = encode_wav(16000, wave)
    # splice a 3-byte (odd) LIST chunk between fmt and data
    fmt_end = raw.index(b"data")
    extra = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"  # pad byte
    spliced = raw[:fmt_end] + extra + raw[fmt_end:]
    rate, ch, back = decode_wav(spliced)
    assert rate == 16000 and np.array_equal(back[:, 0], wave)


def test_wav_rejects_non_pcm():
    import struct

    from apache_flink_spark.multimodal import decode_wav, encode_wav

    raw = bytearray(encode_wav(8000, np.array([1], dtype=np.int16)))
    fmt_at = raw.index(b"fmt ") + 8
    struct.pack_into("<H", raw, fmt_at, 3)  # IEEE float format code
    with pytest.raises(NotImplementedError, match="16-bit integer PCM"):
        decode_wav(bytes(raw))


def test_wav_rejects_bad_magic():
    from apache_flink_spark.multimodal import decode_wav

    with pytest.raises(ValueError, match="RIFF/WAVE"):
        decode_wav(b"OggS" + b"\x00" * 40)


def test_audio_features_exact():
    from apache_flink_spark.multimodal import audio_features, encode_wav

    wave = np.array([10, -20, 0, 5], dtype=np.int16)
    rate, n, sum_abs, peak = audio_features(encode_wav(12000, wave))
    assert (rate, n, sum_abs, peak) == (12000, 4, 35, 20)
