"""Multimodal pipeline inventory — metadata, stubbed decode, frame sampling.

Queries over the synthesized media table (apache_flink_spark/multimodal.py):
binary payloads with typed metadata, decoded via Arrow-batched mapInPandas.
The fake decode is byte-deterministic, so even the Python decode stage is
DuckDB-oracle-checkable (payload == utf-8 text bytes, ASCII in the fixture).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from apache_flink_spark.multimodal import decode_features, media_table
from apache_flink_spark.queries.registry import query


@query(
    "mm_binary_metadata",
    oracle="""
    SELECT doc_id,
           ['image', 'audio', 'video'][(doc_id % 3) + 1] AS media_type,
           octet_length(encode(text)) AS n_bytes,
           md5(text) AS payload_md5,
           hex(encode(substring(text, 1, 4))) AS header_hex
    FROM documents
    """,
)
def mm_binary_metadata(spark, sf_dir):
    """Typed metadata over opaque binary payloads: size, digest, magic-bytes
    header — all computed without decoding, scan-prunable at scale."""
    m = media_table(spark, sf_dir)
    return m.select(
        "doc_id",
        "media_type",
        F.col("meta.n_bytes").alias("n_bytes"),
        F.md5("payload").alias("payload_md5"),
        F.hex(F.substring("payload", 1, 4)).alias("header_hex"),
    )


@query(
    "mm_decode_features",
    oracle="""
    SELECT doc_id,
           ascii(substring(text, 1, 1)) % 64 + 1 AS width,
           ascii(substring(text, 2, 1)) % 64 + 1 AS height,
           octet_length(encode(text)) % 16 + 1 AS n_frames
    FROM documents
    """,
)
def mm_decode_features(spark, sf_dir):
    """The mapInPandas decode stage (stubbed codec, real plumbing): Arrow
    batches of binary payloads -> feature rows. The oracle recomputes the
    byte-deterministic fake decode in SQL, validating batch handling,
    schema, and partition-parallel execution end-to-end."""
    return decode_features(media_table(spark, sf_dir))


@query(
    "mm_frame_sample",
    oracle="""
    SELECT doc_id, t.frame_idx
    FROM (
        SELECT doc_id, octet_length(encode(text)) % 16 + 1 AS n_frames
        FROM documents
        WHERE doc_id % 3 = 2
    ), unnest(generate_series(0, n_frames - 1, 4)) AS t(frame_idx)
    """,
)
def mm_frame_sample(spark, sf_dir):
    """Frame sampling for video payloads: every 4th frame index from the
    decoded frame count — generator explode, no shuffle; the downstream
    per-frame decode would map over (doc_id, frame_idx) pairs."""
    m = media_table(spark, sf_dir)
    decoded = decode_features(m.filter(F.col("media_type") == "video"))
    return decoded.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(4))
        ).alias("frame_idx"),
    )


@query(
    "mm_decode_real_codec",
    oracle="""
    WITH base AS (
        SELECT doc_id,
               doc_id % 16 + 1 AS width,
               doc_id % 8 + 1 AS height,
               (doc_id * 7) % 256 AS g,
               (doc_id * 13) % 256 AS b
        FROM documents
    )
    SELECT base.doc_id,
           CAST(width AS INTEGER) AS width,
           CAST(height AS INTEGER) AS height,
           CAST(width * height AS BIGINT) AS n_pixels,
           CAST(SUM(299 * ((base.doc_id + t.i) % 256) + 587 * g + 114 * b)
                AS BIGINT) AS total_luma_milli
    FROM base, unnest(generate_series(0, width * height - 1)) AS t(i)
    GROUP BY base.doc_id, width, height, g, b
    """,
)
def mm_decode_real_codec(spark, sf_dir):
    """REAL image decode (no codec libraries): deterministic PPM/BMP
    payloads are generated executor-side (R-gradient + solid G/B), then
    the native pure-numpy parser (multimodal.decode_media) reads actual
    wire bytes — P6 headers, BMP bottom-up BGR rows with 4-byte padding —
    and emits width/height/pixel-count/Rec.601 total luma in exact
    integer fixed point. The oracle recomputes the same sum relationally
    (generate_series over pixel indices), so a decoder that misreads
    dimensions, channel order, row padding, or header offsets hash-fails.
    Both mapInPandas stages are narrow: no shuffle, payloads stay on
    executors."""
    from apache_flink_spark.catalog import table
    from apache_flink_spark.multimodal import decode_real_features, synth_images

    docs = table(spark, sf_dir, "documents")
    return decode_real_features(synth_images(docs))


@query(
    "mm_audio_features",
    oracle="""
    SELECT d.doc_id,
           CAST(8000 + (d.doc_id % 3) * 4000 AS INTEGER) AS sample_rate,
           CAST(d.doc_id % 100 + 50 AS INTEGER) AS n_samples,
           CAST(SUM(ABS((d.doc_id * 31 + t.i * 17) % 2048 - 1024))
                AS BIGINT) AS sum_abs,
           CAST(MAX(ABS((d.doc_id * 31 + t.i * 17) % 2048 - 1024))
                AS INTEGER) AS peak
    FROM documents d, unnest(generate_series(0, d.doc_id % 100 + 49)) AS t(i)
    GROUP BY d.doc_id
    """,
)
def mm_audio_features(spark, sf_dir):
    """REAL audio decode (no codec libraries): deterministic 16-bit PCM WAV
    payloads are generated executor-side (RIFF/fmt/data chunks, a
    closed-form integer waveform), then multimodal.decode_wav walks the
    RIFF chunks and emits sample-rate / sample-count / integer amplitude
    features. The oracle recomputes the waveform relationally, so a parser
    that misreads chunk sizes, the fmt layout, or int16 endianness
    hash-fails. Both mapInPandas stages are narrow — payloads never leave
    the executors."""
    from apache_flink_spark.catalog import table
    from apache_flink_spark.multimodal import decode_audio_features, synth_audio

    docs = table(spark, sf_dir, "documents")
    return decode_audio_features(synth_audio(docs))
