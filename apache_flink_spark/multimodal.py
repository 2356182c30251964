"""Multimodal column support — opaque binary payloads + typed metadata +
Pandas-UDF decode plumbing.

North-star addition (task brief): image/audio/video are modeled as
``binary`` columns with a typed metadata struct; decode / feature-extract /
resize / frame-sample run as Arrow-batched ``mapInPandas`` stages. The
actual codec libraries are NOT in this container, so the codec call is
stubbed behind ``decode_media`` (NotImplementedError) with a deterministic
fake (``fake_decode_features``) standing in — the Spark-side plumbing
(schema, batch iteration, partitioning) is real and oracle-tested.

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


def decode_media(payload: bytes, media_type: str):
    """Real codec entry point — requires PIL/ffmpeg/librosa, which are not
    installed in this environment. The pipeline wires through
    ``fake_decode_features`` instead; swap this in when codecs exist."""
    raise NotImplementedError(
        "media codecs (PIL/ffmpeg) are not available in this container; "
        "use fake_decode_features for the deterministic stub"
    )


def fake_decode_features(payload: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for decode: derives (width, height, n_frames)
    from the payload bytes so the distributed plumbing is verifiable."""
    return (
        payload[0] % 64 + 1,
        payload[1] % 64 + 1,
        len(payload) % 16 + 1,
    )


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
