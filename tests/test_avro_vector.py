"""Vectorized avro block codec (formats/avro_vector.py) vs the row codec.

The vector lane must be BYTE-IDENTICAL to the spec-exact closure encoder
and decode its output losslessly — these tests pin that equivalence on
adversarial data (nulls, negatives, 9-byte varints, empty/unicode strings),
plus the structural-fallback and empty-write behaviors.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyspark.sql.types as T
import pytest

from apache_flink_spark.formats import avro_format as A
from apache_flink_spark.formats import avro_vector as V


def _batch_and_schema(n=2000, seed=7):
    rng = np.random.default_rng(seed)
    longs = rng.integers(-(2**62), 2**62, n)
    lmask = rng.random(n) < 0.15
    doubles = rng.normal(size=n) * 1e8
    dmask = rng.random(n) < 0.1
    strs = pa.array(
        [
            None
            if rng.random() < 0.1
            else ("" if rng.random() < 0.1 else "v" * int(rng.integers(0, 40)) + "é☃Å")
            for _ in range(n)
        ]
    )
    ts = pa.array(rng.integers(0, 2**44, n), type=pa.int64()).cast(
        pa.timestamp("us", tz="UTC")
    )
    ints = pa.array(rng.integers(-(2**31), 2**31 - 1, n), type=pa.int32())
    bools = pa.array(rng.random(n) < 0.5)
    batch = pa.RecordBatch.from_arrays(
        [
            pa.array(longs, mask=lmask),
            pa.array(doubles, mask=dmask),
            strs,
            ts,
            ints,
            bools,
        ],
        names=["l", "d", "s", "t", "i", "b"],
    )
    schema = T.StructType(
        [
            T.StructField("l", T.LongType()),
            T.StructField("d", T.DoubleType()),
            T.StructField("s", T.StringType()),
            T.StructField("t", T.TimestampType(), False),
            T.StructField("i", T.IntegerType(), False),
            T.StructField("b", T.BooleanType(), False),
        ]
    )
    return batch, A.spark_to_avro(schema)


def _row_encode(batch, asch):
    enc = A.make_encoder(asch)
    out = bytearray()
    cols = [c.to_pylist() for c in batch.columns]
    for row in zip(*cols):
        enc(row, out)
    return bytes(out)


def test_encode_byte_identical_to_row_codec():
    batch, asch = _batch_and_schema()
    assert V.encode_block(batch, asch) == _row_encode(batch, asch)


def test_decode_roundtrip_lossless():
    batch, asch = _batch_and_schema(seed=11)
    body = V.encode_block(batch, asch)
    cols = V.decode_block(body, batch.num_rows, asch)
    back = pa.RecordBatch.from_arrays(cols, names=batch.schema.names)
    for i, name in enumerate(batch.schema.names):
        got = back.column(i)
        want = batch.column(i)
        if got.type != want.type:
            got = got.cast(want.type)
        assert got.equals(want), f"column {name} mismatch"


def test_decode_row_codec_bytes():
    """Vector decoder reads what the row encoder wrote (cross-lane)."""
    batch, asch = _batch_and_schema(seed=23)
    body = _row_encode(batch, asch)
    cols = V.decode_block(body, batch.num_rows, asch)
    assert pa.RecordBatch.from_arrays(cols, names=batch.schema.names).column(
        2
    ).cast(pa.string()).equals(batch.column(2))


def test_empty_block():
    batch, asch = _batch_and_schema(n=16)
    cols = V.decode_block(b"", 0, asch)
    assert all(len(c) == 0 for c in cols)
    assert V.encode_block(batch.slice(0, 0), asch) == b""


def test_nested_schema_not_vector_ok():
    schema = T.StructType(
        [T.StructField("m", T.MapType(T.StringType(), T.LongType()))]
    )
    assert not V.vector_ok(A.spark_to_avro(schema))


def test_corrupt_block_raises():
    batch, asch = _batch_and_schema(n=64)
    body = V.encode_block(batch, asch)
    with pytest.raises(V.BlockDecodeError):
        V.decode_block(body[: len(body) // 2], batch.num_rows, asch)
    with pytest.raises(V.BlockDecodeError):
        V.decode_block(body + b"\x00", batch.num_rows, asch)


def test_container_arrow_roundtrip(tmp_path):
    batch, asch = _batch_and_schema(seed=31)
    p = str(tmp_path / "t.avro")
    n = A.write_container_arrow(p, asch, [batch])
    assert n == batch.num_rows
    # row decoder reads the vector-written file (container-level parity)
    rows = list(A.read_container(p))
    assert len(rows) == batch.num_rows
    assert rows[0][0] == batch.column(0)[0].as_py()
    # vector decoder reads it too
    total = sum(len(arrays[0]) for arrays in A.read_container_arrow(p))
    assert total == batch.num_rows


def test_empty_write_dir_roundtrip(spark, sf_dir):
    """ADVICE r4: an empty-DataFrame avro write must leave a readable,
    schema-carrying directory that round-trips to an empty DataFrame."""
    import tempfile

    from apache_flink_spark import io

    src = spark.read.parquet(f"{sf_dir}/region.parquet").limit(0)
    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/empty_avro"
        io.write_avro(src, path)
        back = io.read_avro(spark, path)
        assert back.count() == 0
        assert back.columns == src.columns


def test_array_float_roundtrip_byte_identical():
    """r5 array-f4 lane: list<float> columns (embeddings) encode byte-
    identically to the row codec, including null rows and EMPTY arrays
    (terminator-only encoding), and decode losslessly."""
    rng = np.random.default_rng(3)
    n = 800
    lens = rng.integers(0, 6, n)
    vecs = [
        None
        if rng.random() < 0.15
        else [float(np.float32(x)) for x in rng.normal(size=k)]
        for k in lens
    ]
    ids = pa.array(rng.integers(0, 10**6, n))
    emb = pa.array(vecs, type=pa.list_(pa.float32()))
    batch = pa.RecordBatch.from_arrays([ids, emb], names=["id", "emb"])
    schema = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("emb", T.ArrayType(T.FloatType(), False)),
        ]
    )
    asch = A.spark_to_avro(schema)
    assert V.vector_ok(asch)
    body = V.encode_block(batch, asch)
    enc = A.make_encoder(asch)
    ref = bytearray()
    for i in range(n):
        enc((ids[i].as_py(), vecs[i]), ref)
    assert bytes(ref) == body
    cols = V.decode_block(body, n, asch)
    assert cols[1].cast(pa.list_(pa.float32())).equals(emb)
    assert cols[0].equals(ids)


def test_array_nullable_items_falls_back():
    schema = T.StructType(
        [T.StructField("emb", T.ArrayType(T.FloatType(), True))]
    )
    assert not V.vector_ok(A.spark_to_avro(schema))


def test_multi_block_container_roundtrip(tmp_path):
    """Container files with MULTIPLE blocks (>_BLOCK_ROWS rows): the
    vector writer splits at 4096-row boundaries, both decoders see every
    block, and a ROW-codec-written multi-block file reads back through
    the vector lane."""
    batch, asch = _batch_and_schema(n=9000, seed=41)
    p = str(tmp_path / "multi.avro")
    n = A.write_container_arrow(p, asch, [batch])
    assert n == 9000
    blocks = list(A.read_container_arrow(p))
    assert len(blocks) == 3  # 4096 + 4096 + 808
    assert sum(len(b[0]) for b in blocks) == 9000
    assert sum(1 for _ in A.read_container(p)) == 9000
    # row-codec writer -> vector reader
    p2 = str(tmp_path / "rowmulti.avro")
    cols = [c.to_pylist() for c in batch.columns]
    A.write_container(p2, asch, list(zip(*cols)))
    total = 0
    for arrays in A.read_container_arrow(p2):
        total += len(arrays[0])
    assert total == 9000
