"""Decoder-level CDC tests on handcrafted wire-format JSON.

The registered cdc_* queries prove end-to-end materialization against the
DuckDB oracle; these pin the decoder edge cases the round-trip fixture
can't distinguish: partial old-image patching, multi-row canal batches,
unknown-op skipping, and the exact RowKind sequences per op.
"""

from __future__ import annotations

import pytest

from pyspark.sql.types import IntegerType, StringType, StructField, StructType

from apache_flink_spark.cdc import (
    parse_canal,
    parse_debezium,
    parse_maxwell,
    parse_ogg,
)

SCHEMA = StructType(
    [
        StructField("id", IntegerType()),
        StructField("name", StringType()),
        StructField("qty", IntegerType()),
    ]
)


def _rows(spark, payloads):
    return spark.createDataFrame([(p,) for p in payloads], "value string")


def _collect(df):
    return sorted(
        (r["__rowkind"], r["id"], r["name"], r["qty"]) for r in df.collect()
    )


def test_debezium_ops(spark):
    out = parse_debezium(
        _rows(
            spark,
            [
                '{"before": null, "after": {"id": 1, "name": "a", "qty": 5}, "op": "c", "ts_ms": 1}',
                '{"before": null, "after": {"id": 2, "name": "b", "qty": 6}, "op": "r", "ts_ms": 2}',
                '{"before": {"id": 1, "name": "a", "qty": 5}, "after": {"id": 1, "name": "a2", "qty": 7}, "op": "u", "ts_ms": 3}',
                '{"before": {"id": 2, "name": "b", "qty": 6}, "after": null, "op": "d", "ts_ms": 4}',
                '{"before": null, "after": {"id": 9, "name": "x", "qty": 9}, "op": "t", "ts_ms": 5}',
            ],
        ),
        SCHEMA,
    )
    assert _collect(out) == [
        ("+I", 1, "a", 5),
        ("+I", 2, "b", 6),
        ("+U", 1, "a2", 7),
        ("-D", 2, "b", 6),
        ("-U", 1, "a", 5),
    ]


def test_canal_multirow_and_partial_old(spark):
    out = parse_canal(
        _rows(
            spark,
            [
                # one envelope, two inserted rows
                '{"data": [{"id": 1, "name": "a", "qty": 1}, {"id": 2, "name": "b", "qty": 2}], "old": null, "type": "INSERT", "ts": 1}',
                # two updated rows; old[i] carries ONLY the changed column
                '{"data": [{"id": 1, "name": "a", "qty": 10}, {"id": 2, "name": "b2", "qty": 2}], '
                '"old": [{"qty": 1}, {"name": "b"}], "type": "UPDATE", "ts": 2}',
                '{"data": [{"id": 1, "name": "a", "qty": 10}], "old": null, "type": "DELETE", "ts": 3}',
                '{"data": [{"id": 7, "name": "z", "qty": 7}], "old": null, "type": "CREATE", "ts": 4}',
            ],
        ),
        SCHEMA,
    )
    assert _collect(out) == [
        ("+I", 1, "a", 1),
        ("+I", 2, "b", 2),
        ("+U", 1, "a", 10),
        ("+U", 2, "b2", 2),
        ("-D", 1, "a", 10),
        # before-images rebuilt by patching old over data:
        ("-U", 1, "a", 1),
        ("-U", 2, "b", 2),
    ]


def test_maxwell_partial_old(spark):
    out = parse_maxwell(
        _rows(
            spark,
            [
                '{"type": "insert", "data": {"id": 1, "name": "a", "qty": 1}, "ts": 1}',
                '{"type": "update", "data": {"id": 1, "name": "a", "qty": 9}, "old": {"qty": 1}, "ts": 2}',
                '{"type": "delete", "data": {"id": 1, "name": "a", "qty": 9}, "ts": 3}',
                '{"type": "bootstrap-start", "data": {"id": 5, "name": "q", "qty": 5}, "ts": 4}',
            ],
        ),
        SCHEMA,
    )
    assert _collect(out) == [
        ("+I", 1, "a", 1),
        ("+U", 1, "a", 9),
        ("-D", 1, "a", 9),
        ("-U", 1, "a", 1),
    ]


def test_ogg_ops(spark):
    out = parse_ogg(
        _rows(
            spark,
            [
                '{"before": null, "after": {"id": 3, "name": "c", "qty": 3}, "op_type": "I", "op_ts": "2024-01-01 00:00:00.000000"}',
                '{"before": {"id": 3, "name": "c", "qty": 3}, "after": {"id": 3, "name": "c", "qty": 4}, "op_type": "U", "op_ts": "2024-01-01 00:00:01.000000"}',
                '{"before": {"id": 3, "name": "c", "qty": 4}, "after": null, "op_type": "D", "op_ts": "2024-01-01 00:00:02.000000"}',
            ],
        ),
        SCHEMA,
    )
    assert _collect(out) == [
        ("+I", 3, "c", 3),
        ("+U", 3, "c", 4),
        ("-D", 3, "c", 4),
        ("-U", 3, "c", 3),
    ]


def test_decode_plan_is_udf_free(spark):
    """The decode stage must stay JVM-side: no Python eval nodes."""
    df = parse_debezium(
        _rows(spark, ['{"before": null, "after": {"id": 1, "name": "a", "qty": 5}, "op": "c", "ts_ms": 1}']),
        SCHEMA,
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


@pytest.mark.parametrize("bad", ['not json at all', '{"op": "u"}'])
def test_garbage_envelopes_dropped(spark, bad):
    out = parse_debezium(_rows(spark, [bad]), SCHEMA)
    assert out.count() == 0


def test_debezium_decode_runs_on_readstream(spark):
    """The decode expressions are stateless Catalyst exprs, so the SAME
    parse_debezium call must work on a streaming source (the Kafka-value
    shape) — pinned by draining a file stream through it and comparing to
    the batch decode of the same lines."""
    import os
    import tempfile

    import pandas as pd

    lines = [
        '{"before": null, "after": {"id": 1, "name": "a", "qty": 5}, "op": "c", "ts_ms": 1}',
        '{"before": {"id": 1, "name": "a", "qty": 5}, "after": {"id": 1, "name": "b", "qty": 6}, "op": "u", "ts_ms": 2}',
        '{"before": {"id": 1, "name": "b", "qty": 6}, "after": null, "op": "d", "ts_ms": 3}',
    ]
    d = tempfile.mkdtemp(prefix="afs_cdc_stream_")
    with open(os.path.join(d, "cdc.jsonl"), "w") as f:
        f.write("\n".join(lines) + "\n")

    stream = spark.readStream.format("text").load(d)
    decoded = parse_debezium(stream, SCHEMA)

    captured: list[pd.DataFrame] = []

    def sink(batch_df, _bid):
        captured.append(batch_df.toPandas())

    ckpt = tempfile.mkdtemp(prefix="afs_cdc_ckpt_")
    q = (
        decoded.writeStream.foreachBatch(sink)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = sorted(
        (r["__rowkind"], r["id"], r["name"], r["qty"])
        for pdf in captured
        for r in pdf.to_dict("records")
    )
    want = _collect(
        parse_debezium(spark.read.format("text").load(d), SCHEMA)
    )
    assert got == want == [
        ("+I", 1, "a", 5),
        ("+U", 1, "b", 6),
        ("-D", 1, "b", 6),
        ("-U", 1, "a", 5),
    ]


def test_canal_stringified_values_coerce(spark):
    """Real canal wire format stringifies EVERY column value; the decoder
    must cast them per the table schema (the typed-value form decodes
    identically through the same path)."""
    out = parse_canal(
        _rows(
            spark,
            [
                '{"data": [{"id": "1", "name": "a", "qty": "5"}], "old": null, "type": "INSERT", "ts": "1690000000000"}',
                '{"data": [{"id": "1", "name": "a", "qty": "9"}], "old": [{"qty": "5"}], "type": "UPDATE", "ts": 1690000000001}',
            ],
        ),
        SCHEMA,
    )
    assert _collect(out) == [
        ("+I", 1, "a", 5),
        ("+U", 1, "a", 9),
        ("-U", 1, "a", 5),
    ]


def test_debezium_ignore_parse_errors_modes(spark):
    """flink-json's ignore-parse-errors option parity: lenient mode drops
    undecodable envelopes and keeps decoding; strict mode (the reference
    default) fails on the first malformed value."""
    import pytest
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, StructField, StructType
    from pyspark.sql.utils import AnalysisException  # noqa: F401

    from apache_flink_spark import cdc

    schema = StructType(
        [StructField("id", LongType()), StructField("v", LongType())]
    )
    good = '{"op":"c","after":{"id":1,"v":10},"before":null,"ts_ms":1}'
    bad = "{definitely not json"
    df = spark.createDataFrame([(good,), (bad,), (None,)], "value string")

    lenient = cdc.parse_debezium(df, schema).collect()
    assert len(lenient) == 1 and lenient[0].id == 1

    with pytest.raises(Exception, match="Malformed|MALFORMED"):
        cdc.parse_debezium(
            df, schema, ignore_parse_errors=False
        ).collect()

    # strict mode passes cleanly when every value decodes
    ok = cdc.parse_debezium(
        df.filter(F.col("value") != bad), schema, ignore_parse_errors=False
    ).collect()
    assert len(ok) == 1


def test_wire_stream_matches_union_formulation(spark):
    """r13 optimization pin: the one-pass wire builders (conditional
    explode of row + trailing-delete envelopes over a single windowed
    base — `_wire_rows_and_dels`) must emit exactly the same envelope
    MULTISET as the pre-r13 rows.unionAll(dels) formulation. Envelope
    order is irrelevant (materialize re-orders by ts/event_id/rowkind),
    so compare sorted JSON strings."""
    from pyspark.sql import functions as F

    from apache_flink_spark.queries import cdc_queries as cq

    sf_dir = "/root/testdata/sf0.001"
    got = sorted(
        r.value for r in cq._debezium_wire(spark, sf_dir).collect()
    )

    # reference formulation: independent rows + dels branches
    base = cq._cdc_base(spark, sf_dir)
    ts_ms = (F.col("ts_us") / 1000).cast("long")
    from apache_flink_spark.cdc import to_debezium_json

    rows = base.select(
        to_debezium_json(
            F.when(F.col("prev_c").isNull(), F.lit("c")).otherwise(
                F.lit("u")
            ),
            F.when(
                F.col("prev_c").isNotNull(), cq._img("prev_")
            ).otherwise(cq._null_img()),
            cq._img(),
            ts_ms,
        ).alias("value")
    )
    dels = base.filter(cq._is_delete_key()).select(
        to_debezium_json(
            F.lit("d"), cq._img(), cq._null_img(), ts_ms
        ).alias("value")
    )
    want = sorted(r.value for r in rows.unionAll(dels).collect())

    assert got == want and len(got) > 0
