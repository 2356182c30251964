"""CDC ingestion formats: debezium / canal / maxwell / ogg JSON -> changelog.

Reference parity (SURVEY.md §2.1 formats): the reference ships all four CDC
JSON formats in flink-formats/flink-json —
``DebeziumJsonDeserializationSchema.java:56``,
``CanalJsonDeserializationSchema.java``, ``MaxwellJsonDeserializationSchema
.java``, ``OggJsonDeserializationSchema.java`` — each turning a CDC wire
envelope into RowKind-stamped rows. Here each ``parse_*`` turns a DataFrame
with a JSON string column into ``__rowkind``-stamped payload rows (the
engine's changelog convention, ``changelog.py``), feeding
``changelog.materialize`` / ``drop_update_before`` downstream. ``to_*_json``
are the matching serializers (the reference formats are bidirectional too).

Every decoder is a single narrow JVM pass: ``from_json`` -> conditional
``array(struct(kind,row))`` -> ``explode``. No Python UDFs, no shuffle —
at 100 TB the decode stage is embarrassingly parallel and whole-stage
codegen'd, and the SAME expressions run unchanged on a Kafka ``readStream``
value column (decoding is stateless).

Envelope shapes handled (public wire formats):
  debezium: {"before": r|null, "after": r|null, "op": "c|r|u|d", "ts_ms": n}
  canal:    {"data": [r,...], "old": [partial,...]|null,
             "type": "INSERT|UPDATE|DELETE", "ts": n}
  maxwell:  {"data": r, "old": partial|null,
             "type": "insert|update|delete", "ts": n}
  ogg:      {"before": r|null, "after": r|null, "op_type": "I|U|D",
             "op_ts": s}
``partial`` old-images (canal/maxwell carry only the CHANGED columns in
``old``) are patched over the new image per-field to reconstruct the full
before-row, as the reference deserializers do.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from apache_flink_spark.changelog import (
    DELETE,
    INSERT,
    ROWKIND_COL,
    UPDATE_AFTER,
    UPDATE_BEFORE,
)


def _kinded(kind: str, row: Column) -> Column:
    return F.struct(F.lit(kind).alias("kind"), row.alias("row"))


def _emit(parsed: DataFrame, cases: Column) -> DataFrame:
    """Explode the conditional kind/row array into __rowkind-stamped rows.

    Envelopes whose op matches no case (or with a null payload for their
    kind) are dropped, matching the reference deserializers' skip-on-
    unknown-op behavior.
    """
    return (
        parsed.select(F.explode(cases).alias("x"))
        .filter(F.col("x.row").isNotNull())
        .select(F.col("x.kind").alias(ROWKIND_COL), "x.row.*")
    )


def parse_debezium(
    df: DataFrame,
    payload_schema: StructType,
    value_col: str = "value",
    ignore_parse_errors: bool = True,
) -> DataFrame:
    """Debezium JSON envelope -> changelog rows
    (ref DebeziumJsonDeserializationSchema.java:56 op mapping: c/r -> +I,
    u -> -U(before) +U(after), d -> -D(before)).

    ``ignore_parse_errors`` mirrors the reference format option of the
    same name: True (default here) silently drops undecodable envelopes —
    PERMISSIVE from_json yields an all-null struct, whose null op falls
    through _emit's skip case; False reproduces the reference's fail-fast
    default via FAILFAST parse mode, raising on the first malformed value
    while the scan stays distributed."""
    env = StructType(
        [
            StructField("before", payload_schema),
            StructField("after", payload_schema),
            StructField("op", StringType()),
            StructField("ts_ms", LongType()),
        ]
    )
    opts = {} if ignore_parse_errors else {"mode": "FAILFAST"}
    e = df.select(
        F.from_json(F.col(value_col), env, opts).alias("e")
    ).select("e.*")
    cases = (
        F.when(
            F.col("op").isin("c", "r"), F.array(_kinded(INSERT, F.col("after")))
        )
        .when(
            F.col("op") == "u",
            F.array(
                _kinded(UPDATE_BEFORE, F.col("before")),
                _kinded(UPDATE_AFTER, F.col("after")),
            ),
        )
        .when(F.col("op") == "d", F.array(_kinded(DELETE, F.col("before"))))
        .otherwise(F.array().cast(ArrayType(_kind_row_type(payload_schema))))
    )
    return _emit(e, cases)


def parse_ogg(
    df: DataFrame, payload_schema: StructType, value_col: str = "value"
) -> DataFrame:
    """Oracle GoldenGate JSON envelope -> changelog rows
    (ref OggJsonDeserializationSchema.java: I -> +I, U -> -U/+U, D -> -D)."""
    env = StructType(
        [
            StructField("before", payload_schema),
            StructField("after", payload_schema),
            StructField("op_type", StringType()),
            StructField("op_ts", StringType()),
        ]
    )
    e = df.select(F.from_json(F.col(value_col), env).alias("e")).select("e.*")
    cases = (
        F.when(F.col("op_type") == "I", F.array(_kinded(INSERT, F.col("after"))))
        .when(
            F.col("op_type") == "U",
            F.array(
                _kinded(UPDATE_BEFORE, F.col("before")),
                _kinded(UPDATE_AFTER, F.col("after")),
            ),
        )
        .when(F.col("op_type") == "D", F.array(_kinded(DELETE, F.col("before"))))
        .otherwise(F.array().cast(ArrayType(_kind_row_type(payload_schema))))
    )
    return _emit(e, cases)


def _patched(new_row: Column, old_partial: Column, schema: StructType) -> Column:
    """Reconstruct the full before-image: the partial old-image carries only
    the CHANGED columns; unchanged ones are taken from the new image (ref
    Canal/MaxwellJsonDeserializationSchema old-field patching)."""
    return F.struct(
        *[
            F.coalesce(old_partial.getField(f.name), new_row.getField(f.name)).alias(
                f.name
            )
            for f in schema.fields
        ]
    )


def parse_canal(
    df: DataFrame, payload_schema: StructType, value_col: str = "value"
) -> DataFrame:
    """Canal JSON envelope -> changelog rows (ref
    CanalJsonDeserializationSchema.java). ``data`` is an ARRAY (one MySQL
    binlog event can carry many rows); ``old[i]`` holds row i's changed
    columns on UPDATE.

    Canal STRINGIFIES every column value on the wire (``"qty": "5"``),
    and Spark's ``from_json`` does not coerce quoted numbers into numeric
    fields — so the payload is parsed with an all-string schema and CAST
    per the target schema afterwards, exactly the reference
    deserializer's string-to-rowtype conversion. Unquoted (typed) values
    decode identically through the same path."""
    str_schema = StructType(
        [StructField(f.name, StringType()) for f in payload_schema.fields]
    )
    env = StructType(
        [
            StructField("data", ArrayType(str_schema)),
            StructField("old", ArrayType(str_schema)),
            StructField("type", StringType()),
            StructField("ts", LongType()),
        ]
    )
    e = df.select(F.from_json(F.col(value_col), env).alias("e"))
    ex = e.select(
        F.col("e.type").alias("type"),
        F.posexplode("e.data").alias("pos", "row"),
        F.col("e.old").alias("old"),
    )
    old_item = F.element_at(F.col("old"), F.col("pos") + F.lit(1))
    before = _patched(F.col("row"), old_item, str_schema)
    cases = (
        F.when(F.col("type") == "INSERT", F.array(_kinded(INSERT, F.col("row"))))
        .when(
            F.col("type") == "UPDATE",
            F.array(
                _kinded(UPDATE_BEFORE, before), _kinded(UPDATE_AFTER, F.col("row"))
            ),
        )
        .when(F.col("type") == "DELETE", F.array(_kinded(DELETE, F.col("row"))))
        .otherwise(F.array().cast(ArrayType(_kind_row_type(str_schema))))
    )
    emitted = _emit(ex, cases)
    return emitted.select(
        ROWKIND_COL,
        *[
            F.col(f.name).cast(f.dataType).alias(f.name)
            for f in payload_schema.fields
        ],
    )


def parse_maxwell(
    df: DataFrame, payload_schema: StructType, value_col: str = "value"
) -> DataFrame:
    """Maxwell JSON envelope -> changelog rows (ref
    MaxwellJsonDeserializationSchema.java). ``data`` is the new image;
    ``old`` holds the changed columns' prior values on update."""
    env = StructType(
        [
            StructField("data", payload_schema),
            StructField("old", payload_schema),
            StructField("type", StringType()),
            StructField("ts", LongType()),
        ]
    )
    e = df.select(F.from_json(F.col(value_col), env).alias("e")).select("e.*")
    before = _patched(F.col("data"), F.col("old"), payload_schema)
    cases = (
        F.when(F.col("type") == "insert", F.array(_kinded(INSERT, F.col("data"))))
        .when(
            F.col("type") == "update",
            F.array(
                _kinded(UPDATE_BEFORE, before),
                _kinded(UPDATE_AFTER, F.col("data")),
            ),
        )
        .when(F.col("type") == "delete", F.array(_kinded(DELETE, F.col("data"))))
        .otherwise(F.array().cast(ArrayType(_kind_row_type(payload_schema))))
    )
    return _emit(e, cases)


def _kind_row_type(payload_schema: StructType) -> StructType:
    return StructType(
        [StructField("kind", StringType()), StructField("row", payload_schema)]
    )


# ---------------------------------------------------------------------------
# Serializers (the reference formats encode too). Each takes the changelog
# row layout (__rowkind + payload columns) and emits one JSON envelope per
# changelog EVENT — the -U/+U halves of an update are re-paired by the
# caller passing them as (before, after) columns where the wire format
# needs a single update envelope.
# ---------------------------------------------------------------------------


def to_debezium_json(
    op: Column, before: Column, after: Column, ts_ms: Column
) -> Column:
    """One debezium envelope: op in c/u/d, null before/after as appropriate."""
    return F.to_json(
        F.struct(
            before.alias("before"),
            after.alias("after"),
            op.alias("op"),
            ts_ms.alias("ts_ms"),
        )
    )


def to_maxwell_json(
    mtype: Column, data: Column, old: Column, ts: Column
) -> Column:
    return F.to_json(
        F.struct(
            mtype.alias("type"), data.alias("data"), old.alias("old"), ts.alias("ts")
        )
    )


def to_canal_json(
    ctype: Column, data_arr: Column, old_arr: Column, ts: Column
) -> Column:
    return F.to_json(
        F.struct(
            data_arr.alias("data"),
            old_arr.alias("old"),
            ctype.alias("type"),
            ts.alias("ts"),
        )
    )


def to_ogg_json(
    op_type: Column, before: Column, after: Column, op_ts: Column
) -> Column:
    return F.to_json(
        F.struct(
            before.alias("before"),
            after.alias("after"),
            op_type.alias("op_type"),
            op_ts.alias("op_ts"),
        )
    )
