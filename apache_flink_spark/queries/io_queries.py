"""Connector inventory — values source, partitioned parquet, CSV/JSON
round-trips.

Each query exercises a source/sink from SURVEY.md §2.1 end-to-end: write the
fixture data through the connector to scratch space, read it back, and
produce a result the DuckDB oracle checks against the ORIGINAL table — i.e.
the round-trip must be lossless for the oracle to match.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from apache_flink_spark import io
from apache_flink_spark.queries.registry import query
from apache_flink_spark.queries._util import dsum, t


@query(
    "source_values_inline",
    oracle="""
    SELECT * FROM (VALUES
        (1, 'tumble', 600), (2, 'hop', 300), (3, 'session', NULL),
        (4, 'cumulate', 900)
    ) AS v(id, kind, step_s)
    """,
)
def source_values_inline(spark, sf_dir):
    """Values source (StreamExecValues / fromValues): inline literal rows."""
    return spark.createDataFrame(
        [
            (1, "tumble", 600),
            (2, "hop", 300),
            (3, "session", None),
            (4, "cumulate", 900),
        ],
        "id long, kind string, step_s long",
    )


@query(
    "source_datagen_range",
    oracle="""
    SELECT i AS id, i % 100 AS bucket,
           md5(CAST(i AS VARCHAR)) AS payload,
           CAST(i * 37 % 1000 AS DOUBLE) / 10 AS metric
    FROM generate_series(0, 9999) t(i)
    """,
)
def source_datagen_range(spark, sf_dir):
    """Datagen source (DataGeneratorSource.java:95, deterministic mode):
    synthetic rows from a distributed range + derived expression columns —
    the batch twin of the rate source, partition-parallel with no input
    I/O (spark.range splits the sequence across executors)."""
    df = spark.range(0, 10000)
    return df.select(
        F.col("id"),
        (F.col("id") % 100).alias("bucket"),
        F.md5(F.col("id").cast("string")).alias("payload"),
        ((F.col("id") * 37 % 1000).cast("double") / 10).alias("metric"),
    )


@query(
    "sink_parquet_partitioned",
    oracle="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
           CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(12,4))), 2) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY 1, 2
    """,
)
def sink_parquet_partitioned(spark, sf_dir):
    """Partitioned parquet sink + partition-pruned re-read
    (FileSystemTableFactory parity): write lineitem partitioned by
    l_returnflag, read it back, aggregate. Oracle matching proves the
    round-trip is lossless; reads against one flag value prune to a single
    hive partition directory."""
    li = t(spark, sf_dir, "lineitem")
    path = io.roundtrip_dir(sf_dir, "lineitem_part")
    io.write_parquet_partitioned(
        li.select("l_returnflag", "l_linestatus", "l_quantity"),
        path,
        ["l_returnflag"],
    )
    back = io.read_parquet(spark, path)
    return back.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"), dsum("l_quantity").alias("sum_qty")
    )


@query(
    "source_csv_roundtrip",
    oracle="""
    SELECT event_type, COUNT(*) AS n, MIN(epoch_us(ts)) AS first_ts
    FROM events
    GROUP BY 1
    """,
)
def source_csv_roundtrip(spark, sf_dir):
    """CSV format round-trip (flink-csv parity). Timestamps travel as epoch
    micros (CSV has no timestamp type); schema is explicit on read — never
    schema-infer a large CSV (it costs a full extra scan)."""
    e = t(spark, sf_dir, "events")
    path = io.roundtrip_dir(sf_dir, "events_csv")
    io.write_csv(
        e.select(
            "event_id", F.unix_micros("ts").alias("ts_us"), "user_id", "event_type"
        ),
        path,
    )
    back = io.read_csv(
        spark, path, "event_id long, ts_us long, user_id long, event_type string"
    )
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), F.min("ts_us").alias("first_ts")
    )


@query(
    "source_json_roundtrip",
    oracle="""
    SELECT source, lang, COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY 1, 2
    """,
)
def source_json_roundtrip(spark, sf_dir):
    """JSON-lines format round-trip (flink-json parity)."""
    d = t(spark, sf_dir, "documents")
    path = io.roundtrip_dir(sf_dir, "documents_json")
    io.write_json(d.select("doc_id", "source", "lang", "n_chars"), path)
    back = io.read_json(
        spark, path, "doc_id long, source string, lang string, n_chars long"
    )
    return back.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n"), F.sum("n_chars").alias("total_chars")
    )


@query(
    "source_orc_roundtrip",
    oracle="""
    SELECT o_orderstatus, COUNT(*) AS n,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,4))), 2) AS DOUBLE) AS total
    FROM orders
    GROUP BY 1
    """,
)
def source_orc_roundtrip(spark, sf_dir):
    """ORC format round-trip (flink-orc parity — the reference's second
    vectorized columnar format; Spark's ORC reader is equally vectorized
    with the same pushdown surface as parquet)."""
    o = t(spark, sf_dir, "orders")
    path = io.roundtrip_dir(sf_dir, "orders_orc")
    o.select("o_orderkey", "o_orderstatus", "o_totalprice").write.mode(
        "overwrite"
    ).orc(path)
    back = spark.read.orc(path)
    return back.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"), dsum("o_totalprice").alias("total")
    )


@query(
    "source_text_lines",
    oracle="""
    SELECT COUNT(*) AS n_lines,
           CAST(SUM(length(text)) AS BIGINT) AS total_chars
    FROM documents
    """,
)
def source_text_lines(spark, sf_dir):
    """Text-line format (reference readTextFile / sequence-file analog):
    one string column per line; written from and checked against the
    documents fixture. Newlines cannot appear inside a line by
    construction, so the round-trip is lossless."""
    d = t(spark, sf_dir, "documents")
    path = io.roundtrip_dir(sf_dir, "documents_text")
    d.select("text").write.mode("overwrite").text(path)
    back = spark.read.text(path)
    return back.agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.length("value")).alias("total_chars"),
    )


@query(
    "source_seqfile_roundtrip",
    oracle="""
    SELECT event_type AS value, COUNT(*) AS n, MIN(event_id) AS min_key
    FROM events
    GROUP BY 1
    """,
)
def source_seqfile_roundtrip(spark, sf_dir):
    """Hadoop SequenceFile round-trip (reference flink-formats
    sequence-file parity): (event_id, event_type) writable pairs out and
    back. The write is the IO layer's one justified RDD drop-down — there is
    no SequenceFile DataFrame datasource (see io.write_sequence_file)."""
    import shutil

    e = t(spark, sf_dir, "events")
    base = io.roundtrip_dir(sf_dir, "events_seq")
    path = f"{base}/seq"
    shutil.rmtree(path, ignore_errors=True)  # Hadoop sink dir must not exist
    io.write_sequence_file(e.select("event_id", "event_type"), path, "event_id", "event_type")
    back = io.read_sequence_file(spark, path, "key long, value string")
    return back.groupBy("value").agg(
        F.count(F.lit(1)).alias("n"), F.min("key").alias("min_key")
    )


@query(
    "source_compressed_roundtrip",
    oracle="""
    SELECT n_regionkey, COUNT(*) AS n, MIN(n_name) AS first_name
    FROM nation
    GROUP BY 1
    """,
)
def source_compressed_roundtrip(spark, sf_dir):
    """Compressed-format round-trip (reference flink-formats compress /
    StandardDeCompressors): gzip CSV out and back, plus a zstd parquet leg —
    Spark's codecs are transparent on read (extension-sniffed for text
    formats, footer-declared for parquet). Both legs must agree."""
    n = t(spark, sf_dir, "nation")
    base = io.roundtrip_dir(sf_dir, "nation_compressed")
    gz, zst = f"{base}/gz_csv", f"{base}/zstd_parquet"
    n.select("n_nationkey", "n_name", "n_regionkey").write.mode(
        "overwrite"
    ).option("header", "true").option("compression", "gzip").csv(gz)
    n.select("n_nationkey", "n_name", "n_regionkey").write.mode(
        "overwrite"
    ).option("compression", "zstd").parquet(zst)
    back_gz = spark.read.schema(
        "n_nationkey long, n_name string, n_regionkey long"
    ).option("header", "true").csv(gz)
    back_zst = spark.read.parquet(zst)
    agg = lambda df: df.groupBy("n_regionkey").agg(  # noqa: E731
        F.count(F.lit(1)).alias("n"), F.min("n_name").alias("first_name")
    )
    a, b = agg(back_gz), agg(back_zst)
    # Both decompressed legs must agree before either is returned.
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    return a


@query(
    "source_avro_roundtrip",
    oracle="""
    SELECT o_orderstatus,
           COUNT(*) AS n,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,4))), 2) AS DOUBLE)
               AS total_price,
           MIN(epoch_us(o_orderdate)) AS first_order_us
    FROM orders
    GROUP BY 1
    """,
)
def source_avro_roundtrip(spark, sf_dir):
    """Avro container-file round-trip (flink-avro parity). Runs through the
    spec-compliant pure-Python ``pyavro`` datasource when the spark-avro jar
    is absent (apache_flink_spark/formats/avro_format.py): binary-encoded
    blocks, deflate codec, schema self-described in the file header — so
    the read side needs no schema argument. Exercises long, string, double
    and timestamp_ntz columns; the oracle reads the original table, so the
    round-trip must be lossless to hash-match."""
    o = t(spark, sf_dir, "orders")
    path = io.roundtrip_dir(sf_dir, "orders_avro")
    # Repartition before the write: the container-file count IS the read
    # parallelism. Capped at 8 because every pyavro write task cold-starts
    # a dedicated Python datasource worker (~6s for 32 simultaneous
    # starts, measured) while the encode itself is ~1s for all of sf0.1 —
    # on a real cluster the JVM spark-avro path takes over and the input
    # split count governs parallelism instead.
    io.write_avro(
        o.select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate")
        .repartition(min(8, spark.sparkContext.defaultParallelism)),
        path,
    )
    back = io.read_avro(spark, path)
    # o_orderdate is TIMESTAMP_NTZ end-to-end (wall time == UTC instant in
    # this engine's UTC session); cast for unix_micros, matching epoch_us.
    return back.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        dsum("o_totalprice").alias("total_price"),
        F.min(F.unix_micros(F.col("o_orderdate").cast("timestamp"))).alias(
            "first_order_us"
        ),
    )


@query(
    "source_protobuf_roundtrip",
    oracle="""
    SELECT o_orderstatus,
           COUNT(*) AS n,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,4))), 2) AS DOUBLE)
               AS sum_price,
           MIN(o_orderkey) AS min_order,
           MIN(o_custkey) AS min_cust
    FROM orders
    GROUP BY 1
    """,
)
def source_protobuf_roundtrip(spark, sf_dir):
    """Protobuf wire-format round-trip (flink-protobuf PbFormatFactory
    parity). Rows are packed into a struct, encoded to protobuf binary and
    decoded back with the spec-exact pure-Python codec
    (formats/protobuf_format.py) — varints, length-delimited fields, a
    nested message for the money column — all inside Arrow-batched pandas
    UDFs; payload bytes never leave the executors. Oracle reads the
    original table, so the wire round-trip must be lossless. Runs over
    orders (not lineitem): the codec is per-row linear and the parity
    point is the wire format, so the 4x-smaller table keeps the
    Python-CPU stage from dominating the bench."""
    from apache_flink_spark.formats import protobuf_format as P

    desc = {
        "name": "Order",
        "fields": {
            1: ("o_orderkey", "int64"),
            2: ("o_orderstatus", "string"),
            3: (
                "money",
                {
                    "name": "Money",
                    "fields": {
                        1: ("o_totalprice", "double"),
                        2: ("o_custkey", "int64"),
                    },
                },
            ),
        },
    }
    o = t(spark, sf_dir, "orders")
    # Repartition to core count: the encode/decode stages are Python-CPU
    # bound, so parallelism must come from cores, not the fixture's (few)
    # parquet splits — the shuffle costs far less than 3-wide Python.
    packed = o.repartition(spark.sparkContext.defaultParallelism).select(
        F.struct(
            "o_orderkey",
            "o_orderstatus",
            F.struct("o_totalprice", "o_custkey").alias("money"),
        ).alias("payload")
    )
    wire = P.to_protobuf_arrow(packed, "payload", desc)
    back = P.from_protobuf_arrow(wire, "payload", desc).select("payload.*")
    return back.select(
        "o_orderkey", "o_orderstatus", "money.o_totalprice", "money.o_custkey"
    ).groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        dsum("o_totalprice").alias("sum_price"),
        F.min("o_orderkey").alias("min_order"),
        F.min("o_custkey").alias("min_cust"),
    )


@query(
    "ddl_connector_table",
    oracle="""
    SELECT lang, source, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY 1, 2
    """,
)
def ddl_connector_table(spark, sf_dir):
    """Flink CREATE TABLE DDL end-to-end (reference SqlCreateTable +
    filesystem DynamicTableFactory): declare the documents fixture via
    connector DDL — columns, format, path — then aggregate through the
    declared table. The view is lazy, so pruning/pushdown still reach the
    parquet scan; the oracle reads the same fixture directly."""
    from apache_flink_spark.environment import TableEnvironment

    tenv = TableEnvironment(spark=spark)
    name = "ddl_docs_q"
    tenv.sql(
        f"""
        CREATE TABLE {name} (
            doc_id BIGINT,
            text STRING,
            lang STRING,
            source STRING,
            n_chars BIGINT
        ) WITH (
            'connector' = 'filesystem',
            'path' = '{sf_dir}/documents.parquet',
            'format' = 'parquet'
        )
        """
    )
    return tenv.sql(
        f"""
        SELECT lang, source, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
        FROM {name} GROUP BY 1, 2
        """
    )


@query(
    "source_avro_embeddings_roundtrip",
    oracle="""
    SELECT COUNT(*) AS n, MIN(vec_id) AS min_id, MAX(vec_id) AS max_id,
           CAST(SUM(label) AS BIGINT) AS label_sum,
           CAST(SUM(len(embedding)) AS BIGINT) AS total_dims,
           MIN(embedding[1]) AS first_min, MAX(embedding[1]) AS first_max
    FROM embeddings
    """,
)
def source_avro_embeddings_roundtrip(spark, sf_dir):
    """Avro round-trip of the EMBEDDINGS table (vec_id, array<float>,
    label) — the training-data shape a 100 TB pipeline actually ships.
    The array<float> column rides the r5 vectorized block lane
    (formats/avro_vector.py array-f4 kind: single-block spec encoding,
    fixed item stride, payload gathered straight from the Arrow list
    buffers); the element transform pins items non-null so the fast lane
    engages. Oracle reads the original table — the float payload must be
    bit-lossless through the wire (min/max aggregates are order-free)."""
    from apache_flink_spark import io

    e = t(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.expr(
            "transform(embedding, x -> coalesce(x, float(0)))"
        ).alias("embedding"),
        "label",
    )
    path = io.roundtrip_dir(sf_dir, "embeddings_avro")
    io.write_avro(
        e.repartition(min(8, spark.sparkContext.defaultParallelism)), path
    )
    back = io.read_avro(spark, path)
    return back.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("vec_id").alias("min_id"),
        F.max("vec_id").alias("max_id"),
        F.sum("label").cast("bigint").alias("label_sum"),
        F.sum(F.size("embedding")).cast("bigint").alias("total_dims"),
        F.min(F.element_at("embedding", 1)).alias("first_min"),
        F.max(F.element_at("embedding", 1)).alias("first_max"),
    )


@query(
    "mt_materialized_refresh",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(count(*) AS BIGINT) AS cnt,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def mt_materialized_refresh(spark, sf_dir):
    """Materialized table end-to-end (reference: Flink 2.0
    SqlCreateMaterializedTable / MaterializedTableManager refresh
    workflows, gateway refreshMaterializedTable): CREATE … FRESHNESS
    materializes a parquet snapshot + view, ALTER … REFRESH writes
    snapshot N+1 and atomically repoints. The oracle checks the defining
    query against the snapshot CONTENTS — the refresh pipeline must be
    lossless. Snapshot names are uuid-suffixed so gate re-runs on a
    shared session never collide."""
    import uuid as _uuid

    from apache_flink_spark.environment import TableEnvironment

    tenv = TableEnvironment(spark=spark, sf_dir=sf_dir)
    name = f"mt_gate_{_uuid.uuid4().hex[:8]}"
    tenv.sql(
        f"CREATE MATERIALIZED TABLE {name} FRESHNESS = INTERVAL '1' HOUR "
        "AS SELECT l_returnflag, l_linestatus, "
        "CAST(count(*) AS BIGINT) AS cnt, "
        "CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty "
        "FROM lineitem GROUP BY l_returnflag, l_linestatus"
    )
    tenv.sql(f"ALTER MATERIALIZED TABLE {name} REFRESH")
    out = tenv.sql(
        f"SELECT l_returnflag, l_linestatus, cnt, qty FROM {name} "
        "ORDER BY l_returnflag, l_linestatus"
    )
    # read the snapshot eagerly-planned, then drop the table so scratch
    # space does not accumulate across gate runs
    out = out.localCheckpoint(eager=True)
    tenv.materialized_tables.drop(name)
    return out
