"""Source / sink connectors — file formats, partitioned writes, debug sinks.

Reference parity (SURVEY.md §2.1):
  - FileSource + format modules (flink-formats/flink-parquet, flink-csv,
    flink-json; vectorized ParquetVectorizedInputFormat) -> ``spark.read``
    datasources (Spark's vectorized parquet reader is the built-in twin).
  - FileSystemTableFactory partitioned writes -> ``df.write.partitionBy``.
  - PrintTableSinkFactory / BlackHoleTableSinkFactory -> ``format("console")``
    / ``format("noop")``.
  - Values source (StreamExecValues) -> ``spark.createDataFrame``.

Scale notes: partitioned parquet writes shard by partition column value —
pick low-cardinality columns (date, category), never high-cardinality keys
(file-per-key explosion); CSV/JSON exist for interchange, parquet is the
only format that survives 100 TB (columnar pruning + predicate pushdown).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession


def write_parquet_partitioned(
    df: DataFrame, path: str, partition_by: list[str] | None = None
) -> None:
    """Partitioned parquet sink (FileSystemTableFactory parity): hive-style
    <col>=<value>/ directory layout, partition-pruned on read."""
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def write_csv(df: DataFrame, path: str) -> None:
    """CSV sink (flink-csv format parity) — header on, default quoting."""
    df.write.mode("overwrite").option("header", "true").csv(path)


def read_csv(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """CSV source with explicit schema (no inference pass — at scale an
    inference read of 100 TB is a full extra scan)."""
    return spark.read.schema(schema).option("header", "true").csv(path)


def write_json(df: DataFrame, path: str) -> None:
    """JSON-lines sink (flink-json format parity)."""
    df.write.mode("overwrite").json(path)


def read_json(spark: SparkSession, path: str, schema: str) -> DataFrame:
    return spark.read.schema(schema).json(path)


def write_orc(df: DataFrame, path: str) -> None:
    """ORC sink (flink-orc format parity) — columnar, vectorized on read."""
    df.write.mode("overwrite").orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


_AVRO_HINT = (
    "avro format requires the spark-avro jar on the classpath "
    "(spark-submit --packages org.apache.spark:spark-avro_2.13:<ver>)"
)


def _avro_available(spark: SparkSession) -> bool:
    # spark-avro is "built-in but external" — present only when the jar is
    # deployed with the app. Spark's own datasource lookup is the only
    # reliable probe (avro helper classes exist in catalyst even without it).
    try:
        spark.read.format("avro").schema("probe int").load(
            "/nonexistent-avro-probe"
        ).schema
        return True
    except Exception as ex:
        return "Failed to find data source: avro" not in str(ex)


def write_avro(df: DataFrame, path: str) -> None:
    """Avro sink (flink-avro format parity). Prefers the JVM spark-avro
    datasource when its jar is deployed; otherwise falls back to the
    spec-compliant pure-Python container-file datasource registered as
    ``pyavro`` (apache_flink_spark/formats/avro_format.py) — same file
    layout, one container file per partition."""
    try:
        df.write.mode("overwrite").format("avro").save(path)
    except Exception as ex:
        if "Failed to find data source: avro" not in str(ex):
            raise
        from apache_flink_spark.formats import avro_format

        # mapInArrow sink (shared warm UDF worker pool); the registered
        # pyavro datasource write lane stays the API-parity surface.
        avro_format.write_avro_dir(df, path)


def read_avro(spark: SparkSession, path: str) -> DataFrame:
    """Avro source: JVM spark-avro if present, else the pyavro datasource
    (self-describing — schema comes from the container-file header)."""
    try:
        out = spark.read.format("avro").load(path)
        out.schema  # force datasource resolution so a missing jar fails HERE
        return out
    except Exception as ex:
        if "Failed to find data source: avro" not in str(ex):
            raise
        from apache_flink_spark.formats import avro_format

        # mapInArrow source (shared warm UDF worker pool); the registered
        # pyavro datasource read lane stays the API-parity surface.
        return avro_format.read_avro_dir(spark, path)


def write_sequence_file(
    df: DataFrame, path: str, key_col: str, value_col: str
) -> None:
    """Hadoop SequenceFile sink (reference flink-formats sequence-file /
    SerializedOutputFormat parity): (key, value) writable pairs. The only
    justified RDD drop-down in the IO layer — SequenceFile is a K/V
    container with no DataFrame datasource, and Spark's writable conversion
    needs an RDD of pairs. Columns must be primitive (string/long/double)."""
    df.select(key_col, value_col).rdd.map(tuple).saveAsSequenceFile(path)


def read_sequence_file(
    spark: SparkSession, path: str, schema: str = "key string, value string"
) -> DataFrame:
    """SequenceFile source: K/V pairs back as a two-column DataFrame."""
    return spark.createDataFrame(spark.sparkContext.sequenceFile(path), schema)


_PROTOBUF_HINT = (
    "protobuf format requires the spark-protobuf jar on the classpath "
    "(spark-submit --packages org.apache.spark:spark-protobuf_2.13:<ver>) "
    "plus a compiled descriptor file"
)


def protobuf_column(df: DataFrame, col: str, message_name: str, desc_path: str):
    """Decode a binary protobuf column (reference flink-formats/
    flink-protobuf PbFormatFactory parity) via spark-protobuf's
    ``from_protobuf``. Like avro, the module is an external jar — gated
    behind a clear error instead of Spark's generic lookup failure."""
    try:
        from pyspark.sql.protobuf.functions import from_protobuf

        out = df.withColumn(col, from_protobuf(col, message_name, desc_path))
        out.schema  # force analysis so a missing jar fails HERE
        return out
    except Exception as ex:
        msg = str(ex)
        if "PROTOBUF_NOT_LOADED" in msg or (
            "protobuf" in msg.lower()
            and ("not found" in msg.lower() or "failed to find" in msg.lower())
        ):
            raise NotImplementedError(_PROTOBUF_HINT) from None
        raise


def hive_session(warehouse_dir: str | None = None) -> SparkSession:
    """Hive-enabled SparkSession (reference flink-connector-hive
    HiveDynamicTableFactory parity): persistent metastore catalog + managed
    tables. Spark ships the Hive integration in-box (spark-hive jar); the
    metastore defaults to a local Derby db under the warehouse dir. Must be
    the FIRST session in the JVM — catalogImplementation is a static conf
    (tests drive this in a subprocess for that reason)."""
    import os as _os

    builder = (
        SparkSession.builder.appName("apache_flink_spark_hive")
        .master(f"local[{_os.environ.get('SPARK_GRAFT_CPUS', '4')}]")
        .enableHiveSupport()
    )
    if warehouse_dir:
        builder = builder.config("spark.sql.warehouse.dir", warehouse_dir)
        builder = builder.config(
            "javax.jdo.option.ConnectionURL",
            f"jdbc:derby:;databaseName={warehouse_dir}/metastore_db;create=true",
        )
    spark = builder.getOrCreate()
    from apache_flink_spark.session import configure_session

    return configure_session(spark)


def print_sink(df: DataFrame, n: int = 20) -> None:
    """Print/console debug sink (PrintTableSinkFactory parity)."""
    df.show(n, truncate=False)


def blackhole_sink(df: DataFrame) -> None:
    """BlackHole sink (BlackHoleTableSinkFactory parity): full execution, no
    output — the bench harness uses exactly this to time plans."""
    df.write.format("noop").mode("overwrite").save()


def temp_sink_dir(label: str) -> str:
    return tempfile.mkdtemp(prefix=f"afs_sink_{label}_")


def roundtrip_dir(sf_dir: str, label: str) -> str:
    """Stable per-(sf_dir,label) scratch dir for write->read inventory
    queries (idempotent across repeated driver invocations)."""
    d = os.path.join(
        tempfile.gettempdir(),
        "afs_roundtrip",
        sf_dir.strip("/").replace("/", "_"),
        label,
    )
    os.makedirs(d, exist_ok=True)
    return d


_KAFKA_HINT = (
    "kafka source/sink requires the spark-sql-kafka jar on the classpath "
    "(spark-submit --packages "
    "org.apache.spark:spark-sql-kafka-0-10_2.13:<ver>) and reachable "
    "brokers"
)


def read_kafka_stream(
    spark: SparkSession,
    brokers: str,
    topic: str,
    starting_offsets: str = "earliest",
) -> DataFrame:
    """Kafka streaming source (reference flink-connector-kafka
    KafkaDynamicSource / KafkaSourceBuilder parity): key/value binary
    columns + topic/partition/offset/timestamp metadata — the same record
    shape Flink's KafkaRecordDeserializationSchema sees. Feed the value
    column to the CDC decoders (apache_flink_spark/cdc.py) for the
    debezium/canal/maxwell/ogg pipelines, exactly like the reference's
    kafka+debezium-json stack. Jar-gated: the container has no kafka jar
    or broker, so the gate raises with the deploy hint instead of Spark's
    generic lookup failure."""
    try:
        out = (
            spark.readStream.format("kafka")
            .option("kafka.bootstrap.servers", brokers)
            .option("subscribe", topic)
            .option("startingOffsets", starting_offsets)
            .load()
        )
        out.schema  # force datasource resolution so a missing jar fails HERE
        return out
    except Exception as ex:
        if "Failed to find data source: kafka" in str(ex):
            raise NotImplementedError(_KAFKA_HINT) from None
        raise


def write_kafka_stream(
    df: DataFrame, brokers: str, topic: str, checkpoint: str
):
    """Kafka sink (reference KafkaDynamicSink / exactly-once
    KafkaCommitter parity note: Spark's kafka sink is at-least-once; the
    reference's 2PC exactly-once maps to idempotent/transactional
    producers downstream). Expects ``key``/``value`` binary or string
    columns, per the datasource contract."""
    try:
        return (
            df.writeStream.format("kafka")
            .option("kafka.bootstrap.servers", brokers)
            .option("topic", topic)
            .option("checkpointLocation", checkpoint)
            .start()
        )
    except Exception as ex:
        if "Failed to find data source: kafka" in str(ex):
            raise NotImplementedError(_KAFKA_HINT) from None
        raise
