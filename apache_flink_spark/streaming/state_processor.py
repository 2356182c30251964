"""Offline state inspection — State Processor API parity.

Reference: flink-libraries/flink-state-processing-api (SavepointReader —
reading a savepoint's keyed state as a DataSet/DataStream without the job
running). Spark's analog is the state data source: every streaming
checkpoint is offline-readable as a DataFrame via ``format("statestore")``,
with operator/partition inventory via ``format("state-metadata")`` — same
role, same workflow (debug state, audit size, bootstrap migrations).

Both readers are plain batch scans of the checkpoint directory — no running
query needed, cluster-scale parallel (one task per state partition).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_state_metadata(spark: SparkSession, checkpoint_dir: str) -> DataFrame:
    """Operator/partition inventory of a streaming checkpoint (reference
    SavepointReader.window/operator discovery): one row per stateful
    operator with its id, name, partition span and batch id range."""
    return spark.read.format("state-metadata").load(checkpoint_dir)


def read_keyed_state(
    spark: SparkSession,
    checkpoint_dir: str,
    batch_id: int | None = None,
    operator_id: int | None = None,
    store_name: str | None = None,
) -> DataFrame:
    """Keyed state of one stateful operator as (key, value, partition_id)
    rows (reference SavepointReader.readKeyedState). Defaults to the latest
    committed batch of operator 0 — the common single-stateful-op case."""
    reader = spark.read.format("statestore")
    if batch_id is not None:
        reader = reader.option("batchId", str(batch_id))
    if operator_id is not None:
        reader = reader.option("operatorId", str(operator_id))
    if store_name is not None:
        reader = reader.option("storeName", store_name)
    return reader.load(checkpoint_dir)
