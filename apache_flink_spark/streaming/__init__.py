"""Structured Streaming layer — sources, bounded runners, streaming queries.

Reference parity (SURVEY.md §2.12): watermarks, windowed aggregation, dedup
and stream-stream joins run as real Structured Streaming jobs; checkpointing
and state management come from Spark's state store (the reference needs its
CheckpointCoordinator + RocksDB state backend for the same guarantees).
"""

from apache_flink_spark.streaming.sources import (  # noqa: F401
    rate_source,
    run_to_table,
    stream_table,
)
