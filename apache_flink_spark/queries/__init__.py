"""Declared query inventory: one entry per implemented operator (SURVEY.md §2).

Importing this package populates the registry from every query module; the
driver contract (``__spark_entry__.queries`` / ``oracle_sql``) reads it.
"""

from apache_flink_spark.queries.registry import ORACLES, QUERIES

# Import for registration side effects — each module covers a SURVEY.md §2 row.
from apache_flink_spark.queries import (  # noqa: F401,E402
    tpch,
    tpch_extra,
    tpch_rest,
    joins,
    match_recognize_queries,
    aggregates,
    agg_extras,
    async_lookup,
    stream_over_agg,
    over_windows,
    rank_dedup,
    scale_patterns,
    setops,
    sort_ops,
    scalar_functions,
    event_windows,
    graph_queries,
    temporal_joins,
    pattern_match,
    pipeline_dedup,
    pipeline_sampling,
    pipeline_similarity,
    pipeline_text,
    changelog_queries,
    io_queries,
    multimodal_queries,
    stateful_streaming_queries,
    streaming_queries,
    subqueries,
    udf_surface,
    unnest_lateral,
    window_tvf_queries,
)

__all__ = ["QUERIES", "ORACLES"]
