"""Unnest / lateral / table-function correlate surface.

Reference parity (SURVEY.md §2.2): LogicalUnnestRule (UNNEST -> explode),
StreamExecCorrelate (lateral / UDTF join), and the $UNNEST_ROWS$ internal
function. Spark-first: ``explode``/``posexplode`` generators and SQL
``LATERAL`` subqueries — Catalyst plans Generate / LateralJoin nodes with
the generator fused into the projection (no shuffle; the row multiplier is
absorbed by downstream partial aggregation exactly like Flink's correlate
chaining).

Oracle note: DuckDB lacks UNNEST WITH ORDINALITY, so the ordinal oracle
builds (index, value) structs by comprehension before unnesting — same
result set as Spark's posexplode.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from apache_flink_spark.catalog import load_tables
from apache_flink_spark.queries.registry import query
from apache_flink_spark.queries._util import t


@query(
    "unnest_explode_tokens",
    oracle="""
    SELECT doc_id, unnest(string_split(text, ' ')) AS word
    FROM documents
    """,
)
def unnest_explode_tokens(spark, sf_dir):
    """UNNEST of a derived array -> explode (LogicalUnnestRule)."""
    d = t(spark, sf_dir, "documents")
    return d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("word")
    )


@query(
    "unnest_posexplode",
    oracle="""
    SELECT doc_id, u.i - 1 AS pos, u.w AS word
    FROM (
        SELECT doc_id,
               unnest([{'i': i, 'w': l[i]}
                       for i in generate_series(1, len(l))]) AS u
        FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents)
    )
    """,
)
def unnest_posexplode(spark, sf_dir):
    """UNNEST WITH ORDINALITY -> posexplode (0-based position)."""
    d = t(spark, sf_dir, "documents")
    return d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "word")
    )


_LATERAL = """
    SELECT r.r_name, x.n_name, x.n_nationkey
    FROM region r,
    LATERAL (
        SELECT n_name, n_nationkey FROM nation n
        WHERE n.n_regionkey = r.r_regionkey
        ORDER BY n_nationkey
        LIMIT 2
    ) x
"""


@query("lateral_topn_per_region", oracle=_LATERAL)
def lateral_topn_per_region(spark, sf_dir):
    """LATERAL correlate (StreamExecCorrelate): per-region top-2 nations via
    a correlated LATERAL subquery with ORDER BY + LIMIT."""
    load_tables(spark, sf_dir)
    return spark.sql(_LATERAL)


@query(
    "correlate_generator",
    oracle="""
    SELECT p_partkey, t.k
    FROM part, unnest(generate_series(1, p_size % 3 + 1)) AS t(k)
    """,
)
def correlate_generator(spark, sf_dir):
    """Table-function correlate: each part row joined to a generated series
    whose length depends on the row (UDTF-join shape: Correlate over a
    generator, Spark's Generate node)."""
    p = t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.explode(
            F.sequence(F.lit(1), F.col("p_size") % 3 + 1)
        ).alias("k"),
    )


@query(
    "unnest_map_entries",
    oracle="""
    SELECT event_id, 'k' AS key, CAST(json_extract_string(props, '$.k') AS INTEGER) AS val
    FROM events
    """,
)
def unnest_map_entries(spark, sf_dir):
    """Map explode (UNNEST over MAP / MAP_ENTRIES): parse the props JSON into
    a map and explode its entries to (key, value) rows."""
    e = t(spark, sf_dir, "events")
    m = F.map_from_arrays(
        F.array(F.lit("k")),
        F.array(F.get_json_object("props", "$.k").cast("int")),
    )
    return e.select("event_id", F.explode(m).alias("key", "val"))
