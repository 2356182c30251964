"""Flink scalar-function surface (SURVEY.md §2.10) on Spark.

Most of the reference's 224 built-ins (reference: flink-table-common
.../functions/BuiltInFunctionDefinitions.java) exist verbatim in
``pyspark.sql.functions``; this package provides the thin wrappers where
names/semantics differ, plus SQL-side registration.
"""

from apache_flink_spark.functions.scalar import *  # noqa: F401,F403
from apache_flink_spark.functions.registry import register_all  # noqa: F401
