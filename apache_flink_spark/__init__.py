"""apache_flink_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the reference Flink 2.0 fork (see SURVEY.md).

Architecture: the PySpark DataFrame / Spark SQL API *is* the engine surface;
Catalyst/Tungsten/AQE do the batch optimization (SURVEY.md §4.2 shows full
coverage of the reference's rewrite set). This package adds:

- ``TableEnvironment`` (environment.py) + fluent ``Table`` API
  (table_api.py): the Flink entry-point surfaces over ``SparkSession``
  (reference: flink-table-api-java .../TableEnvironment.java, Table.java).
- ``functions/``: the Flink scalar-function surface (SURVEY.md §2.10) —
  Python wrappers plus SQL-UDF registrations where names differ.
- ``streaming/``: Structured Streaming sources/runners and the stateful
  custom operators (Top-N, keep-last, sessions-with-timers) via
  applyInPandasWithState.
- ``io.py`` / ``changelog.py`` / ``multimodal.py`` / ``plans.py``:
  connectors, __rowkind retraction modeling, binary-payload pipelines,
  plan introspection.
- ``queries/``: the executable operator inventory — every SURVEY §2 row and
  every north-star pipeline operator (dedup/similarity/text/multimodal) as
  a registered query with a DuckDB oracle.
"""

from apache_flink_spark.environment import TableEnvironment
from apache_flink_spark.session import get_spark

__all__ = ["TableEnvironment", "get_spark"]
__version__ = "0.1.0"
