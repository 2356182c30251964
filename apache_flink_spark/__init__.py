"""apache_flink_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the reference Flink 2.0 fork (see SURVEY.md).

Architecture: the PySpark DataFrame / Spark SQL API *is* the engine surface;
Catalyst/Tungsten/AQE do the batch optimization (SURVEY.md §4.2 shows full
coverage of the reference's rewrite set). This package adds:

- ``TableEnvironment``: a Flink ``TableEnvironment``-style facade over
  ``SparkSession`` (reference: flink-table-api-java .../TableEnvironment.java).
- ``operators/``: the operators Spark lacks as built-ins — cumulate windows,
  as-of/temporal joins, streaming-style top-n and dedup — expressed as
  DataFrame-level rewrites (no Catalyst extensions needed).
- ``functions/``: the Flink scalar-function surface (SURVEY.md §2.10) mapped to
  ``pyspark.sql.functions``, with thin wrappers where names/semantics differ.
- ``pipeline/``: large-scale training-data operators (dedup families,
  similarity search, text analysis, multimodal columns).
- ``streaming/``: Structured Streaming runners mirroring the reference's
  streaming semantics (watermarks, windows, update-mode aggs, stateful ops).
"""

from apache_flink_spark.environment import TableEnvironment
from apache_flink_spark.session import get_spark

__all__ = ["TableEnvironment", "get_spark"]
__version__ = "0.1.0"
