"""TableEnvironment: the engine's user-facing facade.

Equivalent of the reference's ``TableEnvironment`` (reference:
flink-table/flink-table-api-java/.../api/TableEnvironment.java — executeSql,
sqlQuery, from_path, createTemporaryView) re-expressed over SparkSession.
Unlike the reference there is no separate planner/runtime boundary: the
returned objects ARE Spark DataFrames, so users compose them with the full
DataFrame API and Catalyst plans/executes them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from apache_flink_spark.catalog import load_tables
from apache_flink_spark.functions.registry import register_all
from apache_flink_spark.session import get_spark


class TableEnvironment:
    """Unified batch/stream entry point.

    Reference parity map (flink-table-api-java .../TableEnvironment.java):
      - ``executeSql`` / ``sqlQuery``  -> :meth:`sql`
      - ``from(path)``                 -> :meth:`from_path`
      - ``createTemporaryView``        -> :meth:`create_view`
      - ``fromValues``                 -> :meth:`from_values`
      - function registration          -> done eagerly in ``__init__`` via
        :func:`apache_flink_spark.functions.registry.register_all`
    """

    def __init__(self, spark: SparkSession | None = None, sf_dir: str | None = None):
        self.spark = spark or get_spark()
        register_all(self.spark)
        if sf_dir:
            self.use_data_dir(sf_dir)

    @classmethod
    def create(cls, sf_dir: str | None = None) -> "TableEnvironment":
        return cls(sf_dir=sf_dir)

    def use_data_dir(self, sf_dir: str) -> dict[str, DataFrame]:
        """Register every fixture table under ``sf_dir`` as a temp view."""
        return load_tables(self.spark, sf_dir)

    def sql(self, query: str) -> DataFrame:
        """Parse/plan/execute SQL — reference TableEnvironmentImpl.executeSql
        (flink-table-api-java .../internal/TableEnvironmentImpl.java:727);
        here Catalyst replaces the Calcite parse→validate→optimize chain
        (SURVEY.md §3). MATCH_RECOGNIZE clauses (which Spark SQL lacks) are
        compiled by apache_flink_spark.match_recognize first — reference
        StreamExecMatch.java:61."""
        if "MATCH_RECOGNIZE" in query.upper():
            from apache_flink_spark.match_recognize import sql_with_match_recognize

            return sql_with_match_recognize(self.spark, query)
        return self.spark.sql(query)

    def from_path(self, name: str) -> DataFrame:
        return self.spark.table(name)

    def table(self, name: str):
        """Fluent Table API handle (reference entry point B — SURVEY.md §3;
        pyflink table.py surface in apache_flink_spark/table_api.py)."""
        from apache_flink_spark.table_api import Table

        return Table(self.spark.table(name))

    def create_view(self, name: str, df: DataFrame) -> None:
        df.createOrReplaceTempView(name)

    def from_values(self, rows, schema=None) -> DataFrame:
        """Inline literal table — reference StreamExecValues / fromValues."""
        return self.spark.createDataFrame(rows, schema=schema)
