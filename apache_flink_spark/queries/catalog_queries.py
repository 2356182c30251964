"""Catalog-surface queries — multi-catalog resolution as an operator.

Reference parity: GenericInMemoryCatalog (flink-table-api-java
.../catalog/GenericInMemoryCatalog.java) + CatalogManager's qualified
resolution — a reference user routinely declares a dimension table in a
secondary catalog and joins it against the default catalog's facts with
``catalog.database.table`` names. The engine maps secondary-catalog
tables onto namespaced views (apache_flink_spark/catalogs.py), so the
join below plans exactly like any temp-view join: Catalyst broadcasts
the small dimension side and the fact scan never re-shuffles — the
catalog indirection is metadata-only and costs nothing at 100 TB.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from apache_flink_spark.catalog import load_tables
from apache_flink_spark.queries.registry import query


@query(
    "catalog_cross_join",
    oracle="""
    SELECT r.r_name, COUNT(*) AS n, MIN(n.n_name) AS first_nation
    FROM nation n
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
)
def catalog_cross_join(spark, sf_dir):
    """Cross-catalog join: the nation dimension lives in a secondary
    in-memory catalog (CREATE CATALOG ... 'generic_in_memory'; INSERT
    through the qualified name), the region table stays in the built-in
    catalog, and the join references both via their catalog paths."""
    from apache_flink_spark.environment import TableEnvironment

    load_tables(spark, sf_dir)
    te = TableEnvironment(spark=spark)
    te.sql(
        "CREATE CATALOG IF NOT EXISTS dimcat "
        "WITH ('type' = 'generic_in_memory', 'default-database' = 'dims')"
    )
    path = os.path.join(tempfile.gettempdir(), "q_catalog_nation_dim")
    te.sql(
        f"""
        CREATE TABLE dimcat.dims.nation_dim (
            n_nationkey BIGINT, n_name STRING, n_regionkey BIGINT
        ) WITH (
            'connector' = 'filesystem',
            'path' = '{path}',
            'format' = 'parquet'
        )
        """
    )
    te.sql(
        "INSERT OVERWRITE dimcat.dims.nation_dim "
        "SELECT n_nationkey, n_name, n_regionkey FROM nation"
    )
    return te.sql(
        """
        SELECT r.r_name, COUNT(*) AS n, MIN(n.n_name) AS first_nation
        FROM dimcat.dims.nation_dim n
        JOIN default_catalog.default_database.region r
          ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name
        """
    )


@query(
    "rtas_replace_table",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(14,4))), 2)
                AS DOUBLE) AS sum_price
    FROM orders
    WHERE o_totalprice > 100000
    GROUP BY o_orderpriority
    """,
)
def rtas_replace_table(spark, sf_dir):
    """RTAS — reference SqlReplaceTableAs.java: CREATE OR REPLACE TABLE
    ... AS SELECT runs twice (stale content first, then the real query),
    proving the replace swaps atomically; the read returns the second
    query's result. One distributed write per run, no driver
    materialization."""
    from apache_flink_spark.environment import TableEnvironment

    load_tables(spark, sf_dir)
    te = TableEnvironment(spark=spark)
    path = os.path.join(tempfile.gettempdir(), "q_rtas_summary")
    stmt = (
        "CREATE OR REPLACE TABLE rtas_summary WITH "
        f"('connector' = 'filesystem', 'path' = '{path}', "
        "'format' = 'parquet') AS "
    )
    te.sql(stmt + "SELECT 'stale' AS o_orderpriority, CAST(0 AS BIGINT) "
           "AS n, CAST(0.0 AS DOUBLE) AS sum_price")
    te.sql(
        stmt
        + """
        SELECT o_orderpriority, COUNT(*) AS n,
               CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(14,4))), 2)
                    AS DOUBLE) AS sum_price
        FROM orders
        WHERE o_totalprice > 100000
        GROUP BY o_orderpriority
        """
    )
    return spark.table("rtas_summary")
