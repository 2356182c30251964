"""Query-hint surface driven from SQL STRINGS through the facade.

Reference parity: Flink's join-strategy hints
(flink-table-planner .../hint/JoinStrategy.java — BROADCAST / SHUFFLE_HASH /
SHUFFLE_MERGE / NEST_LOOP) and dynamic table options (FlinkHints.java,
``/*+ OPTIONS('k'='v') */``). apache_flink_spark.query_hints translates
them onto Catalyst's hint vocabulary / a per-statement connector re-scan;
these entries prove the surface end-to-end with DuckDB oracles. Strategy
hints never change results — the oracle is the unhinted query — and the
physical effect is pinned separately in tests/test_query_hints.py.
"""

from __future__ import annotations

from apache_flink_spark.queries.registry import query


def _tenv(spark, sf_dir):
    from apache_flink_spark.environment import TableEnvironment

    tenv = TableEnvironment(spark=spark)
    tenv.use_data_dir(sf_dir)
    return tenv


@query(
    "hint_join_strategies",
    oracle="""
    SELECT n_name, COUNT(*) AS n_orders
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    ORDER BY n_name
    """,
)
def hint_join_strategies(spark, sf_dir):
    """Two Flink join-strategy hints in one statement: BROADCAST on the
    dim join, SHUFFLE_HASH on the fact-fact join — translated onto
    Catalyst (JoinStrategy.java parity). Result is hint-invariant; the
    physical pin (BroadcastHashJoin / ShuffledHashJoin) lives in
    tests/test_query_hints.py."""
    return _tenv(spark, sf_dir).sql(
        """
        SELECT /*+ BROADCAST(nation), SHUFFLE_HASH(customer) */
               n_name, COUNT(*) AS n_orders
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name
        ORDER BY n_name
        """
    )


@query(
    "hint_dynamic_options",
    oracle="""
    SELECT CAST(3 AS BIGINT) AS n, CAST(3 AS BIGINT) AS id_sum
    """,
)
def hint_dynamic_options(spark, sf_dir):
    """Dynamic table options (FlinkHints OPTIONS hint): a datagen DDL
    table declared with 5 rows, re-scanned with a per-statement
    'number-of-rows'='3' override — ids 0..2, sum 3. The base
    declaration is untouched (also pinned in tests)."""
    tenv = _tenv(spark, sf_dir)
    tenv.sql(
        """
        CREATE TABLE hint_q_gen (
            id BIGINT,
            v INT
        ) WITH ('connector' = 'datagen', 'number-of-rows' = '5')
        """
    )
    return tenv.sql(
        """
        SELECT COUNT(*) AS n, CAST(SUM(id) AS BIGINT) AS id_sum
        FROM hint_q_gen /*+ OPTIONS('number-of-rows'='3') */
        """
    )
