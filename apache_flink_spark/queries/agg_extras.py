"""Extended aggregate-function coverage — quantiles, collect, boolean and
bitwise aggregates.

Reference parity (SURVEY.md §2.4 built-in agg functions): PercentileAggFunction,
CollectAggFunction/ArrayAggFunction, and the boolean/bitwise SQL aggregates of
FlinkSqlOperatorTable.

Determinism: quantiles only at q in {0.25, 0.5, 0.75} — the interpolation
factor is a dyadic rational, so lower + q*(higher-lower) over small-integer
quantities is EXACT in IEEE double regardless of which algebraic variant an
engine uses. Collected arrays are sorted then joined to strings (order-free).
Bit/bool aggregates are integer/boolean-exact.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from apache_flink_spark.queries.registry import query
from apache_flink_spark.queries._util import t


@query(
    "agg_percentiles",
    oracle="""
    SELECT l_returnflag,
           quantile_cont(l_quantity, 0.25) AS q25,
           quantile_cont(l_quantity, 0.50) AS q50,
           quantile_cont(l_quantity, 0.75) AS q75
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_percentiles(spark, sf_dir):
    """Exact continuous percentiles (PercentileAggFunction): dyadic
    quantiles over integer-valued quantities are bit-exact cross-engine."""
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.percentile("l_quantity", F.lit(0.25)).alias("q25"),
        F.percentile("l_quantity", F.lit(0.50)).alias("q50"),
        F.percentile("l_quantity", F.lit(0.75)).alias("q75"),
    )


@query(
    "agg_collect_sorted",
    oracle="""
    SELECT n_regionkey,
           array_to_string(list_sort(list(n_name)), ',') AS nations
    FROM nation
    GROUP BY n_regionkey
    """,
)
def agg_collect_sorted(spark, sf_dir):
    """ARRAY_AGG / CollectAggFunction: collect + canonical sort + join (the
    sort makes the shuffle-order-dependent collection deterministic)."""
    n = t(spark, sf_dir, "nation")
    return n.groupBy("n_regionkey").agg(
        F.array_join(F.sort_array(F.collect_list("n_name")), ",").alias("nations")
    )


@query(
    "agg_bool_count_if",
    oracle="""
    SELECT o_orderpriority,
           CAST(count_if(o_totalprice > 200000) AS BIGINT) AS n_big,
           bool_and(o_totalprice > 0) AS all_positive,
           bool_or(o_orderstatus = 'F') AS any_final
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def agg_bool_count_if(spark, sf_dir):
    """count_if / bool_and / bool_or (boolean agg group)."""
    o = t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.count_if(F.col("o_totalprice") > 200000).alias("n_big"),
        F.bool_and(F.col("o_totalprice") > 0).alias("all_positive"),
        F.bool_or(F.col("o_orderstatus") == "F").alias("any_final"),
    )


@query(
    "agg_bitwise",
    oracle="""
    SELECT l_returnflag,
           bit_and(l_linenumber) AS band,
           bit_or(l_linenumber) AS bor,
           bit_xor(l_linenumber) AS bxor
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_bitwise(spark, sf_dir):
    """bit_and / bit_or / bit_xor aggregates — integer-exact."""
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.bit_and("l_linenumber").alias("band"),
        F.bit_or("l_linenumber").alias("bor"),
        F.bit_xor("l_linenumber").alias("bxor"),
    )


@query(
    "agg_filter_clause",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) FILTER (WHERE l_quantity > 25) AS n_big,
           COUNT(*) FILTER (WHERE l_discount = 0) AS n_nodisc,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4)))
                      FILTER (WHERE l_quantity > 25), 2) AS DOUBLE) AS rev_big
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_filter_clause(spark, sf_dir):
    """FILTER (WHERE ...) per-aggregate predicates (SQL:2003 filtered
    aggregates; the reference plans them through AggCallWithFilter) — each
    aggregate sees its own row subset in ONE pass, no self-joins."""
    from apache_flink_spark.catalog import load_tables

    load_tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT l_returnflag,
               COUNT(*) FILTER (WHERE l_quantity > 25) AS n_big,
               COUNT(*) FILTER (WHERE l_discount = 0) AS n_nodisc,
               CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4)))
                          FILTER (WHERE l_quantity > 25), 2) AS DOUBLE) AS rev_big
        FROM lineitem
        GROUP BY l_returnflag
        """
    )


@query(
    "agg_json_objectagg",
    oracle="""
    SELECT user_id,
           '{' || array_to_string(
               list_sort(list('"' || event_type || '":' || CAST(cnt AS VARCHAR))),
               ',') || '}' AS type_counts_json
    FROM (
        SELECT user_id, event_type, COUNT(*) AS cnt
        FROM events GROUP BY 1, 2
    )
    GROUP BY user_id
    """,
)
def agg_json_objectagg(spark, sf_dir):
    """JSON_OBJECTAGG (reference JsonObjectAggFunction) / MULTISET-as-map
    (SURVEY §1.2): per-user JSON object of event-type counts. Entries sort
    canonically before serialization so the collected-order
    nondeterminism disappears."""
    e = t(spark, sf_dir, "events")
    counts = e.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    entry = F.concat(
        F.lit('"'), F.col("event_type"), F.lit('":'), F.col("cnt").cast("string")
    )
    return counts.groupBy("user_id").agg(
        F.concat(
            F.lit("{"),
            F.array_join(F.sort_array(F.collect_list(entry)), ","),
            F.lit("}"),
        ).alias("type_counts_json")
    )
