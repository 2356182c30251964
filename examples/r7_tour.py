#!/usr/bin/env python3
"""Tour of the r7 surfaces: multi-catalog, DISTRIBUTED BY bucketing, RTAS,
the CEP Pattern API, and streaming MATCH_RECOGNIZE cross-variable binds.

Run: python examples/r7_tour.py [sf_dir]   (default /root/testdata/sf0.001)
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from apache_flink_spark.environment import TableEnvironment
    from apache_flink_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="r7_tour")
    te = TableEnvironment(spark=spark, sf_dir=sf_dir)
    tmp = tempfile.mkdtemp(prefix="r7_tour_")

    print("== multi-catalog: a dimension catalog + cross-catalog join ==")
    te.sql("CREATE CATALOG dims WITH ('type' = 'generic_in_memory')")
    te.sql(
        f"CREATE TABLE dims.default.nation_dim (n_nationkey BIGINT, "
        f"n_name STRING, n_regionkey BIGINT) WITH ('connector' = "
        f"'filesystem', 'path' = '{tmp}/nation_dim', 'format' = 'parquet')"
    )
    te.sql(
        "INSERT INTO dims.default.nation_dim "
        "SELECT n_nationkey, n_name, n_regionkey FROM nation"
    )
    te.sql(
        "SELECT r.r_name, COUNT(*) AS nations "
        "FROM dims.default.nation_dim n "
        "JOIN region r ON n.n_regionkey = r.r_regionkey "
        "GROUP BY r.r_name ORDER BY r.r_name"
    ).show(5)
    te.sql("DESCRIBE CATALOG dims").show()

    print("== DISTRIBUTED BY: co-bucketed tables join with no Exchange ==")
    for name, key, cols in [
        ("bl", "l_orderkey", "l_orderkey BIGINT, l_quantity DOUBLE"),
        ("bo", "o_orderkey", "o_orderkey BIGINT, o_orderpriority STRING"),
    ]:
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        te.sql(
            f"CREATE TABLE {name} ({cols}) DISTRIBUTED BY HASH({key}) "
            "INTO 8 BUCKETS WITH ('connector' = 'filesystem', "
            "'format' = 'parquet')"
        )
    te.sql("INSERT INTO bl SELECT l_orderkey, l_quantity FROM lineitem")
    te.sql("INSERT INTO bo SELECT o_orderkey, o_orderpriority FROM orders")
    joined = te.sql(
        "SELECT /*+ SHUFFLE_MERGE(bl) */ o_orderpriority, COUNT(*) AS n "
        "FROM bl JOIN bo ON l_orderkey = o_orderkey GROUP BY 1"
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    print("zero-exchange join:",
          "Exchange hashpartitioning(l_orderkey" not in plan)
    print(te.sql("SHOW CREATE TABLE bo").collect()[0][0])

    print("== RTAS: atomic replace ==")
    te.sql(
        f"CREATE OR REPLACE TABLE prio_summary WITH ('connector' = "
        f"'filesystem', 'path' = '{tmp}/prio', 'format' = 'parquet') AS "
        "SELECT o_orderpriority, COUNT(*) AS n FROM orders GROUP BY 1"
    )
    te.sql("SELECT * FROM prio_summary ORDER BY o_orderpriority").show(3)

    print("== CEP Pattern API: click not-followed-by error, then purchase ==")
    from pyspark.sql import functions as F

    from apache_flink_spark.cep import Pattern, cep_select

    events = te.sql(
        "SELECT user_id, event_id, event_type, unix_micros(ts) AS ep "
        "FROM events WHERE event_type IN ('click', 'purchase', 'error')"
    )
    p = (
        Pattern.begin("A").where("event_type = 'click'")
        .not_followed_by("N").where("event_type = 'error'")
        .followed_by("C").where("event_type = 'purchase'")
    )
    cep_select(
        spark, events, p, "user_id", "ep, event_id",
        {"click_id": "LAST(A.event_id)", "purchase_id": "LAST(C.event_id)"},
    ).show(5)

    print("== streaming MATCH_RECOGNIZE: cross-variable bind on a stream ==")
    from apache_flink_spark.queries import QUERIES

    QUERIES["mr_stream_cross_define"](spark, sf_dir).show(5)

    print("r7 tour complete.")


if __name__ == "__main__":
    main()
