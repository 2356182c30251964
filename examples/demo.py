#!/usr/bin/env python3
"""End-to-end tour of the engine's user surface — what a reference user
switching to this repo would write.

Run: python examples/demo.py [sf_dir]   (default /root/testdata/sf0.001)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

    from apache_flink_spark.environment import TableEnvironment
    from apache_flink_spark.table_api import Over, Tumble

    tenv = TableEnvironment.create(sf_dir=sf_dir)

    print("== SQL (entry point A) ==")
    tenv.sql(
        """SELECT l_returnflag, l_linestatus,
                  round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
           FROM lineitem WHERE l_shipdate <= DATE '1998-09-02'
           GROUP BY 1, 2 ORDER BY 1, 2"""
    ).show()

    print("== Fluent Table API (entry point B) ==")
    (
        tenv.table("orders")
        .filter("o_totalprice > 100000")
        .group_by("o_orderpriority")
        .select(F.count(F.lit(1)).alias("big_orders"))
        .to_df()
        .show()
    )

    print("== Window TVF (tumble) via descriptor ==")
    (
        tenv.table("events")
        .window(Tumble.over("1 hour").on("ts").alias("w"))
        .group_by("event_type")
        .select(F.count(F.lit(1)).alias("n"))
        .select("w.start", "event_type", "n")
        .to_df()
        .orderBy("start", "event_type")
        .show(5)
    )

    print("== Over window via descriptor ==")
    spec = (
        Over.partition_by("o_custkey")
        .order_by("o_orderdate", "o_orderkey")
        .unbounded_preceding()
        .spec()
    )
    (
        tenv.table("orders")
        .add_columns(nth_order=F.count(F.lit(1)).over(spec))
        .select("o_custkey", "o_orderkey", "nth_order")
        .to_df()
        .show(5)
    )

    print("== Structured Streaming (bounded drain) ==")
    from apache_flink_spark.streaming import run_to_table, stream_table

    e = stream_table(tenv.spark, sf_dir, "events")
    agg = (
        e.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .count()
    )
    run_to_table(agg, "complete").orderBy("window", "event_type").show(5)

    print("== Training-data pipeline: MinHash-LSH near-dup candidates ==")
    from apache_flink_spark.queries import QUERIES

    QUERIES["dedup_minhash_lsh"](tenv.spark, sf_dir).show(5)

    print("== Similarity search: cosine top-k ==")
    QUERIES["sim_bruteforce_topk"](tenv.spark, sf_dir).show(5)


if __name__ == "__main__":
    main()
