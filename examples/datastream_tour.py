#!/usr/bin/env python3
"""Tour of the DataStream API facade — the reference's second user API.

Covers the classic DataStream program shapes a Flink user ports verbatim:
map/flatMap/keyBy/window, connect (CoMap), coGroup, side outputs
(OutputTag), async I/O (AsyncDataStream.orderedWait), and the streaming
metrics recorder.

Run: python examples/datastream_tour.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    from apache_flink_spark.datastream import (
        AsyncDataStream,
        OutputTag,
        StreamExecutionEnvironment,
        TumblingEventTimeWindows,
        side_output_split,
    )

    env = StreamExecutionEnvironment.get_execution_environment()

    print("== word count (map/flatMap/keyBy) ==")
    lines = env.from_collection(
        [("to be or not to be",), ("that is the question",)], "line string"
    )
    (
        lines.flat_map(F.split("line", " "))
        .key_by("value")
        .count()
        .to_df()
        .orderBy(F.desc("count"), "value")
        .show(5)
    )

    print("== connect + CoMap: two typed streams into one ==")
    nums = env.from_collection([(1,), (2,)], "n long")
    words = env.from_collection([("xx",), ("yyy",)], "s string")
    nums.connect(words).map(
        [(F.col("n") * 100).alias("v")],
        [F.length("s").cast("long").alias("v")],
    ).to_df().show()

    print("== coGroup: both groups per (key, window), empty sides kept ==")
    clicks = env.from_collection(
        [("u1", "2024-01-01 00:01:00"), ("u2", "2024-01-01 00:02:00")],
        "k string, ts string",
    ).map([F.col("k"), F.to_timestamp("ts").alias("ts")])
    buys = env.from_collection(
        [("u1", "2024-01-01 00:03:00")], "k string, ts string"
    ).map([F.col("k"), F.to_timestamp("ts").alias("ts")])
    (
        clicks.co_group(buys)
        .where("k")
        .equal_to("k")
        .window(TumblingEventTimeWindows.of("10 minutes").on("ts"))
        .apply()
        .to_df()
        .select("key", F.size("left_items"), F.size("right_items"))
        .show()
    )

    print("== side outputs (OutputTag) ==")
    events = env.from_collection(
        [(1, 3), (2, 30), (3, 300)], "id long, v long"
    )
    outs = side_output_split(
        events, OutputTag("small", "v < 10"), OutputTag("medium", "v < 100")
    )
    for name, stream in outs.items():
        print(name, [r.id for r in stream.to_df().collect()])

    print("== async I/O (orderedWait) ==")

    async def service(k):
        import asyncio

        await asyncio.sleep(0.01)
        return f"dim-{k}"

    AsyncDataStream.ordered_wait(
        env.from_sequence(1, 4), service, "id", "enriched", "string"
    ).to_df().show()

    print("== metrics recorder over a streaming job ==")
    from apache_flink_spark.streaming.metrics import attach_metrics
    from apache_flink_spark.streaming.sources import run_to_table, stream_table

    rec = attach_metrics(env.spark)
    sf_dir = "/root/testdata/sf0.001"
    e = stream_table(env.spark, sf_dir, "events")
    run_to_table(
        e.withWatermark("ts", "1 hour")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n")),
        "update",
    )
    import time

    deadline = time.time() + 30
    while time.time() < deadline and not rec.batches():
        time.sleep(0.5)
    print("metrics:", rec.totals())
    env.spark.streams.removeListener(rec)


if __name__ == "__main__":
    main()
