"""DataStream API facade tests (apache_flink_spark/datastream.py).

The registered ds_* queries pin oracle parity; these pin the API contract:
python map/flat_map/reduce callables, key_by aggregates, window assigners,
union/broadcast/rebalance, watermark assignment, and that the expression
fast paths stay JVM-side (no Python eval in the plan).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from apache_flink_spark.datastream import (
    EventTimeSessionWindows,
    SlidingEventTimeWindows,
    StreamExecutionEnvironment,
    TumblingEventTimeWindows,
)


@pytest.fixture()
def env(spark):
    return StreamExecutionEnvironment.get_execution_environment(spark)


def test_from_collection_map_filter_expression_path(spark, env):
    ds = env.from_collection([(1, "a"), (2, "b"), (3, "c")], "n long, s string")
    out = (
        ds.filter("n >= 2")
        .map([F.col("n") * 10, F.col("s")])
        .to_df()
    )
    assert sorted(map(tuple, out.collect())) == [(20, "b"), (30, "c")]
    # expression path must stay JVM-side: no Python eval operators
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_python_map_callable(spark, env):
    ds = env.from_sequence(1, 5)
    out = ds.map(lambda r: (r.id * r.id,), "sq long").to_df()
    assert sorted(r.sq for r in out.collect()) == [1, 4, 9, 16, 25]


def test_python_map_requires_schema(env):
    with pytest.raises(ValueError, match="output_type"):
        env.from_sequence(1, 3).map(lambda r: (r.id,))


def test_python_flat_map_callable(spark, env):
    ds = env.from_collection([("a b",), ("c",)], "line string")
    out = ds.flat_map(
        lambda r: [(w,) for w in r.line.split(" ")], "word string"
    ).to_df()
    assert sorted(r.word for r in out.collect()) == ["a", "b", "c"]


def test_flat_map_expression_explode(spark, env):
    ds = env.from_collection([("a b",), ("c d e",)], "line string")
    out = ds.flat_map(F.split("line", " ")).to_df()
    assert out.columns == ["value"]
    assert out.count() == 5


def test_key_by_aggregates(spark, env):
    rows = [("x", 1), ("x", 2), ("y", 10)]
    ds = env.from_collection(rows, "k string, v long")
    got = {
        (r.k, r.sum_v, r.min_v)
        for r in ds.key_by("k")
        .aggregate(F.sum("v").alias("sum_v"), F.min("v").alias("min_v"))
        .to_df()
        .collect()
    }
    assert got == {("x", 3, 1), ("y", 10, 10)}


def test_keyed_reduce_python(spark, env):
    rows = [("x", 1), ("x", 2), ("x", 4), ("y", 10)]
    ds = env.from_collection(rows, "k string, v long")

    def pick_bigger(a, b):
        return a if a.v >= b.v else b

    got = {
        (r.k, r.v)
        for r in ds.key_by("k").reduce(pick_bigger).to_df().collect()
    }
    assert got == {("x", 4), ("y", 10)}


def test_window_assigner_vocabulary(spark, env, sf_dir):
    import datetime as dt

    rows = [
        ("a", dt.datetime(2024, 1, 1, 0, 1), 1),
        ("a", dt.datetime(2024, 1, 1, 0, 2), 2),
        ("a", dt.datetime(2024, 1, 1, 0, 59), 5),
    ]
    ds = env.from_collection(rows, "k string, ts timestamp, v long")
    win = TumblingEventTimeWindows.of("10 minutes").on("ts").alias("w")
    out = (
        ds.key_by("k").window(win).aggregate(F.sum("v").alias("s")).to_df()
    )
    got = sorted((r.w.start.minute, r.s) for r in out.collect())
    assert got == [(0, 3), (50, 5)]
    # sliding + session assigners build without error and carry .of/.with_gap
    SlidingEventTimeWindows.of("10 minutes").every("5 minutes").on("ts")
    EventTimeSessionWindows.with_gap("5 minutes").on("ts")


def test_union_and_rebalance(spark, env):
    a = env.from_sequence(1, 3)
    b = env.from_sequence(4, 5)
    u = a.union(b)
    assert u.to_df().count() == 5
    assert u.rebalance().to_df().count() == 5


def test_broadcast_hint(spark, env):
    dim = env.from_collection([(1, "one")], "id long, name string").broadcast()
    fact = env.from_sequence(1, 100)
    joined = fact.to_df().join(dim.to_df(), "id")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_watermark_assignment_streaming(spark, env, sf_dir):
    from apache_flink_spark.streaming.sources import stream_table

    ds = env.from_source(stream_table(spark, sf_dir, "events"))
    wm = ds.assign_timestamps_and_watermarks("ts", "10 minutes")
    assert wm.to_df().isStreaming


def test_execute_and_collect_bounded(spark, env):
    rows = env.from_sequence(1, 1000).execute_and_collect(limit=10)
    assert len(rows) == 10


def test_env_execute_noop(env):
    assert env.execute("job") is None


def test_interval_join_batch(spark, env):
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    left = env.from_collection(
        [(1, base + dt.timedelta(minutes=10))], "k long, lts timestamp"
    ).key_by("k")
    right = env.from_collection(
        [
            (1, base + dt.timedelta(minutes=5)),   # inside [-10m, 0]
            (1, base + dt.timedelta(minutes=11)),  # after
            (1, base - dt.timedelta(minutes=5)),   # before window
            (2, base + dt.timedelta(minutes=9)),   # wrong key
        ],
        "k2 long, rts timestamp",
    ).key_by("k2")
    out = left.interval_join(right, "lts", "rts", "-10 minutes", "0 minutes")
    rows = out.to_df().collect()
    assert len(rows) == 1 and rows[0].rts.minute == 5


def test_keyed_process_batch(spark, env):
    import pandas as pd

    ds = env.from_collection(
        [("x", 3), ("x", 1), ("y", 7)], "k string, v long"
    )

    def median_like(key, pdf):
        return pd.DataFrame({"k": [key[0]], "total": [int(pdf.v.sum())]})

    out = ds.key_by("k").process(median_like, "k string, total long")
    got = {(r.k, r.total) for r in out.to_df().collect()}
    assert got == {("x", 4), ("y", 7)}


def test_streaming_process_requires_state_schema(spark, env, sf_dir):
    from apache_flink_spark.streaming.sources import stream_table

    ds = env.from_source(stream_table(spark, sf_dir, "events")).key_by("user_id")
    with pytest.raises(ValueError, match="state_schema"):
        ds.process(lambda *a: None, "user_id long")


def test_connected_streams_co_map(spark, env):
    """connect() + CoMapFunction (ConnectedStreams.java): each side maps
    with its own function into the shared type; results interleave."""
    a = env.from_collection([(1,), (2,)], "n long")
    b = env.from_collection([("x",), ("yy",)], "s string")
    out = (
        a.connect(b)
        .map(
            [(F.col("n") * 10).alias("v")],
            [F.length("s").cast("long").alias("v")],
        )
        .to_df()
        .collect()
    )
    assert sorted(r.v for r in out) == [1, 2, 10, 20]


def test_connected_streams_co_flat_map_python(spark, env):
    a = env.from_collection([(2,)], "n long")
    b = env.from_collection([("ab",)], "s string")

    def f1(row):
        for i in range(int(row.n)):
            yield (i,)

    def f2(row):
        for ch in row.s:
            yield (ord(ch) - ord("a"),)

    out = (
        a.connect(b)
        .flat_map(f1, f2, "v long")
        .to_df()
        .collect()
    )
    assert sorted(r.v for r in out) == [0, 0, 1, 1]


def test_async_datastream_ordered_wait(spark, env):
    """AsyncDataStream.orderedWait: overlapped coroutine lookups, results
    in row order even when completions arrive reversed."""
    from apache_flink_spark.datastream import AsyncDataStream

    async def fake_service(k):
        import asyncio

        await asyncio.sleep((5 - int(k)) * 0.01)  # later keys finish first
        return f"v{k}"

    ds = env.from_collection([(1,), (2,), (3,), (4,)], "k long")
    out = (
        AsyncDataStream.ordered_wait(
            ds, fake_service, "k", "enriched", "string", capacity=4
        )
        .to_df()
        .orderBy("k")
        .collect()
    )
    assert [r.enriched for r in out] == ["v1", "v2", "v3", "v4"]


def test_side_output_split(spark, env):
    """OutputTag routing: every row to exactly one channel, first match
    wins, unmatched rows to main."""
    from apache_flink_spark.datastream import OutputTag, side_output_split

    ds = env.from_collection(
        [(1, 5), (2, 50), (3, 500), (4, 55)], "id long, v long"
    )
    outs = side_output_split(
        ds,
        OutputTag("small", "v < 10"),
        OutputTag("medium", "v < 100"),
    )
    got = {
        name: sorted(r.id for r in s.to_df().collect())
        for name, s in outs.items()
    }
    assert got == {"small": [1], "medium": [2, 4], "main": [3]}


def test_co_group_windowed(spark, env):
    """coGroup: keys present on only one side surface with an empty
    iterable for the absent side (the contract a windowed JOIN loses)."""
    from apache_flink_spark.datastream import TumblingEventTimeWindows

    a = env.from_collection(
        [("u1", "2024-01-01 00:01:00", 1), ("u3", "2024-01-01 00:02:00", 3)],
        "k string, ts string, v long",
    ).map([F.col("k"), F.to_timestamp("ts").alias("ts"), F.col("v")])
    b = env.from_collection(
        [("u1", "2024-01-01 00:03:00", 10), ("u2", "2024-01-01 00:04:00", 20)],
        "k string, ts string, v long",
    ).map([F.col("k"), F.to_timestamp("ts").alias("ts"), F.col("v")])

    out = (
        a.co_group(b)
        .where("k")
        .equal_to("k")
        .window(TumblingEventTimeWindows.of("10 minutes").on("ts"))
        .apply()
        .to_df()
        .collect()
    )
    got = {
        r.key: (len(r.left_items), len(r.right_items)) for r in out
    }
    assert got == {"u1": (1, 1), "u2": (0, 1), "u3": (1, 0)}


def test_side_output_split_null_predicate(spark, env):
    """A NULL-evaluating tag predicate counts as no-match: the row must
    land in main, not vanish under three-valued logic."""
    from apache_flink_spark.datastream import OutputTag, side_output_split

    ds = env.from_collection([(1, None), (2, 5)], "id long, v long")
    outs = side_output_split(ds, OutputTag("small", "v < 10"))
    assert [r.id for r in outs["small"].to_df().collect()] == [2]
    assert [r.id for r in outs["main"].to_df().collect()] == [1]


def test_co_group_composite_key(spark, env):
    from apache_flink_spark.datastream import TumblingEventTimeWindows

    a = env.from_collection(
        [("u1", "A", "2024-01-01 00:01:00")], "k string, g string, ts string"
    ).map([F.col("k"), F.col("g"), F.to_timestamp("ts").alias("ts")])
    b = env.from_collection(
        [("u1", "A", "2024-01-01 00:02:00"), ("u1", "B", "2024-01-01 00:02:30")],
        "k string, g string, ts string",
    ).map([F.col("k"), F.col("g"), F.to_timestamp("ts").alias("ts")])
    rows = (
        a.co_group(b)
        .where("k", "g")
        .equal_to("k", "g")
        .window(TumblingEventTimeWindows.of("10 minutes").on("ts"))
        .apply()
        .to_df()
        .collect()
    )
    got = {
        (r.key0, r.key1): (len(r.left_items), len(r.right_items))
        for r in rows
    }
    assert got == {("u1", "A"): (1, 1), ("u1", "B"): (0, 1)}
