"""DataStream V2 API facade tests (apache_flink_spark/datastream_v2.py;
reference flink-datastream-api). Covers the surface the registered
queries don't: non-keyed process, two-output process, the co-partitioned
two-input join, shuffle/global partitioning, and the lazy sink graph."""

from __future__ import annotations

from apache_flink_spark.datastream_v2 import (
    CollectSink,
    ExecutionEnvironment,
    OneInputStreamProcessFunction,
    ParquetSink,
    TwoInputNonBroadcastStreamProcessFunction,
    TwoOutputStreamProcessFunction,
)


def test_non_keyed_process_and_sink(spark, tmp_path):
    # defined in-function: cloudpickle serializes by VALUE (a test-module
    #-level class pickles by reference, which workers cannot import)
    class Tokenize(OneInputStreamProcessFunction):
        def process_record(self, record, output, ctx):
            for w in record["line"].split():
                output.collect({"word": w, "n": 1})

    env = ExecutionEnvironment.get_instance(spark)
    src = env.from_source(
        ([("a b a",), ("b c",)], "line string"), "lines"
    )
    words = src.process(Tokenize(), "word string, n long")
    sink = CollectSink()
    words.key_by("word").to_sink(sink)
    pq = ParquetSink(str(tmp_path / "words"))
    words.to_sink(pq)
    assert sink.rows == []  # lazy until execute (reference job graph)
    env.execute("wc")
    got = sorted((r.word, r.n) for r in sink.rows)
    assert got == [("a", 1), ("a", 1), ("b", 1), ("b", 1), ("c", 1)]
    assert spark.read.parquet(pq.path).count() == 5


def test_two_output_process(spark):
    class Split(TwoOutputStreamProcessFunction):
        def process_record(self, record, output1, output2, ctx):
            if record["x"] % 2 == 0:
                output1.collect({"x": record["x"]})
            else:
                output2.collect({"y": record["x"]})

    env = ExecutionEnvironment.get_instance(spark)
    src = env.from_source(([(i,) for i in range(10)], "x long"), "nums")
    evens, odds = src.process_two_output(Split(), "x long", "y long")
    assert sorted(r.x for r in evens.df.collect()) == [0, 2, 4, 6, 8]
    assert sorted(r.y for r in odds.df.collect()) == [1, 3, 5, 7, 9]


def test_two_input_non_broadcast(spark):
    class Join(TwoInputNonBroadcastStreamProcessFunction):
        def open(self):
            self.left = []

        def process_record_from_first_input(self, record, output, ctx):
            self.left.append(record["a"])

        def process_record_from_second_input(self, record, output, ctx):
            for a in self.left:
                output.collect(
                    {"k": record["k"], "a": a, "b": record["b"]}
                )

    env = ExecutionEnvironment.get_instance(spark)
    s1 = env.from_source(
        ([(1, 10), (1, 11), (2, 20)], "k long, a long"), "s1"
    ).key_by("k")
    s2 = env.from_source(
        ([(1, 100), (2, 200), (3, 300)], "k long, b long"), "s2"
    ).key_by("k")
    out = s1.connect_and_process(s2, Join(), "k long, a long, b long")
    got = sorted((r.k, r.a, r.b) for r in out.df.collect())
    # first-input records (all of them) precede second-input records per
    # key — the reference's bounded two-input ordering; key 3 has no
    # first-input rows so emits nothing.
    assert got == [(1, 10, 100), (1, 11, 100), (2, 20, 200)]


def test_shuffle_and_global_preserve_rows(spark):
    env = ExecutionEnvironment.get_instance(spark)
    src = env.from_source(([(i,) for i in range(100)], "x long"), "nums")
    assert sorted(
        r.x for r in src.shuffle().df.collect()
    ) == list(range(100))
    g = src.global_()
    assert g.df.rdd.getNumPartitions() == 1
    assert sorted(r.x for r in g.df.collect()) == list(range(100))


def test_broadcast_stream_cap_errors_loudly(spark):
    """r6 VERDICT #3: an oversized broadcast side must error, not OOM the
    driver silently."""
    import pytest as _pytest

    import apache_flink_spark.datastream_v2 as dsv2
    from apache_flink_spark.datastream_v2 import (
        ExecutionEnvironment,
        TwoInputBroadcastStreamProcessFunction,
    )

    env = ExecutionEnvironment.get_instance(spark)
    keyed = env.from_source(
        ([(1, 1)], "k long, v long"), "keyed"
    ).key_by("k")
    big = dsv2.NonKeyedPartitionStream(
        env, spark.range(10).selectExpr("id AS b")
    ).broadcast()

    class Fn(TwoInputBroadcastStreamProcessFunction):
        def process_record_from_broadcast_input(self, rec, ctx):
            pass

        def process_record_from_non_broadcast_input(self, rec, ctx):
            pass

    old = dsv2._MAX_BROADCAST_ROWS
    dsv2._MAX_BROADCAST_ROWS = 5
    try:
        with _pytest.raises(ValueError, match="broadcast side exceeds"):
            keyed.connect_and_process(big, Fn(), "k long")
    finally:
        dsv2._MAX_BROADCAST_ROWS = old
