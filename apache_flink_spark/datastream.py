"""DataStream API facade — the reference's second user-facing API.

Reference parity: the classic DataStream API lives in flink-runtime since
2.0 (``flink-runtime/src/main/java/org/apache/flink/streaming/api/
datastream/DataStream.java``, ``KeyedStream.java``, environment
``.../environment/StreamExecutionEnvironment.java`` — ``fromElements:995``,
``fromCollection:1068``, ``fromSequence:965``, ``socketTextStream:1453``).
This module re-expresses that vocabulary over DataFrames so a DataStream
user can port programs verbatim:

    env = StreamExecutionEnvironment.get_execution_environment()
    ds = env.from_collection([...], "word string")
    (ds.flat_map(..., "word string")
       .key_by("word")
       .sum_("n")                      # Flink batch-mode semantics
       .to_df())

Semantics note (important): Flink 2.0 runs keyed aggregations in BATCH
execution mode by emitting only the FINAL value per key (streaming mode
emits rolling updates). The facade implements the batch-mode contract for
bounded inputs — ``key_by().sum_()`` is a hash aggregate — and the rolling
variant for unbounded inputs is exactly the update-mode streaming group agg
already registered (``stream_update_group_agg``).

Expression-first design: ``map``/``filter`` take Column expressions (JVM,
whole-stage codegen) as the hot path; Python callables are accepted and run
Arrow-batched via ``mapInPandas`` — the documented slow path, same contract
as a Flink ``MapFunction``.
"""

from __future__ import annotations

import os
from collections.abc import Callable, Iterator, Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from apache_flink_spark.table_api import GroupWindow


class StreamExecutionEnvironment:
    """Entry point (StreamExecutionEnvironment.java parity)."""

    def __init__(self, spark: SparkSession | None = None):
        if spark is None:
            from apache_flink_spark.session import get_spark

            spark = get_spark()
        self.spark = spark

    @classmethod
    def get_execution_environment(
        cls, spark: SparkSession | None = None
    ) -> "StreamExecutionEnvironment":
        return cls(spark)

    def set_parallelism(self, n: int) -> "StreamExecutionEnvironment":
        """Default parallelism (``setParallelism``): maps to the shuffle
        partition count — the unit of keyed parallelism here."""
        self.spark.conf.set("spark.sql.shuffle.partitions", str(n))
        return self

    # -- sources -----------------------------------------------------------

    def from_collection(self, data, schema=None) -> "DataStream":
        """``fromCollection:1068`` / ``fromElements:995``."""
        return DataStream(self.spark.createDataFrame(data, schema))

    from_elements = from_collection

    def from_sequence(self, start: int, end: int) -> "DataStream":
        """``fromSequence:965``: inclusive [start, end], column ``id``."""
        return DataStream(self.spark.range(start, end + 1))

    def socket_text_stream(self, host: str, port: int) -> "DataStream":
        """``socketTextStream:1453``: one ``value`` string column/line."""
        from apache_flink_spark.streaming.sources import socket_source

        return DataStream(socket_source(self.spark, host, port))

    def from_source(self, df: DataFrame) -> "DataStream":
        """Wrap any batch or streaming DataFrame (FLIP-27 Source parity —
        the DataFrame IS the source)."""
        return DataStream(df)

    def execute(self, job_name: str | None = None) -> None:
        """``execute()``: no-op — Spark actions trigger execution; kept so
        ported programs run unchanged."""
        return None


def _rowwise(fn: Callable, out_schema: str):
    """Arrow-batched adapter for a per-row Python function (MapFunction /
    FlatMapFunction contract). fn(Row-as-namedtuple) -> tuple (map) or
    iterable of tuples (flat_map when flat=True)."""

    def run_map(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = [fn(r) for r in pdf.itertuples(index=False)]
            yield pd.DataFrame(rows)

    return run_map


def _rowwise_flat(fn: Callable):
    def run_flat(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = [t for r in pdf.itertuples(index=False) for t in fn(r)]
            yield pd.DataFrame(out)

    return run_flat


class DataStream:
    """DataStream.java parity over a DataFrame (batch or streaming)."""

    def __init__(self, df: DataFrame):
        self.df = df

    def to_df(self) -> DataFrame:
        return self.df

    # -- stateless transforms (StreamExecCalc twin) ------------------------

    def map(self, fn, output_type: str | None = None) -> "DataStream":
        """``DataStream.map``. Column expression(s) -> JVM projection (hot
        path); Python callable -> Arrow-batched mapInPandas (slow path,
        requires ``output_type``)."""
        if callable(fn) and not isinstance(fn, Column):
            if output_type is None:
                raise ValueError("python map() needs an output_type schema")
            return DataStream(
                self.df.mapInPandas(_rowwise(fn, output_type), output_type)
            )
        cols = fn if isinstance(fn, (list, tuple)) else [fn]
        return DataStream(self.df.select(*cols))

    def flat_map(self, fn, output_type: str | None = None) -> "DataStream":
        """``DataStream.flatMap``. Column producing an array -> explode
        (JVM); Python generator callable -> mapInPandas."""
        if callable(fn) and not isinstance(fn, Column):
            if output_type is None:
                raise ValueError("python flat_map() needs an output_type")
            return DataStream(
                self.df.mapInPandas(_rowwise_flat(fn), output_type)
            )
        col = fn if isinstance(fn, Column) else F.col(fn)
        return DataStream(self.df.select(F.explode(col).alias("value")))

    def filter(self, predicate) -> "DataStream":
        """``DataStream.filter``: Column/SQL-string predicate (JVM)."""
        return DataStream(self.df.filter(predicate))

    def project(self, *cols) -> "DataStream":
        return DataStream(self.df.select(*cols))

    # -- partitioning ------------------------------------------------------

    def key_by(self, *keys) -> "KeyedStream":
        """``DataStream.keyBy``: hash-partition by key."""
        return KeyedStream(self.df, [k if isinstance(k, Column) else F.col(k) for k in keys], list(keys))

    def broadcast(self) -> "DataStream":
        """``DataStream.broadcast:337``: replicate to every task — here, a
        broadcast-join hint on the relation."""
        return DataStream(F.broadcast(self.df))

    def rebalance(self) -> "DataStream":
        """Round-robin repartition (``rebalance``)."""
        return DataStream(
            self.df.repartition(
                int(os.environ.get("SPARK_GRAFT_CPUS", "0") or 0)
                or self.df.sparkSession.sparkContext.defaultParallelism
            )
        )

    def union(self, *others: "DataStream") -> "DataStream":
        """``DataStream.union``: UNION ALL of same-schema streams."""
        out = self.df
        for o in others:
            out = out.unionAll(o.df)
        return DataStream(out)

    def co_group(self, other: "DataStream") -> "CoGroupedStreams":
        """``DataStream.coGroup`` (CoGroupedStreams.java): windowed
        group-wise pairing — see CoGroupedStreams below."""
        return CoGroupedStreams(self, other)

    def connect(self, other: "DataStream") -> "ConnectedStreams":
        """``DataStream.connect`` (ConnectedStreams.java): pair two
        differently-typed streams for a CoMap/CoFlatMap that folds both
        into one output type."""
        return ConnectedStreams(self, other)

    # -- event time --------------------------------------------------------

    def assign_timestamps_and_watermarks(
        self, ts_col: str, max_out_of_orderness: str
    ) -> "DataStream":
        """``assignTimestampsAndWatermarks`` with
        ``forBoundedOutOfOrderness`` (WatermarkStrategy.java:234)."""
        return DataStream(self.df.withWatermark(ts_col, max_out_of_orderness))

    # -- sinks -------------------------------------------------------------

    def print(self, n: int = 20) -> None:
        """``DataStream.print``: console sink."""
        from apache_flink_spark import io

        io.print_sink(self.df, n)

    def sink_to(self, path: str, fmt: str = "parquet") -> None:
        """FileSink parity."""
        self.df.write.mode("overwrite").format(fmt).save(path)

    def execute_and_collect(self, limit: int = 1000):
        """``executeAndCollect(limit)`` — bounded driver fetch, the ONLY
        collect in this API (mirrors the reference's own test sink)."""
        return self.df.limit(limit).collect()


class ConnectedStreams:
    """``ConnectedStreams.java`` parity: the CoMapFunction /
    CoFlatMapFunction surface. Semantics match the reference exactly —
    each side is transformed by ITS function into the shared output type
    and the results interleave — so the Spark-first plan is two
    independent map stages + UNION ALL (both narrow; no shared operator
    instance is needed because the co-functions in the reference may not
    share mutable state across map1/map2 anyway without keyed state)."""

    def __init__(self, first: DataStream, second: DataStream):
        self.first = first
        self.second = second

    def map(self, fn1, fn2, output_type: str | None = None) -> DataStream:
        """``ConnectedStreams.map(CoMapFunction)``: map1 on stream 1,
        map2 on stream 2, unioned into the common ``output_type``."""
        return self.first.map(fn1, output_type).union(
            self.second.map(fn2, output_type)
        )

    def flat_map(
        self, fn1, fn2, output_type: str | None = None
    ) -> DataStream:
        """``ConnectedStreams.flatMap(CoFlatMapFunction)``."""
        return self.first.flat_map(fn1, output_type).union(
            self.second.flat_map(fn2, output_type)
        )


class KeyedStream(DataStream):
    """KeyedStream.java parity: per-key aggregates and windows. Bounded
    (batch-mode) semantics — final value per key."""

    def __init__(self, df: DataFrame, key_cols: list[Column], key_names: list):
        super().__init__(df)
        self._keys = key_cols
        self._key_names = key_names

    def sum_(self, col) -> DataStream:
        return self._agg(F.sum(col).alias(f"sum_{col}" if isinstance(col, str) else "sum"))

    def min_(self, col) -> DataStream:
        return self._agg(F.min(col).alias(f"min_{col}" if isinstance(col, str) else "min"))

    def max_(self, col) -> DataStream:
        return self._agg(F.max(col).alias(f"max_{col}" if isinstance(col, str) else "max"))

    def count(self) -> DataStream:
        return self._agg(F.count(F.lit(1)).alias("count"))

    def aggregate(self, *aggs: Column) -> DataStream:
        """``KeyedStream.aggregate`` with explicit aggregate expressions."""
        return self._agg(*aggs)

    def _agg(self, *aggs: Column) -> DataStream:
        return DataStream(self.df.groupBy(*self._keys).agg(*aggs))

    def reduce(self, fn: Callable, output_type: str | None = None) -> DataStream:
        """``KeyedStream.reduce``: per-key fold with a Python ReduceFunction
        (fn(acc_row, row) -> row, rows as namedtuples). Arrow-batched
        applyInPandas per key — the documented slow path; prefer
        ``aggregate`` with Column expressions."""
        import functools

        schema = output_type or self.df.schema

        def fold(pdf):
            import pandas as pd

            rows = list(pdf.itertuples(index=False))
            acc = functools.reduce(fn, rows[1:], rows[0])
            return pd.DataFrame([tuple(acc)], columns=list(pdf.columns))

        return DataStream(
            self.df.groupBy(*self._keys).applyInPandas(fold, schema)
        )

    def window(self, assigner: "GroupWindow") -> "WindowedKeyedStream":
        """``KeyedStream.window`` with an event-time window assigner
        (Tumbling/Sliding/Session — same assigners as the Table API)."""
        return WindowedKeyedStream(self.df, self._keys, assigner)

    def interval_join(
        self,
        other: "KeyedStream",
        left_ts: str,
        right_ts: str,
        lower: str,
        upper: str,
    ) -> DataStream:
        """``KeyedStream.intervalJoin:369`` (RT TimeIntervalJoin.java):
        join rows with equal keys whose times satisfy
        ``left_ts + lower <= right_ts <= left_ts + upper`` (lower/upper are
        SQL interval strings, negative allowed: ``"-30 minutes"``).
        On streaming inputs with watermarks, Structured Streaming derives
        state eviction from the range condition — the same cleanup the
        reference's interval-join state timers do."""
        conds = [
            lk.eqNullSafe(rk) for lk, rk in zip(self._keys, other._keys)
        ]
        lo = F.col(left_ts) + F.expr(f"INTERVAL {lower.lstrip('+')}")
        hi = F.col(left_ts) + F.expr(f"INTERVAL {upper.lstrip('+')}")
        cond = conds[0]
        for c in conds[1:]:
            cond = cond & c
        cond = cond & (F.col(right_ts) >= lo) & (F.col(right_ts) <= hi)
        return DataStream(self.df.join(other.df, cond))

    def process(
        self,
        fn,
        output_schema: str,
        state_schema: str | None = None,
        output_mode: str = "append",
        timeout: str = "NoTimeout",
    ) -> DataStream:
        """``KeyedProcessFunction`` parity. Batch input: per-key
        ``applyInPandas`` (fn(key, pdf) -> pdf). Streaming input: per-key
        ``applyInPandasWithState`` (fn(key, pdfs, state) -> iterator of
        pdfs) with a GroupState of ``state_schema`` — the same surface the
        engine's own stateful operators (Top-N, custom sessions, temporal
        sort — streaming/stateful.py) are built on."""
        grouped = self.df.groupBy(*self._keys)
        if self.df.isStreaming:
            if state_schema is None:
                raise ValueError("streaming process() needs a state_schema")
            return DataStream(
                grouped.applyInPandasWithState(
                    fn, output_schema, state_schema, output_mode, timeout
                )
            )
        return DataStream(grouped.applyInPandas(fn, output_schema))


class WindowedKeyedStream:
    def __init__(self, df: DataFrame, keys: list[Column], assigner: GroupWindow):
        self.df = df
        self.keys = keys
        self.assigner = assigner

    def aggregate(self, *aggs: Column) -> DataStream:
        """``WindowedStream.aggregate``: keyed windowed aggregation —
        groupBy(window, keys), the StreamExecWindowAggregate shape."""
        win = self.assigner.to_column().alias(self.assigner.alias_name or "w")
        return DataStream(self.df.groupBy(win, *self.keys).agg(*aggs))


class CoGroupedStreams:
    """``DataStream.coGroup`` builder chain (CoGroupedStreams.java):
    ``a.co_group(b).where(k1).equal_to(k2).window(assigner).apply()``.

    Unlike a windowed JOIN, coGroup surfaces keys present on only ONE
    side (the reference hands the CoGroupFunction an empty iterable for
    the absent side). Spark-first: each side aggregates its per-(key,
    window) rows with collect_list — two partial-aggregated shuffles —
    then a FULL OUTER equi-join on (key, window) stitches the groups;
    missing sides arrive as empty arrays. No row-level cross product
    ever materializes, and at 100 TB both collect_lists combine
    map-side before the one keyed exchange each."""

    def __init__(self, first: "DataStream", second: "DataStream"):
        self.first = first
        self.second = second
        self._k1: list | None = None
        self._k2: list | None = None
        self._assigner: GroupWindow | None = None

    def where(self, *keys) -> "CoGroupedStreams":
        self._k1 = list(keys)
        return self

    def equal_to(self, *keys) -> "CoGroupedStreams":
        self._k2 = list(keys)
        return self

    def window(self, assigner: GroupWindow) -> "CoGroupedStreams":
        self._assigner = assigner
        return self

    def apply(self) -> DataStream:
        """Emit (key, window, left_items array, right_items array) — the
        declarative CoGroupFunction: downstream expressions consume the
        two group arrays exactly as the reference's apply() consumes its
        two iterables."""
        if not self._k1 or not self._k2:
            raise ValueError("co_group needs where(...) and equal_to(...)")
        if self._assigner is None:
            raise ValueError("co_group needs window(assigner)")
        if len(self._k1) != len(self._k2):
            raise ValueError("where(...) and equal_to(...) arity differ")
        win = self._assigner.to_column().alias("w")
        knames = [f"__k{i}" for i in range(len(self._k1))]

        def side(ds: "DataStream", keys: list, out: str) -> DataFrame:
            items = F.struct(*ds.df.columns).alias("__it")
            aliased = [F.col(k).alias(n) for k, n in zip(keys, knames)]
            return (
                ds.df.select(*aliased, win, items)
                .groupBy(*knames, "w")
                .agg(F.collect_list("__it").alias(out))
            )

        l = side(self.first, self._k1, "left_items")
        r = side(self.second, self._k2, "right_items")
        joined = l.join(r, [*knames, "w"], "full")
        empty_l = F.coalesce(
            F.col("left_items"), F.array().cast(l.schema["left_items"].dataType)
        )
        empty_r = F.coalesce(
            F.col("right_items"),
            F.array().cast(r.schema["right_items"].dataType),
        )
        key_cols = (
            [F.col(knames[0]).alias("key")]
            if len(knames) == 1
            else [
                F.col(n).alias(f"key{i}") for i, n in enumerate(knames)
            ]
        )
        return DataStream(
            joined.select(
                *key_cols,
                F.col("w.start").alias("win_start"),
                empty_l.alias("left_items"),
                empty_r.alias("right_items"),
            )
        )


# Window assigner aliases in DataStream vocabulary
# (TumblingEventTimeWindows.of / SlidingEventTimeWindows.of /
#  EventTimeSessionWindows.withGap)
from apache_flink_spark.table_api import (  # noqa: E402
    Session as EventTimeSessionWindows,
    Slide as SlidingEventTimeWindows,
    Tumble as TumblingEventTimeWindows,
)

# DataStream vocabulary: assigners use .of(...) (TumblingEventTimeWindows
# .of, SlidingEventTimeWindows.of) where the Table API says .over(...).
TumblingEventTimeWindows.of = TumblingEventTimeWindows.over
SlidingEventTimeWindows.of = SlidingEventTimeWindows.over

__all__ = [
    "StreamExecutionEnvironment",
    "DataStream",
    "KeyedStream",
    "WindowedKeyedStream",
    "TumblingEventTimeWindows",
    "SlidingEventTimeWindows",
    "EventTimeSessionWindows",
]


class AsyncDataStream:
    """``AsyncDataStream.java`` parity — the async I/O operator factory
    (reference AsyncWaitOperator + orderedWait/unorderedWait). Each Arrow
    batch becomes one bounded flight of overlapped coroutine requests on a
    real asyncio event loop (apache_flink_spark/lookup.py
    ordered_async_probe); ``capacity`` is the reference's max in-flight
    requests. In micro-batch execution ordered vs unordered emission
    collapses at the batch boundary — both emit when the batch completes —
    so ``unordered_wait`` shares the implementation and exists for API
    parity; row order within the batch is preserved either way (the
    stronger, deterministic contract)."""

    @staticmethod
    def ordered_wait(
        ds: DataStream,
        async_fn,
        key_col: str,
        out_col: str,
        out_type: str = "string",
        capacity: int = 4,
    ) -> DataStream:
        from pyspark.sql.types import (
            StructField,
            StructType,
            _parse_datatype_string,
        )

        from apache_flink_spark.lookup import ordered_async_probe

        # NB: StructType(fields) keeps the caller's list by REFERENCE and
        # DataFrames cache their schema object — mutating via .add() would
        # corrupt ds.df.schema. Build a fresh field list instead.
        out_schema = StructType(
            list(ds.df.schema.fields)
            + [StructField(out_col, _parse_datatype_string(out_type))]
        )

        def run(batches: Iterator) -> Iterator:
            probe = ordered_async_probe(async_fn, capacity)
            for pdf in batches:
                pdf = pdf.copy()
                pdf[out_col] = probe(list(pdf[key_col]))
                yield pdf

        return DataStream(ds.df.mapInPandas(run, out_schema))

    unordered_wait = ordered_wait


class OutputTag:
    """``OutputTag.java`` parity: names a side-output channel. The facade
    routes declaratively (a predicate per tag) rather than imperatively
    from inside a process function — same channels, same rows, but the
    routing predicate stays a JVM Column expression instead of Python."""

    def __init__(self, tag_id: str, predicate):
        self.tag_id = tag_id
        self.predicate = predicate


def side_output_split(
    ds: DataStream, *tags: OutputTag
) -> dict[str, DataStream]:
    """Side outputs (reference ProcessFunction Context.output(OutputTag)):
    returns {"main": rows matching NO tag, tag_id: its rows} — every row
    routed exactly once, first matching tag wins (the reference emits to
    whichever tags the process function chooses; first-match is the
    deterministic declarative analog). Each output is a filter over the
    same parent plan, so a persisted/cached parent is scanned once; the
    STREAMING fan-out with real per-sink exactly-once lives in
    streaming/utils.split_to_sinks (foreachBatch persist + N filtered
    sinks)."""
    outs: dict[str, DataStream] = {}
    taken = F.lit(False)
    for tag in tags:
        pred = (
            tag.predicate
            if isinstance(tag.predicate, Column)
            else F.expr(tag.predicate)
        )
        # NULL-safe: a predicate evaluating to SQL NULL must count as
        # no-match, not poison `taken` into NULL and drop the row from
        # every channel (SQL three-valued logic would).
        pred = F.coalesce(pred, F.lit(False))
        outs[tag.tag_id] = DataStream(ds.df.filter(~taken & pred))
        taken = taken | pred
    outs["main"] = DataStream(ds.df.filter(~taken))
    return outs
