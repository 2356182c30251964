"""DataStream V2 API queries (reference flink-datastream-api — the 2.0
experimental surface; facade in apache_flink_spark/datastream_v2.py).

Both entries drive the V2 vocabulary end-to-end — ExecutionEnvironment ->
from_source -> key_by/process/connect_and_process -> result — with exact
DuckDB oracles. Emission happens at end_input per key (order-independent
aggregates), so results are deterministic regardless of Arrow batch
order within a key."""

from __future__ import annotations

from pyspark.sql import functions as F

from apache_flink_spark.catalog import load_tables
from apache_flink_spark.queries.registry import query


@query(
    "dsv2_keyed_process_agg",
    oracle="""
    SELECT user_id, COUNT(*) AS n_events,
           MAX(CAST(round(value * 100) AS BIGINT)) AS max_value_c
    FROM events
    GROUP BY user_id
    """,
)
def dsv2_keyed_process_agg(spark, sf_dir):
    """V2 KeyedPartitionStream.process (KeyedPartitionStream.java:63 +
    OneInputStreamProcessFunction.java:35): per-key ValueState running
    count/max emitted at end_input — the canonical keyed process-function
    shape on the new API."""
    from apache_flink_spark.datastream_v2 import (
        ExecutionEnvironment,
        OneInputStreamProcessFunction,
    )

    events = load_tables(spark, sf_dir)["events"].select(
        "user_id",
        (F.round(F.col("value") * 100)).cast("long").alias("value_c"),
    )

    class MaxCount(OneInputStreamProcessFunction):
        def open(self):
            self._out = None  # stashed collector for end_input emission

        def process_record(self, record, output, ctx):
            self._out = output
            st = ctx.state_manager.get_value_state("agg")
            n, mx = st.value() or (0, None)
            v = record["value_c"]
            st.update((n + 1, v if mx is None or v > mx else mx))

        def end_input(self, ctx):
            st = ctx.state_manager.get_value_state("agg")
            if st.value() is not None and self._out is not None:
                n, mx = st.value()
                self._out.collect(
                    {
                        "user_id": ctx.current_key,
                        "n_events": n,
                        "max_value_c": mx,
                    }
                )

    env = ExecutionEnvironment.get_instance(spark)
    out = (
        env.from_source(events, "events")
        .key_by("user_id")
        .process(
            MaxCount(),
            "user_id long, n_events long, max_value_c long",
        )
    )
    return out.df


@query(
    "dsv2_broadcast_enrich",
    oracle="""
    SELECT c_custkey, n_name
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    """,
)
def dsv2_broadcast_enrich(spark, sf_dir):
    """V2 connect_and_process with a BroadcastStream
    (TwoInputBroadcastStreamProcessFunction.java): the nation dimension
    broadcasts into every partition of the customer stream; broadcast
    records apply before non-broadcast records (the reference's bounded
    broadcast ordering)."""
    from apache_flink_spark.datastream_v2 import (
        ExecutionEnvironment,
        TwoInputBroadcastStreamProcessFunction,
    )

    tables = load_tables(spark, sf_dir)
    customer = tables["customer"].select("c_custkey", "c_nationkey")
    nation = tables["nation"].select("n_nationkey", "n_name")

    class Enrich(TwoInputBroadcastStreamProcessFunction):
        def open(self):
            self.dim = {}

        def process_record_from_broadcast_input(self, record, ctx):
            self.dim[record["n_nationkey"]] = record["n_name"]

        def process_record_from_non_broadcast_input(self, record, output,
                                                    ctx):
            name = self.dim.get(record["c_nationkey"])
            if name is not None:
                output.collect(
                    {"c_custkey": record["c_custkey"], "n_name": name}
                )

    env = ExecutionEnvironment.get_instance(spark)
    cust = env.from_source(customer, "customer").key_by("c_nationkey")
    # BroadcastStream materializes the BOUNDED dimension driver-side and
    # ships it into every partition — the broadcast contract itself
    # (dim is 25 rows; the fact side never leaves the executors).
    dim = env.from_source(nation, "nation").broadcast()
    out = cust.connect_and_process(
        dim, Enrich(), "c_custkey long, n_name string"
    )
    return out.df
