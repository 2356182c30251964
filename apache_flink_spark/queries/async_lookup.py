"""Async / batched external lookup patterns.

Reference parity (SURVEY.md §2.3 lookup join + §2.2 async calc):
AsyncLookupJoinRunner / RetryableLookupFunctionDelegator (flink-table-runtime
.../join/lookup/) probe an external system per row with async batching and
caching; StreamExecAsyncCalc does the same for scalar functions. Spark's
equivalent is ``mapInPandas``: each Arrow batch is one "async round trip" —
the lookup function receives THOUSANDS of keys at once (vs the reference's
per-row futures), amortizing the service call, with a per-executor cache.

The external service is simulated with a deterministic in-process table
(broadcast dict) so the oracle can verify the plumbing; a real deployment
swaps `_service_batch_get` for an aiohttp/grpc batched call with retry —
the DataFrame-side shape (batch in, batch out, no shuffle) is unchanged.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import functions as F

from apache_flink_spark.queries._util import t
from apache_flink_spark.queries.registry import query


#: Hard bound on the simulated service table. This pattern DRIVER-COLLECTS
#: the lookup side (it stands in for an external RPC service, which has no
#: DataFrame); that is only sane for genuinely tiny control tables. For
#: in-cluster lookup data of any real size use a broadcast-hint join
#: (queries/temporal_joins.py lookup_join_enrich) — Catalyst ships it to
#: executors without routing rows through the driver, and falls back to a
#: shuffle join when it outgrows the broadcast threshold.
_MAX_SERVICE_ROWS = 10_000

#: Concurrent in-flight service requests per task (reference
#: AsyncWaitOperator capacity — AsyncDataStream.orderedWait's capacity arg).
_ASYNC_CAPACITY = 4


@query(
    "async_lookup_enrich",
    oracle="""
    SELECT s.s_suppkey, s.s_name, n.n_name AS nation_name,
           length(n.n_name) AS svc_checksum
    FROM supplier s LEFT JOIN nation n ON n.n_nationkey = s.s_nationkey
    """,
)
def async_lookup_enrich(spark, sf_dir):
    """Async lookup join (AsyncLookupJoinRunner / AsyncWaitOperator parity):
    suppliers probe the 'nation service' through a REAL asyncio event loop
    (lookup.ordered_async_probe) — _ASYNC_CAPACITY concurrent in-flight
    coroutine requests per Arrow batch, awaited in submission order
    (ordered async mode — deterministic emission); a production client
    awaits aiohttp/grpc-aio in the same coroutine slot. Each probe goes through
    the per-worker TTL'd LRU cache + bounded-retry wrapper
    (apache_flink_spark.lookup — DefaultLookupCache.java:51 /
    RetryableLookupFunctionDelegator parity), so a hot key hits the
    service once per executor worker. Misses yield NULL (left-join
    semantics) and are negative-cached. Size-guarded — see
    _MAX_SERVICE_ROWS."""
    s = t(spark, sf_dir, "supplier")
    nation = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    nation_rows = nation.limit(_MAX_SERVICE_ROWS + 1).collect()
    if len(nation_rows) > _MAX_SERVICE_ROWS:
        raise ValueError(
            f"async_lookup_enrich: service table exceeds {_MAX_SERVICE_ROWS} "
            "rows — this pattern driver-collects the lookup side and is for "
            "tiny external-service caches only; use lookup_join_enrich "
            "(broadcast-hint join) for in-cluster lookup tables"
        )
    service_table = spark.sparkContext.broadcast(
        {int(r.n_nationkey): r.n_name for r in nation_rows}
    )

    async def _service_batch_get_async(keys) -> dict:
        # One in-flight ASYNC service request for the DISTINCT keys the
        # cache doesn't hold — a real client awaits an aiohttp/grpc-aio
        # batched call here; the asyncio.sleep(0) is the awaited I/O point
        # that lets the event loop overlap the other in-flight requests.
        import asyncio

        await asyncio.sleep(0)
        table = service_table.value
        return {k: table.get(int(k)) for k in keys}

    def lookup(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # ORDERED async mode (reference AsyncWaitOperator with capacity N +
        # OutputMode.ORDERED): each Arrow batch is split into _ASYNC_CAPACITY
        # concurrent in-flight coroutine requests on a real asyncio loop;
        # results are awaited in submission order so emission order — and
        # the oracle hash — is deterministic.
        from apache_flink_spark.lookup import (
            cached_batch_lookup,
            executor_cache,
            ordered_async_probe,
            retrying,
        )

        cache = executor_cache(
            "nation_service", max_size=_MAX_SERVICE_ROWS, ttl_s=600.0
        )
        flight = ordered_async_probe(
            _service_batch_get_async, capacity=_ASYNC_CAPACITY
        )

        def _fetch(keys) -> dict:
            # The cache sees ONE batched fetch; the flight splits it into
            # capacity-bounded concurrent sub-requests.
            keys = list(keys)
            step = max(1, -(-len(keys) // _ASYNC_CAPACITY))
            chunks = [keys[i : i + step] for i in range(0, len(keys), step)]
            merged: dict = {}
            for part in flight(chunks):
                merged.update(part)
            return merged

        probe = cached_batch_lookup(retrying(_fetch, max_attempts=3), cache)

        for pdf in batches:
            names = probe(pdf["s_nationkey"])
            yield pd.DataFrame(
                {
                    "s_suppkey": pdf["s_suppkey"],
                    "s_name": pdf["s_name"],
                    "nation_name": names,
                    "svc_checksum": names.str.len().astype("Int64"),
                }
            )

    return s.select("s_suppkey", "s_name", "s_nationkey").mapInPandas(
        lookup,
        "s_suppkey long, s_name string, nation_name string, svc_checksum int",
    )


@query(
    "win_count_tumble",
    oracle="""
    SELECT user_id, win_id,
           COUNT(*) AS n_events,
           MIN(event_id) AS first_event,
           MAX(event_id) AS last_event
    FROM (
        SELECT user_id, event_id,
               CAST((ROW_NUMBER() OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) - 1) // 50
                    AS BIGINT) AS win_id
        FROM events
    )
    GROUP BY 1, 2
    """,
)
def win_count_tumble(spark, sf_dir):
    """Count tumbling window (SURVEY §2.5 CountTumblingWindowAssigner,
    DataStream countWindow:609): fixed-size windows of 50 events per user in
    event order — row_number div N as the window id."""
    from pyspark.sql import Window

    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    numbered = e.select(
        "user_id",
        "event_id",
        ((F.row_number().over(w) - 1) / 50).cast("long").alias("win_id"),
    )
    return numbered.groupBy("user_id", "win_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("event_id").alias("first_event"),
        F.max("event_id").alias("last_event"),
    )


@query(
    "win_count_slide",
    oracle="""
    SELECT user_id, win_end, n_events,
           CAST(sum_cents AS DOUBLE) / 100 AS window_sum
    FROM (
        SELECT user_id,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS win_end,
               SUM(CAST(ROUND(value * 100) AS BIGINT))
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN 49 PRECEDING AND CURRENT ROW) AS sum_cents,
               COUNT(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN 49 PRECEDING AND CURRENT ROW) AS n_events
        FROM events
    )
    WHERE win_end % 20 = 0
    """,
)
def win_count_slide(spark, sf_dir):
    """Count sliding window (SURVEY §2.5 CountSlidingWindowAssigner,
    DataStream countWindow(size, slide)): every 20th event per user emits an
    aggregate over its last 50 events — a 49-PRECEDING rows frame sampled at
    the slide points. Sum stays in exact integer cents until one final
    division (same determinism rule as over_sliding_rows)."""
    from pyspark.sql import Window

    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    frame = w.rowsBetween(-49, Window.currentRow)
    cents = F.round(F.col("value") * 100).cast("long")
    return (
        e.select(
            "user_id",
            F.row_number().over(w).cast("long").alias("win_end"),
            F.sum(cents).over(frame).alias("sum_cents"),
            F.count(F.lit(1)).over(frame).alias("n_events"),
        )
        .where(F.col("win_end") % 20 == 0)
        .select(
            "user_id",
            "win_end",
            "n_events",
            (F.col("sum_cents").cast("double") / 100).alias("window_sum"),
        )
    )
