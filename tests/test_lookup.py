"""Lookup cache + retry (DefaultLookupCache / RetryableLookupFunctionDelegator
parity): TTL expiry, LRU eviction, missing-key caching, cross-batch hit
behavior, bounded retry, and the live async_lookup_enrich probe-count.
"""

from __future__ import annotations

import pandas as pd
import pytest

from apache_flink_spark.lookup import (
    MISSING,
    LookupCache,
    cached_batch_lookup,
    executor_cache,
    retrying,
)


class FakeClock:
    def __init__(self):
        self.t = 0.0

    def __call__(self):
        return self.t


def test_cache_ttl_expiry():
    clock = FakeClock()
    c = LookupCache(max_size=10, ttl_s=5.0, clock=clock)
    c.put("k", "v")
    assert c.get("k") == "v"
    clock.t = 4.999
    assert c.get("k") == "v"
    clock.t = 5.0  # expire-after-write boundary
    assert c.get("k") is MISSING
    assert c.hits == 2 and c.misses == 1


def test_cache_lru_eviction():
    c = LookupCache(max_size=2, ttl_s=100.0, clock=FakeClock())
    c.put(1, "a")
    c.put(2, "b")
    assert c.get(1) == "a"  # refresh 1's recency
    c.put(3, "c")  # evicts 2 (least recently used)
    assert c.get(2) is MISSING
    assert c.get(1) == "a" and c.get(3) == "c"
    assert c.evictions == 1


def test_cached_batch_lookup_fetches_each_key_once_across_batches():
    calls: list[list] = []

    def service(keys):
        calls.append(sorted(keys))
        return {k: k * 10 for k in keys if k != 99}  # 99: missing from service

    probe = cached_batch_lookup(service, LookupCache(clock=FakeClock()))
    out1 = probe(pd.Series([1, 2, 2, 99]))
    assert out1.iloc[:3].tolist() == [10, 20, 20] and pd.isna(out1.iloc[3])
    assert calls == [[1, 2, 99]]  # distinct keys only
    # second batch: 1 and 2 are warm, 99 is NEGATIVE-cached -> no fetch at all
    out2 = probe(pd.Series([2, 1, 99]))
    assert out2.iloc[:2].tolist() == [20, 10] and pd.isna(out2.iloc[2])
    assert calls == [[1, 2, 99]]
    # a genuinely new key triggers exactly one more fetch
    probe(pd.Series([1, 7]))
    assert calls == [[1, 2, 99], [7]]


def test_retrying_recovers_from_transient_failure():
    attempts = []

    def flaky(keys):
        attempts.append(1)
        if len(attempts) < 3:
            raise ConnectionError("transient")
        return {k: "ok" for k in keys}

    wrapped = retrying(flaky, max_attempts=3, delay_s=0.0)
    assert wrapped([1]) == {1: "ok"}
    assert len(attempts) == 3


def test_retrying_exhausts_and_raises():
    def dead(_keys):
        raise ConnectionError("down")

    wrapped = retrying(dead, max_attempts=3, delay_s=0.0)
    with pytest.raises(ConnectionError):
        wrapped([1])


def test_retrying_does_not_swallow_on_first_success():
    wrapped = retrying(lambda keys: {k: 1 for k in keys}, max_attempts=1)
    assert wrapped([5]) == {5: 1}


def test_executor_cache_is_shared_by_name():
    a = executor_cache("test_shared_cache_xyz")
    b = executor_cache("test_shared_cache_xyz")
    assert a is b


def test_async_lookup_enrich_probe_count(spark):
    """Live probe-count side channel: with the cache + per-batch key dedup,
    the service sees at most (distinct keys x partitions) key fetches —
    far fewer than one per row — and the enriched result is exact."""
    from apache_flink_spark.catalog import table as load_table

    sf_dir = "/root/testdata/sf0.01"
    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey"
    ).repartition(2)
    n_rows = s.count()
    nation = {
        int(r.n_nationkey): r.n_name
        for r in load_table(spark, sf_dir, "nation").collect()
    }
    bc = spark.sparkContext.broadcast(nation)
    probes = spark.sparkContext.accumulator(0)

    def service(keys):
        probes.add(len(list(keys)))
        table = bc.value
        return {k: table.get(int(k)) for k in keys}

    def lookup(batches):
        from apache_flink_spark.lookup import (
            cached_batch_lookup,
            executor_cache,
        )

        probe = cached_batch_lookup(
            service, executor_cache("test_probe_count_svc")
        )
        for pdf in batches:
            names = probe(pdf["s_nationkey"])
            yield pd.DataFrame(
                {"s_suppkey": pdf["s_suppkey"], "nation_name": names}
            )

    got = (
        s.mapInPandas(lookup, "s_suppkey long, nation_name string")
        .toPandas()
        .sort_values("s_suppkey")
        .reset_index(drop=True)
    )
    assert len(got) == n_rows
    want_keys = {
        int(r.s_suppkey): nation.get(int(r.s_nationkey))
        for r in s.collect()
    }
    assert all(
        want_keys[int(k)] == v
        for k, v in zip(got["s_suppkey"], got["nation_name"])
    )
    # 25 nations, 2 partitions: cache+dedup caps fetches at 50; without
    # them it would be one per supplier row.
    assert probes.value <= len(nation) * 2 < n_rows


def test_ordered_async_probe_orders_and_overlaps():
    """AsyncWaitOperator ORDERED-mode parity: results come back in
    SUBMISSION order even when completion order is reversed, and requests
    genuinely overlap (capacity > 1 -> faster than serial execution of
    the sleeps)."""
    import asyncio
    import time

    from apache_flink_spark.lookup import ordered_async_probe

    completion_order = []

    async def service(req):
        idx, delay = req
        await asyncio.sleep(delay)
        completion_order.append(idx)
        return idx

    reqs = [(0, 0.2), (1, 0.1), (2, 0.05)]  # later requests finish first
    t0 = time.perf_counter()
    out = ordered_async_probe(service, capacity=3)(reqs)
    elapsed = time.perf_counter() - t0
    assert out == [0, 1, 2]  # submission order
    assert completion_order == [2, 1, 0]  # reverse completion
    assert elapsed < 0.35  # overlapped, not 0.35s serial


def test_ordered_async_probe_capacity_bounds_inflight():
    import asyncio

    from apache_flink_spark.lookup import ordered_async_probe

    inflight = {"now": 0, "max": 0}

    async def service(req):
        inflight["now"] += 1
        inflight["max"] = max(inflight["max"], inflight["now"])
        await asyncio.sleep(0.01)
        inflight["now"] -= 1
        return req

    out = ordered_async_probe(service, capacity=2)(list(range(8)))
    assert out == list(range(8))
    assert inflight["max"] <= 2
