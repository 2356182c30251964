"""Lookup-join runtime: per-executor TTL'd cache + bounded retry.

Reference parity (SURVEY.md §2.3 lookup join):
  - ``DefaultLookupCache.java:51`` (flink-table-common lookup cache):
    ``maximumSize`` LRU eviction, ``expireAfterWrite`` TTL, hit/miss
    metrics, and missing-key caching (a lookup that returns no row is
    cached as empty so hot missing keys don't re-probe the service).
  - ``RetryableLookupFunctionDelegator.java`` (flink-table-runtime
    join/lookup): bounded fixed-delay retry around the lookup function for
    transient service failures.

Deployment model: the cache lives per PYTHON WORKER process (module-level
registry). Spark reuses workers across Arrow batches and tasks
(``spark.python.worker.reuse`` defaults true), so a hot key is fetched
once per executor worker — the same locality the reference's per-task
cache gives. Nothing is shared across executors, exactly like the
reference (a cache per parallel subtask instance).

Scale: the cache bounds itself by entry count; probes only ever touch the
worker-local dict — no shuffle, no driver involvement. The service fetch
receives DISTINCT missing keys per batch, so even a cold cache amortizes
duplicate keys within an Arrow batch.
"""

from __future__ import annotations

import functools
import threading
import time
from collections import OrderedDict
from collections.abc import Callable, Iterable

import pandas as pd

#: Sentinel distinguishing "key absent from cache" from a cached None
#: (missing-key caching — DefaultLookupCache's cacheMissingKey behavior).
MISSING = object()


class LookupCache:
    """LRU + expire-after-write cache (DefaultLookupCache.java:51 parity).

    ``get`` refreshes LRU recency; expired entries read as absent and are
    dropped. Thread-safe: the async lookup pattern probes it from
    _ASYNC_CAPACITY concurrent in-flight requests.
    """

    def __init__(
        self,
        max_size: int = 10_000,
        ttl_s: float = 600.0,
        clock: Callable[[], float] = time.monotonic,
    ) -> None:
        self.max_size = max_size
        self.ttl_s = ttl_s
        self._clock = clock
        self._d: OrderedDict = OrderedDict()
        self._lock = threading.Lock()
        self.hits = 0
        self.misses = 0
        self.evictions = 0

    def get(self, key):
        with self._lock:
            ent = self._d.get(key)
            if ent is None:
                self.misses += 1
                return MISSING
            expires_at, value = ent
            if self._clock() >= expires_at:
                del self._d[key]
                self.misses += 1
                return MISSING
            self._d.move_to_end(key)
            self.hits += 1
            return value

    def put(self, key, value) -> None:
        with self._lock:
            self._d[key] = (self._clock() + self.ttl_s, value)
            self._d.move_to_end(key)
            while len(self._d) > self.max_size:
                self._d.popitem(last=False)
                self.evictions += 1

    def __len__(self) -> int:
        return len(self._d)


#: Per-worker-process cache registry: one named cache per lookup source,
#: surviving across Arrow batches and tasks within the worker.
_CACHES: dict[str, LookupCache] = {}


def executor_cache(
    name: str, max_size: int = 10_000, ttl_s: float = 600.0
) -> LookupCache:
    cache = _CACHES.get(name)
    if cache is None:
        cache = _CACHES[name] = LookupCache(max_size=max_size, ttl_s=ttl_s)
    return cache


def retrying(
    fn: Callable,
    max_attempts: int = 3,
    delay_s: float = 0.01,
    retryable: tuple[type[BaseException], ...] = (Exception,),
) -> Callable:
    """Bounded fixed-delay retry (RetryableLookupFunctionDelegator parity):
    re-invoke on a retryable failure up to max_attempts, then re-raise."""
    if max_attempts < 1:
        raise ValueError("max_attempts must be >= 1")

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        for attempt in range(1, max_attempts + 1):
            try:
                return fn(*args, **kwargs)
            except retryable:
                if attempt == max_attempts:
                    raise
                time.sleep(delay_s)

    return wrapper


def ordered_async_probe(
    async_fn: Callable, capacity: int = 4
) -> Callable[[list], list]:
    """ORDERED async I/O (reference AsyncWaitOperator with
    ``AsyncDataStream.orderedWait`` + capacity): run a real asyncio event
    loop with at most ``capacity`` in-flight coroutine requests and return
    results in SUBMISSION order — deterministic emission, which is what
    keeps downstream oracles hash-stable.

    ``async_fn`` is a genuine coroutine function (an aiohttp/grpc-aio
    batched call in production; the tests use an asyncio-sleeping fake).
    The returned callable takes a list of request payloads and blocks
    until all complete — the shape a ``mapInPandas`` stage calls per Arrow
    batch, making each batch one bounded flight of overlapped round
    trips."""
    import asyncio

    def probe(requests: list) -> list:
        async def run():
            sem = asyncio.Semaphore(capacity)

            async def one(req):
                async with sem:
                    return await async_fn(req)

            # gather preserves submission order regardless of completion
            # order — the ORDERED output mode.
            return list(await asyncio.gather(*(one(r) for r in requests)))

        return asyncio.run(run())

    return probe


def cached_batch_lookup(
    batch_fn: Callable[[Iterable], dict], cache: LookupCache
) -> Callable[[pd.Series], pd.Series]:
    """Wrap a batched service fetch with the cache.

    ``batch_fn`` receives the DISTINCT keys absent from the cache and
    returns {key: value}; keys it omits are cached as None (missing-key
    caching). The returned function maps a full key Series to values,
    serving repeats and warm keys from the cache.
    """

    def lookup(keys: pd.Series) -> pd.Series:
        resolved: dict = {}
        missing: list = []
        for k in pd.unique(keys.dropna()):
            v = cache.get(k)
            if v is MISSING:
                missing.append(k)
            else:
                resolved[k] = v
        if missing:
            fetched = batch_fn(missing)
            for k in missing:
                v = fetched.get(k)
                cache.put(k, v)
                resolved[k] = v
        return keys.map(lambda k: resolved.get(k))

    return lookup
