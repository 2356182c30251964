"""Per-run persist that cannot leak across runs.

Several queries materialize a narrow intermediate with ``.persist()``
because it feeds multiple downstream subtrees within ONE execution
(guide §5: materialize-vs-rescan). A bare ``.persist()`` has a hidden
cross-RUN effect though: Spark's CacheManager keys cache entries by
canonicalized plan, so a LATER identical call of the same query finds
the previous call's materialized InMemoryRelation and silently serves
the intermediate from cache instead of recomputing it ("Asked to cache
already cached data"). Under the bench's min-of-N discipline that would
time a partially-cached run — exactly the cross-run result caching the
optimization rules forbid (measured on sim_semdedup at sf0.1: 1.40s
re-served vs 1.63s honest warm recompute).

:func:`run_persist` keeps the intra-run materialization but drops the
PREVIOUS call's entry at the next call's entry, so every execution
recomputes its intermediates from the parquet inputs. The registry holds
one DataFrame handle per call-site key — a handle used only to
unpersist, never a memo of results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_LAST: dict[str, DataFrame] = {}
_SITE_SEQ: dict[str, int] = {}


def _drop(prev: DataFrame) -> None:
    """Unpersist a previous run's entry. Only a stopped session is a
    legitimate reason for this to fail (nothing is cached then); any
    other failure must surface, because silently keeping the stale
    materialized entry lets the NEXT identical ``persist()`` re-serve it
    — the exact cross-run reuse this module exists to prevent (ADVICE
    r13 #2)."""
    try:
        sc = prev.sparkSession.sparkContext
        stopped = sc._jsc is None or sc._jsc.sc().isStopped()
    except Exception:
        stopped = True  # no reachable JVM == no cache to drop
    if not stopped:
        prev.unpersist(blocking=False)


def run_persist(df: DataFrame, key: str) -> DataFrame:
    """Persist ``df`` for the duration of this run; unpersist the
    DataFrame persisted under ``key`` by the previous run (if any), so
    repeated executions of the same query never reuse each other's
    materialized cache. ``key`` must be unique per call site AND the
    call site must run at most once per job graph — a second invocation
    would unpersist the first's still-lazy DataFrame (use
    :func:`run_persist_per_invocation` for such operators)."""
    prev = _LAST.pop(key, None)
    if prev is not None:
        _drop(prev)
    _LAST[key] = df.persist()
    return df


def run_persist_per_invocation(
    df: DataFrame, site: str, keep_last: int = 2
) -> DataFrame:
    """Per-run persist for call sites that may run MORE than once inside
    one job graph (e.g. two side-output operators in one pipeline,
    ADVICE r13 #1): every invocation gets its own registry entry, so a
    later invocation never unpersists an earlier, still-lazy sibling.
    Cross-run reuse stays impossible with a bounded registry: the entry
    ``keep_last`` invocations back is dropped at each new invocation, so
    a repeated run's invocations evict the previous run's."""
    n = _SITE_SEQ.get(site, 0)
    _SITE_SEQ[site] = n + 1
    old = _LAST.pop(f"{site}#{n - keep_last}", None)
    if old is not None:
        _drop(old)
    _LAST[f"{site}#{n}"] = df.persist()
    return df
