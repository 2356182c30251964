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


def run_persist(df: DataFrame, key: str) -> DataFrame:
    """Persist ``df`` for the duration of this run; unpersist the
    DataFrame persisted under ``key`` by the previous run (if any), so
    repeated executions of the same query never reuse each other's
    materialized cache. ``key`` must be unique per call site."""
    prev = _LAST.pop(key, None)
    if prev is not None:
        try:
            prev.unpersist(blocking=False)
        except Exception:
            pass  # session already stopped — nothing cached to drop
    _LAST[key] = df.persist()
    return df
