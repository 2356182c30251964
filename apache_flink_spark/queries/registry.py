"""Registry mapping query names -> (spark builder, duckdb oracle SQL).

The builders are the engine's executable operator inventory; the oracle SQL
strings are the ANSI-SQL ground truth the driver runs on DuckDB (SURVEY.md §5:
the reference validates every TPC-DS/TPC-H query against official answer
sets — the oracle plays that role here).

Determinism contract for oracle-checked queries (see tests/test_oracle.py):
  - money/quantity DOUBLE columns are cast to DECIMAL before SUM/AVG so the
    aggregate is exact and order-independent, then cast back to DOUBLE for a
    bit-identical result in both engines;
  - timestamps cross the boundary as epoch-micros BIGINT or formatted strings;
  - every LIMIT/top-n query breaks ties on a unique key.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register a declared query. ``oracle=None`` => rows-only check
    (reserved for genuinely non-SQL-expressible ops)."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco
