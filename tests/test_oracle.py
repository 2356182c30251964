"""Every oracle-declared query must hash-match DuckDB (the t2 gate, locally)."""

from __future__ import annotations

import pytest

from apache_flink_spark.queries import ORACLES, QUERIES
from tests.oracle_utils import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    assert_matches_oracle(df, ORACLES[name], sf_dir)


def test_all_queries_runnable(spark, sf_dir):
    """Queries without an oracle still must execute and have a stable
    schema (oracle-backed ones already executed in the parametrized gate
    above — re-running them here would double the suite's cost)."""
    for name, fn in QUERIES.items():
        if name in ORACLES:
            continue
        df = fn(spark, sf_dir)
        assert df.columns, name
        assert df.count() >= 0, name


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())
