"""DuckDB-oracle comparison harness — local replica of the driver's t2 gate.

Mirrors the reference's answer-set validation (SURVEY.md §5: TpchResultComparator
diffs engine output against official answers); here DuckDB on the same parquet
is the answer set. Comparison is order-insensitive (rows sorted), column-name
aligned (sorted), and bit-exact — the engine's queries are designed so float
outputs are deterministic (see queries/_util.py).
"""

from __future__ import annotations

import duckdb
import pandas as pd

from apache_flink_spark.catalog import TABLES


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con


def canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def assert_matches_oracle(spark_df, oracle_sql: str, sf_dir: str) -> None:
    actual = canonicalize(spark_df.toPandas())
    con = duck_connect(sf_dir)
    try:
        expected = canonicalize(con.execute(oracle_sql).df())
    finally:
        con.close()
    assert list(actual.columns) == list(expected.columns), (
        f"column mismatch: spark={list(actual.columns)} duckdb={list(expected.columns)}"
    )
    assert len(actual) == len(expected), (
        f"row count mismatch: spark={len(actual)} duckdb={len(expected)}"
    )
    # The driver's gate hashes VALUES: an int 3655 and a float 3655.0 hash
    # differently even though assert_frame_equal(check_dtype=False) calls
    # them equal (r2 regression: DuckDB SUM(int)/count_if return HUGEINT ->
    # pandas float64). Require matching numeric-kind so the local gate is at
    # least as strict as the driver's.
    for c in actual.columns:
        ka, ke = actual[c].dtype.kind, expected[c].dtype.kind
        if ka != ke and {ka, ke} <= set("iufb") and {ka, ke} != {"i", "u"}:
            raise AssertionError(
                f"dtype kind mismatch on {c!r}: spark={actual[c].dtype} "
                f"duckdb={expected[c].dtype} — cast the oracle (HUGEINT?) or "
                "the Spark side so both engines agree on int-vs-float"
            )
    pd.testing.assert_frame_equal(actual, expected, check_dtype=False, check_exact=True)
