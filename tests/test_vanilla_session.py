"""Regression: queries must work on a session the engine did not build.

The driver harness passes its OWN SparkSession; r1 failed 0/50 because
``catalog.load_tables`` assumed ``get_spark()`` had pre-set
``spark.sql.legacy.parquet.nanosAsLong``. These tests strip the engine confs
from the shared session (emulating a vanilla ``builder.getOrCreate()`` — a
second JVM per test would be prohibitively slow) and verify the registry
re-applies them on entry. scripts/vanilla_smoke.py does the full
separate-process sweep.
"""

from __future__ import annotations

import pytest

from apache_flink_spark import catalog
from apache_flink_spark.queries import ORACLES, QUERIES
from tests.oracle_utils import assert_matches_oracle

# Confs get_spark() sets that correctness could silently depend on.
_ENGINE_CONFS = (
    "spark.sql.legacy.parquet.nanosAsLong",
    "spark.sql.session.timeZone",
    "spark.sql.execution.arrow.pyspark.enabled",
    "spark.sql.execution.arrow.maxRecordsPerBatch",
    "spark.sql.adaptive.enabled",
)


@pytest.fixture()
def vanilla(spark):
    """Strip engine confs + catalog cache so the next query sees a session
    that looks freshly built by an external harness."""
    saved = {}
    for k in _ENGINE_CONFS:
        try:
            saved[k] = spark.conf.get(k)
            spark.conf.unset(k)
        except Exception:
            saved[k] = None
    catalog._CACHE.clear()
    catalog._ACTIVE_VIEWS.clear()
    yield spark
    for k, v in saved.items():
        if v is not None:
            spark.conf.set(k, v)
    catalog._CACHE.clear()
    catalog._ACTIVE_VIEWS.clear()


@pytest.mark.parametrize(
    "name",
    [
        "q1_pricing_summary",  # parquet scan incl. decimal aggregation
        "mm_decode_features",  # mapInPandas (Arrow path)
        "stream_tumble_agg",  # Structured Streaming + event-time window
    ],
)
def test_vanilla_session_runs_query(vanilla, sf_dir, name):
    if name not in QUERIES:
        pytest.skip(f"{name} not registered")
    df = QUERIES[name](vanilla, sf_dir)
    if name in ORACLES:
        assert_matches_oracle(df, ORACLES[name], sf_dir)
    else:
        assert df.count() >= 0


def test_vanilla_session_reads_nanos_timestamps(vanilla, sf_dir):
    """The events fixture's TIMESTAMP(NANOS) column is the r1 killer —
    loading it must configure the session rather than assume it."""
    tables = catalog.load_tables(vanilla, sf_dir)
    assert "events" in tables
    # ts must come back as a usable timestamp (normalized from int64 nanos).
    row = tables["events"].select("ts").first()
    assert row.ts is not None
    assert vanilla.conf.get("spark.sql.legacy.parquet.nanosAsLong") == "true"
    assert vanilla.conf.get("spark.sql.session.timeZone") == "UTC"


def test_ts_normalizes_to_timestamp_on_any_session(vanilla, sf_dir):
    """pyspark 4.1 reads the fixtures' TIMESTAMP(NANOS) as TIMESTAMP_NTZ on
    EVERY session (the legacy nanosAsLong conf is build-time-only and inert
    here); the catalog must hand queries a session-tz TIMESTAMP regardless —
    r2 regression: unix_micros(ts) fails on NTZ."""
    from pyspark.sql.types import TimestampType

    events = catalog.load_tables(vanilla, sf_dir)["events"]
    assert isinstance(events.schema["ts"].dataType, TimestampType)
    # and the normalized column is actually usable by epoch extraction:
    events.selectExpr("unix_micros(ts)").limit(1).collect()
