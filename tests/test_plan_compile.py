"""Compiled-plan analog: signatures are stable and round-trip to disk."""

from __future__ import annotations

from apache_flink_spark.plans import dump_plan, load_signature, plan_signature
from apache_flink_spark.queries import QUERIES


def test_signature_stable_across_builds(spark, sf_dir):
    a = plan_signature(QUERIES["q1_pricing_summary"](spark, sf_dir))
    b = plan_signature(QUERIES["q1_pricing_summary"](spark, sf_dir))
    assert a == b
    assert "Aggregate" in a


def test_dump_and_restore(spark, sf_dir, tmp_path):
    df = QUERIES["q6_forecast_revenue"](spark, sf_dir)
    p = str(tmp_path / "q6_plan.json")
    dump_plan(df, p)
    assert load_signature(p) == plan_signature(df)


def test_signature_detects_shape_change(spark, sf_dir):
    """A broadcast hint flips the join strategy; the signature (optimized
    logical plan skeleton with hints resolved) need not change, but the
    point of the golden test is filter/limit pushdown shape: limit(2) vs
    full scan must differ."""
    full = plan_signature(QUERIES["q1_pricing_summary"](spark, sf_dir))
    limited = plan_signature(
        QUERIES["q1_pricing_summary"](spark, sf_dir).limit(2)
    )
    assert full != limited
