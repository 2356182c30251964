"""Regression: switching sf_dir in one session must re-point temp views.

load_tables caches DataFrames per (session, sf_dir); temp views are
session-global, so a cache hit after a different sf_dir was active must
re-register the views — otherwise spark.sql() reads the previous scale
factor's data (caught via q20 returning the sf0.1 answer for an sf0.01
call when the harness alternated scale factors).
"""

from __future__ import annotations

from apache_flink_spark.catalog import load_tables

SF_A = "/root/testdata/sf0.001"
SF_B = "/root/testdata/sf0.01"


def test_views_follow_sf_dir_switch(spark):
    a = load_tables(spark, SF_A)["lineitem"].count()
    b = load_tables(spark, SF_B)["lineitem"].count()
    assert a != b
    # Re-request the first sf_dir: the cache hit must still re-point views.
    load_tables(spark, SF_A)
    assert spark.sql("SELECT COUNT(*) AS n FROM lineitem").collect()[0].n == a
    load_tables(spark, SF_B)
    assert spark.sql("SELECT COUNT(*) AS n FROM lineitem").collect()[0].n == b
