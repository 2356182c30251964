"""COMPILE PLAN / EXECUTE PLAN persistence + native CTAS/ANALYZE pins.

Reference parity model: SqlCompilePlan/SqlExecutePlan (parserImpls.ftl:2875),
CompiledPlan.execute(); CTAS (SqlCreateTableAs) and ANALYZE TABLE are
Catalyst-native and pinned here so the surface stays covered.
"""

from __future__ import annotations

import json

import pytest

from apache_flink_spark.environment import TableEnvironment

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def tenv(spark):
    return TableEnvironment(spark=spark, sf_dir=SF)


def test_compile_then_execute(tenv, tmp_path):
    plan = str(tmp_path / "p" / "q.json")
    out = tenv.sql(
        f"COMPILE PLAN '{plan}' FOR "
        "SELECT r_name, count(*) AS n FROM region GROUP BY r_name"
    )
    assert out.collect()[0].result == "OK"
    doc = json.load(open(plan))
    assert doc["planFormatVersion"] == 1 and "GROUP BY" in doc["statement"]
    rows = tenv.sql(f"EXECUTE PLAN '{plan}'").collect()
    assert len(rows) == 5 and all(r.n == 1 for r in rows)


def test_compile_and_execute_oneshot(tenv, tmp_path):
    plan = str(tmp_path / "one.json")
    rows = tenv.sql(
        f"COMPILE AND EXECUTE PLAN '{plan}' FOR "
        "SELECT count(*) AS n FROM nation"
    ).collect()
    assert rows[0].n == 25
    assert json.load(open(plan))["statement"].startswith("SELECT")


def test_compile_existing_fails_unless_if_not_exists(tenv, tmp_path):
    plan = str(tmp_path / "dup.json")
    tenv.sql(f"COMPILE PLAN '{plan}' FOR SELECT 1 AS a")
    with pytest.raises(ValueError, match="already exists"):
        tenv.sql(f"COMPILE PLAN '{plan}' FOR SELECT 2 AS a")
    # IF NOT EXISTS keeps the original
    tenv.sql(f"COMPILE PLAN '{plan}' IF NOT EXISTS FOR SELECT 2 AS a")
    assert tenv.sql(f"EXECUTE PLAN '{plan}'").collect()[0].a == 1


def test_execute_missing_and_bad_version(tenv, tmp_path):
    with pytest.raises(FileNotFoundError):
        tenv.sql(f"EXECUTE PLAN '{tmp_path}/nope.json'")
    bad = tmp_path / "bad.json"
    bad.write_text(json.dumps({"planFormatVersion": 99, "statement": "SELECT 1"}))
    with pytest.raises(ValueError, match="format version"):
        tenv.sql(f"EXECUTE PLAN '{bad}'")


def test_compile_validates_eagerly(tenv, tmp_path):
    plan = str(tmp_path / "broken.json")
    with pytest.raises(Exception):
        tenv.sql(f"COMPILE PLAN '{plan}' FOR SELECT * FROM missing_xyz")
    import os

    assert not os.path.exists(plan)  # nothing persisted on failure


def test_plan_confs_replayed(tenv, tmp_path):
    plan = str(tmp_path / "conf.json")
    tenv.spark.conf.set("spark.sql.shuffle.partitions", "13")
    try:
        tenv.sql(f"COMPILE PLAN '{plan}' FOR SELECT 1 AS a")
    finally:
        tenv.spark.conf.set("spark.sql.shuffle.partitions", "32")
    tenv.sql(f"EXECUTE PLAN '{plan}'")
    assert tenv.spark.conf.get("spark.sql.shuffle.partitions") == "13"
    tenv.spark.conf.set("spark.sql.shuffle.partitions", "32")


def test_ctas_and_analyze_native(tenv, tmp_path):
    tenv.sql(
        f"CREATE TABLE ctas_pin USING parquet LOCATION '{tmp_path}/c' AS "
        "SELECT r_regionkey, r_name FROM region"
    )
    try:
        assert tenv.sql("SELECT count(*) AS n FROM ctas_pin").collect()[0].n == 5
        tenv.sql("ANALYZE TABLE ctas_pin COMPUTE STATISTICS")
        stats = tenv.sql("DESCRIBE EXTENDED ctas_pin").collect()
        assert any("Statistics" in (r.col_name or "") for r in stats)
    finally:
        tenv.sql("DROP TABLE ctas_pin")
