"""r7 DDL long tail — RTAS, ALTER VIEW family, DESCRIBE FUNCTION/MODEL,
REMOVE JAR (reference flink-sql-parser statement classes)."""

from __future__ import annotations

import os
import sys
import textwrap

import pytest

from apache_flink_spark.catalog_sql import CatalogSqlError
from apache_flink_spark.ddl import DdlError
from apache_flink_spark.environment import TableEnvironment


@pytest.fixture()
def te(spark):
    return TableEnvironment(spark=spark)


def _ctas(te, name, path, select):
    te.sql(
        f"CREATE TABLE {name} WITH ('connector' = 'filesystem', "
        f"'path' = '{path}', 'format' = 'parquet') AS {select}"
    )


def test_rtas_create_or_replace(te, spark, tmp_path):
    path = os.path.join(str(tmp_path), "rtas_t")
    # CREATE OR REPLACE on a fresh name: creates
    te.sql(
        f"CREATE OR REPLACE TABLE rtas_t WITH ('connector' = 'filesystem', "
        f"'path' = '{path}', 'format' = 'parquet') AS SELECT 1 AS k"
    )
    assert [r.k for r in spark.table("rtas_t").collect()] == [1]
    # replace with different content AND schema
    te.sql(
        f"CREATE OR REPLACE TABLE rtas_t WITH ('connector' = 'filesystem', "
        f"'path' = '{path}', 'format' = 'parquet') "
        "AS SELECT 2 AS k, 'x' AS v"
    )
    rows = spark.table("rtas_t").collect()
    assert [(r.k, r.v) for r in rows] == [(2, "x")]
    # bare REPLACE requires existence
    te.sql(
        f"REPLACE TABLE rtas_t WITH ('connector' = 'filesystem', "
        f"'path' = '{path}', 'format' = 'parquet') AS SELECT 3 AS k"
    )
    assert [r.k for r in spark.table("rtas_t").collect()] == [3]
    with pytest.raises(DdlError, match="does not exist"):
        te.sql(
            f"REPLACE TABLE rtas_missing WITH ('connector' = 'filesystem', "
            f"'path' = '{tmp_path}/nope', 'format' = 'parquet') "
            "AS SELECT 1 AS k"
        )


def test_rtas_failure_keeps_old_table(te, spark, tmp_path):
    path = os.path.join(str(tmp_path), "rtas_keep")
    _ctas(te, "rtas_keep", path, "SELECT 7 AS k")
    with pytest.raises(Exception):
        te.sql(
            f"CREATE OR REPLACE TABLE rtas_keep WITH "
            f"('connector' = 'filesystem', 'path' = '{path}', "
            "'format' = 'parquet') AS SELECT no_such_col FROM rtas_keep"
        )
    # old data still visible
    assert [r.k for r in spark.table("rtas_keep").collect()] == [7]


def test_alter_view_rename_and_as(te, spark):
    te.sql("CREATE TEMPORARY VIEW av_v AS SELECT 1 AS x")
    te.sql("ALTER VIEW av_v RENAME TO av_v2")
    assert te.sql("SELECT x FROM av_v2").collect()[0].x == 1
    assert "av_v" not in [
        r[0] for r in te.sql("SHOW VIEWS").collect()
    ]
    # SHOW CREATE VIEW follows the rename
    ddl = te.sql("SHOW CREATE VIEW av_v2").collect()[0][0]
    assert "av_v2" in ddl
    te.sql("ALTER VIEW av_v2 AS SELECT 5 AS x")
    assert te.sql("SELECT x FROM av_v2").collect()[0].x == 5
    assert "SELECT 5" in te.sql("SHOW CREATE VIEW av_v2").collect()[0][0]
    te.sql("ALTER VIEW av_v2 SET ('note' = 'kept')")
    te.sql("DROP VIEW av_v2")
    with pytest.raises(CatalogSqlError, match="does not exist"):
        te.sql("ALTER VIEW av_gone RENAME TO av_x")
    # catalog views fall through to Spark's native ALTER VIEW
    spark.sql("DROP VIEW IF EXISTS av_cat")
    spark.sql("CREATE VIEW av_cat AS SELECT 9 AS x")
    try:
        te.sql("ALTER VIEW av_cat AS SELECT 10 AS x")
        assert spark.table("av_cat").collect()[0].x == 10
        te.sql("ALTER VIEW av_cat SET ('note' = 'native')")
        props = dict(
            (r.key, r.value)
            for r in spark.sql("SHOW TBLPROPERTIES av_cat").collect()
        )
        assert props.get("note") == "native"
    finally:
        spark.sql("DROP VIEW av_cat")


def test_describe_function(te, tmp_path):
    rows = dict(te.sql("DESCRIBE FUNCTION abs").collect())
    assert rows["is system function"] == "true"
    mod = tmp_path / "r7_descfn_mod.py"
    mod.write_text(textwrap.dedent("""
        from pyspark.sql.functions import udf
        from pyspark.sql.types import StringType

        @udf(returnType=StringType())
        def my_upper(s):
            return None if s is None else s.upper()
        """))
    sys.path.insert(0, str(tmp_path))
    te.sql(
        "CREATE TEMPORARY FUNCTION my_upper AS "
        "'r7_descfn_mod.my_upper' LANGUAGE PYTHON"
    )
    rows = dict(te.sql("DESCRIBE FUNCTION my_upper").collect())
    assert rows["is system function"] == "false"
    assert rows["function language"] == "PYTHON"
    ext = dict(te.sql("DESCRIBE FUNCTION EXTENDED my_upper").collect())
    assert ext["kind"] == "SCALAR"
    with pytest.raises(CatalogSqlError, match="doesn't exist"):
        te.sql("DESCRIBE FUNCTION nope_fn_xyz")
    te.sql("DROP TEMPORARY FUNCTION my_upper")
    sys.path.remove(str(tmp_path))


def test_describe_model(te):
    te.sql(
        "CREATE MODEL dm1 INPUT (emb ARRAY<FLOAT>) OUTPUT (score DOUBLE) "
        "WITH ('provider' = 'l2norm')"
    )
    rows = te.sql("DESCRIBE MODEL dm1").collect()
    assert [(r.name, r.kind) for r in rows] == [
        ("emb", "INPUT"), ("score", "OUTPUT")
    ]
    ext = te.sql("DESCRIBE MODEL EXTENDED dm1").collect()
    assert ("option:provider", "l2norm", "OPTION") in [
        (r.name, r.type, r.kind) for r in ext
    ]
    te.sql("DROP MODEL dm1")


def test_remove_jar(te, tmp_path):
    # build a trivial jar (a zip) so ADD JAR accepts it
    import zipfile

    jar = str(tmp_path / "dummy_r7.jar")
    with zipfile.ZipFile(jar, "w") as z:
        z.writestr("META-INF/MANIFEST.MF", "Manifest-Version: 1.0\n")
    te.sql(f"ADD JAR '{jar}'")
    assert any(
        "dummy_r7.jar" in r[0]
        for r in te.sql("SHOW JARS").collect()
    )
    te.sql(f"REMOVE JAR '{jar}'")
    assert not any(
        "dummy_r7.jar" in r[0]
        for r in te.sql("SHOW JARS").collect()
    )
    with pytest.raises(CatalogSqlError, match="not in the session"):
        te.sql(f"REMOVE JAR '{jar}'")


def test_show_views_like_and_models(te, spark):
    te.sql("CREATE TEMPORARY VIEW lt_vw_one AS SELECT 1 AS x")
    try:
        assert [
            r[0] for r in te.sql("SHOW VIEWS LIKE 'lt_vw%'").collect()
        ] == ["lt_vw_one"]
        assert "lt_vw_one" not in [
            r[0] for r in te.sql("SHOW VIEWS NOT LIKE 'lt_vw%'").collect()
        ]
    finally:
        te.sql("DROP VIEW lt_vw_one")
    te.sql(
        "CREATE MODEL lt_m1 INPUT (v ARRAY<FLOAT>) OUTPUT (s DOUBLE) "
        "WITH ('provider' = 'l2norm')"
    )
    try:
        assert [
            r[0] for r in te.sql("SHOW MODELS LIKE 'lt_m%'").collect()
        ] == ["lt_m1"]
        te.sql("ALTER MODEL lt_m1 RENAME TO lt_m2")
        assert [
            r[0] for r in te.sql("SHOW MODELS LIKE 'lt_m%'").collect()
        ] == ["lt_m2"]
        te.sql("ALTER MODEL IF EXISTS lt_gone RENAME TO lt_x")  # no-op
    finally:
        te.sql("DROP MODEL IF EXISTS lt_m1")
        te.sql("DROP MODEL IF EXISTS lt_m2")
