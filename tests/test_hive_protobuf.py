"""Hive catalog integration + protobuf format gating (SURVEY §2.1).

Hive needs catalogImplementation=hive, a STATIC conf — so the test drives a
fresh JVM in a subprocess (the shared test session is in-memory-catalog).
Protobuf's spark-protobuf jar is not shipped here; the gate must raise the
helpful NotImplementedError, not Spark's generic lookup failure.
"""

from __future__ import annotations

import glob
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_HIVE_JARS = glob.glob("/opt/spark/jars/spark-hive_*.jar")


@pytest.mark.skipif(not _HIVE_JARS, reason="spark-hive jar not deployed")
def test_hive_catalog_managed_table(tmp_path):
    """enableHiveSupport path (reference flink-connector-hive
    HiveDynamicTableFactory): create a database + managed table through the
    Hive metastore, insert, read back via the catalog."""
    script = f"""
import sys
sys.path.insert(0, {REPO!r})
from apache_flink_spark.io import hive_session
spark = hive_session(warehouse_dir={str(tmp_path)!r})
assert spark.conf.get("spark.sql.catalogImplementation") == "hive", \\
    spark.conf.get("spark.sql.catalogImplementation")
spark.sql("CREATE DATABASE IF NOT EXISTS afs_db")
spark.sql("DROP TABLE IF EXISTS afs_db.kv")
spark.sql("CREATE TABLE afs_db.kv (k STRING, v BIGINT) USING parquet")
spark.sql("INSERT INTO afs_db.kv VALUES ('a', 1), ('b', 2)")
rows = spark.sql("SELECT sum(v) AS s FROM afs_db.kv").collect()
assert rows[0].s == 3, rows
tables = [t.name for t in spark.catalog.listTables("afs_db")]
assert "kv" in tables, tables
print("HIVE_OK")
"""
    out = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        timeout=180,
        cwd=str(tmp_path),  # keep derby.log / metastore litter out of the repo
    )
    assert "HIVE_OK" in out.stdout, f"stdout={out.stdout}\nstderr={out.stderr[-2000:]}"


def test_protobuf_gated_with_hint(spark, tmp_path):
    from apache_flink_spark.io import protobuf_column

    desc = tmp_path / "dummy.desc"
    desc.write_bytes(b"\x0a\x00")  # descriptor parse happens JVM-side
    df = spark.createDataFrame([(bytearray(b"\x08\x01"),)], "payload binary")
    try:
        protobuf_column(df, "payload", "M", str(desc))
    except NotImplementedError as ex:
        assert "spark-protobuf" in str(ex)
    else:
        pytest.skip("spark-protobuf jar present — gate not exercised")
