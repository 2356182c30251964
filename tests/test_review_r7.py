"""Regression pins for the round-6 ADVICE findings (round 7)."""

from __future__ import annotations

import pandas as pd
import pytest

from apache_flink_spark.environment import TableEnvironment


@pytest.fixture()
def te(spark):
    return TableEnvironment(spark=spark)


def test_truncate_native_table_falls_through(te, spark):
    """ADVICE (medium): TRUNCATE TABLE on a Spark-native managed table must
    reach spark.sql, not die in the row-level facade's _table_spec."""
    spark.sql("DROP TABLE IF EXISTS r7_native_trunc")
    spark.sql("CREATE TABLE r7_native_trunc (id INT) USING parquet")
    spark.sql("INSERT INTO r7_native_trunc VALUES (1), (2)")
    te.sql("TRUNCATE TABLE r7_native_trunc")
    assert spark.table("r7_native_trunc").count() == 0
    spark.sql("DROP TABLE r7_native_trunc")


def test_delete_native_table_falls_through_to_spark_error(te, spark):
    """DELETE on a non-DDL table must fall through; Spark's own error (the
    v1 source doesn't support deletes), not RowLevelError, is the surface."""
    from apache_flink_spark.row_level import RowLevelError

    spark.sql("DROP TABLE IF EXISTS r7_native_del")
    spark.sql("CREATE TABLE r7_native_del (id INT) USING parquet")
    try:
        with pytest.raises(Exception) as exc:
            te.sql("DELETE FROM r7_native_del WHERE id = 1")
        assert not isinstance(exc.value, RowLevelError)
    finally:
        spark.sql("DROP TABLE r7_native_del")


def test_create_like_native_source_falls_through(te, spark):
    """ADVICE (low): CREATE TABLE ... LIKE with a Spark-catalog source must
    fall through to spark.sql rather than raising DdlError."""
    spark.sql("DROP TABLE IF EXISTS r7_like_dst")
    spark.sql("DROP TABLE IF EXISTS r7_like_src")
    spark.sql("CREATE TABLE r7_like_src (id INT, name STRING) USING parquet")
    try:
        te.sql("CREATE TABLE r7_like_dst LIKE r7_like_src")
        assert spark.table("r7_like_dst").columns == ["id", "name"]
    finally:
        spark.sql("DROP TABLE IF EXISTS r7_like_dst")
        spark.sql("DROP TABLE r7_like_src")


def test_ptf_three_named_scalar_args(te, spark):
    """ADVICE (low): 3+ named scalar args left ' , , ' in the leftover check
    and were falsely rejected."""
    from apache_flink_spark.ptf import register_ptf

    def scaled(pdf, factor=2, offset=0, cap=10**9):
        out = pdf["v"].to_numpy() * factor + offset
        return pd.DataFrame({"k": pdf["k"].to_numpy(), "sv": out.clip(max=cap)})

    register_ptf("t_scaled3", scaled, "k int, sv bigint", semantics="row")
    spark.createDataFrame(
        [(1, 10), (2, 20)], "k int, v int"
    ).createOrReplaceTempView("r7_ptf_in")
    rows = te.sql(
        "SELECT k, sv FROM t_scaled3(TABLE r7_ptf_in, factor => 3, "
        "offset => 1, cap => 100) ORDER BY k"
    ).collect()
    assert [(r.k, r.sv) for r in rows] == [(1, 31), (2, 61)]
