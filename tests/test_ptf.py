"""Process Table Functions (FLIP-440) — SQL call syntax, both semantics,
error surfaces, literal safety."""

from __future__ import annotations

import pandas as pd
import pytest

from apache_flink_spark.environment import TableEnvironment
from apache_flink_spark.ptf import (
    PtfError,
    apply_ptf,
    register_ptf,
    rewrite_ptf_calls,
)


@pytest.fixture()
def te(spark):
    te = TableEnvironment(spark=spark)
    spark.createDataFrame(
        [(1, 10, "x"), (1, 20, "y"), (2, 5, "z"), (2, 7, "w"), (2, 9, "v")],
        "k int, v int, s string",
    ).createOrReplaceTempView("ptf_in")
    return te


@pytest.fixture(autouse=True)
def _fns():
    def running_sum(keys, pdf):
        return pd.DataFrame(
            {"v": pdf["v"].to_numpy(), "rsum": pdf["v"].cumsum()}
        )

    def double_rows(pdf, factor=2):
        return pd.DataFrame(
            {"k": pdf["k"].to_numpy(), "dv": pdf["v"].to_numpy() * factor}
        )

    register_ptf("t_rsum", running_sum, "v int, rsum bigint")
    register_ptf("t_double", double_rows, "k int, dv int", semantics="row")


def test_set_semantics_sql(te):
    rows = te.sql(
        "SELECT * FROM t_rsum(input => TABLE ptf_in "
        "PARTITION BY k ORDER BY v) ORDER BY k, v"
    ).collect()
    assert [(r.k, r.v, r.rsum) for r in rows] == [
        (1, 10, 10),
        (1, 20, 30),
        (2, 5, 5),
        (2, 7, 12),
        (2, 9, 21),
    ]


def test_row_semantics_sql_with_scalar_arg(te):
    rows = te.sql(
        "SELECT k, dv FROM t_double(TABLE ptf_in, factor => 10) "
        "ORDER BY dv"
    ).collect()
    assert [r.dv for r in rows] == [50, 70, 90, 100, 200]


def test_composes_with_outer_sql(te):
    rows = te.sql(
        "SELECT k, MAX(rsum) AS m FROM t_rsum(input => TABLE ptf_in "
        "PARTITION BY k ORDER BY v) GROUP BY k ORDER BY k"
    ).collect()
    assert [(r.k, r.m) for r in rows] == [(1, 30), (2, 21)]


def test_literal_safety(te):
    # a PTF-call-shaped string inside a literal is untouched
    got = te.sql(
        "SELECT 't_rsum(input => TABLE ptf_in PARTITION BY k)' AS s"
    ).collect()[0].s
    assert got == "t_rsum(input => TABLE ptf_in PARTITION BY k)"


def test_set_requires_partition_by(te):
    with pytest.raises(PtfError, match="PARTITION BY"):
        te.sql("SELECT * FROM t_rsum(input => TABLE ptf_in)")


def test_row_rejects_partition_by(te):
    with pytest.raises(PtfError, match="TABLE_AS_ROW"):
        te.sql("SELECT * FROM t_double(TABLE ptf_in PARTITION BY k)")


def test_unknown_scalar_syntax_errors(te):
    with pytest.raises(PtfError, match="scalar"):
        te.sql(
            "SELECT * FROM t_double(TABLE ptf_in, col_ref_not_literal)"
        )


def test_unregistered_name_falls_through(te):
    # not a registered PTF -> plain Spark error, not a PtfError
    with pytest.raises(Exception) as ei:
        te.sql("SELECT * FROM no_such_ptf(TABLE ptf_in)").collect()
    assert not isinstance(ei.value, PtfError)


def test_apply_ptf_programmatic(spark, te):
    out = apply_ptf(
        spark,
        "t_rsum",
        spark.table("ptf_in"),
        partition_by=["k"],
        order_by=["v"],
    )
    assert out.columns == ["k", "v", "rsum"]
    assert out.count() == 5
    with pytest.raises(PtfError, match="not in table columns"):
        apply_ptf(
            spark, "t_rsum", spark.table("ptf_in"), partition_by=["nope"]
        )


def test_emitting_fewer_rows(spark):
    def head1(keys, pdf):
        return pd.DataFrame({"first_v": [int(pdf["v"].iloc[0])]})

    register_ptf("t_head1", head1, "first_v int")
    out = apply_ptf(
        spark,
        "t_head1",
        spark.table("ptf_in"),
        partition_by=["k"],
        order_by=["v"],
    )
    assert sorted(
        (r.k, r.first_v) for r in out.collect()
    ) == [(1, 10), (2, 5)]
