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


def test_streaming_ptf_state_across_batches(spark, tmp_path):
    """Streaming PTF (FLIP-440 + Flink 2.1 state support): a per-key
    cumulative counter whose GroupState must survive micro-batch
    boundaries — 3 staged files -> 3 batches, final count per key equals
    the batch ground truth."""
    import os

    from apache_flink_spark.ptf import apply_ptf_stream

    src = os.path.join(str(tmp_path), "src")
    df = spark.createDataFrame(
        [(k, i) for k in (1, 2) for i in range(30)], "k int, v int"
    )
    df.repartition(3).write.parquet(src)

    def counter(keys, pdf_iter, state):
        n = state.value()[0] if state.value() else 0
        for pdf in pdf_iter:
            n += len(pdf)
        state.update((n,))
        yield pd.DataFrame({"n_events": [n]})

    register_ptf("t_counter", counter, "n_events bigint")
    stream = (
        spark.readStream.schema("k int, v int")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = apply_ptf_stream(
        "t_counter", stream, ["k"], state_schema="n bigint"
    )
    captured = {}

    def sink(bdf, bid):
        captured[bid] = bdf.toPandas()

    import tempfile

    q = (
        out.writeStream.foreachBatch(sink)
        .outputMode("update")
        .option(
            "checkpointLocation", tempfile.mkdtemp(prefix="ptf_ckpt_")
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert len(captured) >= 2  # state really crossed batch boundaries
    allb = pd.concat(
        [captured[b].assign(_b=b) for b in sorted(captured)],
        ignore_index=True,
    )
    final = allb.sort_values("_b").groupby("k", as_index=False).last()
    assert sorted(
        (int(r.k), int(r.n_events)) for r in final.itertuples()
    ) == [(1, 30), (2, 30)]


def test_streaming_ptf_guards(spark):
    from apache_flink_spark.ptf import apply_ptf_stream

    stream = spark.readStream.format("rate").load()
    with pytest.raises(PtfError, match="row-semantics"):
        apply_ptf_stream("t_double", stream, ["value"], "n bigint")
    with pytest.raises(PtfError, match="PARTITION BY"):
        apply_ptf_stream("t_rsum", stream, [], "n bigint")


def test_ptf_inside_insert_statement(te, tmp_path):
    """The PTF rewrite must run BEFORE the INSERT route (r6 review #5) —
    an INSERT ... SELECT FROM <ptf>(TABLE ...) previously failed with an
    unresolved-function error."""
    import os

    path = os.path.join(str(tmp_path), "ptf_sink")
    te.sql(
        f"""
        CREATE TABLE ptf_sink (v INT, rsum BIGINT) WITH (
            'connector' = 'filesystem',
            'path' = '{path}',
            'format' = 'parquet'
        )
        """
    )
    te.sql(
        "INSERT INTO ptf_sink SELECT v, rsum FROM t_rsum(input => "
        "TABLE ptf_in PARTITION BY k ORDER BY v) WHERE k = 1"
    )
    rows = te.sql("SELECT v, rsum FROM ptf_sink ORDER BY v").collect()
    assert [(r.v, r.rsum) for r in rows] == [(10, 10), (20, 30)]
