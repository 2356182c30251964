"""Stored procedures (reference Procedure.java / CALL statement parity):
the sys built-ins, CALL routing + literal args, SHOW PROCEDURES, loud
errors. The compaction built-in is the javadoc's own canonical example
(a rewrite-data-files maintenance procedure) done Spark-first."""

from __future__ import annotations

import glob
import os

import pytest

from apache_flink_spark.environment import TableEnvironment
from apache_flink_spark.procedures import (
    ProcedureError,
    register_procedure,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def tenv(spark):
    return TableEnvironment(spark=spark, sf_dir=SF)


def test_show_procedures(tenv):
    names = [r.procedure_name for r in tenv.sql("SHOW PROCEDURES").collect()]
    assert {"sys.compact_files", "sys.table_stats",
            "sys.checkpoint_info"} <= set(names)


def test_compact_files_procedure(tenv, spark, tmp_path):
    src = str(tmp_path / "frag")
    # fragment: 24 tiny files
    spark.range(24_000).repartition(24).write.parquet(src)
    before = len(glob.glob(os.path.join(src, "*.parquet")))
    assert before >= 20
    row = tenv.sql(f"CALL sys.compact_files('{src}', 512)").first()
    assert row.files_before == before
    assert row.files_after < before
    after_files = glob.glob(os.path.join(src, "*.parquet"))
    assert len(after_files) == row.files_after
    # data identical post-compaction
    got = sorted(r.id for r in spark.read.parquet(src).collect())
    assert got == list(range(24_000))
    # no staging/backup dirs left behind
    assert not os.path.exists(src + ".__compacting__")
    assert not os.path.exists(src + ".__precompact__")


def test_table_stats_procedure(tenv, spark):
    row = tenv.sql("CALL sys.table_stats('nation')").first()
    assert row.table_name == "nation"
    assert row.row_count == spark.table("nation").count()
    assert row.total_bytes > 0


def test_checkpoint_info_procedure(tenv, spark, tmp_path):
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    (
        spark.readStream.format("rate")
        .option("rowsPerSecond", "10")
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    rows = tenv.sql(f"CALL sys.checkpoint_info('{ckpt}')").collect()
    kinds = {r.kind for r in rows}
    assert "offsets" in kinds and "commits" in kinds
    with pytest.raises(ProcedureError, match="not a"):
        tenv.sql(f"CALL sys.checkpoint_info('{tmp_path}')")


def test_unknown_procedure_and_bad_args(tenv):
    with pytest.raises(ProcedureError, match="does not exist"):
        tenv.sql("CALL sys.nope()")
    with pytest.raises(ProcedureError, match="argument mismatch"):
        tenv.sql("CALL sys.table_stats()")
    with pytest.raises(ProcedureError, match="unsupported CALL argument"):
        tenv.sql("CALL sys.table_stats(nation)")


def test_custom_procedure_with_literal_args(tenv):
    def echo(ctx, s, n, flag=False):
        return (
            "s string, n bigint, flag boolean",
            [(s, n, flag)],
        )

    register_procedure("test.echo", echo)
    row = tenv.sql("CALL test.echo('it''s, fine', 7, TRUE)").first()
    assert (row.s, row.n, row.flag) == ("it's, fine", 7, True)
