"""Regression pins for the r6-continuation review findings: declared
csv options surviving COW rewrites and OPTIONS re-scans, statement-set
splitting vs CASE...END, ML_PREDICT into DDL sinks, compaction view
refresh, hints inside INSERT, REPL statement sets, aliased OPTIONS."""

from __future__ import annotations

import io

import pytest

from apache_flink_spark.environment import TableEnvironment

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def tenv(spark):
    return TableEnvironment(spark=spark, sf_dir=SF)


def _piped_csv_table(tenv, tmp_path, name):
    p = tmp_path / name
    p.mkdir()
    (p / "d.csv").write_text("1|x\n2|y\n3|z\n")
    tenv.sql(
        f"""
        CREATE TABLE {name} (a BIGINT, b STRING) WITH (
            'connector' = 'filesystem', 'path' = '{p}', 'format' = 'csv',
            'csv.field-delimiter' = '|', 'csv.include-header' = 'false')
        """
    )
    return p


def test_cow_delete_preserves_declared_csv_options(tenv, spark, tmp_path):
    """Finding 1: DELETE on a pipe-delimited table must rewrite
    pipe-delimited, not comma+header."""
    p = _piped_csv_table(tenv, tmp_path, "rv_csv1")
    assert tenv.sql("DELETE FROM rv_csv1 WHERE a = 2").first().rows_affected == 1
    got = sorted(tuple(r) for r in spark.table("rv_csv1").collect())
    assert got == [(1, "x"), (3, "z")]
    # on-disk bytes still pipe-delimited, no header
    data = "".join(
        f.read_text() for f in p.glob("*.csv")
    )
    assert "|" in data and "a|b" not in data and "," not in data


def test_options_hint_merges_declared_csv_options(tenv, spark, tmp_path):
    """Finding 2: an OPTIONS hint overriding ONE key keeps the declared
    delimiter instead of resetting to defaults."""
    _piped_csv_table(tenv, tmp_path, "rv_csv2")
    got = tenv.sql(
        "SELECT a, b FROM rv_csv2 "
        "/*+ OPTIONS('csv.include-header'='false') */ ORDER BY a"
    ).collect()
    assert [tuple(r) for r in got] == [(1, "x"), (2, "y"), (3, "z")]


def test_statement_set_member_with_case_end(tenv, spark, tmp_path):
    """Finding 3: a member's CASE ... END must not close the set."""
    from apache_flink_spark.sql_client import split_statements

    d = str(tmp_path / "ss")
    tenv.sql(
        f"""CREATE TABLE rv_ss (k BIGINT) WITH (
            'connector'='filesystem','path'='{d}','format'='parquet')"""
    )
    stmt = (
        "EXECUTE STATEMENT SET BEGIN "
        "INSERT INTO rv_ss SELECT CASE WHEN id > 1 THEN id ELSE 0 END "
        "FROM range(3); "
        "INSERT INTO rv_ss SELECT 99; "
        "END"
    )
    parts = split_statements(stmt + "; SELECT 1")
    assert len(parts) == 2 and parts[0].rstrip().upper().endswith("END")
    res = tenv.sql(stmt).collect()
    assert len(res) == 2
    got = sorted(r.k for r in spark.table("rv_ss").collect())
    assert got == [0, 0, 2, 99]
    with pytest.raises(ValueError, match="unterminated"):
        split_statements("EXECUTE STATEMENT SET BEGIN INSERT INTO a SELECT 1;")


def test_insert_ml_predict_into_ddl_sink(tenv, spark, tmp_path):
    """Finding 4: INSERT INTO <ddl sink> SELECT ... FROM ML_PREDICT."""
    d = str(tmp_path / "scored")
    tenv.sql(
        f"""CREATE TABLE rv_scored (vec_id BIGINT, score DOUBLE) WITH (
            'connector'='filesystem','path'='{d}','format'='parquet')"""
    )
    tenv.sql("DROP MODEL IF EXISTS rv_norm")
    tenv.sql(
        """CREATE MODEL rv_norm INPUT (embedding ARRAY<FLOAT>)
           OUTPUT (score DOUBLE) WITH ('provider' = 'vector-l2norm')"""
    )
    tenv.sql(
        "INSERT INTO rv_scored SELECT vec_id, score FROM "
        "ML_PREDICT(TABLE embeddings, MODEL rv_norm) WHERE vec_id < 5"
    )
    rows = spark.table("rv_scored").collect()
    assert len(rows) == 5 and all(r.score > 0 for r in rows)


def test_compact_files_refreshes_ddl_view(tenv, spark, tmp_path):
    """Finding 5: a DDL view over a compacted path stays readable."""
    d = str(tmp_path / "frag")
    spark.range(1000).repartition(10).write.parquet(d)
    tenv.sql(
        f"""CREATE TABLE rv_frag (id BIGINT) WITH (
            'connector'='filesystem','path'='{d}','format'='parquet')"""
    )
    assert spark.table("rv_frag").count() == 1000  # populate file index
    row = tenv.sql(f"CALL sys.compact_files('{d}', 512)").first()
    assert row.files_after < row.files_before
    assert spark.table("rv_frag").count() == 1000  # no FileNotFound


def test_hint_inside_insert_select(tenv, spark, tmp_path):
    """Finding 6: OPTIONS/strategy hints inside an INSERT's SELECT are
    translated before the insert routing."""
    d = str(tmp_path / "hi")
    tenv.sql(
        f"""CREATE TABLE rv_hi (id BIGINT) WITH (
            'connector'='filesystem','path'='{d}','format'='parquet')"""
    )
    tenv.sql(
        """CREATE TABLE rv_gen (id BIGINT) WITH (
            'connector' = 'datagen', 'number-of-rows' = '5')"""
    )
    tenv.sql(
        "INSERT INTO rv_hi SELECT id FROM rv_gen "
        "/*+ OPTIONS('number-of-rows'='3') */"
    )
    assert spark.table("rv_hi").count() == 3


def test_repl_statement_set_and_quoted_semicolon(tenv, spark, tmp_path):
    """Finding 7: the interactive REPL buffers an open statement set and
    never splits inside string literals."""
    from apache_flink_spark.sql_client import GatewayClient, SqlClient
    from apache_flink_spark.sql_gateway import SqlGatewayService

    d = str(tmp_path / "repl")
    svc = SqlGatewayService(spark=spark, sf_dir=SF)
    try:
        out = io.StringIO()
        cli = SqlClient(GatewayClient(svc), out=out)
        # everything through the client: gateway sessions are isolated,
        # so the DDL table + inserts + readback live in ONE session
        cli.repl(
            io.StringIO(
                f"CREATE TABLE rv_repl (k BIGINT) WITH ("
                f"'connector'='filesystem','path'='{d}',"
                f"'format'='parquet');\n"
                "EXECUTE STATEMENT SET BEGIN\n"
                "INSERT INTO rv_repl SELECT 1;\n"
                "INSERT INTO rv_repl SELECT 2;\n"
                "END;\n"
                "SELECT ';' AS semi;\n"
                "SELECT count(*) AS n_rows FROM rv_repl;\n"
            )
        )
        text = out.getvalue()
        assert "error" not in text.lower(), text
        assert "| 2      " in text or "| 2 " in text  # count row
        assert "| ;    |" in text  # the quoted semicolon as data
    finally:
        svc.close()


def test_options_hint_after_alias(tenv):
    """Finding 8: '<table> AS alias /*+ OPTIONS */' resolves the table."""
    tenv.sql(
        """CREATE TABLE IF NOT EXISTS rv_gen2 (id BIGINT) WITH (
            'connector' = 'datagen', 'number-of-rows' = '5')"""
    )
    got = tenv.sql(
        "SELECT count(*) AS n FROM rv_gen2 AS g "
        "/*+ OPTIONS('number-of-rows'='2') */"
    ).first()
    assert got.n == 2
