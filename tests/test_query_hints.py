"""Flink SQL query hints — reference JoinStrategy / FlinkHints parity:
join-strategy hints steer the Catalyst physical join (plan-pinned), OPTIONS
dynamic table options re-scan DDL tables per statement, LOOKUP/STATE_TTL
strip cleanly, everything else errors loudly and string literals are never
touched."""

from __future__ import annotations

import pytest

from apache_flink_spark.environment import TableEnvironment
from apache_flink_spark.query_hints import HintError, rewrite_flink_hints

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def tenv(spark):
    return TableEnvironment(spark=spark, sf_dir=SF)


def _physical(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


JOIN_SQL = (
    "SELECT {hint} c.c_custkey, o.o_orderkey FROM customer c "
    "JOIN orders o ON c.c_custkey = o.o_custkey"
)


def test_broadcast_hint_forces_broadcast_join(tenv):
    df = tenv.sql(JOIN_SQL.format(hint="/*+ BROADCAST(c) */"))
    assert "BroadcastHashJoin" in _physical(df)


def test_shuffle_merge_maps_to_spark_merge(tenv):
    df = tenv.sql(JOIN_SQL.format(hint="/*+ SHUFFLE_MERGE(c) */"))
    assert "SortMergeJoin" in _physical(df)


def test_shuffle_hash_hint(tenv):
    df = tenv.sql(JOIN_SQL.format(hint="/*+ SHUFFLE_HASH(c) */"))
    assert "ShuffledHashJoin" in _physical(df)


def test_nest_loop_maps_to_shuffle_replicate_nl(tenv):
    df = tenv.sql(JOIN_SQL.format(hint="/*+ NEST_LOOP(c) */"))
    assert "CartesianProduct" in _physical(df)


def test_hinted_results_equal_unhinted(tenv):
    plain = sorted(map(tuple, tenv.sql(JOIN_SQL.format(hint="")).collect()))
    for hint in ("/*+ BROADCAST(c) */", "/*+ SHUFFLE_MERGE(o) */",
                 "/*+ NEST_LOOP(c) */"):
        hinted = sorted(
            map(tuple, tenv.sql(JOIN_SQL.format(hint=hint)).collect())
        )
        assert hinted == plain, hint


def test_lookup_and_state_ttl_stripped(spark):
    out = rewrite_flink_hints(
        spark,
        "SELECT /*+ LOOKUP('table'='dim', 'async'='true'), "
        "BROADCAST(d), STATE_TTL('o'='1d') */ * FROM o JOIN d ON o.k = d.k",
    )
    assert out == (
        "SELECT /*+ BROADCAST(d) */ * FROM o JOIN d ON o.k = d.k"
    )


def test_all_stripped_block_removed(spark):
    out = rewrite_flink_hints(
        spark, "SELECT /*+ STATE_TTL('o'='1d') */ 1 AS x"
    )
    assert "/*+" not in out


def test_unknown_hint_errors_loudly(spark):
    with pytest.raises(HintError, match="unsupported hint"):
        rewrite_flink_hints(spark, "SELECT /*+ MAGIC(t) */ 1")


def test_string_literals_untouched(spark, tenv):
    sql = "SELECT '/*+ NEST_LOOP(x) */' AS s, 'it''s /*+' AS t"
    assert rewrite_flink_hints(spark, sql) == sql
    row = tenv.sql(sql).collect()[0]
    assert row.s == "/*+ NEST_LOOP(x) */"


def test_options_hint_on_datagen_table(tenv):
    tenv.sql(
        """
        CREATE TABLE hint_gen (
            id BIGINT,
            v INT
        ) WITH ('connector' = 'datagen', 'number-of-rows' = '5')
        """
    )
    assert tenv.sql("SELECT count(*) AS n FROM hint_gen").first().n == 5
    got = tenv.sql(
        "SELECT count(*) AS n FROM hint_gen "
        "/*+ OPTIONS('number-of-rows'='3') */"
    ).first()
    assert got.n == 3
    # base declaration untouched
    assert tenv.sql("SELECT count(*) AS n FROM hint_gen").first().n == 5


def test_options_hint_on_csv_table(tenv, tmp_path):
    p = tmp_path / "piped"
    p.mkdir()
    (p / "data.csv").write_text("a|b\n1|x\n2|y\n")
    tenv.sql(
        f"""
        CREATE TABLE hint_csv (
            a BIGINT,
            b STRING
        ) WITH (
            'connector' = 'filesystem',
            'path' = '{p}',
            'format' = 'csv'
        )
        """
    )
    got = tenv.sql(
        "SELECT a, b FROM hint_csv "
        "/*+ OPTIONS('csv.field-delimiter'='|') */ ORDER BY a"
    ).collect()
    assert [tuple(r) for r in got] == [(1, "x"), (2, "y")]


def test_options_on_non_ddl_table_errors(tenv):
    with pytest.raises(HintError, match="connector DDL"):
        tenv.sql(
            "SELECT * FROM nation /*+ OPTIONS('format'='csv') */"
        )


def test_options_unknown_key_errors(tenv, tmp_path):
    p = tmp_path / "pq"
    with pytest.raises(HintError, match="unsupported option"):
        tenv.sql(
            "SELECT * FROM hint_csv /*+ OPTIONS('scan.bogus'='1') */"
        )


def test_options_hint_inside_ctas(tenv, tmp_path):
    """The hint rewrite must run BEFORE the CTAS route (r6 review #5) —
    a hint inside CREATE TABLE ... AS SELECT was silently ignored."""
    import os

    tenv.sql(
        """
        CREATE TABLE hint_gen2 (
            id BIGINT, v INT
        ) WITH ('connector' = 'datagen', 'number-of-rows' = '50')
        """
    )
    path = os.path.join(str(tmp_path), "ctas_hint")
    tenv.sql(
        f"""
        CREATE TABLE ctas_hint WITH (
            'connector' = 'filesystem',
            'path' = '{path}',
            'format' = 'parquet'
        ) AS SELECT id, v FROM hint_gen2
             /*+ OPTIONS('number-of-rows'='4') */
        """
    )
    assert tenv.sql("SELECT count(*) AS n FROM ctas_hint").first().n == 4
