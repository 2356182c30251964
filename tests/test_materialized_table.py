"""Materialized-table lifecycle: CREATE/REFRESH/SUSPEND/RESUME/partition
refresh/scheduler + gateway refresh operation.

Reference parity model: SqlCreateMaterializedTable / SqlAlterMaterializedTable*
DDL, CatalogMaterializedTable refresh modes, MaterializedTableManager refresh
workflows, SqlGatewayService.refreshMaterializedTable.
"""

from __future__ import annotations

import pytest

from apache_flink_spark.environment import TableEnvironment
from apache_flink_spark.materialized_table import MaterializedTableError

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def tenv(spark, tmp_path):
    env = TableEnvironment(spark=spark, sf_dir=SF)
    # source table the tests mutate between refreshes
    spark.createDataFrame(
        [(1, "a", 10), (2, "a", 20), (3, "b", 30)], "id int, grp string, v int"
    ).write.mode("overwrite").parquet(str(tmp_path / "src"))
    env.sql(
        f"CREATE OR REPLACE TEMPORARY VIEW mt_src AS "
        f"SELECT * FROM parquet.`{tmp_path/'src'}`"
    )
    yield env
    for name in list(env.materialized_tables.tables):
        env.materialized_tables.drop(name)


def _write_src(spark, tmp_path, rows):
    spark.createDataFrame(rows, "id int, grp string, v int").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "src"))
    spark.catalog.refreshByPath(str(tmp_path / "src"))


def test_create_and_query(tenv):
    tenv.sql(
        "CREATE MATERIALIZED TABLE mt_sum FRESHNESS = INTERVAL '1' HOUR "
        "AS SELECT grp, sum(v) AS total FROM mt_src GROUP BY grp"
    )
    got = {
        (r.grp, r.total)
        for r in tenv.sql("SELECT * FROM mt_sum").collect()
    }
    assert got == {("a", 30), ("b", 30)}
    d = tenv.materialized_tables.describe("mt_sum")
    # 1h freshness >= the 30-min threshold derives FULL, as in the reference
    assert d["refreshMode"] == "FULL" and d["status"] == "ACTIVATED"


def test_contents_are_snapshot_until_refresh(tenv, spark, tmp_path):
    tenv.sql(
        "CREATE MATERIALIZED TABLE mt_cnt FRESHNESS = INTERVAL '1' DAY "
        "AS SELECT count(*) AS n FROM mt_src"
    )
    assert tenv.sql("SELECT * FROM mt_cnt").collect()[0].n == 3
    _write_src(spark, tmp_path, [(i, "a", i) for i in range(10)])
    # still the old snapshot
    assert tenv.sql("SELECT * FROM mt_cnt").collect()[0].n == 3
    out = tenv.sql("ALTER MATERIALIZED TABLE mt_cnt REFRESH").collect()
    assert out[0].rows_refreshed == 1
    assert tenv.sql("SELECT * FROM mt_cnt").collect()[0].n == 10


def test_freshness_derives_continuous(tenv):
    tenv.sql(
        "CREATE MATERIALIZED TABLE mt_c FRESHNESS = INTERVAL '30' SECOND "
        "AS SELECT count(*) AS n FROM mt_src"
    )
    assert tenv.materialized_tables.describe("mt_c")["refreshMode"] == (
        "CONTINUOUS"
    )
    tenv.sql("ALTER MATERIALIZED TABLE mt_c SET REFRESH_MODE = FULL")
    assert tenv.materialized_tables.describe("mt_c")["refreshMode"] == "FULL"


def test_scheduler_tick_refreshes_due_only(tenv, spark, tmp_path):
    mgr = tenv.materialized_tables
    tenv.sql(
        "CREATE MATERIALIZED TABLE mt_due FRESHNESS = INTERVAL '1' SECOND "
        "AS SELECT count(*) AS n FROM mt_src"
    )
    tenv.sql(
        "CREATE MATERIALIZED TABLE mt_slow FRESHNESS = INTERVAL '1' DAY "
        "AS SELECT count(*) AS n FROM mt_src"
    )
    # Anchor on mt_due's OWN refresh time: under a loaded host the later
    # CREATE of mt_slow can take >1s, so max() over both tables would put
    # the 1s-fresh mt_due already past due at t0 (flaked in a 4-shard run).
    t0 = mgr.tables["mt_due"].last_refresh_mono
    assert mgr.tick(now=t0) == []  # nothing due yet
    _write_src(spark, tmp_path, [(i, "a", i) for i in range(7)])
    assert mgr.tick(now=t0 + 2.0) == ["mt_due"]  # only the 1s-fresh table
    assert tenv.sql("SELECT * FROM mt_due").collect()[0].n == 7
    assert tenv.sql("SELECT * FROM mt_slow").collect()[0].n == 3


def test_suspend_blocks_tick_resume_restores(tenv, spark, tmp_path):
    mgr = tenv.materialized_tables
    tenv.sql(
        "CREATE MATERIALIZED TABLE mt_s FRESHNESS = INTERVAL '1' SECOND "
        "AS SELECT count(*) AS n FROM mt_src"
    )
    t0 = mgr.tables["mt_s"].last_refresh_mono
    tenv.sql("ALTER MATERIALIZED TABLE mt_s SUSPEND")
    assert mgr.tick(now=t0 + 5.0) == []
    assert mgr.describe("mt_s")["status"] == "SUSPENDED"
    tenv.sql("ALTER MATERIALIZED TABLE mt_s RESUME")
    assert mgr.tick(now=t0 + 5.0) == ["mt_s"]


def test_partition_refresh_rewrites_only_target(tenv, spark, tmp_path):
    tenv.sql(
        "CREATE MATERIALIZED TABLE mt_p PARTITIONED BY (grp) "
        "FRESHNESS = INTERVAL '1' DAY "
        "AS SELECT id, v, grp FROM mt_src"
    )
    # mutate BOTH partitions upstream
    _write_src(
        spark, tmp_path,
        [(1, "a", 100), (2, "a", 200), (3, "b", 300)],
    )
    out = tenv.sql(
        "ALTER MATERIALIZED TABLE mt_p REFRESH PARTITION (grp = 'a')"
    ).collect()
    assert out[0].rows_refreshed == 2
    rows = {
        (r.grp, r.v) for r in tenv.sql("SELECT grp, v FROM mt_p").collect()
    }
    # partition a refreshed, partition b still the old snapshot — pinned
    assert rows == {("a", 100), ("a", 200), ("b", 30)}


def test_partition_refresh_requires_declared_key(tenv):
    tenv.sql(
        "CREATE MATERIALIZED TABLE mt_np FRESHNESS = INTERVAL '1' DAY "
        "AS SELECT id, v, grp FROM mt_src"
    )
    with pytest.raises(MaterializedTableError, match="not in PARTITIONED BY"):
        tenv.sql("ALTER MATERIALIZED TABLE mt_np REFRESH PARTITION (grp='a')")


def test_drop_removes_view_and_storage(tenv):
    tenv.sql(
        "CREATE MATERIALIZED TABLE mt_d FRESHNESS = INTERVAL '1' DAY "
        "AS SELECT 1 AS one"
    )
    root = tenv.materialized_tables.tables["mt_d"].root
    tenv.sql("DROP MATERIALIZED TABLE mt_d")
    import os

    assert not os.path.exists(root)
    with pytest.raises(Exception):
        tenv.sql("SELECT * FROM mt_d").collect()


def test_bad_ddl_errors_loudly(tenv):
    with pytest.raises(MaterializedTableError, match="unsupported"):
        tenv.sql("CREATE MATERIALIZED TABLE broken AS SELECT 1")  # no FRESHNESS
    with pytest.raises(MaterializedTableError, match="unknown"):
        tenv.sql("ALTER MATERIALIZED TABLE nope REFRESH")


def test_gateway_refresh_operation(spark):
    from apache_flink_spark.sql_gateway import (
        OperationStatus,
        SqlGatewayService,
    )

    svc = SqlGatewayService(spark=spark, sf_dir=SF)
    try:
        sh = svc.open_session()
        svc.configure_session(
            sh,
            "CREATE MATERIALIZED TABLE mt_gw FRESHNESS = INTERVAL '1' DAY "
            "AS SELECT count(*) AS n FROM nation",
        )
        oh = svc.refresh_materialized_table(sh, "mt_gw")
        assert svc.await_operation(sh, oh) is OperationStatus.FINISHED
        rs = svc.fetch_results(sh, oh, 0)
        assert rs.data[0][0] == "mt_gw" and rs.data[0][1] == 1
    finally:
        svc.close()


# ---------------------------------------------------------------------------
# CONTINUOUS mode: incremental checkpointed refresh
# ---------------------------------------------------------------------------


def _add_src_files(spark, tmp_path, rows, fname):
    # append NEW parquet files (what a landing zone does) — the file
    # stream must pick up only these
    spark.createDataFrame(rows, "id int, grp string, v int").coalesce(
        1
    ).write.mode("append").parquet(str(tmp_path / "src"))


def test_continuous_append_is_incremental(tenv, spark, tmp_path):
    mgr = tenv.materialized_tables
    mgr.register_stream_source("mt_src", str(tmp_path / "src"))
    tenv.sql(
        "CREATE MATERIALIZED TABLE mt_ca FRESHNESS = INTERVAL '10' SECOND "
        "REFRESH_MODE = CONTINUOUS "
        "AS SELECT id, v FROM mt_src WHERE v >= 20"
    )
    assert mgr.tables["mt_ca"].continuous_sink == "append"
    got = {(r.id, r.v) for r in tenv.sql("SELECT * FROM mt_ca").collect()}
    assert got == {(2, 20), (3, 30)}  # offset-0 replay of existing data
    # new files arrive; next tick ingests ONLY them (offsets persisted)
    _add_src_files(spark, tmp_path, [(4, "b", 40), (5, "a", 5)], "b2")
    tenv.sql("ALTER MATERIALIZED TABLE mt_ca REFRESH")
    got = {(r.id, r.v) for r in tenv.sql("SELECT * FROM mt_ca").collect()}
    assert got == {(2, 20), (3, 30), (4, 40)}


def test_continuous_complete_aggregate(tenv, spark, tmp_path):
    mgr = tenv.materialized_tables
    mgr.register_stream_source("mt_src", str(tmp_path / "src"))
    tenv.sql(
        "CREATE MATERIALIZED TABLE mt_cc FRESHNESS = INTERVAL '10' SECOND "
        "REFRESH_MODE = CONTINUOUS "
        "AS SELECT grp, count(*) AS n, sum(v) AS sv FROM mt_src GROUP BY grp"
    )
    assert mgr.tables["mt_cc"].continuous_sink == "complete"
    got = {(r.grp, r.n, r.sv) for r in tenv.sql("SELECT * FROM mt_cc").collect()}
    assert got == {("a", 2, 30), ("b", 1, 30)}
    _add_src_files(spark, tmp_path, [(6, "a", 6)], "b2")
    tenv.sql("ALTER MATERIALIZED TABLE mt_cc REFRESH")
    got = {(r.grp, r.n, r.sv) for r in tenv.sql("SELECT * FROM mt_cc").collect()}
    # incremental agg state carried the old groups across the tick
    assert got == {("a", 3, 36), ("b", 1, 30)}


def test_continuous_without_source_falls_back(tenv):
    mgr = tenv.materialized_tables
    # mt_src NOT registered as a stream source in this fixture instance
    tenv.sql(
        "CREATE MATERIALIZED TABLE mt_fb FRESHNESS = INTERVAL '10' SECOND "
        "REFRESH_MODE = CONTINUOUS "
        "AS SELECT count(*) AS n FROM mt_src"
    )
    assert mgr.tables["mt_fb"].continuous_sink == "fallback"
    assert tenv.sql("SELECT * FROM mt_fb").collect()[0].n == 3


def test_continuous_tick_refreshes_at_cadence(tenv, spark, tmp_path):
    mgr = tenv.materialized_tables
    mgr.register_stream_source("mt_src", str(tmp_path / "src"))
    tenv.sql(
        "CREATE MATERIALIZED TABLE mt_ct FRESHNESS = INTERVAL '1' SECOND "
        "REFRESH_MODE = CONTINUOUS "
        "AS SELECT id FROM mt_src"
    )
    t0 = mgr.tables["mt_ct"].last_refresh_mono
    _add_src_files(spark, tmp_path, [(9, "z", 90)], "b2")
    assert mgr.tick(now=t0 + 2.0) == ["mt_ct"]
    ids = {r.id for r in tenv.sql("SELECT * FROM mt_ct").collect()}
    assert ids == {1, 2, 3, 9}


def test_continuous_property_random_arrivals(tenv, spark, tmp_path):
    """Property: for ANY slicing of row arrivals into files/ticks, a
    CONTINUOUS table's final contents equal the batch truth — append and
    complete sinks both."""
    import random

    mgr = tenv.materialized_tables
    src = str(tmp_path / "prop_src")
    rows = [(i, "g" + str(i % 3), i * 10) for i in range(40)]
    rng = random.Random(7)
    spark.createDataFrame(
        rows[:5], "id int, grp string, v int"
    ).coalesce(1).write.mode("overwrite").parquet(src)
    tenv.sql(
        f"CREATE OR REPLACE TEMPORARY VIEW prop_src AS "
        f"SELECT * FROM parquet.`{src}`"
    )
    mgr.register_stream_source("prop_src", src)
    tenv.sql(
        "CREATE MATERIALIZED TABLE mt_pa FRESHNESS = INTERVAL '1' SECOND "
        "REFRESH_MODE = CONTINUOUS AS SELECT id, v FROM prop_src WHERE id % 2 = 0"
    )
    tenv.sql(
        "CREATE MATERIALIZED TABLE mt_pc FRESHNESS = INTERVAL '1' SECOND "
        "REFRESH_MODE = CONTINUOUS "
        "AS SELECT grp, count(*) AS n, sum(v) AS sv FROM prop_src GROUP BY grp"
    )
    i = 5
    while i < len(rows):
        step = rng.choice([1, 2, 3, 7])
        chunk = rows[i:i + step]
        i += step
        spark.createDataFrame(
            chunk, "id int, grp string, v int"
        ).coalesce(1).write.mode("append").parquet(src)
        if rng.random() < 0.7:  # some arrivals share a tick
            mgr.refresh("mt_pa")
            mgr.refresh("mt_pc")
    mgr.refresh("mt_pa")
    mgr.refresh("mt_pc")
    want_a = {(i_, v) for i_, g, v in rows if i_ % 2 == 0}
    got_a = {(r.id, r.v) for r in tenv.sql("SELECT * FROM mt_pa").collect()}
    assert got_a == want_a
    import collections

    truth = collections.defaultdict(lambda: [0, 0])
    for i_, g, v in rows:
        truth[g][0] += 1
        truth[g][1] += v
    want_c = {(g, n, sv) for g, (n, sv) in truth.items()}
    got_c = {
        (r.grp, r.n, r.sv) for r in tenv.sql("SELECT * FROM mt_pc").collect()
    }
    assert got_c == want_c


def test_time_travel_resolves_snapshot_generations(tenv, spark, tmp_path):
    """FLIP-308 FOR SYSTEM_TIME AS OF on a materialized table: a
    timestamp between two refreshes reads the OLDER retained snapshot;
    now reads the current one; pre-creation errors loudly."""
    from datetime import datetime, timedelta

    tenv.sql(
        "CREATE MATERIALIZED TABLE mt_tt FRESHNESS = INTERVAL '1' DAY "
        "AS SELECT count(*) AS n FROM mt_src"
    )
    t_after_v0 = datetime.now()
    _write_src(spark, tmp_path, [(i, "a", i) for i in range(7)])
    import time as _time

    _time.sleep(0.05)
    tenv.sql("ALTER MATERIALIZED TABLE mt_tt REFRESH")
    t_after_v1 = datetime.now()

    def q(ts):
        return tenv.sql(
            f"SELECT n FROM mt_tt FOR SYSTEM_TIME AS OF TIMESTAMP "
            f"'{ts.strftime('%Y-%m-%d %H:%M:%S.%f')}'"
        ).collect()[0].n

    assert q(t_after_v1) == 7      # current generation
    assert q(t_after_v0) == 3      # previous retained generation
    with pytest.raises(MaterializedTableError, match="no retained"):
        q(t_after_v0 - timedelta(hours=1))
    # plain reads still see the live view
    assert tenv.sql("SELECT n FROM mt_tt").collect()[0].n == 7


def test_time_travel_on_continuous_append_mode(tenv, spark, tmp_path):
    """FLIP-308 on an append-mode CONTINUOUS table: the single growing
    generation resolves for any timestamp at/after its birth instead of
    erroring (r6 review #4); pre-creation still errors loudly."""
    from datetime import datetime, timedelta

    mgr = tenv.materialized_tables
    mgr.register_stream_source("mt_src", str(tmp_path / "src"))
    tenv.sql(
        "CREATE MATERIALIZED TABLE mt_ta FRESHNESS = INTERVAL '10' SECOND "
        "REFRESH_MODE = CONTINUOUS "
        "AS SELECT id, v FROM mt_src WHERE v >= 20"
    )
    assert mgr.tables["mt_ta"].continuous_sink == "append"

    def q(ts):
        return {
            (r.id, r.v)
            for r in tenv.sql(
                f"SELECT * FROM mt_ta FOR SYSTEM_TIME AS OF TIMESTAMP "
                f"'{ts.strftime('%Y-%m-%d %H:%M:%S.%f')}'"
            ).collect()
        }

    now = datetime.now()
    assert q(now) == {(2, 20), (3, 30)}
    with pytest.raises(MaterializedTableError, match="no retained"):
        q(now - timedelta(hours=1))
