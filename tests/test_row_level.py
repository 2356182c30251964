"""Row-level DML (reference SupportsRowLevelDelete/Update abilities +
SqlTruncateTable) on DDL filesystem tables: copy-on-write rewrite with
atomic swap, SQL NULL semantics, loud errors for non-DDL targets."""

from __future__ import annotations

import glob
import os

import pytest

from apache_flink_spark.environment import TableEnvironment
from apache_flink_spark.row_level import RowLevelError

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def tenv(spark):
    return TableEnvironment(spark=spark, sf_dir=SF)


@pytest.fixture()
def table(tenv, spark, tmp_path):
    """A fresh 3-column parquet DDL table per test."""
    path = str(tmp_path / "rl")
    spark.createDataFrame(
        [(i, float(i) * 10, "grp%d" % (i % 3)) for i in range(100)],
        "id bigint, val double, grp string",
    ).write.parquet(path)
    name = "rl_t"
    tenv.sql(
        f"""
        CREATE TABLE {name} (
            id BIGINT, val DOUBLE, grp STRING
        ) WITH ('connector' = 'filesystem', 'path' = '{path}',
                'format' = 'parquet')
        """
    )
    return name, path


def test_delete_where(tenv, spark, table):
    name, path = table
    n = tenv.sql(f"DELETE FROM {name} WHERE id >= 90").first().rows_affected
    assert n == 10
    assert spark.table(name).count() == 90
    assert spark.table(name).agg({"id": "max"}).first()[0] == 89
    # no staging dirs left
    assert not glob.glob(path + ".__*")


def test_delete_null_predicate_keeps_row(tenv, spark, table):
    name, _ = table
    # NULLIF(grp,'grp0') IS NULL for grp0 rows -> predicate NULL -> keep
    n = tenv.sql(
        f"DELETE FROM {name} WHERE LENGTH(NULLIF(grp, 'grp0')) > 3"
    ).first().rows_affected
    kept = spark.table(name)
    assert kept.count() == 100 - n
    assert set(r.grp for r in kept.select("grp").distinct().collect()) == {
        "grp0"
    }


def test_update_sees_pre_update_image(tenv, spark, table):
    name, _ = table
    # swap-style double assignment: both RHS see the OLD row
    n = tenv.sql(
        f"UPDATE {name} SET val = id + val, id = id * 2 WHERE id < 3"
    ).first().rows_affected
    assert n == 3
    rows = spark.table(name).filter("id < 6").collect()
    got = sorted((r.id, r.val) for r in rows)
    # old rows (0,0.0) (1,10.0) (2,20.0) -> val=id+val, id doubled;
    # old ids 3,4,5 untouched (id 4 now appears twice: updated old-2 and
    # the untouched original)
    assert got == [
        (0, 0.0), (2, 11.0), (3, 30.0), (4, 22.0), (4, 40.0), (5, 50.0)
    ]


def test_update_without_where_touches_all(tenv, spark, table):
    name, _ = table
    n = tenv.sql(f"UPDATE {name} SET val = 0.5").first().rows_affected
    assert n == 100
    assert spark.table(name).agg({"val": "max"}).first()[0] == 0.5


def test_truncate(tenv, spark, table):
    name, _ = table
    assert tenv.sql(f"TRUNCATE TABLE {name}").first().rows_affected == 100
    assert spark.table(name).count() == 0
    # still writable after truncate
    tenv.sql(f"INSERT INTO {name} SELECT 1, 2.0, 'g'")
    assert spark.table(name).count() == 1


def test_non_ddl_and_bad_column_errors(tenv, table):
    name, _ = table
    # Non-DDL tables fall through to spark.sql (r6 ADVICE): Spark raises
    # its own unsupported-DELETE error for v1 sources, not RowLevelError.
    with pytest.raises(Exception) as exc:
        tenv.sql("DELETE FROM nation WHERE n_nationkey = 1")
    assert not isinstance(exc.value, RowLevelError)
    with pytest.raises(RowLevelError, match="unknown column"):
        tenv.sql(f"UPDATE {name} SET nope = 1")
