"""Property test: random ALTER TABLE sequences vs an in-memory model.

Seeded random walks over ADD / DROP / RENAME col / MODIFY / RENAME TO on
a parquet DDL table, mirrored against a pandas model — after every step
the table's visible rows must equal the model exactly (schema + values).
This pins the metadata-only-vs-copy-on-write strategy split: a wrong
metadata-only choice silently NULLs or misreads columns, which the model
comparison catches immediately.
"""

from __future__ import annotations

import os
import random

import pandas as pd
import pytest

from apache_flink_spark.environment import TableEnvironment

_TYPES = ["BIGINT", "STRING", "DOUBLE"]
_CASTS = {"BIGINT": "int64", "STRING": "object", "DOUBLE": "float64"}


def _model_cast(series, t):
    if t == "BIGINT":
        return pd.to_numeric(series, errors="coerce").astype("Int64")
    if t == "DOUBLE":
        return pd.to_numeric(series, errors="coerce").astype("float64")
    return series.map(
        lambda v: None
        if v is None or (isinstance(v, float) and pd.isna(v))
        else (
            # Spark renders integral DOUBLEs as '1.0' and ints as '1'
            repr(float(v)) if isinstance(v, float) else str(v)
        )
    )


@pytest.mark.parametrize("seed", [11, 23, 47])
def test_random_alter_sequences_match_model(spark, tmp_path, seed):
    rng = random.Random(seed)
    te = TableEnvironment(spark=spark)
    name = f"prop_alter_{seed}"
    path = os.path.join(str(tmp_path), name)
    te.sql(
        f"""
        CREATE TABLE {name} (c0 BIGINT, c1 STRING) WITH (
            'connector' = 'filesystem',
            'path' = '{path}',
            'format' = 'parquet'
        )
        """
    )
    te.sql(f"INSERT INTO {name} SELECT 1, 'a' UNION ALL SELECT 2, 'b'")
    model = pd.DataFrame(
        {"c0": pd.Series([1, 2], dtype="Int64"), "c1": ["a", "b"]}
    )
    types = {"c0": "BIGINT", "c1": "STRING"}
    next_id = 2

    for _step in range(12):
        op = rng.choice(["add", "drop", "rename", "modify", "rename_tbl"])
        cols = list(model.columns)
        if op == "add":
            t = rng.choice(_TYPES)
            c = f"c{next_id}"
            next_id += 1
            te.sql(f"ALTER TABLE {name} ADD ({c} {t})")
            model[c] = pd.Series(
                [None] * len(model), dtype=_CASTS[t] if t != "BIGINT" else "Int64"
            )
            types[c] = t
        elif op == "drop" and len(cols) > 1:
            c = rng.choice(cols)
            te.sql(f"ALTER TABLE {name} DROP {c}")
            model = model.drop(columns=[c])
            types.pop(c)
        elif op == "rename":
            c = rng.choice(cols)
            c2 = f"c{next_id}"
            next_id += 1
            te.sql(f"ALTER TABLE {name} RENAME {c} TO {c2}")
            model = model.rename(columns={c: c2})
            types[c2] = types.pop(c)
        elif op == "modify":
            c = rng.choice(cols)
            t = rng.choice([x for x in _TYPES if x != types[c]])
            if types[c] == "STRING" and t != "STRING":
                continue  # string->numeric of 'a' is NULL-lossy; skip
            te.sql(f"ALTER TABLE {name} MODIFY ({c} {t})")
            model[c] = _model_cast(model[c], t)
            types[c] = t
        else:
            new = f"{name}_r{_step}"
            te.sql(f"ALTER TABLE {name} RENAME TO {new}")
            name = new

        got = (
            te.sql(f"SELECT * FROM {name}")
            .toPandas()
            .sort_values(list(model.columns)[0] if len(model.columns) else [])
            .reset_index(drop=True)
        )
        want = model.sort_values(
            list(model.columns)[0] if len(model.columns) else []
        ).reset_index(drop=True)
        assert list(got.columns) == list(want.columns), f"step {_step} ({op})"
        for c in want.columns:
            gv = ["∅" if pd.isna(x) else str(x) for x in got[c]]
            wv = ["∅" if pd.isna(x) else str(x) for x in want[c]]
            assert gv == wv, f"step {_step} ({op}) column {c}: {gv} != {wv}"


@pytest.mark.parametrize("seed", [5, 19])
def test_random_partition_op_sequences_match_model(spark, tmp_path, seed):
    """Random walks over the PARTITIONED-table statement family — dynamic
    and static INSERT, static-partition OVERWRITE, ADD/DROP PARTITION
    (full and prefix specs), COMPACT — mirrored against an in-memory
    model. After every step both the visible rows AND the SHOW PARTITIONS
    listing must match the model exactly: this pins dynamic-overwrite
    scoping, prefix-spec deletion, empty-partition registration, and the
    layout-preserving compaction rewrite (r6 review #2) in combination."""
    rng = random.Random(seed)
    te = TableEnvironment(spark=spark)
    name = f"prop_part_{seed}"
    path = os.path.join(str(tmp_path), name)
    te.sql(
        f"""
        CREATE TABLE {name} (
            id BIGINT, v STRING, region STRING, day STRING
        ) PARTITIONED BY (region, day) WITH (
            'connector' = 'filesystem',
            'path' = '{path}',
            'format' = 'parquet'
        )
        """
    )
    regions, days = ["eu", "us", "ap"], ["d1", "d2"]
    rows: list[tuple] = []      # model: (id, v, region, day)
    empty_dirs: set = set()     # registered-but-empty (region, day)
    next_id = 0

    for _step in range(14):
        op = rng.choice(
            ["ins_dyn", "ins_static", "ovw_static", "add_part",
             "drop_part", "compact"]
        )
        if op == "ins_dyn":
            n = rng.randint(1, 3)
            batch = [
                (next_id + i, f"v{next_id + i}",
                 rng.choice(regions), rng.choice(days))
                for i in range(n)
            ]
            next_id += n
            sel = " UNION ALL ".join(
                f"SELECT {i}, '{v}', '{r}', '{d}'" for i, v, r, d in batch
            )
            te.sql(f"INSERT INTO {name} {sel}")
            rows += batch
            empty_dirs -= {(r, d) for _i, _v, r, d in batch}
        elif op in ("ins_static", "ovw_static"):
            r, d = rng.choice(regions), rng.choice(days)
            n = rng.randint(1, 2)
            batch = [(next_id + i, f"s{next_id + i}", r, d) for i in range(n)]
            next_id += n
            sel = " UNION ALL ".join(
                f"SELECT {i}, '{v}'" for i, v, _r, _d in batch
            )
            kw = "INTO" if op == "ins_static" else "OVERWRITE"
            te.sql(f"INSERT {kw} {name} PARTITION (region='{r}', day='{d}') {sel}")
            if op == "ovw_static":
                rows = [t for t in rows if not (t[2] == r and t[3] == d)]
            rows += batch
            empty_dirs.discard((r, d))
        elif op == "add_part":
            r, d = rng.choice(regions), rng.choice(days)
            te.sql(
                f"ALTER TABLE {name} ADD IF NOT EXISTS "
                f"PARTITION (region='{r}', day='{d}')"
            )
            if not any(t[2] == r and t[3] == d for t in rows):
                empty_dirs.add((r, d))
        elif op == "drop_part":
            if rng.random() < 0.5:  # prefix spec: whole region
                r = rng.choice(regions)
                spec = f"region='{r}'"
                keep = lambda t: t[2] != r  # noqa: E731
                dirs_keep = lambda rd: rd[0] != r  # noqa: E731
            else:
                r, d = rng.choice(regions), rng.choice(days)
                spec = f"region='{r}', day='{d}'"
                keep = lambda t: not (t[2] == r and t[3] == d)  # noqa: E731
                dirs_keep = lambda rd: rd != (r, d)  # noqa: E731
            te.sql(f"ALTER TABLE {name} DROP IF EXISTS PARTITION ({spec})")
            rows = [t for t in rows if keep(t)]
            empty_dirs = {rd for rd in empty_dirs if dirs_keep(rd)}
        else:  # compact (needs at least one parquet file)
            if not rows:
                continue
            te.sql(f"ALTER TABLE {name} COMPACT")

        got = sorted(
            (r.id, r.v, r.region, r.day)
            for r in te.sql(f"SELECT * FROM {name}").collect()
        )
        assert got == sorted(rows), f"step {_step} ({op}): rows diverged"
        want_parts = sorted(
            {f"region={r}/day={d}" for _i, _v, r, d in rows}
            | {f"region={r}/day={d}" for r, d in empty_dirs}
        )
        got_parts = [
            r["partition name"] for r in te.sql(f"SHOW PARTITIONS {name}").collect()
        ]
        assert got_parts == want_parts, (
            f"step {_step} ({op}): partitions {got_parts} != {want_parts}"
        )
