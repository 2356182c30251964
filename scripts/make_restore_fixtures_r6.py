"""Write the round-6 cross-version checkpoint-restore fixtures — one per
custom stateful operator (reference analog: flink-table-planner
restore-tests, one suite per exec node; VERDICT r5 item #3).

For each op in tests/restore_ops.OPS: runs batch 1 through the operator
with a checkpoint under the FIXED path /tmp/afs_restore_<op> (file-source
offsets store absolute paths), snapshots checkpoint + input into
tests/fixtures/restore_<op>_v1/, and records META.json.
tests/test_restore_compat.py restarts each from its snapshot with batch 2
and asserts output only the restored batch-1 state can produce.

Usage: python scripts/make_restore_fixtures_r6.py [op ...]
"""

from __future__ import annotations

import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def make(spark, op: str) -> None:
    from tests.restore_ops import OPS, run_from

    spec = OPS[op]
    fix = f"/tmp/afs_restore_{op}"
    dest = os.path.join(REPO, "tests", "fixtures", f"restore_{op}_v1")

    shutil.rmtree(fix, ignore_errors=True)
    os.makedirs(f"{fix}/input")
    with open(f"{fix}/input/b1.json", "w") as f:
        for row in spec["batch1"]:
            f.write(json.dumps(row) + "\n")

    run_from(spark, op, fix, f"{fix}/out1")

    n1 = (
        spark.read.parquet(f"{fix}/out1").count()
        if os.path.exists(f"{fix}/out1")
        else 0
    )

    shutil.rmtree(dest, ignore_errors=True)
    os.makedirs(dest)
    shutil.copytree(f"{fix}/ckpt", f"{dest}/ckpt")
    shutil.copy(f"{fix}/input/b1.json", f"{dest}/b1.json")
    with open(f"{dest}/META.json", "w") as f:
        json.dump(
            {
                "written_by_round": 6,
                "operator": op,
                "key_groups": 8,
                "shuffle_partitions": 4,
                "batch1_rows_emitted": n1,
            },
            f,
            indent=1,
        )
    print(f"fixture written to {dest} (batch1 emitted {n1} rows)")


def main() -> int:
    from apache_flink_spark.session import get_spark
    from tests.restore_ops import OPS

    ops = sys.argv[1:] or list(OPS)
    spark = get_spark()
    # Key-group count and stateful shuffle partitioning are baked into the
    # checkpoint layout — pin both (the restore test pins the same values
    # from META.json).
    spark.conf.set("spark.graft.stateful.keyGroups", "8")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    for op in ops:
        make(spark, op)
    return 0


if __name__ == "__main__":
    sys.exit(main())
