"""Driver-harness emulation: every registered query on a VANILLA SparkSession.

The driver contract passes a session the engine did not build, so nothing may
depend on ``get_spark()`` defaults (r1 regression: nanosAsLong). This script
builds a bare ``SparkSession.builder.master(...).getOrCreate()`` — no engine
confs — then runs every ``queries()`` entry and compares oracle-declared ones
against DuckDB with the same canonicalization as tests/oracle_utils.

Usage: python scripts/vanilla_smoke.py [sf_dir] [name_filter_substr]
Writes a JSON summary to /tmp/vanilla_smoke.json and prints failures.
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
FILTER = sys.argv[2] if len(sys.argv) > 2 else ""


def main() -> int:
    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]")
        .appName("vanilla_smoke")
        # Heap is ENVIRONMENT sizing, not an engine conf — the point of this
        # script is "no engine confs", but Spark's 1g local default OOMs the
        # heavier sf0.1 intermediates (triangle wedge join) regardless of
        # which engine runs them.
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
        )
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod
    from tests.oracle_utils import assert_matches_oracle

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()

    results: dict[str, dict] = {}
    t0 = time.time()
    for name, fn in sorted(queries.items()):
        if FILTER and FILTER not in name:
            continue
        started = time.time()
        try:
            df = fn(spark, SF_DIR)
            if name in oracles:
                assert_matches_oracle(df, oracles[name], SF_DIR)
                results[name] = {"ok": True, "mode": "oracle"}
            else:
                n = df.count()
                results[name] = {"ok": True, "mode": "rows_only", "rows": n}
        except Exception:
            results[name] = {"ok": False, "err": traceback.format_exc(limit=4)}
        results[name]["sec"] = round(time.time() - started, 2)

    ok = sum(1 for r in results.values() if r["ok"])
    summary = {
        "sf_dir": SF_DIR,
        "total": len(results),
        "ok": ok,
        "failed": len(results) - ok,
        "wall_sec": round(time.time() - t0, 1),
        "results": results,
    }
    with open("/tmp/vanilla_smoke.json", "w") as f:
        json.dump(summary, f, indent=1)
    for name, r in results.items():
        if not r["ok"]:
            print(f"FAIL {name}\n{r['err']}\n", file=sys.stderr)
    print(f"{ok}/{len(results)} ok in {summary['wall_sec']}s (sf={SF_DIR})")
    return 0 if ok == len(results) else 1


if __name__ == "__main__":
    raise SystemExit(main())
