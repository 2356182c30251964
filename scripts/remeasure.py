#!/usr/bin/env python3
"""Re-measure a named headline query with the bench's OWN methodology.

r11 (VERDICT r10 what's-wrong #3): adjudication re-measures must use the
bench's exact action — a warm noop-format WRITE of the full plan — because
the frozen BASELINE_BENCH.json numbers were recorded that way. The r10
`mr_cross_define_last` note quoted 0.73x from count()-driven runs; swapping
the action swaps what is measured (count() can prune the write-side plan and
skips the noop sink datasource path), so the number was not comparable.

Usage:
    python scripts/remeasure.py QUERY_NAME [N_RUNS] [SF_DIR]

Prints one JSON line: {"query", "runs", "times", "median", "baseline",
"ratio", "loadavg", "sf_dir"}. All runs are WARM (one untimed warm-up run
first, matching bench.py's min-of-N-after-warm-up discipline); the median of
N is reported because adjudication wants the typical warm time, not the
luckiest.
"""

from __future__ import annotations

import json
import os
import statistics
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def remeasure(query: str, runs: int = 5, sf_dir: str | None = None) -> dict:
    import time

    from apache_flink_spark.queries import QUERIES
    from apache_flink_spark.session import get_spark

    sf_dir = sf_dir or os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    fn = QUERIES[query]
    spark = get_spark(app_name="apache_flink_spark_remeasure")

    # Warm-up: JVM/codegen/broadcast, untimed (bench.py parity).
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

    times = []
    for _ in range(runs):
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        times.append(round(time.perf_counter() - t0, 4))

    median = round(statistics.median(times), 4)
    out = {
        "query": query,
        "runs": runs,
        "times": times,
        "median": median,
        "sf_dir": sf_dir,
        "loadavg": [round(x, 2) for x in os.getloadavg()],
        "action": "noop-write (bench.py methodology)",
    }
    base_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BASELINE_BENCH.json",
    )
    if os.path.exists(base_path):
        base = json.load(open(base_path))
        ref = base["queries"].get(query) or base.get("appended", {}).get(query)
        if isinstance(ref, dict):  # appended entries may carry metadata
            ref = ref.get("sec") or ref.get("value")
        if ref:
            out["baseline"] = ref
            out["ratio"] = round(median / ref, 3)
    return out


def main() -> None:
    query = sys.argv[1]
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else None
    print(json.dumps(remeasure(query, runs, sf_dir)))


if __name__ == "__main__":
    main()
