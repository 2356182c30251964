"""Append-only BASELINE_BENCH.json update (VERDICT r6 #2: the recorded
baseline is FROZEN — when the headline grows, new queries get baselines
appended; existing entries are never re-measured).

Measures each named query with bench.py's methodology (session warm-up,
per-query warm run, then median of N timed runs) and appends the medians.

Usage: python scripts/append_baseline.py q1 [q2 ...] [--runs N]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    argv = sys.argv[1:]
    args, runs, i = [], 3, 0
    while i < len(argv):
        a = argv[i]
        if a.startswith("--runs"):
            if "=" in a:
                runs = int(a.split("=", 1)[1])
            else:
                i += 1
                runs = int(argv[i])
        else:
            args.append(a)
        i += 1
    if not args:
        print("usage: append_baseline.py <query> [...]", file=sys.stderr)
        return 2

    sys.path.insert(0, REPO)
    os.environ.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf_dir = os.environ["SPARK_GRAFT_SF_DIR"]

    from apache_flink_spark.queries import QUERIES
    from apache_flink_spark.session import get_spark

    spark = get_spark(app_name="append_baseline")
    # session warm-up: flagship query (bench.py's JVM/parquet warm pass)
    QUERIES["q1_pricing_summary"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    path = os.path.join(REPO, "BASELINE_BENCH.json")
    with open(path) as f:
        doc = json.load(f)

    for name in args:
        if name in doc["queries"]:
            print(f"SKIP {name}: already recorded (baseline is frozen, "
                  "append-only)", file=sys.stderr)
            continue
        fn = QUERIES[name]
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
        times = []
        for _ in range(runs):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            times.append(round(time.perf_counter() - t0, 4))
        doc["queries"][name] = round(statistics.median(times), 4)
        print(f"{name}: {times} -> median {doc['queries'][name]}",
              file=sys.stderr)

    doc.setdefault("appended", {})
    with open(path, "w") as f:
        json.dump(doc, f, indent=1)
    print(f"wrote {path}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
