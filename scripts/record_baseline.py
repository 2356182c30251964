"""Re-record BASELINE_BENCH.json: same-host median-of-N per-query bench.

FROZEN since r6 (VERDICT r6 "what's wrong" #2): do NOT re-run this for an
existing baseline — a baseline re-recorded by the round it judges measures
only same-host noise. When the headline GROWS, append the new queries'
baselines with scripts/append_baseline.py instead.

Runs ``bench.py`` N times (default 3) at sf0.1, takes the per-query
median, and writes the baseline artifact bench.py's ``vs_baseline`` block
compares against. Run on a QUIET machine — concurrent load lands in the
baseline and silently flatters every later round.

Usage: python scripts/record_baseline.py [runs] [round_no]
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RUNS = int(sys.argv[1]) if len(sys.argv) > 1 else 3
ROUND = int(sys.argv[2]) if len(sys.argv) > 2 else -1


def main() -> int:
    results = []
    for i in range(RUNS):
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            capture_output=True, text=True, cwd=REPO,
        )
        line = out.stdout.strip().splitlines()[-1]
        d = json.loads(line)
        if "queries" not in d:
            # bench.py keeps the stdout line short for the driver's tail
            # window; the per-query map lives in the sidecar (r7)
            with open(os.path.join(REPO, "BENCH_DETAIL.json")) as f:
                d["queries"] = json.load(f)["queries"]
        results.append(d)
        print(
            f"run {i + 1}/{RUNS}: total={d['value']}s "
            f"({len(d['queries'])} queries)",
            file=sys.stderr,
        )
    names = sorted(
        set.intersection(*(set(r["queries"]) for r in results))
    )
    medians = {
        n: round(statistics.median(r["queries"][n] for r in results), 4)
        for n in names
    }
    doc = {
        "note": (
            f"Same-host median-of-{RUNS} per-query bench baseline "
            "(sf0.1, local[32]), recorded with bench.py's per-query "
            "warm-up pass (times are WARM). bench.py compares each run "
            "against these and reports vs_baseline ratios; judge perf "
            "against THIS, not single runs."
        ),
        "recorded_round": ROUND,
        "sf": results[0]["sf"],
        "cpus": int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
        "totals_observed": [r["value"] for r in results],
        "total_median": round(
            statistics.median(r["value"] for r in results), 4
        ),
        "queries": medians,
    }
    path = os.path.join(REPO, "BASELINE_BENCH.json")
    with open(path, "w") as f:
        json.dump(doc, f, indent=1)
    print(f"wrote {path}: {len(medians)} queries", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
