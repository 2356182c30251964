"""Append-only BASELINE_BENCH.json update (VERDICT r6 #2: the recorded
baseline is FROZEN — when the headline grows, new queries get baselines
appended; existing entries are never re-measured).

Measures each named query with bench.py's methodology (session warm-up,
per-query warm run, then median of N timed runs) and appends the medians.

r10 — the freeze rule is CODE now (VERDICT r9 next-item #7, the cea0b67
adjudication): an existing entry may be re-measured ONLY with an
explicit ``--re-record`` flag AND only while no committed driver bench
artifact (BENCH_r*.json) has ever consumed the key. Once a driver run
has seen the number, the entry is immutable, period.

Usage: python scripts/append_baseline.py q1 [q2 ...] [--runs N]
                                        [--re-record]
                                        [--semantics-changed REASON]

r12: ``--semantics-changed REASON`` is the semantic-rework invalidation
path (VERDICT r11 what's-wrong #1) — when a query's semantics were
reworked (oracle + compile both changed), its frozen baseline measures
a query that no longer exists; the old value is archived in the
``invalidated`` freeze log with the reason, then re-recorded.
"""

from __future__ import annotations

import glob
import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def driver_consumed_keys(repo: str = REPO) -> set[str]:
    """Query names a driver bench run has consumed — these baselines
    are immutable. Sources: any per-query map embedded in a BENCH_r*
    artifact, plus the per-query detail file the driver's artifact
    points at (BENCH_DETAIL.json) in BOTH the working tree and HEAD
    (a key added this round appears in neither until the next driver
    run — exactly the same-round correction window)."""
    out: set[str] = set()

    def _take(doc) -> None:
        if not isinstance(doc, dict):
            return
        q = doc.get("queries")
        if isinstance(q, dict):
            out.update(q.keys())
        _take(doc.get("parsed"))

    for p in glob.glob(os.path.join(repo, "BENCH_r*.json")):
        try:
            with open(p) as f:
                _take(json.load(f))
        except (OSError, ValueError):
            continue
    detail = os.path.join(repo, "BENCH_DETAIL.json")
    try:
        with open(detail) as f:
            _take(json.load(f))
    except (OSError, ValueError):
        pass
    try:  # HEAD's copy too, in case the working tree was locally rerun
        import subprocess

        blob = subprocess.run(
            ["git", "-C", repo, "show", "HEAD:BENCH_DETAIL.json"],
            capture_output=True, text=True, timeout=30,
        )
        if blob.returncode == 0:
            _take(json.loads(blob.stdout))
    except (OSError, ValueError, subprocess.SubprocessError):
        pass
    return out


def check_mutation(
    name: str,
    existing: bool,
    consumed: set[str],
    re_record: bool,
    semantics_changed: "str | None" = None,
) -> str:
    """The freeze rule as a pure function (pytest-pinned):

    - new key                         -> 'append'
    - existing key, no --re-record    -> 'skip' (frozen, append-only)
    - existing key, --re-record, key never in a committed BENCH_r*.json
                                      -> 're-record' (same-round
                                        correction, the cea0b67 case)
    - existing key, --re-record, key consumed by a driver run
                                      -> ValueError (immutable)
    - existing key, --semantics-changed REASON (r12, VERDICT r11
      what's-wrong #1) -> 'invalidate': the query's SEMANTICS were
      reworked (oracle + compile changed), so the frozen number
      measures a query that no longer exists and comparing against it
      is itself a falsehood. The old value is NOT overwritten silently:
      it is archived under doc['invalidated'][name] with the reason
      (the freeze log), then a fresh median is recorded. The reason is
      mandatory and non-empty — this path is for semantic reworks
      only, never for "the number got worse".
    """
    if not existing:
        return "append"
    if semantics_changed is not None:
        if not semantics_changed.strip():
            raise ValueError(
                "--semantics-changed requires a non-empty reason (it is "
                "the freeze-log entry)"
            )
        return "invalidate"
    if not re_record:
        return "skip"
    if name in consumed:
        raise ValueError(
            f"baseline for {name!r} is FROZEN: a committed driver bench "
            "artifact (BENCH_r*.json) has consumed it — re-recording a "
            "consumed baseline is forbidden (append-only rule)"
        )
    return "re-record"


def main() -> int:
    argv = sys.argv[1:]
    args, runs, re_record, i = [], 3, False, 0
    semantics_changed = None
    while i < len(argv):
        a = argv[i]
        if a.startswith("--runs"):
            if "=" in a:
                runs = int(a.split("=", 1)[1])
            else:
                i += 1
                runs = int(argv[i])
        elif a == "--re-record":
            re_record = True
        elif a.startswith("--semantics-changed"):
            if "=" in a:
                semantics_changed = a.split("=", 1)[1]
            else:
                i += 1
                semantics_changed = argv[i]
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

    consumed = driver_consumed_keys()
    for name in args:
        action = check_mutation(
            name, name in doc["queries"], consumed, re_record,
            semantics_changed,
        )
        if action == "skip":
            print(f"SKIP {name}: already recorded (baseline is frozen, "
                  "append-only; --re-record only before a driver run "
                  "consumes the key)", file=sys.stderr)
            continue
        if action == "invalidate":
            # freeze log: archive the stale-semantics value, never lose it
            doc.setdefault("invalidated", {})[name] = {
                "old_value": doc["queries"][name],
                "reason": semantics_changed,
            }
            print(f"INVALIDATE {name}: archived old median "
                  f"{doc['queries'][name]} — {semantics_changed}",
                  file=sys.stderr)
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
