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

r13 hardening (ADVICE r12 #3 + VERDICT r12 what's-wrong #1):

- ``--semantics-changed`` now requires EVIDENCE, not just a reason: the
  query's source hash (function source + oracle SQL, sha256) is recorded
  at freeze time in ``doc['source_hashes']``; invalidation is rejected
  when the recorded hash equals the current one (no rework actually
  happened). The invalidating commit is recorded in the freeze-log entry.
- ``--measurement-invalid REASON`` is a separate, narrower path for
  baselines whose frozen value is a load-sensitive FLOOR (the r12
  adjudication: sub-second streaming queries whose arm/checkpoint
  overhead dominates — any load prints >1.5x against a floor-recorded
  number). Guarded: only entries with a frozen median under 1.0s
  qualify, the reason is mandatory, and the old value is archived in the
  same ``invalidated`` freeze log. Semantics are unchanged, so the
  source hash is NOT required to differ on this path.
- ``--warm N`` re-runs the per-query warm pass N times before timing
  (default 1). Floor re-freezes use a deep warm (e.g. ``--warm 6``) so
  the recorded median is the stable tail, not the cold arm.
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
    *,
    measurement_invalid: "str | None" = None,
    frozen_value: "float | None" = None,
    source_unchanged: "bool | None" = None,
    cross_run_reuse: "str | None" = None,
    uses_run_persist: "bool | None" = None,
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
    if cross_run_reuse is not None:
        # r14 (VERDICT r13 next-item #1): baselines recorded while bare
        # .persist() calls silently served materialized intermediates
        # ACROSS bench runs (CacheManager keys by canonicalized plan;
        # removed in commit 9ec80a8 by routing through
        # run_cache.run_persist) measured a partially-cached second run —
        # the frozen number is structurally unreachable by the honest
        # engine. Guarded: the reason is mandatory, and the query's
        # CURRENT source must actually route through run_persist (the
        # evidence that it was affected) — anything else would launder a
        # plain regression through this path.
        if not cross_run_reuse.strip():
            raise ValueError(
                "--cross-run-reuse requires a non-empty reason (it is "
                "the freeze-log entry)"
            )
        if not uses_run_persist:
            raise ValueError(
                f"--cross-run-reuse rejected for {name!r}: the query's "
                "source does not route through run_cache.run_persist, so "
                "its frozen baseline cannot have been flattered by the "
                "cross-run persist reuse. Frozen baselines are immutable "
                "without evidence."
            )
        return "invalidate"
    if measurement_invalid is not None:
        # r13: floor-baseline re-freeze — measurement artifact, not a
        # semantic rework. Only load-dominated sub-second entries qualify.
        if not measurement_invalid.strip():
            raise ValueError(
                "--measurement-invalid requires a non-empty reason (it is "
                "the freeze-log entry)"
            )
        if frozen_value is None or frozen_value >= 1.0:
            raise ValueError(
                f"--measurement-invalid is for load-dominated sub-second "
                f"floors only; frozen median for {name!r} is "
                f"{frozen_value} (>= 1.0s). A slow query's baseline is not "
                "a floor artifact — use --semantics-changed with evidence "
                "if its semantics were reworked."
            )
        return "invalidate"
    if semantics_changed is not None:
        if not semantics_changed.strip():
            raise ValueError(
                "--semantics-changed requires a non-empty reason (it is "
                "the freeze-log entry)"
            )
        if source_unchanged:
            # ADVICE r12 #3: the reason alone is not evidence — the
            # query's recorded source hash must have changed since the
            # freeze, else nothing was reworked and invalidation would
            # launder a plain regression.
            raise ValueError(
                f"--semantics-changed rejected for {name!r}: the query's "
                "source hash (function source + oracle SQL) is UNCHANGED "
                "since the baseline was frozen — a semantics rework must "
                "actually change the compiled query. Frozen baselines are "
                "immutable without evidence."
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


def query_source_hash(name: str) -> str:
    """sha256 of the query's unwrapped function source + oracle SQL —
    the freeze-time identity --semantics-changed must show has changed
    (ADVICE r12 #3)."""
    import hashlib
    import inspect

    from apache_flink_spark.queries import ORACLES, QUERIES

    fn = inspect.unwrap(QUERIES[name])
    text = inspect.getsource(fn) + "\n" + ORACLES.get(name, "")
    return hashlib.sha256(text.encode()).hexdigest()


def main() -> int:
    argv = sys.argv[1:]
    args, runs, warm, re_record, i = [], 3, 1, False, 0
    semantics_changed = None
    measurement_invalid = None
    cross_run_reuse = None
    while i < len(argv):
        a = argv[i]
        if a.startswith("--runs"):
            if "=" in a:
                runs = int(a.split("=", 1)[1])
            else:
                i += 1
                runs = int(argv[i])
        elif a.startswith("--warm"):
            if "=" in a:
                warm = int(a.split("=", 1)[1])
            else:
                i += 1
                warm = int(argv[i])
        elif a == "--re-record":
            re_record = True
        elif a.startswith("--semantics-changed"):
            if "=" in a:
                semantics_changed = a.split("=", 1)[1]
            else:
                i += 1
                semantics_changed = argv[i]
        elif a.startswith("--measurement-invalid"):
            if "=" in a:
                measurement_invalid = a.split("=", 1)[1]
            else:
                i += 1
                measurement_invalid = argv[i]
        elif a.startswith("--cross-run-reuse"):
            if "=" in a:
                cross_run_reuse = a.split("=", 1)[1]
            else:
                i += 1
                cross_run_reuse = argv[i]
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

    def head_commit() -> str:
        import subprocess

        try:
            out = subprocess.run(
                ["git", "-C", REPO, "rev-parse", "HEAD"],
                capture_output=True, text=True, timeout=30,
            )
            return out.stdout.strip() if out.returncode == 0 else "unknown"
        except (OSError, subprocess.SubprocessError):
            return "unknown"

    consumed = driver_consumed_keys()
    hashes = doc.setdefault("source_hashes", {})
    for name in args:
        existing = name in doc["queries"]
        cur_hash = query_source_hash(name)
        uses_run_persist = None
        if cross_run_reuse is not None:
            import inspect

            src = inspect.getsource(inspect.unwrap(QUERIES[name]))
            uses_run_persist = "run_persist(" in src
        action = check_mutation(
            name, existing, consumed, re_record,
            semantics_changed,
            measurement_invalid=measurement_invalid,
            frozen_value=doc["queries"].get(name),
            source_unchanged=(
                hashes.get(name) == cur_hash if name in hashes else None
            ),
            cross_run_reuse=cross_run_reuse,
            uses_run_persist=uses_run_persist,
        )
        if action == "skip":
            print(f"SKIP {name}: already recorded (baseline is frozen, "
                  "append-only; --re-record only before a driver run "
                  "consumes the key)", file=sys.stderr)
            continue
        if action == "invalidate":
            # freeze log: archive the stale value, never lose it
            reason = cross_run_reuse or measurement_invalid or semantics_changed
            doc.setdefault("invalidated", {})[name] = {
                "old_value": doc["queries"][name],
                "reason": reason,
                "kind": (
                    "recorded-with-cross-run-reuse" if cross_run_reuse
                    else "measurement" if measurement_invalid
                    else "semantics"
                ),
                "commit": head_commit(),
            }
            print(f"INVALIDATE {name}: archived old median "
                  f"{doc['queries'][name]} — {reason}",
                  file=sys.stderr)
        fn = QUERIES[name]
        for _ in range(warm):
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        times = []
        for _ in range(runs):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            times.append(round(time.perf_counter() - t0, 4))
        doc["queries"][name] = round(statistics.median(times), 4)
        hashes[name] = cur_hash
        print(f"{name}: {times} -> median {doc['queries'][name]}",
              file=sys.stderr)

    doc.setdefault("appended", {})
    with open(path, "w") as f:
        json.dump(doc, f, indent=1)
    print(f"wrote {path}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
