"""Capture .explain("formatted") for bench headline queries.

Usage: python scripts/capture_plans.py <tag> [name_substr_filter...]
Writes plans/$SPARK_GRAFT_PLANS_ROUND/<query>_<tag>.txt (default r14) for
every non-streaming headline query
(streaming queries execute on construction — their micro-batch plans are
captured separately when touched).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    tag = sys.argv[1]
    filters = sys.argv[2:]
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "plans", os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r14"))
    os.makedirs(out_dir, exist_ok=True)

    from apache_flink_spark.queries import QUERIES
    from apache_flink_spark.queries.registry import STREAMING
    from apache_flink_spark.session import get_spark
    from bench import HEADLINE

    spark = get_spark(app_name="capture_plans")
    done = skipped = 0
    for name in HEADLINE:
        if filters and not any(f in name for f in filters):
            continue
        fn = QUERIES.get(name)
        if fn is None:
            continue
        if name in STREAMING:
            skipped += 1
            continue
        try:
            df = fn(spark, SF_DIR)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as exc:  # noqa: BLE001
            plan = f"ERROR capturing plan: {exc}"
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as f:
            f.write(plan)
        done += 1
    print(f"captured {done} plans ({skipped} streaming skipped) -> {out_dir}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
