"""Partition sizing for exchanges that feed Python (Arrow) stages.

The r13 rule pinned every exchange feeding an ``applyInPandas`` /
``mapInPandas`` stage at ``spark.sql.shuffle.partitions`` outright,
because AQE's 64 MB advisory coalesce — sized for JVM shuffle economics
— starved the Python stage of parallelism (the whole NFA scan collapsed
onto 1-2 cores). That fixed the starvation but over-corrected on tiny
inputs: at sf0.1 on a 32-core local master the pin schedules 32
near-empty Python tasks, each paying worker dispatch + Arrow serde for a
few KB of rows (measured r14, 10-query batch CEP/MR sweep at sf0.1:
sp=8/16 -> 7.18s, sp=32 -> 7.9s, sp=4 -> 8.8s).

:func:`python_stage_partitions` keeps both ends honest by sizing the pin
from the plan's OWN estimate of the input: one Python task per
``PYTHON_STAGE_BYTES_PER_PARTITION`` of estimated input bytes, clamped to
``spark.sql.shuffle.partitions``. The floor (128 KiB) is the measured
point where per-task overhead (~10 ms dispatch + serde) stays an order
of magnitude below the Python compute on that slice; any real input
(one parquet row group is already 128 MB) blows past
``32 * 128 KiB`` instantly, so a cluster-sized conf still gets its full
width — only KB-scale inputs stop paying for empty tasks. When the
estimate is unavailable or meaningless (e.g. above a localCheckpoint,
which erases stats and reports Long.Max), the helper falls back to full
conf width — the safe direction for the Python stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

#: Estimated input bytes per Python task, for stages whose Python body is
#: VECTORIZED (numpy/pandas batch kernels — the NFA matchers, the PTF
#: apply). Measured at sf0.1 (estimates 0.8-1.5 MB): 8-16 partitions
#: minimize the 10-query batch CEP/MR family; 128 KiB/partition lands in
#: that band and reaches full conf width for any input above ~4 MB
#: estimated on a 32-wide conf (a single real row group exceeds it).
PYTHON_STAGE_BYTES_PER_PARTITION = 128 * 1024

#: Floor for stages whose Python body is PER-ROW (a Python loop or a
#: per-group pandas construction: the DataStream V2 process functions,
#: the UDTAF per-customer aggregate). Their per-byte cost is ~1-2 orders
#: of magnitude above the vectorized stages, so they saturate the
#: available width far earlier (measured at sf0.1, estimate ~1.1 MB:
#: udtaf_apply_in_pandas 2.98s at 32 partitions vs 6.9s at 9;
#: dsv2_keyed_process_agg 0.89s at 32 vs 1.54s at 12). 8 KiB/partition
#: keeps full width for anything above ~256 KB estimated while KB-scale
#: test inputs still skip the empty-task tax.
PYTHON_ROW_STAGE_BYTES_PER_PARTITION = 8 * 1024


def python_stage_partitions(
    df: DataFrame,
    bytes_per_partition: int = PYTHON_STAGE_BYTES_PER_PARTITION,
) -> int:
    """Partition count for the exchange feeding a Python stage over
    ``df``: ``clamp(est_bytes / bytes_per_partition, 1,
    spark.sql.shuffle.partitions)`` — full conf width as soon as the
    input is non-trivial, never 32 near-empty Python tasks on KB inputs,
    and full width again whenever the estimate is unknown."""
    sp = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    try:
        est = int(
            df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        )
    except Exception:
        return sp
    if est <= 0 or est >= (1 << 60):  # unknown / stat-erased plans
        return sp
    return max(1, min(sp, -(-est // bytes_per_partition)))
