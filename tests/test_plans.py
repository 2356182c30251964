"""Physical-plan assertions — the 100 TB scale story, checked per plan.

The reference needs explicit planner rules for these (SURVEY.md §4.2);
Catalyst provides them, but only if the queries are phrased declaratively.
These tests pin that property so a refactor that silently breaks pushdown,
pruning, or broadcast selection fails CI — the local-mode analog of a 100 TB
regression.
"""

from __future__ import annotations

import pytest

from apache_flink_spark.queries import QUERIES


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized_plan(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    """q6 filters on shipdate/discount/quantity must reach the parquet scan
    as PushedFilters (reference: PushFilterIntoTableSourceScanRule)."""
    plan = _executed_plan(QUERIES["q6_forecast_revenue"](spark, sf_dir))
    assert "PushedFilters: [" in plan
    assert "l_shipdate" in plan.split("PushedFilters:")[1][:400]


def test_column_pruning_reaches_scan(spark, sf_dir):
    """q6 touches 4 of 11 lineitem columns; ReadSchema must show only those
    (reference: PushProjectIntoTableSourceScanRule)."""
    plan = _executed_plan(QUERIES["q6_forecast_revenue"](spark, sf_dir))
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_extendedprice" in read_schema
    assert "l_returnflag" not in read_schema, "scan reads unused columns"


def test_broadcast_join_for_small_dims(spark, sf_dir):
    """Dim tables under the broadcast threshold must plan as
    BroadcastHashJoin, never shuffling the fact side (reference: broadcast
    distribution via BatchPhysicalHashJoinRule)."""
    plan = _executed_plan(QUERIES["q5_local_supplier_volume"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan


def test_lookup_join_is_broadcast(spark, sf_dir):
    plan = _executed_plan(QUERIES["lookup_join_enrich"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan


def test_whole_stage_codegen_on_agg_path(spark, sf_dir):
    """The hot agg path must sit inside WholeStageCodegen spans (reference
    needs Janino codegen: HashAggCodeGenerator.scala; Spark: free)."""
    df = QUERIES["q1_pricing_summary"](spark, sf_dir)
    # AQE finalizes the plan only at execution; "*(n)" prefixes mark
    # WholeStageCodegen spans in the final plan string.
    df.collect()
    plan = _executed_plan(df)
    assert "isFinalPlan=true" in plan
    assert "*(" in plan, "no WholeStageCodegen span on the agg path"
    assert "HashAggregate" in plan


def test_topn_uses_window_group_limit(spark, sf_dir):
    """row_number<=N must push a group-limit below the sort (reference:
    FlinkLogicalRankRule -> rank-limit pushdown; Catalyst:
    InferWindowGroupLimit)."""
    plan = _optimized_plan(QUERIES["rank_topn_per_group"](spark, sf_dir))
    assert "WindowGroupLimit" in plan


def test_minhash_plan_has_single_signature_pass(spark, sf_dir):
    """The LSH banding must not re-execute the shingle subtree per band:
    exactly one Generate (shingle explode) pair in the whole plan."""
    plan = _executed_plan(QUERIES["dedup_minhash_lsh"](spark, sf_dir))
    # The plan has three DIFFERENT explodes (shingles -> bands -> pairs),
    # each once; the regression guarded against is the SHINGLE explode
    # appearing multiple times (band-per-arm union / self-join shapes).
    assert plan.count("array_distinct(transform(sequence") == 1, (
        "band fan-out re-executes the shingle explode"
    )


def test_partition_pruning_on_partitioned_sink(spark, sf_dir, tmp_path):
    """Reading one partition of a partitioned write must prune directories
    (reference: PushPartitionIntoTableSourceScanRule / dynamic pruning)."""
    li = QUERIES["q1_pricing_summary"]  # noqa: F841 — warm catalog
    from apache_flink_spark.catalog import table
    from pyspark.sql import functions as F

    df = table(spark, sf_dir, "lineitem").select("l_returnflag", "l_quantity")
    out = str(tmp_path / "part")
    df.write.partitionBy("l_returnflag").mode("overwrite").parquet(out)
    back = spark.read.parquet(out).filter(F.col("l_returnflag") == "R")
    plan = _executed_plan(back)
    assert "PartitionFilters: [isnotnull(l_returnflag" in plan


@pytest.mark.parametrize(
    "name",
    [
        "q1_pricing_summary",
        "q3_shipping_priority",
        "fn_string_basics",
        "text_quality_score",
        "win_tumble_agg",
    ],
)
def test_no_python_udfs_on_builtin_surface(spark, sf_dir, name):
    """Everything claiming to be built-in must stay JVM-side: no
    BatchEvalPython / ArrowEvalPython nodes in those plans."""
    plan = _executed_plan(QUERIES[name](spark, sf_dir))
    assert "EvalPython" not in plan


def test_q21_self_joins_survive_no_broadcast(spark, sf_dir):
    """q21 at 100 TB cannot broadcast the fact table: with broadcast
    planning disabled (simulating fact-scale sizes) every remaining join
    must fall back to SortMergeJoin — never a nested-loop or a fact-side
    broadcast. r8: the EXISTS/NOT-EXISTS self-joins fused into one
    per-(order, supplier) aggregation + window, so the plan now has TWO
    joins (orders, supplier) and ONE lineitem scan instead of four
    self-joins over three scans."""
    import re

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _executed_plan(QUERIES["q21_sole_blame_supplier"](spark, sf_dir))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    # the orders (fact-fact) join must shuffle; the supplier join stays
    # broadcast BY EXPLICIT HINT (a dimension side — the hint correctly
    # overrides the disabled threshold)
    assert plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin") >= 1
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert len(re.findall(r"FileScan parquet.*lineitem", plan)) == 1


def test_embedding_neardup_is_equijoin(spark, sf_dir):
    """sim_embedding_neardup's candidate generation must be a banded-LSH
    EQUI-join — an all-pairs theta join (BroadcastNestedLoopJoin /
    CartesianProduct) is O(n^2) at corpus scale and is the exact r1
    perf-weak finding this pins against."""
    plan = _executed_plan(QUERIES["sim_embedding_neardup"](spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_q2_correlated_min_decorrelates(spark, sf_dir):
    """q2's correlated MIN subquery must rewrite to aggregate + join
    (Catalyst decorrelation; reference: FlinkSubQueryRemoveRule) — a
    per-row scalar subquery would re-scan lineitem once per part row."""
    opt = _optimized_plan(QUERIES["q2_min_cost_supplier"](spark, sf_dir))
    assert "scalar-subquery" not in opt.lower()
    assert "Join" in opt and "Aggregate" in opt


def test_pii_scrub_prunes_to_two_columns(spark, sf_dir):
    """text_pii_scrub touches doc_id+text only; the scan must not read the
    lang/source/n_chars columns (narrow map stage at 100 TB)."""
    plan = _executed_plan(QUERIES["text_pii_scrub"](spark, sf_dir))
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "doc_id" in read_schema and "text" in read_schema
    assert "n_chars" not in read_schema and "lang" not in read_schema


def test_epoch_shuffle_has_no_global_sort(spark, sf_dir):
    """pipeline_epoch_shuffle orders WITHIN hash-partitioned shards — a
    range-partitioned global sort would serialize the corpus through one
    ordering at 100 TB."""
    plan = _executed_plan(QUERIES["pipeline_epoch_shuffle"](spark, sf_dir))
    assert "rangepartitioning" not in plan.lower()
    assert "hashpartitioning" in plan.lower()


def test_length_buckets_partial_aggregation(spark, sf_dir):
    """pipeline_length_buckets must map-side combine before the bucket
    shuffle (two HashAggregate phases), so the exchange carries one row per
    (partition, bucket), not per document."""
    plan = _executed_plan(QUERIES["pipeline_length_buckets"](spark, sf_dir))
    assert plan.count("HashAggregate") >= 2


def test_q70_single_fact_scan_and_tiny_expand(spark, sf_dir):
    """r13 optimization pin: ds_q70's executed form pre-aggregates the
    lineitem x supplier join per s_nationkey ONCE (localCheckpoint), so
    (a) its result is bit-identical to the reference two-scan SQL the
    oracle runs, and (b) the main plan's ROLLUP Expand consumes the
    25-row partial table (Scan ExistingRDD), not the raw fact table —
    one lineitem scan per execution instead of two, Expand over rows
    proportional to |nation| at any scale."""
    from apache_flink_spark.queries.tpcds_shapes import _sql
    from apache_flink_spark.queries.tpcds_shapes2 import _DS_Q70

    new = QUERIES["ds_q70_rollup_rank_within_parent"](spark, sf_dir)
    old = _sql(spark, sf_dir, _DS_Q70)
    assert [f.simpleString() for f in new.schema.fields] == [
        f.simpleString() for f in old.schema.fields
    ]
    got = sorted(map(tuple, new.collect()))
    want = sorted(map(tuple, old.collect()))
    assert got == want and len(got) > 0

    plan = _executed_plan(new)
    # the main query reads only the checkpointed partials + dim tables:
    # no lineitem scan may remain above the checkpoint
    assert "ExistingRDD" in plan
    assert "lineitem" not in plan


def test_python_stage_partitions_size_derived(spark):
    """r14 optimization pin (VERDICT r13 #3): the exchange feeding a
    Python stage is sized from the input's estimate with a
    bytes-per-partition floor — KB-scale inputs stop paying near-empty
    Python tasks, while any non-trivial input still reaches the full
    conf width (cluster-sized in deployment)."""
    from apache_flink_spark.parallelism import (
        PYTHON_STAGE_BYTES_PER_PARTITION,
        python_stage_partitions,
    )

    sp = int(spark.conf.get("spark.sql.shuffle.partitions"))
    # LongType range: 8 bytes/row estimate. Large input -> full width.
    big = spark.range(sp * PYTHON_STAGE_BYTES_PER_PARTITION)  # >= sp*floor bytes
    assert python_stage_partitions(big) == sp
    # KB-scale input -> a small partition count, never zero.
    small = spark.range(100)
    n_small = python_stage_partitions(small)
    assert 1 <= n_small < sp
    # Stat-erased plans (localCheckpoint) fall back to full width: the
    # safe direction for a Python stage.
    ck = spark.range(10).localCheckpoint(eager=True)
    assert python_stage_partitions(ck) in (sp, 1)  # ExistingRDD may report tiny or unknown
