"""Key-group sizing config for the sharded stateful operators (SCALE.md
"Stateful key groups"): groups derive from cluster parallelism, are
overridable via spark.graft.stateful.keyGroups, results are INDEPENDENT of
the group count, and the per-group state budget fails loudly."""

from __future__ import annotations

import pytest

from apache_flink_spark.streaming import stateful as S


def test_default_is_checkpoint_stable_constant(spark):
    """The unpinned default must be machine-INDEPENDENT: the group count is
    baked into every checkpoint's shard layout, so deriving it from core
    count would silently mis-shard state restored on different hardware."""
    assert S.key_groups(spark) == S.KEY_GROUPS_DEFAULT == 128


def test_override_and_validation(spark):
    spark.conf.set("spark.graft.stateful.keyGroups", "7")
    try:
        assert S.key_groups(spark) == 7
        spark.conf.set("spark.graft.stateful.keyGroups", "0")
        with pytest.raises(ValueError, match="keyGroups"):
            S.key_groups(spark)
    finally:
        spark.conf.unset("spark.graft.stateful.keyGroups")


def test_budget_error_message():
    with pytest.raises(RuntimeError, match="maxGroupRows"):
        S._check_group_budget(11, 10, "op_under_test")
    S._check_group_budget(10, 10, "op_under_test")  # at budget: fine


@pytest.mark.parametrize("groups", ["3", "64"])
def test_temporal_join_group_count_invariant(spark, sf_dir, groups):
    """The temporal join must produce identical rows under any key-group
    count — sharding is an execution detail, not semantics."""
    from apache_flink_spark.queries import QUERIES

    def run():
        rows = QUERIES["stream_temporal_join"](spark, sf_dir).collect()
        return sorted(tuple(r) for r in rows)

    baseline = run()
    spark.conf.set("spark.graft.stateful.keyGroups", groups)
    try:
        assert run() == baseline
    finally:
        spark.conf.unset("spark.graft.stateful.keyGroups")


def test_dedup_ttl_group_count_invariant(spark, sf_dir):
    from apache_flink_spark.queries import QUERIES

    def run():
        rows = QUERIES["stream_dedup_state_ttl"](spark, sf_dir).collect()
        return sorted(tuple(r) for r in rows)

    baseline = run()
    spark.conf.set("spark.graft.stateful.keyGroups", "5")
    try:
        assert run() == baseline
    finally:
        spark.conf.unset("spark.graft.stateful.keyGroups")


def test_budget_guard_fires_in_running_query(spark, sf_dir):
    """End-to-end: an impossibly low per-group budget must abort the
    stateful temporal join with the sizing-guidance error, not OOM or
    silently truncate."""
    from apache_flink_spark.queries import QUERIES

    spark.conf.set("spark.graft.stateful.maxGroupRows", "1")
    try:
        with pytest.raises(Exception) as ei:
            QUERIES["stream_temporal_join"](spark, sf_dir).collect()
        assert "maxGroupRows" in str(ei.value)
    finally:
        spark.conf.unset("spark.graft.stateful.maxGroupRows")
