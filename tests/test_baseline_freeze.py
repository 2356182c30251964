"""r10 (VERDICT r9 next-item #7): the BASELINE_BENCH freeze rule as
code — an existing baseline entry may be re-measured only with an
explicit --re-record flag AND only while no committed driver bench
artifact (BENCH_r*.json) has consumed the key (the cea0b67
adjudication, now pinned)."""

from __future__ import annotations

import json
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

from append_baseline import check_mutation, driver_consumed_keys  # noqa: E402


def test_new_key_appends():
    assert check_mutation("brand_new", False, {"old"}, False) == "append"
    assert check_mutation("brand_new", False, {"old"}, True) == "append"


def test_existing_key_skips_without_flag():
    assert check_mutation("q1", True, set(), False) == "skip"
    assert check_mutation("q1", True, {"q1"}, False) == "skip"


def test_re_record_allowed_only_before_driver_consumption():
    # same-round correction: key exists but no driver artifact saw it
    assert check_mutation("fresh", True, {"other"}, True) == "re-record"
    # consumed by a driver run -> immutable, loud error
    with pytest.raises(ValueError, match="FROZEN"):
        check_mutation("q1", True, {"q1"}, True)


def test_semantics_changed_invalidation_path():
    """r12 (VERDICT r11 what's-wrong #1): a semantic rework invalidates
    the frozen number — the old value is archived in the freeze log and
    re-recorded, even for consumed keys; the reason is mandatory."""
    # consumed key + reason -> invalidate (archive, then re-record)
    assert check_mutation(
        "q1", True, {"q1"}, False, "r11 reworked the quantifier window"
    ) == "invalidate"
    # empty reason -> loud reject (the reason IS the freeze-log entry)
    with pytest.raises(ValueError, match="non-empty reason"):
        check_mutation("q1", True, {"q1"}, False, "  ")
    # new keys still just append regardless
    assert check_mutation("new", False, {"q1"}, False, "why") == "append"
    # and the archive itself exists for the one invalidated entry
    with open(os.path.join(REPO, "BASELINE_BENCH.json")) as f:
        base = json.load(f)
    inv = base.get("invalidated", {})
    assert "cep_times_window_gaps" in inv
    assert inv["cep_times_window_gaps"]["old_value"] == 1.0186
    assert inv["cep_times_window_gaps"]["reason"].strip()


def test_semantics_changed_requires_source_change():
    """r13 (ADVICE r12 #3): a reason alone is not evidence — when the
    query's freeze-time source hash is recorded and UNCHANGED, the
    semantics-change invalidation is rejected (it would launder a plain
    regression)."""
    with pytest.raises(ValueError, match="UNCHANGED"):
        check_mutation(
            "q1", True, {"q1"}, False, "claimed rework",
            source_unchanged=True,
        )
    # hash differs -> the rework is real, invalidation proceeds
    assert check_mutation(
        "q1", True, {"q1"}, False, "real rework",
        source_unchanged=False,
    ) == "invalidate"
    # no recorded hash (pre-r13 freeze) -> cannot prove either way, allow
    assert check_mutation(
        "q1", True, {"q1"}, False, "pre-r13 entry",
        source_unchanged=None,
    ) == "invalidate"


def test_measurement_invalid_path_guarded_to_subsecond_floors():
    """r13 (VERDICT r12 what's-wrong #1): floor-recorded sub-second
    baselines may be re-frozen via --measurement-invalid; anything at or
    above 1.0s is rejected — that is not floor-artifact territory."""
    assert check_mutation(
        "win_tumble_agg", True, {"win_tumble_agg"}, False,
        measurement_invalid="floor-recorded baseline, load-dominated "
        "sub-second query", frozen_value=0.2885,
    ) == "invalidate"
    with pytest.raises(ValueError, match="sub-second"):
        check_mutation(
            "sim_semdedup", True, {"sim_semdedup"}, False,
            measurement_invalid="nope", frozen_value=3.2438,
        )
    with pytest.raises(ValueError, match="non-empty reason"):
        check_mutation(
            "win_tumble_agg", True, set(), False,
            measurement_invalid="  ", frozen_value=0.2885,
        )


def test_driver_consumed_keys_reads_committed_artifacts():
    keys = driver_consumed_keys(REPO)
    # the r9 driver bench consumed the shared-query set via
    # BENCH_DETAIL.json — the flagship and a long-standing CEP query
    # must therefore be immutable
    assert "q1_pricing_summary" in keys
    assert "mr_cross_define_last" in keys
    # and the full frozen set is now guarded end-to-end: re-recording
    # any consumed baseline raises
    with open(os.path.join(REPO, "BASELINE_BENCH.json")) as f:
        base = json.load(f)
    consumed_frozen = [k for k in base["queries"] if k in keys]
    assert consumed_frozen, "no consumed baseline keys found"
    with pytest.raises(ValueError, match="FROZEN"):
        check_mutation(consumed_frozen[0], True, keys, True)


def test_cross_run_reuse_path_requires_run_persist_evidence():
    """r14 (VERDICT r13 next-item #1): baselines recorded while bare
    .persist() calls served cached intermediates across runs may be
    re-frozen — but ONLY with evidence that the query actually routes
    through run_cache.run_persist; anything else would launder a plain
    regression through the invalidation path."""
    # evidenced -> invalidate (freeze-log entry)
    assert check_mutation(
        "sim_semdedup", True, {"sim_semdedup"}, False,
        cross_run_reuse="recorded with cross-run persist reuse (9ec80a8)",
        uses_run_persist=True,
    ) == "invalidate"
    # no run_persist call site -> rejected loudly
    with pytest.raises(ValueError, match="run_persist"):
        check_mutation(
            "sim_lsh_ann", True, {"sim_lsh_ann"}, False,
            cross_run_reuse="claimed without evidence",
            uses_run_persist=False,
        )
    # empty reason -> rejected
    with pytest.raises(ValueError, match="reason"):
        check_mutation(
            "sim_semdedup", True, set(), False,
            cross_run_reuse="  ", uses_run_persist=True,
        )
    # new keys still just append
    assert check_mutation(
        "brand_new", False, set(), False,
        cross_run_reuse="x", uses_run_persist=True,
    ) == "append"
