"""r13 — the flink-cep test-file accounting TAIL (VERDICT r12 missing
item #5): one accounting entry per remaining reference test file, with
the portable scenarios pinned. With this file, EVERY file under
flink-libraries/flink-cep/src/test has an accounting entry (the r12
standard); the SURVEY §2.9 table carries the summary.

  - nfa/NFAIterativeConditionTimeContextTest.java (2 tests):
    :42 testEventTimestamp PINNED below — ctx.timestamp() inside an
    IterativeCondition is, in this engine's model, the ORDER BY column
    itself (conditions reference it directly; same observable result).
    :67 testCurrentProcessingTime n/a — asserts against an injected
    TestTimerService's processing clock (harness internals; wall-clock
    conditions are inherently nondeterministic to pin).
  - nfa/compiler/NFACompilerTest.java (11 tests): 2 pinned below —
    :66 testNFACompilerUniquePatternName (duplicate pattern name is a
    loud reject) and :85 testNFACompilerPatternEndsWithNotFollowedBy
    (trailing notFollowedBy rejects on the compile path; the
    cep_select window-scan plan is the supported route, oracle-backed
    by cep_not_followed_by). The other 9 assert the compiled STATE
    GRAPH (state names/transition lists, state-copy counts, windowTime
    fields) — n/a: this engine compiles to MATCH_RECOGNIZE text +
    VM programs, not NFA state objects; the BEHAVIOR of every graph
    shape is pinned by the ported ITCase suites.
  - nfa/NFAStatusChangeITCase.java (3 tests): n/a — asserts the
    nfaChanged()/stateChanged bookkeeping flags that gate checkpoint
    writes (NFAState dirty tracking); no match-result assertions.
  - nfa/NFAStateAccessTest.java (2 tests): n/a — counts SharedBuffer
    accessor reads/writes through TestSharedBuffer; the same patterns'
    match RESULTS are covered by NFAITCase ports (r12).
  - nfa/DeweyNumberTest.java (2 tests): n/a — unit test of the Dewey
    version-number encoding (SharedBuffer pointer versioning); the
    engine tracks binds positionally, no Dewey numbers exist.
  - nfa/sharedbuffer/SharedBufferTest.java (6) +
    LockableTypeSerializerTest / LockableTypeSerializerUpgradeTest:
    n/a — SharedBuffer node refcounts, extract order internals, and
    Java serializer compatibility; the r12 NFAITCase accounting
    already carries the 5 state-layout n/a's of the same machinery.
  - NFASerializerUpgradeTest.java: n/a — Java serializer upgrade
    matrix; the engine's analog (cross-version state restore) is
    pinned by the 13 committed restore fixtures
    (tests/test_restore_compat.py).
  - operator/CEPOperatorTest (keyed-operator harness internals),
    CEPMigrationTest (old-Flink savepoint migration; restore fixtures
    are the analog), CEPRescalingTest (key-group rescaling — the
    engine's key-group sharding is pinned by tests/test_key_groups.py),
    CepRuntimeContextTest (RichFunction runtime context — Rich
    functions were declared n/a in the r12 CEPITCase accounting),
    CepProcessFunctionContextTest (PatternProcessFunction
    timestamps/side-output plumbing; the timeout side output surface
    is oracle-backed by cep_timeout_side_output): all n/a — operator
    harness internals with no portable match semantics beyond what the
    ITCase ports pin.
  - Event/SubEvent/utils/*: fixtures and harness helpers, not tests.
"""

from __future__ import annotations

import pytest

from apache_flink_spark.cep import CepError, Pattern, cep_select


def test_iterative_condition_event_timestamp(spark):
    """NFAIterativeConditionTimeContextTest.java:42 — a condition on
    ctx.timestamp(): the event at ts==3 matches, others do not. In this
    engine the event timestamp IS the order column."""
    S = 1_000_000
    rows = [(1, 1, 1 * S), (1, 2, 3 * S), (1, 3, 4 * S)]
    df = spark.createDataFrame(rows, "k long, event_id long, ep long")
    p = Pattern.begin("START").where(f"ep = {3 * S}")
    out = cep_select(
        spark, df, p, "k", "ep", {"eid": "LAST(START.event_id)"}
    )
    assert [r.eid for r in out.collect()] == [2]


def test_duplicate_pattern_name_rejects(spark):
    """NFACompilerTest.java:66 — duplicate pattern names are a loud
    MalformedPatternException in the reference; same here."""
    with pytest.raises(CepError, match="already used"):
        (Pattern.begin("start").where("a = 1")
         .followed_by("middle").where("a = 2")
         .followed_by("middle").where("a = 3"))


def test_trailing_not_followed_by_needs_window_scan(spark):
    """NFACompilerTest.java:85 — a pattern ENDING in notFollowedBy is
    rejected on the plain compile path ("NotFollowedBy is not supported
    as a last part of a Pattern!"); the within()-bounded form runs on
    the cep_select window-scan plan (oracle entry cep_not_followed_by)."""
    from apache_flink_spark.cep import pattern_to_match_recognize

    p = (Pattern.begin("A").where("x = 1")
         .not_followed_by("B").where("x = 2"))
    with pytest.raises(CepError, match="notFollowedBy"):
        pattern_to_match_recognize(p, "t", "k", "ep", {"a": "LAST(A.x)"})
