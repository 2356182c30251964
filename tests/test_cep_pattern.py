"""CEP Pattern API (flink-cep Pattern.java parity) — builder, compile to
MATCH_RECOGNIZE, negative patterns, quantifiers, guards."""

from __future__ import annotations

import pytest

from apache_flink_spark.cep import (
    CepError,
    Pattern,
    cep_select,
    pattern_to_match_recognize,
)

MEAS = {"a_id": "LAST(A.event_id)"}


@pytest.fixture()
def events(spark):
    return spark.createDataFrame(
        [
            (1, 1, "click", 100), (1, 2, "view", 200),
            (1, 3, "purchase", 300),
            (2, 4, "click", 100), (2, 5, "error", 150),
            (2, 6, "purchase", 300),
            (3, 7, "click", 100), (3, 8, "view", 200),
        ],
        "user_id long, event_id long, event_type string, ep long",
    )


def test_middle_not_followed_by_kills_match(spark, events):
    p = (
        Pattern.begin("A").where("event_type = 'click'")
        .not_followed_by("N").where("event_type = 'error'")
        .followed_by("C").where("event_type = 'purchase'")
    )
    out = cep_select(
        spark, events, p, "user_id", "ep",
        {"a_id": "LAST(A.event_id)", "c_id": "LAST(C.event_id)"},
    )
    assert sorted((r.user_id, r.a_id, r.c_id) for r in out.collect()) == [
        (1, 1, 3)
    ]


def test_followed_by_skips_intervening_rows(spark, events):
    p = (
        Pattern.begin("A").where("event_type = 'click'")
        .followed_by("C").where("event_type = 'purchase'")
    )
    out = cep_select(
        spark, events, p, "user_id", "ep",
        {"a_id": "LAST(A.event_id)", "c_id": "LAST(C.event_id)"},
    )
    # u2's error between click and purchase does NOT kill a plain followedBy
    assert sorted((r.user_id, r.a_id, r.c_id) for r in out.collect()) == [
        (1, 1, 3), (2, 4, 6)
    ]


def test_next_requires_adjacency(spark, events):
    p = (
        Pattern.begin("A").where("event_type = 'click'")
        .next("C").where("event_type = 'purchase'")
    )
    out = cep_select(
        spark, events, p, "user_id", "ep", {"c_id": "LAST(C.event_id)"}
    )
    assert out.count() == 0  # no user has purchase immediately after click


def test_trailing_not_followed_by_window_plan(spark, events):
    p = (
        Pattern.begin("A").where("event_type = 'click'")
        .not_followed_by("B").where("event_type = 'purchase'")
        .within(1, "minutes")
    )
    out = cep_select(
        spark, events, p, "user_id", "ep", {"click_id": "A.event_id"}
    )
    assert sorted((r.user_id, r.click_id) for r in out.collect()) == [(3, 7)]
    # plan: single window scan, no join
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan


def test_quantifiers_compile(spark):
    df = spark.createDataFrame(
        [(1, i, "up" if i < 4 else "down", i * 10) for i in range(1, 7)],
        "k long, event_id long, event_type string, ep long",
    )
    p = (
        Pattern.begin("U").where("event_type = 'up'").times(2, 3)
        .followed_by("D").where("event_type = 'down'")
    )
    stmt = pattern_to_match_recognize(
        p, "t", "k", "ep", {"n_up": "COUNT(U.*)"}
    )
    # r8: the DEFAULT internal contiguity is RELAXED (Quantifier.java:49
    # SKIP_TILL_NEXT) — the bounded loop compiles to gap-interleaved
    # repetitions; consecutive() restores the strict repetition
    assert "U (G0*? U){1,2}" in stmt
    out = cep_select(spark, df, p, "k", "ep", {"n_up": "COUNT(U.*)"})
    assert out.count() > 0
    p_strict = (
        Pattern.begin("U").where("event_type = 'up'").times(2, 3)
        .consecutive()
        .followed_by("D").where("event_type = 'down'")
    )
    stmt_strict = pattern_to_match_recognize(
        p_strict, "t", "k", "ep", {"n_up": "COUNT(U.*)"}
    )
    assert "U{2,3} G0*? D" in stmt_strict


def test_guards(spark):
    with pytest.raises(CepError, match="identifier"):
        Pattern.begin("not a name")
    with pytest.raises(CepError, match="already used"):
        Pattern.begin("A").followed_by("a")
    # r10: notNext after a LOOP is supported (the guard applies to every
    # take, reference NotPatternITCase:447); after an OPTIONAL it keeps
    # the reference's own reject (Pattern.java notNext)
    with pytest.raises(CepError, match="OPTIONAL"):
        Pattern.begin("A").optional().not_next("B")
    Pattern.begin("A").one_or_more().not_next("B")  # allowed now
    with pytest.raises(CepError, match="cannot follow another negative"):
        Pattern.begin("A").not_followed_by("N").not_next("B")
    with pytest.raises(CepError, match="quantifiers on negative"):
        Pattern.begin("A").not_followed_by("B").one_or_more()
    with pytest.raises(CepError, match="quantifiers on negative"):
        Pattern.begin("A").not_next("B").optional()
    p = Pattern.begin("A").not_followed_by("B").where("x = 1")
    with pytest.raises(CepError, match="requires"):
        # trailing notFollowedBy without within()
        cep_select(None, None, p, "k", "ep", MEAS)
    p2 = (
        Pattern.begin("A").not_followed_by("B").where("x = 1").next("C")
    )
    with pytest.raises(CepError, match="followedBy"):
        pattern_to_match_recognize(p2, "t", "k", "ep", MEAS)


def test_iterative_condition_via_binds(spark):
    """flink-cep IterativeCondition parity: a where() condition may
    reference LAST/FIRST of an earlier pattern variable — it compiles to
    a cross-variable DEFINE evaluated by the MR bind-tracking NFA."""
    df = spark.createDataFrame(
        [
            (1, 1, "start", 10, 100), (1, 2, "grow", 15, 200),
            (1, 3, "grow", 12, 300),
            (2, 4, "start", 10, 100), (2, 5, "grow", 5, 200),
        ],
        "k long, event_id long, event_type string, v long, ep long",
    )
    p = (
        Pattern.begin("A").where("event_type = 'start'")
        .followed_by("B").where("event_type = 'grow' AND B.v > LAST(A.v)")
    )
    out = cep_select(
        spark, df, p, "k", "ep",
        {"a_id": "LAST(A.event_id)", "b_id": "LAST(B.event_id)"},
    )
    # k=1: grow 15 > start 10 matches (event 2); k=2: 5 < 10 -> no match
    assert sorted((r.k, r.a_id, r.b_id) for r in out.collect()) == [(1, 1, 2)]


def test_consecutive_until_subtype_surface(spark):
    """Pattern.java long tail: consecutive() is the active default
    (MR repetitions are strict), until() strengthens the loop predicate,
    allowCombinations/subtype error loudly."""
    df = spark.createDataFrame(
        [(1, i, v, i * 10) for i, v in enumerate([1, 2, 3, 99, 4], 1)],
        "k long, event_id long, v long, ep long",
    )
    p = (
        Pattern.begin("U").where("v < 50").one_or_more().consecutive()
        .until("v > 90")
    )
    out = cep_select(
        spark, df, p, "k", "ep",
        {"n": "COUNT(U.*)", "last_id": "LAST(U.event_id)"},
    )
    # greedy run 1,2,3 stops before 99 (until) — longest match first
    rows = sorted((r.n, r.last_id) for r in out.collect())
    assert rows[-1] == (3, 3)
    # allowCombinations (r9): supported on BOUNDED loops; strict/greedy
    # conflicts and unbounded no-horizon forms still error loudly
    with pytest.raises(CepError, match="consecutive"):
        Pattern.begin("A").one_or_more().consecutive().allow_combinations()
    with pytest.raises(CepError, match="needs a preceding"):
        Pattern.begin("A").allow_combinations()
    from apache_flink_spark.cep import pattern_to_match_recognize

    with pytest.raises(CepError, match="UNBOUNDED"):
        pattern_to_match_recognize(
            Pattern.begin("A").where("v > 0").one_or_more()
            .allow_combinations(),
            "t", "k", "ep", {"n": "COUNT(A.*)"},
        )
    with pytest.raises(CepError, match="subtype"):
        Pattern.begin("A").subtype(object)
    with pytest.raises(CepError, match="until"):
        Pattern.begin("A").until("v > 1")


def test_optional_on_looping_quantifier(spark):
    """Pattern.java optional() on TOP of times/oneOrMore (the OPTIONAL
    quantifier property on a looping state): zero occurrences OR the
    whole loop — r8."""
    from apache_flink_spark.cep import pattern_to_match_recognize

    p = (
        Pattern.begin("s").where("kind='s'")
        .followed_by("a").where("kind='a'").times(2).optional()
        .followed_by("b").where("kind='b'")
    )
    stmt = pattern_to_match_recognize(
        p, "t", "k", "ts", {"na": "COUNT(a.*)"}
    )
    # r10: the element's leading relaxed gap sits INSIDE the optional
    # (skipping the element skips its ignore edge too — GroupITCase
    # testFollowedByOptionalGroupPattern)
    assert "( G0*? ( a (G1*? a){1} ) )?" in stmt
    rows = [
        (1, 1, "s", 0), (1, 2, "a", 1), (1, 3, "a", 2), (1, 4, "b", 3),
        (2, 1, "s", 0), (2, 2, "b", 1),
    ]
    df = spark.createDataFrame(rows, "k int, ts bigint, kind string, v int")
    got = sorted(
        (r.k, r.na)
        for r in cep_select(
            spark, df, p, "k", "ts", {"na": "COUNT(a.*)"}
        ).collect()
    )
    # r9: reference default emission — the optional loop branches into
    # BOTH the zero-occurrence match and the loop match per start
    # (NFAITCase testTimesNonStrictOptional2: [start, end] is emitted
    # alongside the times variants)
    assert got == [(1, 0), (1, 2), (2, 0)]
    with pytest.raises(CepError, match="already optional"):
        Pattern.begin("a").times(2).optional().optional()


def test_greedy_is_the_default_and_pins(spark):
    p = Pattern.begin("a").where("kind='a'").one_or_more().greedy()
    assert p is not None
    with pytest.raises(CepError, match="needs a preceding quantifier"):
        Pattern.begin("a").greedy()
    with pytest.raises(CepError, match="already reluctant"):
        Pattern.begin("a").one_or_more().reluctant().greedy()


def test_relaxed_loop_respects_within_horizon(spark):
    """r8 interaction pin: the relaxed (SKIP_TILL_NEXT) loop's gap rows
    still count against the within() horizon — a later qualifying row
    OUTSIDE the horizon must not join the loop (the VM's WITHIN limit
    applies to gap-interleaved repetitions exactly like flat patterns)."""
    rows = [
        # ep in MICROS; horizon = 1 minute = 60_000_000 us
        (1, 0, "a"), (1, 10_000_000, "x"), (1, 20_000_000, "a"),
        (1, 120_000_000, "a"),  # outside the 1-min horizon of ep=0
        (1, 130_000_000, "b"),
    ]
    df = spark.createDataFrame(rows, "k long, ep long, kind string")
    p = (
        Pattern.begin("A").where("kind = 'a'").one_or_more()
        .followed_by("B").where("kind = 'b'")
        .within(1, "minutes")
    )
    out = cep_select(
        spark, df, p, "k", "ep",
        {"n_a": "COUNT(A.*)", "first_ep": "FIRST(A.ep)"},
    ).collect()
    got = sorted((r.n_a, r.first_ep) for r in out)
    # from ep=0: only the two a's inside [0, 60s] can loop, and B at 130s
    # is outside the horizon -> NO match from 0 or 20s; from ep=120s the
    # single a + b at 130s matches within ITS horizon.
    assert got == [(1, 120_000_000)]


def test_nfaitcase_one_or_more_scenarios(spark):
    """Pin the reference's canonical oneOrMore emission scenarios
    (flink-libraries/flink-cep NFAITCase.java:1846-1952 testOneOrMore):
    input [c, d, a, a, a, d, a, b] under the three consuming strategies
    plus the greedy()/reluctant() pins and testBeginWithZeroOrMore."""
    from collections import Counter

    from apache_flink_spark.cep import cep_select

    rows = [
        (1, 1, "c", 10), (1, 2, "d", 20), (1, 3, "a", 30), (1, 4, "a", 40),
        (1, 5, "a", 50), (1, 6, "d", 60), (1, 7, "a", 70), (1, 8, "b", 80),
    ]
    df = spark.createDataFrame(
        rows, "k long, event_id long, kind string, ep long"
    )
    meas = {
        "n_a": "COUNT(middle.*)",
        "first_a": "FIRST(middle.event_id)",
        "last_a": "LAST(middle.event_id)",
        "end_id": "LAST(end1.event_id)",
    }

    def run(p, counter=False):
        got = [
            tuple(r[c] for c in meas)
            for r in cep_select(spark, df, p, "k", "ep", meas).collect()
        ]
        return Counter(got) if counter else sorted(got)

    def base():
        return (
            Pattern.begin("start").where("kind = 'c'")
            .followed_by("middle").where("kind = 'a'")
        )

    # SKIP_TILL_NEXT default: every loop prefix (4 matches)
    assert run(
        base().one_or_more().followed_by("end1").where("kind = 'b'")
    ) == [(1, 3, 3, 8), (2, 3, 4, 8), (3, 3, 5, 8), (4, 3, 7, 8)]
    # STRICT (consecutive): prefixes of the adjacent run (3 matches)
    assert run(
        base().one_or_more().consecutive()
        .followed_by("end1").where("kind = 'b'")
    ) == [(1, 3, 3, 8), (2, 3, 4, 8), (3, 3, 5, 8)]
    # SKIP_TILL_ANY (allowCombinations): every subset anchored at the
    # first take — 8 matches, two distinct subsets sharing measures
    assert run(
        base().one_or_more().allow_combinations()
        .followed_by("end1").where("kind = 'b'").within(1, "hours"),
        counter=True,
    ) == Counter({
        (1, 3, 3, 8): 1, (2, 3, 4, 8): 1, (2, 3, 5, 8): 1,
        (2, 3, 7, 8): 1, (3, 3, 5, 8): 1, (3, 3, 7, 8): 2,
        (4, 3, 7, 8): 1,
    })
    # greedy(): maximal-only; reluctant(): minimal-only
    assert run(
        base().one_or_more().greedy()
        .followed_by("end1").where("kind = 'b'")
    ) == [(4, 3, 7, 8)]
    assert run(
        base().one_or_more().reluctant()
        .followed_by("end1").where("kind = 'b'")
    ) == [(1, 3, 3, 8)]

    # testBeginWithZeroOrMore: [a a a b] -> 7 matches incl. [b] ONCE
    rows2 = [
        (1, 1, "a", 10), (1, 2, "a", 20), (1, 3, "a", 30), (1, 4, "b", 40),
    ]
    df2 = spark.createDataFrame(
        rows2, "k long, event_id long, kind string, ep long"
    )
    p2 = (
        Pattern.begin("middle").where("kind = 'a'").one_or_more()
        .optional()
        .followed_by("end").where("kind = 'b'")
    )
    m2 = {
        "n_a": "COUNT(middle.*)",
        "first_a": "FIRST(middle.event_id)",
        "end_id": "LAST(end.event_id)",
    }
    got = sorted(
        tuple(r[c] for c in m2)
        for r in cep_select(spark, df2, p2, "k", "ep", m2).collect()
    )
    assert got == [
        (0, None, 4),
        (1, 1, 4), (1, 2, 4), (1, 3, 4),
        (2, 1, 4), (2, 2, 4),
        (3, 1, 4),
    ]


def test_group_pattern_default_quantifier_enumerates(spark):
    """r9: a GroupPattern with a RANGE quantifier under the default
    emission branches per repetition count — (click fb purchase)
    times(1,2) emits BOTH the 1-rep and the 2-rep match per start
    (group-level enum splits on the VM); greedy() pins the maximal."""
    rows = [
        (1, 1, "click", 10), (1, 2, "purchase", 20),
        (1, 3, "click", 30), (1, 4, "purchase", 40),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, event_type string, ep long"
    )
    inner = (
        Pattern.begin("A").where("event_type = 'click'")
        .followed_by("B").where("event_type = 'purchase'")
    )
    meas = {
        "n_b": "COUNT(B.*)",
        "first_a": "FIRST(A.event_id)",
        "last_b": "LAST(B.event_id)",
    }

    def run(p):
        return sorted(
            tuple(r[c] for c in meas)
            for r in cep_select(
                spark, df, p, "user_id", "ep", meas
            ).collect()
        )

    assert run(Pattern.begin(inner).times(1, 2)) == [
        (1, 1, 2),   # one repetition from click 1
        (1, 3, 4),   # one repetition from click 3
        (2, 1, 4),   # two repetitions from click 1
    ]
    assert run(Pattern.begin(inner).times(1, 2).greedy()) == [
        (1, 3, 4),   # start 3 has only the 1-rep maximal
        (2, 1, 4),   # start 1: maximal only
    ]


def test_followed_by_any_branches(spark):
    """Pattern.java followedByAny (r9 — NFAITCase.java:565
    testBranchingPattern): SKIP_TILL_ANY between elements branches into
    EVERY later qualifying row — 3 middles x 2 nexts x 1 end = 6
    matches; plain followedBy over the same rows takes the FIRST next
    qualifying row only."""
    rows = [
        (1, 40, "start", 0.0, 1), (1, 41, "mid", 10.0, 3),
        (1, 42, "mid", 10.0, 4), (1, 43, "mid", 10.0, 5),
        (1, 44, "next", 2.0, 6), (1, 45, "next", 2.0, 7),
        (1, 46, "end", 1.0, 8),
    ]
    df = spark.createDataFrame(
        rows, "k long, event_id long, kind string, v double, ep long"
    )
    meas = {
        "m_id": "LAST(M.event_id)",
        "n_id": "LAST(N.event_id)",
        "e_id": "LAST(E.event_id)",
    }
    p_any = (
        Pattern.begin("S").where("kind = 'start'")
        .followed_by_any("M").where("kind = 'mid' AND v > 5.0")
        .followed_by_any("N").where("kind = 'next'")
        .followed_by_any("E").where("kind = 'end'")
    )
    got = sorted(
        tuple(r[c] for c in meas)
        for r in cep_select(spark, df, p_any, "k", "ep", meas).collect()
    )
    assert got == [
        (41, 44, 46), (41, 45, 46), (42, 44, 46),
        (42, 45, 46), (43, 44, 46), (43, 45, 46),
    ], got
    p_next = (
        Pattern.begin("S").where("kind = 'start'")
        .followed_by("M").where("kind = 'mid' AND v > 5.0")
        .followed_by("N").where("kind = 'next'")
        .followed_by("E").where("kind = 'end'")
    )
    got2 = sorted(
        tuple(r[c] for c in meas)
        for r in cep_select(spark, df, p_next, "k", "ep", meas).collect()
    )
    assert got2 == [(41, 44, 46)], got2


def test_not_next_decimal_literal(spark):
    """r9 ADVICE: a notNext condition containing a decimal literal
    ('amount > 1.5') is NOT a qualified name — the dotted-identifier
    guard must not fire on number-adjacent dots."""
    df = spark.createDataFrame(
        [
            (1, 1, "a", 1.0, 100), (1, 2, "b", 1.2, 200),
            (2, 3, "a", 1.0, 100), (2, 4, "b", 9.9, 200),
        ],
        "k long, event_id long, kind string, amount double, ep long",
    )
    p = (
        Pattern.begin("A").where("kind = 'a'")
        .not_next("N").where("kind = 'b' AND amount > 1.5")
    )
    out = cep_select(spark, df, p, "k", "ep", {"a_id": "LAST(A.event_id)"})
    # k=2's physically-next row has amount 9.9 > 1.5 -> killed
    assert sorted(r.a_id for r in out.collect()) == [1]
    # qualified names still reject loudly
    p_bad = (
        Pattern.begin("A").where("kind = 'a'")
        .not_next("N").where("N.amount > 1.5")
    )
    with pytest.raises(CepError, match="bare column names"):
        cep_select(spark, df, p_bad, "k", "ep", {"a_id": "LAST(A.event_id)"})


def test_greedy_inner_loop_in_enumerable_group(spark):
    """r9 ADVICE: a greedy()-pinned inner loop inside an ENUMERABLE group
    quantifier stays maximal-only — enum-flagging is tracked per
    variable, and pinned inner variables are excluded."""
    df = spark.createDataFrame(
        [(1, 10, 1, 100), (1, 11, 2, 200), (1, 12, 2, 300)],
        "k long, event_id long, kind long, ep long",
    )
    inner = (
        Pattern.begin("A").where("kind = 1")
        .next("B").where("kind = 2").one_or_more().greedy()
    )
    p = Pattern.begin(inner).one_or_more()  # outer: enumerable default
    out = cep_select(
        spark, df, p, "k", "ep",
        {"a_id": "FIRST(A.event_id)", "n_b": "COUNT(B.*)"},
    )
    # inner B+ greedy -> ONLY the maximal take (n_b=2); without the
    # per-variable exclusion the outer enum flag leaked onto B and the
    # non-maximal prefix (n_b=1) was emitted too
    assert sorted((r.a_id, r.n_b) for r in out.collect()) == [(10, 2)]
    # a group whose inner variables are ALL pinned cannot carry the
    # enum flag anywhere -> loud reject
    inner2 = Pattern.begin("C").where("kind = 1").one_or_more().greedy()
    p2 = Pattern.begin(inner2).one_or_more()
    with pytest.raises(CepError, match="pin the group itself"):
        cep_select(spark, df, p2, "k", "ep", {"c_id": "FIRST(C.event_id)"})


S = 1_000_000  # one second in micros


def test_within_previous_and_current_nfaitcase(spark):
    """NFAITCase.java:317 testSimplePatternWithTimeWindowNFAWithinPrevious-
    AndCurrent, ms scaled to seconds: start1@1 start2@2 middle@3 foobar@4
    end@11 end2@13, within(9, PREVIOUS_AND_CURRENT) declared after the
    last element — end@11 completes both starts (gap middle->end 8 < 9),
    end@13 is pruned (gap 10 >= 9; NFA.isStateTimedOut prunes at >=)."""
    rows = [
        (1, 1, "start", 1 * S), (1, 2, "start", 2 * S),
        (1, 3, "middle", 3 * S), (1, 4, "foobar", 4 * S),
        (1, 5, "end", 11 * S), (1, 6, "end", 13 * S),
    ]
    df = spark.createDataFrame(
        rows, "k long, event_id long, name string, ep long"
    )
    p = (
        Pattern.begin("S").where("name = 'start'")
        .followed_by("M").where("name = 'middle'")
        .followed_by("E").where("name = 'end'")
        .within(9, "seconds", within_type="PREVIOUS_AND_CURRENT")
    )
    out = cep_select(
        spark, df, p, "k", "ep",
        {"s_id": "FIRST(S.event_id)", "m_id": "LAST(M.event_id)",
         "e_id": "LAST(E.event_id)"},
    )
    got = sorted((r.s_id, r.m_id, r.e_id) for r in out.collect())
    assert got == [(1, 3, 5), (2, 3, 5)], got


def test_quantifier_window_take_chain_and_boundary(spark):
    """Quantifier window — r11 REFERENCE-EXACT semantics (replaces the
    r10 all-consecutive-gaps reading, which the parameterized
    TimesRangeITCase/TimesOrMoreITCase suites refuted): Times.windowTime
    rides the state-name-keyed windowTimes map and only DELIMITED take
    states get an entry (NFACompiler createState:435 +
    NFAStateNameHandler.getUniqueInternalName — the FIRST-created state,
    which is the loop's LAST position, keeps the undelimited base
    name), and the window prunes only while the computation WAITS AT
    the bounded state (an optional position's ignore twin is
    unbounded). Consequences pinned here:

    1. oneOrMore(window) at the pattern HEAD is fully inert: position 1
       has no previous element and positions 2+ sit at the undelimited
       looping state.
    2. the ENTRY gap (previous element's take -> first loop take) IS
       bounded, strict < (isStateTimedOut prunes at >=).
    3. for timesOrMore(2, window), take 2 is bounded vs take 1 through
       ignores; takes 3+ are unbounded."""
    rows = [
        (1, 1, "c", 0 * S), (1, 2, "v", 2 * S), (1, 3, "c", 5 * S),
        (1, 4, "c", 8 * S), (1, 5, "v", 9 * S), (1, 6, "c", 30 * S),
        (1, 7, "p", 31 * S),
    ]
    df = spark.createDataFrame(
        rows, "k long, event_id long, kind string, ep long"
    )
    meas = {"first_a": "FIRST(A.event_id)", "last_a": "LAST(A.event_id)",
            "n_a": "COUNT(A.*)"}

    def run(p, d=df):
        out = cep_select(spark, d, p, "k", "ep", meas)
        return sorted(
            (r.first_a, r.last_a, r.n_a) for r in out.collect()
        )

    # (1) head oneOrMore window is inert — identical to no window
    p_w = (Pattern.begin("A").where("kind = 'c'")
           .one_or_more(window=(10, "seconds"))
           .followed_by("B").where("kind = 'p'")
           .within(60, "seconds"))
    p_nw = (Pattern.begin("A").where("kind = 'c'").one_or_more()
            .followed_by("B").where("kind = 'p'")
            .within(60, "seconds"))
    assert run(p_w) == run(p_nw)
    # (2) entry gap bounded, strict <: click exactly 10s after the
    # start element is pruned; 9.999s passes
    p_entry = (Pattern.begin("S").where("kind = 'v'")
               .followed_by("A").where("kind = 'c'")
               .times(2, window=(10, "seconds"))
               .followed_by("B").where("kind = 'p'")
               .within(60, "seconds"))
    rows_eq = [(1, 1, "v", 0), (1, 2, "c", 10 * S),
               (1, 3, "c", 11 * S), (1, 4, "p", 12 * S)]
    df_eq = spark.createDataFrame(
        rows_eq, "k long, event_id long, kind string, ep long"
    )
    assert run(p_entry, df_eq) == []
    rows_ok = [(1, 1, "v", 0), (1, 2, "c", 10 * S - 1),
               (1, 3, "c", 11 * S), (1, 4, "p", 12 * S)]
    df_ok = spark.createDataFrame(
        rows_ok, "k long, event_id long, kind string, ep long"
    )
    assert run(p_entry, df_ok) == [(2, 3, 2)]
    # ...and times(2)'s SECOND take (the final position) is unbounded:
    # a 30s gap between the two clicks still matches
    rows_gap = [(1, 1, "v", 0), (1, 2, "c", 5 * S),
                (1, 3, "c", 35 * S), (1, 4, "p", 36 * S)]
    df_gap = spark.createDataFrame(
        rows_gap, "k long, event_id long, kind string, ep long"
    )
    assert run(p_entry, df_gap) == [(2, 3, 2)]
    # (3) timesOrMore(2): take 2 bounded through ignores (strict <),
    # takes 3+ unbounded
    p_tom = (Pattern.begin("S").where("kind = 'v'")
             .followed_by("A").where("kind = 'c'")
             .times_or_more(2, window=(10, "seconds"))
             .followed_by("B").where("kind = 'p'")
             .within(120, "seconds"))
    rows_tom = [(1, 1, "v", 0), (1, 2, "c", 1 * S),
                (1, 5, "v", 2 * S), (1, 3, "c", 11 * S + 1),
                (1, 4, "p", 12 * S)]
    df_tom = spark.createDataFrame(
        rows_tom, "k long, event_id long, kind string, ep long"
    )
    # take2 gap (1s -> 11.001s) = 10.001s >= 10s: pruned
    assert run(p_tom, df_tom) == []
    rows_tom2 = [(1, 1, "v", 0), (1, 2, "c", 1 * S),
                 (1, 3, "c", 9 * S), (1, 4, "c", 60 * S),
                 (1, 5, "p", 61 * S)]
    df_tom2 = spark.createDataFrame(
        rows_tom2, "k long, event_id long, kind string, ep long"
    )
    # take2 at 8s (< 10) binds; take 3 at +51s is UNBOUNDED
    assert run(p_tom, df_tom2) == sorted([(2, 3, 2), (2, 4, 3)])


def test_trailing_nfb_previous_and_current_horizon(spark):
    """NFAITCase.java:507 testPendingStateMatches (both within types run
    the same scenario): begin(start).notFollowedBy(middle).within(5,
    PREVIOUS_AND_CURRENT) — the trailing element's gap window IS a valid
    absence horizon (NFACompiler:188 accepts windowTimes OR windowTime).
    starts @5 and @11 pend (no middle within 5s); start@1 is killed by
    middle@4."""
    rows = [
        (1, 1, "start", 1 * S), (1, 2, "middle", 4 * S),
        (1, 3, "start", 5 * S), (1, 4, "start", 11 * S),
        (1, 5, "middle", 18 * S),
    ]
    df = spark.createDataFrame(
        rows, "k long, event_id long, name string, ep long"
    )
    p = (
        Pattern.begin("A").where("name = 'start'")
        .not_followed_by("N").where("name = 'middle'")
        .within(5, "seconds", within_type="PREVIOUS_AND_CURRENT")
    )
    out = cep_select(spark, df, p, "k", "ep", {"a_id": "LAST(A.event_id)"})
    assert sorted(r.a_id for r in out.collect()) == [3, 4]


def test_gap_window_guards():
    """r10 validation parity: NFACompilerTest.testCheckPatternWindowTimes
    (gap window larger than the FIRST_AND_LAST window rejects), plus the
    documented subset bounds."""
    from apache_flink_spark.cep import pattern_to_match_recognize

    # gap window > FIRST_AND_LAST horizon (reference MalformedPattern)
    p = (
        Pattern.begin("A").where("x = 1")
        .followed_by("B").where("x = 2")
        .within(3, "seconds", within_type="PREVIOUS_AND_CURRENT")
        .within(2, "seconds")
    )
    with pytest.raises(CepError, match="cannot be larger"):
        pattern_to_match_recognize(p, "t", "k", "ep", MEAS)
    # PREVIOUS_AND_CURRENT on a quantified element -> quantifier window
    with pytest.raises(CepError, match="quantifier's window argument"):
        Pattern.begin("A").where("x = 1").one_or_more().within(
            1, "minutes", within_type="PREVIOUS_AND_CURRENT"
        )
    # unknown within type
    with pytest.raises(CepError, match="unknown within_type"):
        Pattern.begin("A").within(1, "minutes", within_type="BOGUS")
    # after an optional element the previous take is branch-dependent:
    # the conjunct falls through the candidate chain with IS NULL
    # guards (O bound -> gap to O; else gap to A)
    p2 = (
        Pattern.begin("A").where("x = 1")
        .followed_by("O").where("x = 2").optional()
        .followed_by("B").where("x = 3")
        .within(1, "minutes", within_type="PREVIOUS_AND_CURRENT")
    )
    stmt = pattern_to_match_recognize(
        p2, "t", "k", "ep", {"a_id": "LAST(A.event_id)"}
    )
    assert "LAST(O.ep) IS NOT NULL" in stmt and "LAST(A.ep)" in stmt
    # middle notFollowedBy never takes an event
    p3 = (
        Pattern.begin("A").where("x = 1")
        .not_followed_by("N").where("x = 2")
        .within(1, "minutes", within_type="PREVIOUS_AND_CURRENT")
        .followed_by("B").where("x = 3")
    )
    with pytest.raises(CepError, match="MIDDLE"):
        pattern_to_match_recognize(p3, "t", "k", "ep", MEAS)
    # repeated FIRST_AND_LAST declarations keep the SMALLEST window
    # (NFACompiler:378, testWindowTimeCorrectlySet)
    p4 = (
        Pattern.begin("A").where("x = 1").within(10, "seconds")
        .followed_by("B").where("x = 2").within(20, "seconds")
    )
    assert p4._within == (10, "seconds")
    p5 = (
        Pattern.begin("A").where("x = 1").within(20, "seconds")
        .followed_by("B").where("x = 2").within(10, "seconds")
    )
    assert p5._within == (10, "seconds")


def test_group_within_previous_and_current(spark):
    """r11 (VERDICT r10 missing #2): within(PREVIOUS_AND_CURRENT) on a
    GROUP pattern. Reference mechanics: the window binds to the
    looping-group dummy take-state created while currentPattern is
    still the GroupPattern (NFACompiler.createLoopingGroupPatternState
    + createState:428 keying windowTimes by state name), and
    NFA.isStateTimedOut prunes a partial match waiting there when
    next_take.ts - previousTimestamp >= w — i.e. the gap from the last
    taken event into each repetition's FIRST take, strict <. Gaps
    INSIDE a repetition are NOT bounded by the group window (inner
    states carry their own windowTimes entries only if declared)."""

    def grp():
        return (Pattern.begin("M1").where("name='a'")
                .followed_by("M2").where("name='b'"))

    m = {"c": "LAST(C.event_id)", "a": "LAST(M1.event_id)",
         "b": "LAST(M2.event_id)", "d": "LAST(D.event_id)"}
    # unquantified group: bounds c -> a (the group's first take) only
    p = (Pattern.begin("C").where("name='c'").followed_by(grp())
         .within(3, "seconds", within_type="PREVIOUS_AND_CURRENT")
         .followed_by("D").where("name='d'"))
    rows_ok = [(1, 40, "c", 1 * S), (1, 41, "a", 2 * S),
               (1, 42, "b", 3 * S), (1, 43, "d", 4 * S)]
    assert _run_cep(spark, rows_ok, p, m) == [(40, 41, 42, 43)]
    # gap c@1 -> a@5 is 4s >= 3s: pruned (isStateTimedOut)
    rows_late = [(1, 40, "c", 1 * S), (1, 41, "a", 5 * S),
                 (1, 42, "b", 6 * S), (1, 43, "d", 7 * S)]
    assert _run_cep(spark, rows_late, p, m) == []
    # boundary: gap exactly 3s fails (strict <, prunes at >=)
    rows_eq = [(1, 40, "c", 1 * S), (1, 41, "a", 4 * S),
               (1, 42, "b", 5 * S), (1, 43, "d", 6 * S)]
    assert _run_cep(spark, rows_eq, p, m) == []
    # the gap INSIDE the group (a -> b) is NOT bounded by the window
    rows_inner = [(1, 40, "c", 1 * S), (1, 41, "a", 2 * S),
                  (1, 42, "b", 30 * S), (1, 43, "d", 31 * S)]
    assert _run_cep(spark, rows_inner, p, m) == [(40, 41, 42, 43)]
    # looping group (a b)+: the window also bounds REPETITION
    # re-entries (previous repetition's last take -> next head take)
    mq = {**m, "na": "COUNT(M1.*)"}
    pq = (Pattern.begin("C").where("name='c'").followed_by(grp())
          .one_or_more()
          .within(3, "seconds", within_type="PREVIOUS_AND_CURRENT")
          .followed_by("D").where("name='d'"))
    rows2 = [(1, 40, "c", 1 * S), (1, 41, "a", 2 * S),
             (1, 42, "b", 3 * S), (1, 43, "a", 4 * S),
             (1, 44, "b", 5 * S), (1, 45, "d", 6 * S)]
    assert _run_cep(spark, rows2, pq, mq) == [
        (40, 41, 42, 45, 1), (40, 43, 44, 45, 2),
    ]
    # rep-2 entry gap b@3 -> a@7 is 4s >= 3s: only the 1-rep branch
    rows2_late = [(1, 40, "c", 1 * S), (1, 41, "a", 2 * S),
                  (1, 42, "b", 3 * S), (1, 43, "a", 7 * S),
                  (1, 44, "b", 8 * S), (1, 45, "d", 9 * S)]
    assert _run_cep(spark, rows2_late, pq, mq) == [(40, 41, 42, 45, 1)]
    # unsupported shapes reject loudly: repeating group with an
    # optional inner element (bind order != positional order across
    # repetitions), and a group head that is itself quantified
    p_bad = (Pattern.begin("C").where("name='c'")
             .followed_by(
                 Pattern.begin("M1").where("name='a'")
                 .followed_by("M2").where("name='b'").optional())
             .one_or_more()
             .within(3, "seconds", within_type="PREVIOUS_AND_CURRENT")
             .followed_by("D").where("name='d'"))
    with pytest.raises(CepError, match="REPEATING group"):
        _run_cep(spark, rows2, p_bad, m)
    p_bad2 = (Pattern.begin("C").where("name='c'")
              .followed_by(
                  Pattern.begin("M1").where("name='a'").times(2)
                  .followed_by("M2").where("name='b'"))
              .within(3, "seconds", within_type="PREVIOUS_AND_CURRENT")
              .followed_by("D").where("name='d'"))
    with pytest.raises(CepError, match="head element"):
        _run_cep(spark, rows2, p_bad2, m)
    # checkPatternWindowTimes applies to group windows too
    p_big = (Pattern.begin("C").where("name='c'").followed_by(grp())
             .within(10, "seconds", within_type="PREVIOUS_AND_CURRENT")
             .followed_by("D").where("name='d'").within(5, "seconds"))
    with pytest.raises(CepError, match="cannot be larger"):
        _run_cep(spark, rows2, p_big, m)


def test_nfaitcase_branching_skip_till_next(spark):
    """NFAITCase.java:2492 testBranchingPatternSkipTillNext: start
    followedBy mid(vol>5) followedBy next-one followedByAny end — the
    SKIP_TILL_NEXT legs take the FIRST qualifying row, so exactly ONE
    match (start, foo1, nextOne1, end). (subtype(SubEvent) expressed as
    the is_sub column predicate — the documented subtype() mapping.)"""
    rows = [
        (1, 40, "start", 0, 0.0, 1 * S),
        (1, 41, "foo1", 1, 10.0, 3 * S), (1, 42, "foo2", 1, 10.0, 4 * S),
        (1, 43, "foo3", 1, 10.0, 5 * S),
        (1, 44, "next-one", 1, 2.0, 6 * S),
        (1, 45, "next-one", 1, 2.0, 7 * S),
        (1, 46, "end", 0, 0.0, 8 * S),
    ]
    df = spark.createDataFrame(
        rows,
        "k long, event_id long, name string, is_sub long, vol double, "
        "ep long",
    )
    p = (
        Pattern.begin("S").where("name = 'start'")
        .followed_by("M").where("is_sub = 1 AND vol > 5.0")
        .followed_by("N").where("is_sub = 1 AND name = 'next-one'")
        .followed_by_any("E").where("name = 'end'")
    )
    meas = {
        "s_id": "LAST(S.event_id)", "m_id": "LAST(M.event_id)",
        "n_id": "LAST(N.event_id)", "e_id": "LAST(E.event_id)",
    }
    got = sorted(
        tuple(r[c] for c in meas)
        for r in cep_select(spark, df, p, "k", "ep", meas).collect()
    )
    assert got == [(40, 41, 44, 46)], got


def test_nfaitcase_branching_mixed_followed_by(spark):
    """NFAITCase.java:2534 testBranchingPatternMixedFollowedBy: the
    FIRST leg upgrades to followedByAny — every foo middle branches,
    the later SKIP_TILL_NEXT legs still take the first qualifying row:
    3 matches (foo1/foo2/foo3 each with nextOne1 and end)."""
    rows = [
        (1, 40, "start", 0, 0.0, 1 * S),
        (1, 41, "foo1", 1, 10.0, 3 * S), (1, 42, "foo2", 1, 10.0, 4 * S),
        (1, 43, "foo3", 1, 10.0, 5 * S),
        (1, 44, "next-one", 1, 2.0, 6 * S),
        (1, 45, "next-one", 1, 2.0, 7 * S),
        (1, 46, "end", 0, 0.0, 8 * S),
    ]
    df = spark.createDataFrame(
        rows,
        "k long, event_id long, name string, is_sub long, vol double, "
        "ep long",
    )
    p = (
        Pattern.begin("S").where("name = 'start'")
        .followed_by_any("M").where("is_sub = 1 AND vol > 5.0")
        .followed_by("N").where("is_sub = 1 AND name = 'next-one'")
        .followed_by_any("E").where("name = 'end'")
    )
    meas = {
        "s_id": "LAST(S.event_id)", "m_id": "LAST(M.event_id)",
        "n_id": "LAST(N.event_id)", "e_id": "LAST(E.event_id)",
    }
    got = sorted(
        tuple(r[c] for c in meas)
        for r in cep_select(spark, df, p, "k", "ep", meas).collect()
    )
    assert got == [
        (40, 41, 44, 46), (40, 42, 44, 46), (40, 43, 44, 46),
    ], got


@pytest.mark.parametrize("within_type", ["FIRST_AND_LAST",
                                         "PREVIOUS_AND_CURRENT"])
def test_nfaitcase_times_clearing_buffer(spark, within_type):
    """NFAITCase.java:2292 testTimesClearingBuffer (both within types):
    c next a{2} followedBy b within(8) over c@1 a@2 a@3 a@4 b@6 — the
    match-visible half of the scenario: exactly one match
    (c, a@2, a@3, b) under either within type (the reference's
    assertion on partial-match cleanup has no batch analog)."""
    rows = [
        (1, 40, "c", 1 * S), (1, 41, "a", 2 * S), (1, 42, "a", 3 * S),
        (1, 43, "a", 4 * S), (1, 44, "b", 6 * S),
    ]
    df = spark.createDataFrame(
        rows, "k long, event_id long, name string, ep long"
    )
    p = (
        Pattern.begin("C").where("name = 'c'")
        .next("A").where("name = 'a'").times(2)
        .followed_by("B").where("name = 'b'")
        .within(8, "seconds", within_type=within_type)
    )
    meas = {
        "c_id": "LAST(C.event_id)", "first_a": "FIRST(A.event_id)",
        "last_a": "LAST(A.event_id)", "b_id": "LAST(B.event_id)",
    }
    got = sorted(
        tuple(r[c] for c in meas)
        for r in cep_select(spark, df, p, "k", "ep", meas).collect()
    )
    assert got == [(40, 41, 42, 44)], got


@pytest.mark.parametrize("within_type", ["FIRST_AND_LAST",
                                         "PREVIOUS_AND_CURRENT"])
def test_nfaitcase_optional_clearing_buffer(spark, within_type):
    """NFAITCase.java:2330 testOptionalClearingBuffer (both within
    types): c followedBy a? followedBy b within(8) over c@1 a@5 b@6 —
    the optional middle enumerates (reference default): both
    (c, a, b) and the skip-branch (c, b) emit under either type."""
    rows = [
        (1, 40, "c", 1 * S), (1, 43, "a", 5 * S), (1, 44, "b", 6 * S),
    ]
    df = spark.createDataFrame(
        rows, "k long, event_id long, name string, ep long"
    )
    p = (
        Pattern.begin("C").where("name = 'c'")
        .followed_by("A").where("name = 'a'").optional()
        .followed_by("B").where("name = 'b'")
        .within(8, "seconds", within_type=within_type)
    )
    meas = {
        "c_id": "LAST(C.event_id)", "a_id": "LAST(A.event_id)",
        "b_id": "LAST(B.event_id)",
    }
    got = sorted(
        (tuple(r[c] for c in meas)
         for r in cep_select(spark, df, p, "k", "ep", meas).collect()),
        key=str,
    )
    assert got == sorted(
        [(40, 43, 44), (40, None, 44)], key=str
    ), got


def test_nfaitcase_at_least_one_clearing_buffer(spark):
    """NFAITCase.java:2368 testAtLeastOneClearingBuffer: c followedBy
    a+ allowCombinations followedBy b within(8) over c@1 a@2 a@3 b@5 —
    the SKIP_TILL_NEXT entry pins the loop anchor at a@2 (the first a
    cannot be skipped), SKIP_TILL_ANY inside enumerates the anchored
    subsets: (c,[a2],b) and (c,[a2,a3],b)."""
    rows = [
        (1, 40, "c", 1 * S), (1, 41, "a", 2 * S), (1, 42, "a", 3 * S),
        (1, 44, "b", 5 * S),
    ]
    df = spark.createDataFrame(
        rows, "k long, event_id long, name string, ep long"
    )
    p = (
        Pattern.begin("C").where("name = 'c'")
        .followed_by("A").where("name = 'a'").one_or_more()
        .allow_combinations()
        .followed_by("B").where("name = 'b'")
        .within(8, "seconds")
    )
    meas = {
        "c_id": "LAST(C.event_id)", "n_a": "COUNT(A.*)",
        "first_a": "FIRST(A.event_id)", "last_a": "LAST(A.event_id)",
        "b_id": "LAST(B.event_id)",
    }
    got = sorted(
        tuple(r[c] for c in meas)
        for r in cep_select(spark, df, p, "k", "ep", meas).collect()
    )
    assert got == [
        (40, 1, 41, 41, 44), (40, 2, 41, 42, 44),
    ], got


def _run_cep(spark, rows, p, meas):
    df = spark.createDataFrame(
        rows, "k long, event_id long, name string, ep long"
    )
    out = cep_select(spark, df, p, "k", "ep", meas)
    return sorted(
        (tuple(r[c] for c in meas) for r in out.collect()), key=str
    )


def test_notpattern_itcase_scenarios(spark):
    """NotPatternITCase harvest (r10) — middle-notFollowedBy NOT
    scoping, reference-exact: the forbidden condition guards every
    ignore edge from the negative pattern to the first event TAKEN
    after it (branch-dependent discharge across optional successors),
    plus the backward rule: a notFollowedBy directly after a relaxed
    loop guards the loop's internal ignore edge too. Each block cites
    its reference test (flink-libraries/flink-cep NotPatternITCase.java)
    and reproduces its expected match set verbatim."""
    M3 = {"s": "LAST(S.event_id)", "m": "LAST(M.event_id)",
          "d": "LAST(D.event_id)"}
    # testNotFollowedBy:151 — a c1 b1 c2 d: the c2 branch crosses b1 and
    # dies; ONE match (a, c1, d). notFollowedBy before followedByAny.
    rows = [(1, 40, "a", 1 * S), (1, 41, "c", 2 * S),
            (1, 42, "b", 3 * S), (1, 43, "c", 4 * S), (1, 44, "d", 5 * S)]
    p = (Pattern.begin("S").where("name='a'")
         .not_followed_by("N").where("name='b'")
         .followed_by_any("M").where("name='c'")
         .followed_by("D").where("name='d'"))
    assert _run_cep(spark, rows, p, M3) == [(40, 41, 44)]
    # testNotFollowedByBeforeOptional:184 — the skip-c branch (a, d)
    # keeps the guard armed and dies on b1; still ONE match.
    p = (Pattern.begin("S").where("name='a'")
         .not_followed_by("N").where("name='b'")
         .followed_by_any("M").where("name='c'").optional()
         .followed_by("D").where("name='d'"))
    assert _run_cep(spark, rows, p, M3) == [(40, 41, 44)]
    # testTimesWithNotFollowedBy:218 — a b1 c b2 d: the notFollowedBy
    # AFTER the b{2} loop guards the loop's internal ignore edge (the
    # reference stop state is active inside the loop), so the c between
    # the takes kills everything: EMPTY.
    rows3 = [(1, 40, "a", 1 * S), (1, 41, "b", 2 * S),
             (1, 42, "c", 3 * S), (1, 43, "b", 4 * S),
             (1, 44, "d", 5 * S)]
    p3 = (Pattern.begin("S").where("name='a'")
          .followed_by_any("M").where("name='b'").times(2)
          .not_followed_by("N").where("name='c'")
          .followed_by("D").where("name='d'"))
    assert _run_cep(spark, rows3, p3, M3) == []
    # testTimesWithNotFollowedByAfter:291 — c AFTER the completed loop,
    # before d: killed by the forward guard: EMPTY.
    rows4 = [(1, 40, "a", 1 * S), (1, 46, "d", 2 * S),
             (1, 41, "e", 3 * S), (1, 43, "b", 4 * S),
             (1, 44, "b", 5 * S), (1, 42, "c", 6 * S),
             (1, 47, "d", 7 * S)]
    assert _run_cep(spark, rows4, p3, M3) == []
    # testIgnoreStateOfTimesWithNotFollowedBy:252 — nf(b) before an
    # OPTIONAL c{2}: only the skip-branch completed by the FIRST d
    # survives (every c-taking branch crosses b1): (a, d1).
    rows5 = [(1, 40, "a", 1 * S), (1, 45, "d", 2 * S),
             (1, 41, "e", 3 * S), (1, 43, "b", 4 * S),
             (1, 42, "c", 5 * S), (1, 44, "c", 6 * S),
             (1, 46, "d", 7 * S)]
    p5 = (Pattern.begin("S").where("name='a'")
          .not_followed_by("N").where("name='b'")
          .followed_by_any("M").where("name='c'").times(2).optional()
          .followed_by("D").where("name='d'"))
    assert _run_cep(spark, rows5, p5, M3) == [(40, None, 45)]
    # testNotFollowedByBeforeOptionalAtTheEnd:329 — optional LAST
    # element: the bare (a) match emits (the match ends AT a — no
    # follow window at all), plus (a, c1); (a, c2) crosses b1 and dies.
    rows6 = [(1, 40, "a", 1 * S), (1, 41, "c", 2 * S),
             (1, 42, "b", 3 * S), (1, 43, "c", 4 * S)]
    p6 = (Pattern.begin("S").where("name='a'")
          .not_followed_by("N").where("name='b'")
          .followed_by_any("E").where("name='c'").optional())
    m6 = {"s": "LAST(S.event_id)", "e": "LAST(E.event_id)"}
    assert _run_cep(spark, rows6, p6, m6) == [(40, 41), (40, None)]
    # testNotFollowedByBeforeOptionalTimes:362 — the guard discharges at
    # the FIRST loop take (c1), so the b1 BETWEEN the takes is fine:
    # (a, c1, c2, d) only.
    rows7 = [(1, 40, "a", 1 * S), (1, 41, "c", 2 * S),
             (1, 42, "b", 3 * S), (1, 43, "c", 4 * S),
             (1, 44, "d", 5 * S)]
    m7 = {"s": "LAST(S.event_id)", "fm": "FIRST(M.event_id)",
          "lm": "LAST(M.event_id)", "d": "LAST(D.event_id)"}
    assert _run_cep(spark, rows7, p5, m7) == [(40, 41, 43, 44)]
    # testNotFollowedByBeforeOneOrMoreEager:683 — nf(c) before b+: the
    # guard covers only the gap to the FIRST b; the loop then skips c1
    # internally and every prefix emits (default emission): 4 matches.
    rows8 = [(1, 40, "a", 1 * S), (1, 41, "b", 2 * S),
             (1, 50, "c", 3 * S), (1, 44, "b", 4 * S),
             (1, 45, "b", 5 * S), (1, 46, "b", 6 * S),
             (1, 47, "d", 7 * S)]
    p8 = (Pattern.begin("S").where("name='a'")
          .not_followed_by("N").where("name='c'")
          .followed_by("M").where("name='b'").one_or_more()
          .followed_by("D").where("name='d'"))
    m8 = {"s": "LAST(S.event_id)", "n": "COUNT(M.*)",
          "lm": "LAST(M.event_id)", "d": "LAST(D.event_id)"}
    assert _run_cep(spark, rows8, p8, m8) == [
        (40, 1, 41, 47), (40, 2, 44, 47), (40, 3, 45, 47),
        (40, 4, 46, 47),
    ]


@pytest.mark.parametrize("within_type", ["FIRST_AND_LAST",
                                         "PREVIOUS_AND_CURRENT"])
def test_notpattern_trailing_within_at_end(spark, within_type):
    """NotPatternITCase.java:997 testNotFollowedByWithinAtEnd (both
    within types — in the two-element form the previous event IS the
    first event): a1@1 (b@2 kills), a2@4 (b@10 is 6s out — absence
    emits), a3@11 (b@13 kills): exactly [a2]."""
    rows = [
        (1, 40, "a", 1 * S), (1, 41, "b", 2 * S), (1, 42, "a", 4 * S),
        (1, 43, "c", 5 * S), (1, 44, "b", 10 * S), (1, 45, "a", 11 * S),
        (1, 46, "b", 13 * S),
    ]
    df = spark.createDataFrame(
        rows, "k long, event_id long, name string, ep long"
    )
    p = (
        Pattern.begin("A").where("name = 'a'")
        .not_followed_by("B").where("name = 'b'")
        .within(3, "seconds", within_type=within_type)
    )
    out = cep_select(spark, df, p, "k", "ep", {"a_id": "A.event_id"})
    assert sorted(r.a_id for r in out.collect()) == [42]


def test_notpattern_before_times_within(spark):
    """NotPatternITCase.java:1031 testNotFollowByBeforeTimesWithin:
    a nf(b) followedBy c{0,2} within(3) — the zero-take branch emits the
    bare (a) immediately (no follow window at all, even with a b 1s
    later); c-branches of a1 die on b1 AND the horizon; a3's second c
    is outside the horizon. Reference match set reproduced verbatim."""
    rows = [
        (1, 40, "a", 1 * S), (1, 41, "b", 2 * S), (1, 42, "a", 10 * S),
        (1, 43, "c", 11 * S), (1, 44, "c", 12 * S), (1, 45, "a", 20 * S),
        (1, 46, "c", 21 * S), (1, 47, "c", 24 * S),
    ]
    df = spark.createDataFrame(
        rows, "k long, event_id long, name string, ep long"
    )
    p = (
        Pattern.begin("A").where("name = 'a'")
        .not_followed_by("B").where("name = 'b'")
        .followed_by("C").where("name = 'c'").times(0, 2)
        .within(3, "seconds")
    )
    meas = {"a_id": "LAST(A.event_id)", "n_c": "COUNT(C.*)",
            "last_c": "LAST(C.event_id)"}
    got = sorted(
        (tuple(r[c] for c in meas)
         for r in cep_select(spark, df, p, "k", "ep", meas).collect()),
        key=str,
    )
    assert got == sorted([
        (40, 0, None), (42, 0, None), (42, 1, 43), (42, 2, 44),
        (45, 0, None), (45, 1, 46),
    ], key=str), got


def test_timeout_side_output_nfaitcase(spark):
    """NFAITCase.java:358/:466 testSimplePatternWithTimeoutHandling
    (both within types) — cep_select_timeouts reproduces the reference's
    (timedOutPattern, timeoutTs) pairs exactly: under FIRST_AND_LAST all
    four partials time out (followedByAny branches persist past
    qualifying rows); under PREVIOUS_AND_CURRENT (declared on the last
    element) only the {start, middle} partials carry a window."""
    from apache_flink_spark.cep import cep_select_timeouts

    rows = [(1, 1, "start", 1 * S), (1, 2, "start", 2 * S),
            (1, 3, "middle", 3 * S), (1, 4, "foobar", 4 * S),
            (1, 5, "end", 11 * S), (1, 6, "end", 13 * S)]
    df = spark.createDataFrame(
        rows, "k long, event_id long, name string, ep long"
    )
    meas = {"s_id": "FIRST(S.event_id)", "m_id": "LAST(M.event_id)"}
    p = (Pattern.begin("S").where("name='start'")
         .followed_by_any("M").where("name='middle'")
         .followed_by_any("E").where("name='end'")
         .within(10, "seconds"))
    got = sorted(
        ((r.s_id, r.m_id, r.awaiting, r.timeout_ts // S)
         for r in cep_select_timeouts(
             spark, df, p, "k", "ep, event_id", meas).collect()),
        key=str,
    )
    assert got == sorted([
        (1, None, "M", 11), (2, None, "M", 12),
        (1, 3, "E", 11), (2, 3, "E", 12),
    ], key=str), got
    p2 = (Pattern.begin("S").where("name='start'")
          .followed_by_any("M").where("name='middle'")
          .followed_by_any("E").where("name='end'")
          .within(10, "seconds",
                  within_type="PREVIOUS_AND_CURRENT"))
    got2 = sorted(
        ((r.s_id, r.m_id, r.awaiting, r.timeout_ts // S)
         for r in cep_select_timeouts(
             spark, df, p2, "k", "ep, event_id", meas).collect()),
        key=str,
    )
    assert got2 == sorted(
        [(1, 3, "E", 13), (2, 3, "E", 13)], key=str
    ), got2
    # followedBy waits are ADVANCED by a qualifying row strictly before
    # the deadline (no timeout for {start} prefixes), and at exactly the
    # deadline the timeout wins (isStateTimedOut >=)
    p3 = (Pattern.begin("S").where("name='start'")
          .followed_by("M").where("name='middle'")
          .followed_by("E").where("name='end'")
          .within(10, "seconds"))
    got3 = sorted(
        ((r.s_id, r.m_id, r.awaiting, r.timeout_ts // S)
         for r in cep_select_timeouts(
             spark, df, p3, "k", "ep, event_id", meas).collect()),
        key=str,
    )
    # {s1,m}: first end @11 == deadline 11 -> timeout wins; {s2,m}:
    # end @11 < deadline 12 -> advanced (the match side emits it)
    assert got3 == [(1, 3, "E", 11)], got3
    # guards
    with pytest.raises(CepError, match="time window"):
        cep_select_timeouts(
            spark, df,
            Pattern.begin("S").where("name='start'")
            .followed_by("E").where("name='end'"),
            "k", "ep, event_id", meas,
        )
    with pytest.raises(CepError, match="single-occurrence"):
        cep_select_timeouts(
            spark, df,
            Pattern.begin("S").where("name='start'").one_or_more()
            .followed_by("E").where("name='end'")
            .within(10, "seconds"),
            "k", "ep, event_id", meas,
        )


def test_after_match_skip_itcase_scenarios(spark):
    """AfterMatchSkipITCase harvest (r10) — the four skip strategies on
    the CEP Pattern API, each block reproducing its reference test's
    match set verbatim (flink-libraries/flink-cep
    AfterMatchSkipITCase.java)."""

    def run(rows, p, meas, skip):
        df = spark.createDataFrame(
            rows, "k long, event_id long, name string, ep long"
        )
        out = cep_select(spark, df, p, "k", "ep", meas, skip=skip)
        return sorted(
            (tuple(r[c] for c in meas) for r in out.collect()), key=str
        )

    # testNoSkip:50 / testSkipPastLast:212 — a{3} over a1..a6
    rows = [(1, i, "a", i * S) for i in range(1, 7)]
    p = Pattern.begin("A").where("name = 'a'").times(3)
    m = {"f": "FIRST(A.event_id)", "l": "LAST(A.event_id)"}
    assert run(rows, p, m, "SKIP TO NEXT ROW") == [
        (1, 3), (2, 4), (3, 5), (4, 6),
    ]
    assert run(rows, p, m, "SKIP PAST LAST ROW") == [(1, 3), (4, 6)]
    # testSkipToFirst:244 — start{2} next end{2}, every row satisfies
    # both conditions; resume at the FIRST row bound to 'end'
    rows2 = [(1, i, "ab", i * S) for i in range(1, 7)]
    p2 = (Pattern.begin("ST").where("name LIKE '%a%'").times(2)
          .next("E").where("name LIKE '%b%'").times(2))
    m2 = {"f": "FIRST(ST.event_id)", "l": "LAST(E.event_id)"}
    assert run(rows2, p2, m2, "SKIP TO FIRST E") == [(1, 4), (3, 6)]
    # testSkipToLast:281 — 7 rows; resume at the LAST row bound to 'end'
    rows3 = [(1, i, "ab", i * S) for i in range(1, 8)]
    assert run(rows3, p2, m2, "SKIP TO LAST E") == [(1, 4), (4, 7)]


def test_notpattern_after_loop_scenarios(spark):
    """NotPatternITCase after-loop negations (r10): notNext after a
    looping element applies its NEXT() guard to EVERY take (a branch
    dies as soon as any taken loop row is immediately followed by a
    forbidden event), and notFollowedBy after a loop kills via both the
    loop's internal ignore edge and the forward gap. Reference match
    sets reproduced verbatim."""
    m = {"a": "LAST(A.event_id)", "lb": "LAST(B.event_id)",
         "d": "LAST(D.event_id)"}
    # testNotNextAfterOneOrMoreSkipTillNext:447 — b1's successor is a c,
    # and SKIP_TILL_NEXT cannot anchor past b1: EMPTY
    rows = [(1, 40, "a", 1 * S), (1, 41, "b", 2 * S),
            (1, 43, "c", 3 * S), (1, 42, "b", 4 * S),
            (1, 44, "d", 5 * S)]
    p = (Pattern.begin("A").where("name='a'")
         .followed_by("B").where("name='b'").one_or_more()
         .not_next("N").where("name='c'")
         .followed_by("D").where("name='d'"))
    assert _run_cep(spark, rows, p, m) == []
    # testNotNextAfterOneOrMoreSkipTillAny:453 — followedByAny anchors
    # past b1: exactly [a, b2, d]
    p2 = (Pattern.begin("A").where("name='a'")
          .followed_by_any("B").where("name='b'").one_or_more()
          .not_next("N").where("name='c'")
          .followed_by("D").where("name='d'"))
    assert _run_cep(spark, rows, p2, m) == [(40, 42, 44)]
    # testNotFollowedByNextAfterOneOrMoreEager:491 — every b1-anchored
    # branch crosses the c (loop-internal or forward gap): EMPTY
    rows2 = [(1, 40, "a", 1 * S), (1, 41, "b", 2 * S),
             (1, 42, "b", 3 * S), (1, 43, "b", 4 * S),
             (1, 50, "c", 5 * S), (1, 44, "b", 6 * S),
             (1, 45, "b", 7 * S), (1, 46, "b", 8 * S),
             (1, 47, "d", 9 * S)]
    p3 = (Pattern.begin("A").where("name='a'")
          .followed_by("B").where("name='b'").one_or_more()
          .not_followed_by("N").where("name='c'")
          .followed_by("D").where("name='d'"))
    assert _run_cep(spark, rows2, p3, m) == []
    # testNotFollowedByAnyAfterOneOrMoreEager:497 — anchors after the c
    # emit every prefix: 6 matches
    p4 = (Pattern.begin("A").where("name='a'")
          .followed_by_any("B").where("name='b'").one_or_more()
          .not_followed_by("N").where("name='c'")
          .followed_by("D").where("name='d'"))
    m4 = {"a": "LAST(A.event_id)", "fb": "FIRST(B.event_id)",
          "lb": "LAST(B.event_id)", "d": "LAST(D.event_id)"}
    assert _run_cep(spark, rows2, p4, m4) == [
        (40, 44, 44, 47), (40, 44, 45, 47), (40, 44, 46, 47),
        (40, 45, 45, 47), (40, 45, 46, 47), (40, 46, 46, 47),
    ]


def test_notpattern_before_zero_or_more(spark):
    """NotPatternITCase.java:797/:875 testNotFollowedByBeforeZeroOrMore
    (Eager, SkipTillNext and SkipTillAny): a nf(c) b* d over
    a b1 c1 b4 b5 b6 d — the guard kills the bare (a, d) branch (it
    crosses the c) and pins the loop anchor at b1 under BOTH entry
    contiguities (the ANY entry gap carries the guard too, so anchors
    past the c are unreachable); the loop then skips the c internally
    and every b1-anchored prefix emits: the same 4 matches for both."""
    rows = [(1, 40, "a", 1 * S), (1, 41, "b", 2 * S),
            (1, 50, "c", 3 * S), (1, 44, "b", 4 * S),
            (1, 45, "b", 5 * S), (1, 46, "b", 6 * S),
            (1, 47, "d", 7 * S)]
    m = {"a": "LAST(A.event_id)", "n": "COUNT(B.*)",
         "lb": "LAST(B.event_id)", "d": "LAST(D.event_id)"}
    exp = sorted([(40, 1, 41, 47), (40, 2, 44, 47), (40, 3, 45, 47),
                  (40, 4, 46, 47)], key=str)
    p = (Pattern.begin("A").where("name='a'")
         .not_followed_by("N").where("name='c'")
         .followed_by("B").where("name='b'").one_or_more().optional()
         .followed_by("D").where("name='d'"))
    assert _run_cep(spark, rows, p, m) == exp
    p2 = (Pattern.begin("A").where("name='a'")
          .not_followed_by("N").where("name='c'")
          .followed_by_any("B").where("name='b'").one_or_more()
          .optional()
          .followed_by("D").where("name='d'"))
    assert _run_cep(spark, rows, p2, m) == exp


def test_notpattern_branching_at_start(spark):
    """NotPatternITCase.java:398 testNotFollowedByWithBranchingAtStart:
    a1's branch crosses the b on the way to its first c and dies; only
    (a2, c2, d) survives."""
    rows = [(1, 40, "a", 1 * S), (1, 42, "b", 2 * S),
            (1, 41, "c", 3 * S), (1, 45, "a", 4 * S),
            (1, 43, "c", 5 * S), (1, 44, "d", 6 * S)]
    p = (Pattern.begin("A").where("name='a'")
         .not_followed_by("N").where("name='b'")
         .followed_by("M").where("name='c'")
         .followed_by("D").where("name='d'"))
    m = {"a": "LAST(A.event_id)", "c": "LAST(M.event_id)",
         "d": "LAST(D.event_id)"}
    assert _run_cep(spark, rows, p, m) == [(45, 43, 44)]


def test_after_match_skip_discarding_and_iterative(spark):
    """AfterMatchSkipITCase.java:743 testSkipToFirstDiscarding (mixed
    conditions + greedy loop; the second match REUSES rows of the
    first) and :791 testSkipBeforeOtherAlreadyCompleted (skipToFirst
    with an IterativeCondition reading A's bind) — reference match sets
    reproduced verbatim."""

    def run(rows, p, meas, skip):
        df = spark.createDataFrame(
            rows,
            "k long, event_id long, name string, price double, ep long",
        )
        out = cep_select(spark, df, p, "k", "ep", meas, skip=skip)
        return sorted(
            (tuple(r[c] for c in meas) for r in out.collect()), key=str
        )

    rows = [(1, 1, "a", 0.0, 1 * S), (1, 2, "b", 0.0, 2 * S),
            (1, 3, "c", 0.0, 3 * S), (1, 4, "c", 0.0, 4 * S),
            (1, 5, "c", 0.0, 5 * S), (1, 6, "d", 0.0, 6 * S)]
    p = (Pattern.begin("AC").where("name='a' OR name='c'")
         .followed_by("BC").where("name='b' OR name='c'")
         .followed_by("CS").where("name='c'").one_or_more().greedy()
         .followed_by("D").where("name='d'"))
    m = {"f": "FIRST(AC.event_id)", "b": "LAST(BC.event_id)",
         "nc": "COUNT(CS.*)", "d": "LAST(D.event_id)"}
    assert run(rows, p, m, "SKIP TO FIRST CS") == [
        (1, 2, 3, 6), (3, 4, 1, 6),
    ]
    rows2 = [(1, 1, "a", 0.0, 1 * S), (1, 2, "c", 0.0, 2 * S),
             (1, 3, "a", 1.0, 3 * S), (1, 4, "c", 0.0, 4 * S),
             (1, 5, "b", 1.0, 5 * S), (1, 6, "b", 0.0, 6 * S)]
    p2 = (Pattern.begin("A").where("name='a'")
          .followed_by("C").where("name='c'")
          .followed_by("B").where("name='b' AND B.price = FIRST(A.price)"))
    m2 = {"a": "LAST(A.event_id)", "c": "LAST(C.event_id)",
          "b": "LAST(B.event_id)"}
    assert run(rows2, p2, m2, "SKIP TO FIRST C") == [
        (1, 2, 6), (3, 4, 5),
    ]


def test_greedy_itcase_scenarios(spark):
    """GreedyITCase harvest (r10) — greedy() loop semantics, each block
    citing its reference test (flink-libraries/flink-cep
    GreedyITCase.java) and reproducing the expected match set verbatim.
    Key r10 fix: greedy is INERT when the loop is the pattern's LAST
    positive element — the NFA reaches the final state at every count
    and emits each one."""

    def run(rows, p, meas):
        df = spark.createDataFrame(
            rows,
            "k long, event_id long, name string, price double, ep long",
        )
        out = cep_select(spark, df, p, "k", "ep", meas)
        return sorted(
            (tuple(r[c] for c in meas) for r in out.collect()), key=str
        )

    m = {"c": "LAST(C.event_id)", "n": "COUNT(A.*)",
         "la": "LAST(A.event_id)", "d": "LAST(D.event_id)"}

    def base():
        return (Pattern.begin("C").where("name='c'")
                .followed_by("A").where("name='a'").one_or_more()
                .greedy()
                .followed_by("D").where("name='d'"))

    # testGreedyOneOrMore:263 — maximal single match
    rows = [(1, 40, "c", 0.0, 1 * S), (1, 41, "a", 2.0, 2 * S),
            (1, 42, "a", 2.0, 3 * S), (1, 43, "a", 2.0, 4 * S),
            (1, 44, "d", 3.0, 5 * S)]
    assert run(rows, base(), m) == [(40, 3, 43, 44)]
    # testGreedyOneOrMoreInBetween:299 — dummies between takes skipped
    rows2 = [(1, 40, "c", 0.0, 1 * S), (1, 90, "dummy", 0.0, 2 * S),
             (1, 41, "a", 2.0, 3 * S), (1, 91, "dummy", 0.0, 4 * S),
             (1, 42, "a", 2.0, 5 * S), (1, 92, "dummy", 0.0, 6 * S),
             (1, 43, "a", 2.0, 7 * S), (1, 44, "d", 3.0, 8 * S)]
    assert run(rows2, base(), m) == [(40, 3, 43, 44)]
    # testGreedyOneOrMoreWithDummyEventsAfterQuantifier:338
    rows3 = [(1, 40, "c", 0.0, 1 * S), (1, 41, "a", 2.0, 2 * S),
             (1, 42, "a", 2.0, 3 * S), (1, 93, "dummy", 2.0, 4 * S),
             (1, 44, "d", 3.0, 5 * S)]
    assert run(rows3, base(), m) == [(40, 2, 42, 44)]
    # testGreedyOneOrMoreWithDummyEventsBeforeQuantifier:373 — no a's
    rows4 = [(1, 40, "c", 0.0, 1 * S), (1, 93, "dummy", 2.0, 2 * S),
             (1, 44, "d", 3.0, 3 * S)]
    assert run(rows4, base(), m) == []

    def until_p():
        return (Pattern.begin("C").where("name='c'")
                .followed_by("A").where("name='a'").one_or_more()
                .greedy().until("price > 3.0")
                .followed_by("D").where("name='d'"))

    # testGreedyUntilOneOrMoreWithDummyEventsAfterQuantifier:402 — the
    # until() blocks both the take AND the ignore edge of the 4.0 row,
    # so the loop ends before it; the post-loop gap skips it
    rows5 = [(1, 40, "c", 1.0, 1 * S), (1, 41, "a", 2.0, 2 * S),
             (1, 42, "a", 3.0, 3 * S), (1, 43, "a", 3.0, 4 * S),
             (1, 90, "a", 4.0, 5 * S), (1, 45, "d", 3.0, 6 * S)]
    assert run(rows5, until_p(), m) == [(40, 3, 43, 45)]
    # testGreedyUntilOneOrMoreWithDummyEventsBeforeQuantifier:440 — the
    # high-price a sits at the loop ANCHOR (the pre-loop gap cannot skip
    # an a) and fails until(): EMPTY
    rows6 = [(1, 40, "c", 1.0, 1 * S), (1, 90, "a", 4.0, 2 * S),
             (1, 41, "a", 2.0, 3 * S), (1, 42, "a", 3.0, 4 * S),
             (1, 43, "a", 3.0, 5 * S), (1, 45, "d", 3.0, 6 * S)]
    assert run(rows6, until_p(), m) == []
    # testEndWithGreedyTimesRange:609 — END-position greedy enumerates
    m2 = {"c": "LAST(C.event_id)", "n": "COUNT(A.*)",
          "la": "LAST(A.event_id)"}
    rows7 = [(1, 40, "c", 0.0, 1 * S), (1, 41, "a", 2.0, 2 * S),
             (1, 42, "a", 2.0, 3 * S), (1, 43, "a", 2.0, 4 * S),
             (1, 44, "a", 2.0, 5 * S), (1, 45, "dummy", 2.0, 6 * S)]
    p7 = (Pattern.begin("C").where("name='c'")
          .followed_by("A").where("name='a'").times(2, 5).greedy())
    assert run(rows7, p7, m2) == [(40, 2, 42), (40, 3, 43), (40, 4, 44)]
    # testEndWithZeroOrMoreGreedy:533 — incl. the zero-take bare (c)
    rows8 = [(1, 40, "c", 0.0, 1 * S), (1, 41, "a", 2.0, 2 * S),
             (1, 42, "a", 2.0, 3 * S), (1, 44, "dummy", 2.0, 4 * S),
             (1, 43, "a", 2.0, 5 * S)]
    p8 = (Pattern.begin("C").where("name='c'")
          .followed_by("A").where("name='a'").one_or_more().optional()
          .greedy())
    assert run(rows8, p8, m2) == sorted(
        [(40, 0, None), (40, 1, 41), (40, 2, 42), (40, 3, 43)], key=str
    )
    # testEndWithZeroOrMoreConsecutiveGreedy:571 — adjacent run only
    p9 = (Pattern.begin("C").where("name='c'")
          .followed_by("A").where("name='a'").one_or_more().optional()
          .consecutive().greedy())
    assert run(rows8, p9, m2) == sorted(
        [(40, 0, None), (40, 1, 41), (40, 2, 42)], key=str
    )
    # testGreedyTimesRange:647 — NOT at the end: maximal single match
    rows9 = [(1, 40, "c", 0.0, 1 * S), (1, 41, "a", 2.0, 2 * S),
             (1, 42, "a", 2.0, 3 * S), (1, 43, "a", 2.0, 4 * S),
             (1, 44, "a", 2.0, 5 * S), (1, 45, "d", 2.0, 6 * S)]
    p10 = (Pattern.begin("C").where("name='c'")
           .followed_by("A").where("name='a'").times(2, 5).greedy()
           .followed_by("D").where("name='d'"))
    assert run(rows9, p10, m) == [(40, 4, 44, 45)]


def test_group_itcase_scenarios(spark):
    """GroupITCase harvest (r10) — GroupPattern composition scenarios
    reproduced verbatim (flink-libraries/flink-cep GroupITCase.java):
    quantified groups, optional groups (skip branch emits), default
    prefix emission on (a b)+, and NEGATIONS AFTER a group —
    notFollowedBy (forward-gap guard) and notNext (the strict guard
    binds to the group's last taken element, newly supported)."""

    def grp():
        return (Pattern.begin("M1").where("name='a'")
                .followed_by("M2").where("name='b'"))

    m = {"c": "LAST(C.event_id)", "a": "LAST(M1.event_id)",
         "b": "LAST(M2.event_id)", "d": "LAST(D.event_id)"}
    # testGroupFollowedByTimes:46 — c (a b){2} d: one match
    rows = [(1, 40, "c", 1 * S), (1, 41, "a", 2 * S),
            (1, 42, "b", 3 * S), (1, 43, "a", 4 * S),
            (1, 44, "b", 5 * S), (1, 45, "d", 6 * S)]
    p = (Pattern.begin("C").where("name='c'").followed_by(grp())
         .times(2).followed_by("D").where("name='d'"))
    assert _run_cep(spark, rows, p, {**m, "na": "COUNT(M1.*)"}) == [
        (40, 43, 44, 45, 2),
    ]
    # testGroupFollowedByOptional:90 — skip branch (c, d) AND the
    # first-anchored take (c, a1, b, d); never the a2-anchored one
    rows2 = [(1, 40, "c", 1 * S), (1, 41, "a", 2 * S),
             (1, 42, "a", 3 * S), (1, 43, "b", 4 * S),
             (1, 44, "d", 5 * S)]
    p2 = (Pattern.begin("C").where("name='c'").followed_by(grp())
          .optional().followed_by("D").where("name='d'"))
    assert _run_cep(spark, rows2, p2, m) == sorted(
        [(40, 41, 43, 44), (40, None, None, 44)], key=str
    )
    # testGroupFollowedByOneOrMore:171 — default prefix emission
    p3 = (Pattern.begin("C").where("name='c'").followed_by(grp())
          .one_or_more().followed_by("D").where("name='d'"))
    assert _run_cep(spark, rows, p3, {**m, "na": "COUNT(M1.*)"}) == [
        (40, 41, 42, 45, 1), (40, 43, 44, 45, 2),
    ]
    # testGroupNotFollowedBy:477 / testGroupNotNext:524 — the (a1, b1)
    # branch dies on the d; only (c, a2, b2, e) survives
    rows3 = [(1, 40, "c", 1 * S), (1, 41, "a", 2 * S),
             (1, 42, "b", 3 * S), (1, 43, "d", 4 * S),
             (1, 44, "a", 5 * S), (1, 45, "b", 6 * S),
             (1, 46, "e", 7 * S)]
    m3 = {"c": "LAST(C.event_id)", "a": "LAST(M1.event_id)",
          "b": "LAST(M2.event_id)", "e": "LAST(E.event_id)"}
    p4 = (Pattern.begin("C").where("name='c'").followed_by_any(grp())
          .not_followed_by("N").where("name='d'")
          .followed_by("E").where("name='e'"))
    assert _run_cep(spark, rows3, p4, m3) == [(40, 44, 45, 46)]
    p5 = (Pattern.begin("C").where("name='c'").followed_by_any(grp())
          .not_next("N").where("name='d'")
          .followed_by("E").where("name='e'"))
    assert _run_cep(spark, rows3, p5, m3) == [(40, 44, 45, 46)]


def test_group_nest_scenarios(spark):
    """GroupITCase nested groups (r10): testGroupNest:571 —
    ``d (a (b c)+?)? e`` — and testGroupNestTimes:634 —
    ``d fBAny (a (b c){3}){0,2} e`` — reproduced verbatim on the
    backtracking VM (the body-text parser's bounded paren nesting was
    raised to depth 6 for the nested compile)."""
    rows = [(1, 40, "d", 1 * S), (1, 41, "a", 2 * S),
            (1, 42, "b", 3 * S), (1, 43, "c", 4 * S),
            (1, 44, "b", 5 * S), (1, 45, "c", 6 * S),
            (1, 46, "e", 7 * S)]
    inner = (Pattern.begin("M2").where("name='b'")
             .followed_by("M3").where("name='c'"))
    mid = (Pattern.begin("M1").where("name='a'")
           .followed_by(inner).one_or_more().optional())
    p = (Pattern.begin("ST").where("name='d'")
         .followed_by(mid).optional()
         .followed_by("E").where("name='e'"))
    m = {"a": "LAST(M1.event_id)", "nb": "COUNT(M2.*)",
         "lc": "LAST(M3.event_id)", "e": "LAST(E.event_id)"}
    assert _run_cep(spark, rows, p, m) == sorted([
        (None, 0, None, 46), (41, 0, None, 46),
        (41, 1, 43, 46), (41, 2, 45, 46),
    ], key=str)
    rows2 = (
        [(1, 40, "d", 1 * S), (1, 41, "a", 2 * S)]
        + [(1, 42 + i, nm, (3 + i) * S)
           for i, nm in enumerate(["b", "c", "b", "c", "b", "c"])]
        + [(1, 48, "a", 9 * S)]
        + [(1, 49 + i, nm, (10 + i) * S)
           for i, nm in enumerate(["b", "c", "b", "c", "b", "c"])]
        + [(1, 55, "e", 16 * S)]
    )
    inner2 = (Pattern.begin("N2").where("name='b'")
              .followed_by("N3").where("name='c'"))
    mid2 = (Pattern.begin("N1").where("name='a'")
            .followed_by(inner2).times(3))
    p2 = (Pattern.begin("SX").where("name='d'")
          .followed_by_any(mid2).times(0, 2)
          .followed_by("EX").where("name='e'"))
    m2 = {"fa": "FIRST(N1.event_id)", "la": "LAST(N1.event_id)",
          "nb": "COUNT(N2.*)", "e": "LAST(EX.event_id)"}
    assert _run_cep(spark, rows2, p2, m2) == sorted([
        (None, None, 0, 55), (41, 41, 3, 55), (48, 48, 3, 55),
        (41, 48, 6, 55),
    ], key=str)


def test_group_itcase_until_and_optional_edges(spark):
    """GroupITCase long tail (r10): until() on a GROUP loop gates every
    consumed row (:839 — both prefixes emit, the d stops the loop);
    a group STARTING with an optional element under strict next (:892);
    and the optional-group gap-scope fix (:932
    testFollowedByOptionalGroupPattern): ``a -> (b c)? next d`` binds d
    STRICTLY next to a when the group is skipped — the relaxed gap
    belongs to the group's states and is skipped with it."""
    # :839
    rows3 = [(1, 40, "c", 1 * S), (1, 41, "a", 2 * S),
             (1, 42, "b", 3 * S), (1, 43, "a", 4 * S),
             (1, 44, "b", 5 * S), (1, 45, "d", 6 * S)]
    grp3 = (Pattern.begin("M1").where("name='a'")
            .followed_by("M2").where("name='b'"))
    p3 = (Pattern.begin("C").where("name='c'")
          .followed_by(grp3).one_or_more().until("name = 'd'")
          .followed_by("D").where("name='d'"))
    m3 = {"c": "LAST(C.event_id)", "n": "COUNT(M1.*)",
          "lb": "LAST(M2.event_id)", "d": "LAST(D.event_id)"}
    assert _run_cep(spark, rows3, p3, m3) == [
        (40, 1, 42, 45), (40, 2, 44, 45),
    ]
    # :892
    grp2 = (Pattern.begin("M1").where("name='b'").optional()
            .next("M2").where("name='c'"))
    p2 = (Pattern.begin("A").where("name='a'")
          .next(grp2).next("D").where("name='d'"))
    rows2 = [(1, 40, "a", 1 * S), (1, 41, "c", 2 * S),
             (1, 42, "d", 3 * S)]
    m2 = {"a": "LAST(A.event_id)", "c": "LAST(M2.event_id)",
          "d": "LAST(D.event_id)"}
    assert _run_cep(spark, rows2, p2, m2) == [(40, 41, 42)]
    # :932 — [a, d2] must NOT match (the skipped group takes its
    # relaxed gap with it, so d binds strictly next to a)
    rows = [(1, 40, "a", 1 * S), (1, 41, "d", 2 * S),
            (1, 42, "d", 3 * S)]
    grp = (Pattern.begin("M1").where("name='b'")
           .next("M2").where("name='c'"))
    p = (Pattern.begin("A").where("name='a'")
         .followed_by(grp).optional()
         .next("D").where("name='d'"))
    m = {"a": "LAST(A.event_id)", "d": "LAST(D.event_id)"}
    assert _run_cep(spark, rows, p, m) == [(40, 41)]


def test_group_itcase_quantifier_variants(spark):
    """GroupITCase quantifier variants (r10): optional exact-count
    groups whose partial take dies (:133 — only the skip branch
    emits), zero-or-more groups (:217 — every repetition count), and
    allowCombinations on a GROUP loop (:265 — the between-reps ignore
    edge is TRUE, so whole repetitions may be skipped: all three
    2-subsets of the three (a b) pairs)."""

    def grp():
        return (Pattern.begin("M1").where("name='a'")
                .followed_by("M2").where("name='b'"))

    # :133 testFollowedByGroupTimesOptional
    rows = [(1, 40, "c", 1 * S), (1, 41, "a", 2 * S),
            (1, 45, "d", 3 * S)]
    p = (Pattern.begin("C").where("name='c'").followed_by(grp())
         .times(2).optional().followed_by("D").where("name='d'"))
    m = {"c": "LAST(C.event_id)", "a": "LAST(M1.event_id)",
         "d": "LAST(D.event_id)"}
    assert _run_cep(spark, rows, p, m) == [(40, None, 45)]
    # :217 testGroupFollowedByZeroOrMore
    rows2 = [(1, 40, "c", 1 * S), (1, 41, "a", 2 * S),
             (1, 42, "b", 3 * S), (1, 43, "a", 4 * S),
             (1, 44, "b", 5 * S), (1, 45, "d", 6 * S)]
    p2 = (Pattern.begin("C").where("name='c'").followed_by(grp())
          .one_or_more().optional()
          .followed_by("D").where("name='d'"))
    m2 = {"c": "LAST(C.event_id)", "n": "COUNT(M1.*)",
          "lb": "LAST(M2.event_id)", "d": "LAST(D.event_id)"}
    assert _run_cep(spark, rows2, p2, m2) == [
        (40, 0, None, 45), (40, 1, 42, 45), (40, 2, 44, 45),
    ]
    # :265 testGroupFollowedByAnyTimesCombinations
    rows3 = [(1, 40, "c", 1 * S), (1, 41, "a", 2 * S),
             (1, 42, "b", 3 * S), (1, 43, "a", 4 * S),
             (1, 44, "b", 5 * S), (1, 45, "a", 6 * S),
             (1, 46, "b", 7 * S), (1, 47, "d", 8 * S)]
    p3 = (Pattern.begin("C").where("name='c'").followed_by_any(grp())
          .times(2).allow_combinations()
          .followed_by("D").where("name='d'"))
    m3 = {"fa": "FIRST(M1.event_id)", "la": "LAST(M1.event_id)",
          "lb": "LAST(M2.event_id)", "d": "LAST(D.event_id)"}
    assert _run_cep(spark, rows3, p3, m3) == [
        (41, 43, 44, 47), (41, 45, 46, 47), (43, 45, 46, 47),
    ]


def test_group_itcase_any_next_begin_variants(spark):
    """GroupITCase remaining variants (r10): followedByAny into
    optional/unbounded group loops (:317 — both 2-rep anchors plus the
    skip branch; :369 — all six anchor/count combinations), strict
    NEXT into a zero-or-more group (:423 — only the adjacent anchor,
    plus the skip branch whose relaxed tail gap reaches d), and a
    pattern BEGINNING with a quantified group (:796)."""

    def grp():
        return (Pattern.begin("M1").where("name='a'")
                .followed_by("M2").where("name='b'"))

    rows = [(1, 40, "c", 1 * S), (1, 41, "a", 2 * S),
            (1, 42, "b", 3 * S), (1, 43, "a", 4 * S),
            (1, 44, "b", 5 * S), (1, 45, "a", 6 * S),
            (1, 46, "b", 7 * S), (1, 47, "d", 8 * S)]
    m = {"fa": "FIRST(M1.event_id)", "la": "LAST(M1.event_id)",
         "n": "COUNT(M1.*)", "d": "LAST(D.event_id)"}
    p1 = (Pattern.begin("C").where("name='c'")
          .followed_by_any(grp()).times(2).optional()
          .followed_by("D").where("name='d'"))
    assert _run_cep(spark, rows, p1, m) == sorted([
        (41, 43, 2, 47), (43, 45, 2, 47), (None, None, 0, 47),
    ], key=str)
    p2 = (Pattern.begin("C").where("name='c'")
          .followed_by_any(grp()).times_or_more(1)
          .followed_by("D").where("name='d'"))
    assert _run_cep(spark, rows, p2, m) == sorted([
        (41, 41, 1, 47), (41, 43, 2, 47), (41, 45, 3, 47),
        (43, 43, 1, 47), (43, 45, 2, 47), (45, 45, 1, 47),
    ], key=str)
    p3 = (Pattern.begin("C").where("name='c'")
          .next(grp()).one_or_more().optional()
          .followed_by("D").where("name='d'"))
    assert _run_cep(spark, rows, p3, m) == sorted([
        (41, 41, 1, 47), (41, 43, 2, 47), (41, 45, 3, 47),
        (None, None, 0, 47),
    ], key=str)
    rows2 = [(1, 41, "a", 1 * S), (1, 42, "b", 2 * S),
             (1, 43, "a", 3 * S), (1, 44, "b", 4 * S),
             (1, 45, "d", 5 * S)]
    p4 = (Pattern.begin(grp()).times(1, 2)
          .followed_by("D").where("name='d'"))
    assert _run_cep(spark, rows2, p4, m) == sorted([
        (41, 41, 1, 45), (41, 43, 2, 45), (43, 43, 1, 45),
    ], key=str)


def test_iterative_conditions_itcase_scenarios(spark):
    """IterativeConditionsITCase harvest (r10) — aggregate reductions
    over a variable's binds inside where() (the reference's
    ctx.getEventsForPattern loop), new in r10 as DEFINE bind-aggregates
    SUM/MIN/MAX/AVG/COUNT with RUNNING semantics (the own variable
    includes the candidate row; ignore edges evaluate the take
    condition AS IF the candidate were taken — the _INCL rewrite).
    Reference match sets reproduced verbatim."""

    def run(rows, p, meas):
        df = spark.createDataFrame(
            rows,
            "k long, event_id long, name string, price double, ep long",
        )
        out = cep_select(spark, df, p, "k", "ep", meas)
        return sorted(
            (tuple(r[c] for c in meas) for r in out.collect()), key=str
        )

    m = {"fs": "FIRST(ST.event_id)", "n": "COUNT(ST.*)",
         "ls": "LAST(ST.event_id)", "e": "LAST(E.event_id)"}
    # testIterativeWithLoopingStartingEager:146 — start+? with
    # sum-including-candidate < 5: [s1,s2], [s1], [s2], [s3], []
    rows = [(1, 40, "start", 1.0, 1 * S), (1, 41, "start", 2.0, 2 * S),
            (1, 42, "start", 3.0, 3 * S), (1, 46, "end", 1.0, 4 * S)]
    p = (Pattern.begin("ST").where("name = 'start' AND SUM(ST.price) < 5.0")
         .one_or_more().optional()
         .followed_by("E").where("name = 'end'"))
    assert run(rows, p, m) == sorted([
        (40, 1, 40, 46), (40, 2, 41, 46), (41, 1, 41, 46),
        (42, 1, 42, 46), (None, 0, None, 46),
    ], key=str)
    # testIterativeWithPrevPatternDependency:229 — the END's condition
    # aggregates the loop's binds: only prefixes whose sum >= 2 complete
    rows2 = [(1, 40, "start", 1.0, 1 * S), (1, 41, "start", 2.0, 2 * S),
             (1, 46, "end", 1.0, 4 * S)]
    p2 = (Pattern.begin("ST").where("name = 'start'").one_or_more()
          .followed_by("E").where("name = 'end' AND SUM(ST.price) >= 2.0"))
    assert run(rows2, p2, m) == sorted([
        (40, 2, 41, 46), (41, 1, 41, 46),
    ], key=str)
    # testIterativeWithBranchingPatternEager:58 — LIKE discriminator +
    # bind-sum on the loop; 5 matches (the 3.0-priced foo3 is skipped
    # by s1's branches via the as-if-taken ignore edge)
    rows3 = [(1, 40, "start", 1.0, 1 * S), (1, 41, "foo1", 1.0, 2 * S),
             (1, 42, "foo2", 2.0, 3 * S), (1, 45, "start", 2.0, 4 * S),
             (1, 43, "foo3", 3.0, 5 * S), (1, 44, "foo4", 1.0, 6 * S),
             (1, 47, "next-one", 1.0, 7 * S), (1, 46, "end", 1.0, 8 * S)]
    p3 = (Pattern.begin("ST").where("name = 'start'")
          .followed_by("M")
          .where("name LIKE 'foo%' AND SUM(M.price) < 5.0").one_or_more()
          .followed_by("E").where("name = 'end'"))
    m3 = {"s": "LAST(ST.event_id)", "n": "COUNT(M.*)",
          "fm": "FIRST(M.event_id)", "lm": "LAST(M.event_id)"}
    assert run(rows3, p3, m3) == sorted([
        (40, 1, 41, 41), (40, 2, 41, 42), (40, 3, 41, 44),
        (45, 1, 43, 43), (45, 2, 43, 44),
    ], key=str)
    # as-if-taken divergence pin (not a reference test, derived from
    # NFA semantics): a too-expensive candidate is IGNORED, not a loop
    # terminator — the loop may take a later, cheaper row
    rows4 = [(1, 40, "start", 1.0, 1 * S), (1, 41, "start", 2.0, 2 * S),
             (1, 42, "start", 3.0, 3 * S), (1, 43, "start", 1.0, 4 * S),
             (1, 46, "end", 1.0, 5 * S)]
    got = run(rows4, p, m)
    assert (40, 3, 43, 46) in got  # [s1, s2, (skip s3), s4, e]


def test_nfaitcase_times_family(spark):
    """NFAITCase times-family harvest (r10) — exact-count loops under
    every contiguity mode, reproduced verbatim: next+allowCombinations
    anchors at the adjacent row (:1166/:1236 with noise between
    takes), begin-with-consecutive-times (:1203), relaxed eager
    single-match (:1277), and followedByAny+combinations enumerating
    all 2-subsets (:1310)."""
    m = {"c": "LAST(C.event_id)", "fa": "FIRST(A.event_id)",
         "la": "LAST(A.event_id)", "b": "LAST(B.event_id)"}
    rows = [(1, 40, "c", 1 * S), (1, 41, "a", 2 * S),
            (1, 42, "a", 3 * S), (1, 43, "a", 4 * S),
            (1, 44, "b", 6 * S)]
    p = (Pattern.begin("C").where("name='c'")
         .next("A").where("name='a'").times(2).allow_combinations()
         .followed_by("B").where("name='b'"))
    assert _run_cep(spark, rows, p, m) == [
        (40, 41, 42, 44), (40, 41, 43, 44),
    ]
    rows2 = [(1, 41, "a", 2 * S), (1, 42, "a", 3 * S),
             (1, 43, "a", 4 * S), (1, 44, "b", 6 * S)]
    p2 = (Pattern.begin("A").where("name='a'").times(2).consecutive()
          .followed_by("B").where("name='b'"))
    m2 = {"fa": "FIRST(A.event_id)", "la": "LAST(A.event_id)",
          "b": "LAST(B.event_id)"}
    assert _run_cep(spark, rows2, p2, m2) == [
        (41, 42, 44), (42, 43, 44),
    ]
    rows3 = [(1, 40, "c", 1 * S), (1, 41, "a", 2 * S),
             (1, 90, "f", 3 * S), (1, 42, "a", 4 * S),
             (1, 91, "f", 5 * S), (1, 43, "a", 6 * S),
             (1, 44, "b", 7 * S)]
    assert _run_cep(spark, rows3, p, m) == [
        (40, 41, 42, 44), (40, 41, 43, 44),
    ]
    rows4 = [(1, 40, "c", 1 * S), (1, 41, "a", 2 * S),
             (1, 42, "a", 4 * S), (1, 43, "a", 6 * S),
             (1, 44, "b", 7 * S)]
    p4 = (Pattern.begin("C").where("name='c'")
          .followed_by("A").where("name='a'").times(2)
          .followed_by("B").where("name='b'"))
    assert _run_cep(spark, rows4, p4, m) == [(40, 41, 42, 44)]
    p5 = (Pattern.begin("C").where("name='c'")
          .followed_by_any("A").where("name='a'").times(2)
          .allow_combinations()
          .followed_by("B").where("name='b'"))
    assert _run_cep(spark, rows4, p5, m) == [
        (40, 41, 42, 44), (40, 41, 43, 44), (40, 42, 43, 44),
    ]


def test_complex_branching_after_zero_or_more(spark):
    """NFAITCase.java:612 testComplexBranchingAfterZeroOrMore,
    faithfully ported (r11, VERDICT r10 what's-wrong #2): the reference
    pattern has ``.oneOrMore().allowCombinations().optional()``
    (NFAITCase.java:639-641) — the r10 pin dropped allowCombinations
    and mislabeled the resulting (correct) anchored-prefix emission a
    divergence. With SKIP_TILL_ANY inner contiguity the engine
    reproduces the reference's 16 matches exactly: ALL subsets of the
    three middles (including the row-skipping {m1, m3}) per d-choice.

    The horizon-less unbounded form stays the documented compile-time
    reject (the SKIP_TILL_ANY match set is exponential in the unbounded
    row span); a within() horizon bounds the enumeration and is how the
    supported surface expresses this scenario."""
    rows = [(1, 40, "c", 1 * S), (1, 41, "a", 2 * S),
            (1, 42, "a", 3 * S), (1, 43, "a", 4 * S),
            (1, 44, "b", 5 * S), (1, 45, "d", 6 * S),
            (1, 46, "d", 7 * S), (1, 47, "e", 8 * S)]

    def build():
        return (Pattern.begin("C").where("name='c'")
                .followed_by_any("A").where("name='a'")
                .one_or_more().allow_combinations().optional()
                .followed_by_any("B").where("name='b'")
                .followed_by_any("D").where("name='d'")
                .followed_by_any("E").where("name='e'"))

    m = {"fa": "FIRST(A.event_id)", "la": "LAST(A.event_id)",
         "n": "COUNT(A.*)", "b": "LAST(B.event_id)",
         "d": "LAST(D.event_id)", "e": "LAST(E.event_id)"}
    # Horizon-less unbounded allowCombinations: loud compile-time reject.
    with pytest.raises(CepError, match="UNBOUNDED"):
        _run_cep(spark, rows, build(), m)
    # With a within() horizon: the reference's 16 matches, verbatim —
    # every subset of {m1, m2, m3} (8, incl. empty) x each d.
    got = _run_cep(spark, rows, build().within(1, "minutes"), m)
    expect = sorted(
        [
            (fa, la, n, 44, d, 47)
            for (fa, la, n) in [
                (41, 43, 3), (41, 42, 2), (41, 43, 2), (42, 43, 2),
                (41, 41, 1), (42, 42, 1), (43, 43, 1), (None, None, 0),
            ]
            for d in (45, 46)
        ],
        key=str,
    )
    assert got == expect, got


def test_nfaitcase_optional_times_family(spark):
    """NFAITCase optional-times harvest (r10) — times/oneOrMore loops
    with optional() under every contiguity/inner-mode combination,
    reproduced verbatim: :1549 (insufficient takes -> zero branch
    only), :1577 (fBAny+combinations: all 2-subsets + zero), :1625
    (fBAny relaxed: anchored prefixes + zero), :1667 (consecutive:
    adjacent pair + zero), :1705 (oneOrMore consecutive: adjacent runs
    per anchor + zero), :1755 (strict entry + consecutive)."""
    m = {"fa": "FIRST(A.event_id)", "la": "LAST(A.event_id)",
         "n": "COUNT(A.*)", "b": "LAST(B.event_id)"}
    rows = [(1, 40, "c", 1 * S), (1, 90, "f", 2 * S),
            (1, 41, "a", 3 * S), (1, 91, "f", 4 * S),
            (1, 42, "a", 5 * S), (1, 43, "a", 6 * S),
            (1, 44, "b", 7 * S)]
    p = (Pattern.begin("C").where("name='c'")
         .followed_by("A").where("name='a'").times(3).optional()
         .followed_by("B").where("name='b'"))
    assert _run_cep(
        spark,
        [(1, 40, "c", 1 * S), (1, 90, "f", 2 * S), (1, 44, "b", 7 * S)],
        p, m,
    ) == [(None, None, 0, 44)]
    p2 = (Pattern.begin("C").where("name='c'")
          .followed_by_any("A").where("name='a'").times(2)
          .allow_combinations().optional()
          .followed_by("B").where("name='b'"))
    assert _run_cep(spark, rows, p2, m) == sorted([
        (41, 42, 2, 44), (41, 43, 2, 44), (42, 43, 2, 44),
        (None, None, 0, 44),
    ], key=str)
    p3 = (Pattern.begin("C").where("name='c'")
          .followed_by_any("A").where("name='a'").times(2).optional()
          .followed_by("B").where("name='b'"))
    assert _run_cep(spark, rows, p3, m) == sorted([
        (41, 42, 2, 44), (42, 43, 2, 44), (None, None, 0, 44),
    ], key=str)
    p4 = (Pattern.begin("C").where("name='c'")
          .followed_by_any("A").where("name='a'").times(2)
          .consecutive().optional()
          .followed_by("B").where("name='b'"))
    assert _run_cep(spark, rows, p4, m) == sorted([
        (42, 43, 2, 44), (None, None, 0, 44),
    ], key=str)
    p5 = (Pattern.begin("C").where("name='c'")
          .followed_by_any("A").where("name='a'").one_or_more()
          .consecutive().optional()
          .followed_by("B").where("name='b'"))
    assert _run_cep(spark, rows, p5, m) == sorted([
        (41, 41, 1, 44), (42, 42, 1, 44), (42, 43, 2, 44),
        (43, 43, 1, 44), (None, None, 0, 44),
    ], key=str)
    rows2 = [(1, 40, "c", 1 * S), (1, 41, "a", 2 * S),
             (1, 42, "a", 3 * S), (1, 43, "a", 4 * S),
             (1, 44, "b", 5 * S)]
    p6 = (Pattern.begin("C").where("name='c'")
          .next("A").where("name='a'").times(2).consecutive().optional()
          .followed_by("B").where("name='b'"))
    assert _run_cep(spark, rows2, p6, m) == sorted([
        (41, 42, 2, 44), (None, None, 0, 44),
    ], key=str)


def test_optional_times_non_strict_with_next(spark):
    """NFAITCase.java:1791 testOptionalTimesNonStrictWithNext,
    faithfully ported (r11, VERDICT r10 what's-wrong #2): the reference
    pattern has ``.times(2).allowCombinations().optional()``
    (NFAITCase.java:1808) — the r10 pin dropped allowCombinations and
    mislabeled the correct anchored-prefix emission a divergence. With
    the bounded SKIP_TILL_ANY loop (inside the supported surface — no
    horizon needed for times(n)) the engine reproduces the reference's
    3 matches exactly, including the row-skipping {m1, m3}."""
    rows3 = [(1, 40, "c", 1 * S), (1, 41, "a", 2 * S),
             (1, 90, "f", 3 * S), (1, 42, "a", 4 * S),
             (1, 91, "f", 5 * S), (1, 43, "a", 6 * S),
             (1, 44, "b", 7 * S)]
    p7 = (Pattern.begin("C").where("name='c'")
          .next("A").where("name='a'").times(2)
          .allow_combinations().optional()
          .followed_by("B").where("name='b'"))
    m = {"fa": "FIRST(A.event_id)", "la": "LAST(A.event_id)",
         "n": "COUNT(A.*)", "b": "LAST(B.event_id)"}
    got = _run_cep(spark, rows3, p7, m)
    assert got == sorted([
        (41, 42, 2, 44), (41, 43, 2, 44), (None, None, 0, 44),
    ], key=str), got
    # And the r10 variant WITHOUT allowCombinations stays the anchored
    # SKIP_TILL_NEXT emission (no {m1, m3}) — that distinction is the
    # whole point of the two inner contiguity modes.
    p8 = (Pattern.begin("C").where("name='c'")
          .next("A").where("name='a'").times(2).optional()
          .followed_by("B").where("name='b'"))
    assert _run_cep(spark, rows3, p8, m) == sorted([
        (41, 42, 2, 44), (None, None, 0, 44),
    ], key=str)


def test_notpattern_itcase_one_or_more_combinations(spark):
    """NotPatternITCase × allowCombinations harvest (r11, VERDICT r10
    next-item #7) — the SKIP_TILL_ANY interactions with negative
    patterns, reproduced verbatim from flink-libraries/flink-cep
    NotPatternITCase.java. The unbounded oneOrMore+allowCombinations
    forms carry a within() horizon (the supported surface — the
    horizon-less form is the documented compile-time reject; the
    horizon exceeds every fixture's span, so the match sets are the
    reference's verbatim)."""
    M = {"n": "COUNT(B.*)", "fb": "FIRST(B.event_id)",
         "lb": "LAST(B.event_id)", "sb": "SUM(B.event_id)",
         "d": "LAST(D.event_id)"}
    # AFTER fixture: a b1 b2 b3 c b4 b5 b6 d (NotFollowByData order)
    rows_after = [(1, 40, "a", 1 * S), (1, 41, "b", 2 * S),
                  (1, 42, "b", 3 * S), (1, 43, "b", 4 * S),
                  (1, 90, "c", 5 * S), (1, 44, "b", 6 * S),
                  (1, 45, "b", 7 * S), (1, 46, "b", 8 * S),
                  (1, 50, "d", 9 * S)]

    def p_after(entry_any):
        p = Pattern.begin("A").where("name='a'")
        p = (p.followed_by_any("B") if entry_any
             else p.followed_by("B"))
        return (p.where("name='b'").one_or_more().allow_combinations()
                .not_followed_by("N").where("name='c'")
                .followed_by("D").where("name='d'")
                .within(1, "minutes"))

    # :527 testNotFollowedByNextAfterOneOrMoreCombinations — followedBy
    # entry: the first take is b1 and every continuation crosses c: EMPTY
    assert _run_cep(spark, rows_after, p_after(False), M) == []
    # :533 testNotFollowedByAnyAfterOneOrMoreCombinations — followedByAny
    # entry: every nonempty subset of {b4, b5, b6} (the post-c runs; any
    # subset touching b1-b3 crosses c and dies)
    assert _run_cep(spark, rows_after, p_after(True), M) == sorted([
        (3, 44, 46, 135, 50), (2, 44, 45, 89, 50), (2, 44, 46, 90, 50),
        (2, 45, 46, 91, 50), (1, 44, 44, 44, 50), (1, 45, 45, 45, 50),
        (1, 46, 46, 46, 50),
    ], key=str)

    # BEFORE fixture: a b1 c b4 b5 b6 d
    rows_before = [(1, 40, "a", 1 * S), (1, 41, "b", 2 * S),
                   (1, 90, "c", 3 * S), (1, 44, "b", 4 * S),
                   (1, 45, "b", 5 * S), (1, 46, "b", 6 * S),
                   (1, 50, "d", 7 * S)]

    def p_before(entry_any, combinations, optional):
        p = (Pattern.begin("A").where("name='a'")
             .not_followed_by("N").where("name='c'"))
        p = (p.followed_by_any("B") if entry_any
             else p.followed_by("B"))
        p = p.where("name='b'").one_or_more()
        if combinations:
            p = p.allow_combinations()
        if optional:
            p = p.optional()
        return (p.followed_by("D").where("name='d'")
                .within(1, "minutes"))

    # every BEFORE variant must take b1 FIRST: the not-c guard arms on
    # the negative pattern and discharges only on the first TAKEN row,
    # so a branch whose first take is b4+ crosses c and dies — and the
    # zero-or-more's empty branch dies the same way (no {a, d} match).
    all8 = sorted([
        (4, 41, 46, 176, 50), (3, 41, 45, 130, 50), (3, 41, 46, 131, 50),
        (3, 41, 46, 132, 50), (2, 41, 44, 85, 50), (2, 41, 45, 86, 50),
        (2, 41, 46, 87, 50), (1, 41, 41, 41, 50),
    ], key=str)
    eager4 = sorted([
        (4, 41, 46, 176, 50), (3, 41, 45, 130, 50),
        (2, 41, 44, 85, 50), (1, 41, 41, 41, 50),
    ], key=str)
    # :603 testNotFollowedByAnyBeforeOneOrMoreEager — anchored prefixes
    assert _run_cep(spark, rows_before, p_before(True, False, False),
                    M) == eager4
    # :632 testNotFollowedByAnyBeforeOneOrMoreCombinations — all subsets
    # anchored at b1 (incl. the b1+b6 / b1+b5+b6 row-skipping entries)
    assert _run_cep(spark, rows_before, p_before(True, True, False),
                    M) == all8
    # :712 testNotFollowedByBeforeOneOrMoreCombinations — same set: the
    # followedBy entry only constrains the FIRST take, which is b1 in
    # every branch anyway
    assert _run_cep(spark, rows_before, p_before(False, True, False),
                    M) == all8
    # :825 testNotFollowedByBeforeZeroOrMoreCombinationsSkipTillNext —
    # optional() adds no match (the empty branch crosses c)
    assert _run_cep(spark, rows_before, p_before(False, True, True),
                    M) == all8
    # :875 testNotFollowedByBeforeZeroOrMoreEagerSkipTillAny
    assert _run_cep(spark, rows_before, p_before(True, False, True),
                    M) == eager4
    # :903 testNotFollowedByBeforeZeroOrMoreCombinationsSkipTillAny
    assert _run_cep(spark, rows_before, p_before(True, True, True),
                    M) == all8


def test_not_followed_by_within_at_end_after_match(spark):
    """NotPatternITCase.java:1078 testNotFollowedByWithinAtEndAfterMatch
    (r11, VERDICT r10 next-item #7): trailing notFollowedBy over a
    COMPOSED prefix (a+ allowCombinations, c), skipPastLastEvent, within
    5s. The reference holds the completed prefix in a Pending state and
    confirms at the window timeout; the skip strategy prunes when the
    confirmed matches emit — ONE match {a1, a2, a3, c1} survives (the
    NFA emits the longest branch first, then skip-past-last kills every
    overlapping alternative)."""
    rows = [(1, 40, "a", 1 * S), (1, 41, "a", 2 * S),
            (1, 42, "a", 3 * S), (1, 43, "c", 4 * S),
            (1, 44, "c", 10 * S)]
    df = spark.createDataFrame(
        rows, "k long, event_id long, name string, ep long"
    )
    p = (Pattern.begin("A").where("name='a'")
         .one_or_more().allow_combinations()
         .followed_by("C").where("name='c'")
         .not_followed_by("B").where("name='b'")
         .within(5, "seconds"))
    meas = {"n": "COUNT(A.*)", "fa": "FIRST(A.event_id)",
            "la": "LAST(A.event_id)", "c": "LAST(C.event_id)"}

    def run(pp, sk):
        out = cep_select(spark, df, pp, "k", "ep", meas, skip=sk)
        return sorted(tuple(r[c] for c in meas) for r in out.collect())

    # the reference expectation, verbatim
    assert run(p, "SKIP PAST LAST ROW") == [(3, 40, 42, 43)]
    # no-skip emits the full SKIP_TILL_ANY family (every a-subset)
    assert run(p, "SKIP TO NEXT ROW") == [
        (1, 40, 40, 43), (1, 41, 41, 43), (1, 42, 42, 43),
        (2, 40, 41, 43), (2, 40, 42, 43), (2, 41, 42, 43),
        (3, 40, 42, 43),
    ]
    # a forbidden row strictly inside (end, start + w) kills: b@5s is
    # inside a1's (4, 6) window — but matches starting a2/a3 survive
    # (their deadlines are 7/8s; b@5 kills those too: 5 < 7, 5 < 8 — so
    # everything with end < 5 dies; matches ENDING at c1@4 all die)
    rows_kill = rows + [(1, 45, "b", 5 * S)]
    dfk = spark.createDataFrame(
        rows_kill, "k long, event_id long, name string, ep long"
    )
    out = cep_select(spark, dfk, p, "k", "ep", meas,
                     skip="SKIP PAST LAST ROW")
    assert sorted(tuple(r[c] for c in meas) for r in out.collect()) == []
    # a forbidden row exactly AT the deadline does NOT kill: the
    # reference processes advanceTime (the timeout) before the
    # same-time event (NFA.isStateTimedOut prunes at >=)
    rows_eq = rows + [(1, 45, "b", 6 * S)]
    dfe = spark.createDataFrame(
        rows_eq, "k long, event_id long, name string, ep long"
    )
    out = cep_select(spark, dfe, p, "k", "ep", meas,
                     skip="SKIP PAST LAST ROW")
    got = sorted(tuple(r[c] for c in meas) for r in out.collect())
    # a1's deadline is 6s: b@6 confirms a1's family; a2/a3 starts have
    # deadlines 7/8s so b@6 kills their families (but they overlap the
    # emitted a1 match anyway under skip-past-last)
    assert got == [(3, 40, 42, 43)]
    # PREVIOUS_AND_CURRENT on the trailing element composes too: the
    # window then runs from the match END (the previous taken event)
    p2 = (Pattern.begin("A").where("name='a'")
          .times(2).consecutive()
          .followed_by("C").where("name='c'")
          .not_followed_by("B").where("name='b'")
          .within(3, "seconds",
                  within_type="PREVIOUS_AND_CURRENT"))
    # end c1@4, window 3s from the end -> deadline 7s: b@6 kills
    out = cep_select(spark, dfe, p2, "k", "ep", meas,
                     skip="SKIP TO NEXT ROW")
    assert sorted(tuple(r[c] for c in meas) for r in out.collect()) == []
    # ...but b@8 is outside (deadline 7s): both times(2) windows confirm
    rows_ok = rows + [(1, 45, "b", 8 * S)]
    dfo = spark.createDataFrame(
        rows_ok, "k long, event_id long, name string, ep long"
    )
    out = cep_select(spark, dfo, p2, "k", "ep", meas,
                     skip="SKIP TO NEXT ROW")
    assert sorted(tuple(r[c] for c in meas) for r in out.collect()) == [
        (2, 40, 41, 43), (2, 41, 42, 43),
    ]


def test_nfaitcase_zero_or_more_long_tail(spark):
    """NFAITCase zero-or-more long tail (r11) — reproduced verbatim
    (unbounded allowCombinations forms carry a within() horizon larger
    than every fixture span: the supported surface; the horizon-less
    form is the documented reject).

    :2578 testMultipleTakesVersionCollision — TWO adjacent unbounded
    SKIP_TILL_ANY loops over the same condition: the reference emits a
    MULTISET (distinct M1/M2 splits flatten to equal event lists); the
    engine's per-split matches project to exactly that multiset."""
    from collections import Counter

    # :2578 — c a a a a a b; (flat count, flat id-sum) multiset
    rows = [(1, 40, "c", 1 * S), (1, 41, "a", 3 * S), (1, 42, "a", 4 * S),
            (1, 43, "a", 5 * S), (1, 44, "a", 6 * S), (1, 45, "a", 7 * S),
            (1, 50, "b", 10 * S)]
    p = (Pattern.begin("C").where("name='c'")
         .followed_by("M1").where("name='a'")
         .one_or_more().allow_combinations()
         .followed_by("M2").where("name='a'")
         .one_or_more().allow_combinations()
         .followed_by("B").where("name='b'")
         .within(1, "minutes"))
    meas = {"n1": "COUNT(M1.*)", "s1": "SUM(M1.event_id)",
            "n2": "COUNT(M2.*)", "s2": "SUM(M2.event_id)"}
    out = cep_select(
        spark,
        spark.createDataFrame(
            rows, "k long, event_id long, name string, ep long"
        ),
        p, "k", "ep, event_id", meas,
    )
    got = Counter(
        (r["n1"] + r["n2"], r["s1"] + r["s2"]) for r in out.collect()
    )
    assert got == Counter({
        (5, 215): 4, (4, 170): 3, (4, 172): 2, (4, 171): 2, (4, 173): 2,
        (3, 126): 2, (3, 128): 2, (3, 130): 1, (3, 127): 1, (2, 83): 1,
    }), got
    # :811 testZeroOrMoreAfterZeroOrMore — two adjacent OPTIONAL
    # SKIP_TILL_ANY loops over different conditions; the second loop's
    # followedBy ENTRY still anchors at the first qualifying d
    rows2 = [(1, 40, "c", 1 * S), (1, 41, "a", 3 * S),
             (1, 42, "d", 4 * S), (1, 43, "d", 5 * S),
             (1, 44, "e", 6 * S)]
    p2 = (Pattern.begin("C").where("name='c'")
          .followed_by_any("M1").where("name='a'")
          .one_or_more().allow_combinations().optional()
          .followed_by("M2").where("name='d'")
          .one_or_more().allow_combinations().optional()
          .followed_by("E").where("name='e'")
          .within(1, "minutes"))
    m2 = {"n1": "COUNT(M1.*)", "n2": "COUNT(M2.*)",
          "l2": "LAST(M2.event_id)", "e": "LAST(E.event_id)"}
    assert _run_cep(spark, rows2, p2, m2) == sorted([
        (1, 2, 43, 44), (1, 1, 42, 44), (0, 2, 43, 44),
        (0, 1, 42, 44), (1, 0, None, 44), (0, 0, None, 44),
    ], key=str)
    # :859 testZeroOrMoreAfterBranching — followedByAny branch, merge,
    # then an optional SKIP_TILL_ANY kleene: every (a-choice x kleene
    # subset)
    rows3 = [(1, 40, "c", 1 * S), (1, 41, "a", 3 * S),
             (1, 42, "a", 4 * S), (1, 90, "f", 5 * S),
             (1, 43, "d", 6 * S), (1, 44, "d", 7 * S),
             (1, 45, "e", 8 * S)]
    p3 = (Pattern.begin("C").where("name='c'")
          .followed_by_any("A").where("name='a'")
          .followed_by_any("MG").where("name='f'")
          .followed_by_any("K").where("name='d'")
          .one_or_more().allow_combinations().optional()
          .followed_by("E").where("name='e'")
          .within(1, "minutes"))
    m3 = {"a": "LAST(A.event_id)", "nk": "COUNT(K.*)",
          "sk": "SUM(K.event_id)", "e": "LAST(E.event_id)"}
    assert _run_cep(spark, rows3, p3, m3) == sorted([
        (41, 0, None, 45), (41, 1, 43, 45), (41, 1, 44, 45),
        (41, 2, 87, 45),
        (42, 0, None, 45), (42, 1, 43, 45), (42, 1, 44, 45),
        (42, 2, 87, 45),
    ], key=str)
    # :913 testStrictContinuityNoResultsAfterZeroOrMore — next after an
    # optional loop: the c between the loop and b kills everything
    rows4 = [(1, 40, "d", 1 * S), (1, 41, "a", 2 * S),
             (1, 42, "a", 3 * S), (1, 43, "c", 4 * S),
             (1, 44, "b", 5 * S)]
    p4 = (Pattern.begin("ST").where("name='d'")
          .followed_by("M").where("name='a'").one_or_more().optional()
          .next("E").where("name='b'"))
    m4 = {"n": "COUNT(M.*)", "fm": "FIRST(M.event_id)",
          "lm": "LAST(M.event_id)"}
    assert _run_cep(spark, rows4, p4, m4) == []
    # :946 testStrictContinuityResultsAfterZeroOrMore — only the
    # branches whose LAST take sits strictly before b survive
    rows5 = [(1, 40, "d", 1 * S), (1, 41, "a", 2 * S),
             (1, 42, "a", 3 * S), (1, 43, "b", 5 * S)]
    p5 = (Pattern.begin("ST").where("name='d'")
          .followed_by_any("M").where("name='a'")
          .one_or_more().optional().allow_combinations()
          .next("E").where("name='b'")
          .within(1, "minutes"))
    assert _run_cep(spark, rows5, p5, m4) == sorted([
        (2, 41, 42), (1, 42, 42),
    ], key=str)
    # :2022 testSkipTillAnyZeroOrMore — every m1-anchored subset plus
    # the empty branch (the followedBy ENTRY pins the first take to m1)
    rows6 = [(1, 40, "c", 1 * S), (1, 90, "d", 2 * S),
             (1, 41, "a", 3 * S), (1, 42, "a", 4 * S),
             (1, 43, "a", 4 * S + 1), (1, 91, "d", 5 * S),
             (1, 44, "a", 6 * S), (1, 50, "b", 7 * S)]
    p6 = (Pattern.begin("C").where("name='c'")
          .followed_by("M").where("name='a'")
          .one_or_more().optional().allow_combinations()
          .followed_by("E").where("name='b'")
          .within(1, "minutes"))
    m6 = {"n": "COUNT(M.*)", "fm": "FIRST(M.event_id)",
          "sm": "SUM(M.event_id)", "e": "LAST(E.event_id)"}
    assert _run_cep(spark, rows6, p6, m6) == sorted([
        (4, 41, 170, 50), (3, 41, 127, 50), (3, 41, 128, 50),
        (2, 41, 85, 50), (3, 41, 126, 50), (2, 41, 83, 50),
        (2, 41, 84, 50), (1, 41, 41, 50), (0, None, None, 50),
    ], key=str)
    # :1056 testNextZeroOrMore — strict-entry optional consecutive
    # loop: the non-middle row next to start kills the loop branch,
    # only the zero branch reaches end
    rows7 = [(1, 40, "st", 1 * S), (1, 90, "ev", 2 * S),
             (1, 41, "mi", 3 * S), (1, 42, "mi", 4 * S),
             (1, 43, "mi", 5 * S), (1, 46, "en", 6 * S)]
    p7 = (Pattern.begin("ST").where("name='st'")
          .next("M").where("name='mi'")
          .one_or_more().optional().consecutive()
          .followed_by("E").where("name='en'"))
    m7 = {"s": "LAST(ST.event_id)", "nm": "COUNT(M.*)",
          "e": "LAST(E.event_id)"}
    assert _run_cep(spark, rows7, p7, m7) == [(40, 0, 46)]


def _run_cep_priced(spark, rows, p, meas):
    df = spark.createDataFrame(
        rows, "k long, event_id long, name string, price double, ep long"
    )
    out = cep_select(spark, df, p, "k", "ep, event_id", meas)
    return sorted(
        (tuple(r[c] for c in meas) for r in out.collect()), key=str
    )


def test_until_condition_itcase_scenarios(spark):
    """UntilConditionITCase harvest (r11) — all 12 scenarios reproduced
    verbatim (flink-libraries/flink-cep UntilConditionITCase.java).
    until() strengthens every row the loop consumes with NOT(stop) —
    takes AND ignore edges — and bind-aggregates inside the stop
    condition evaluate over ACCEPTED events only (the reference's
    ctx.getEventsForPattern never includes the candidate; the Java
    `sum = 0` loop is ported as COALESCE(SUM(...), 0))."""
    MU = {"n": "COUNT(M.*)", "fm": "FIRST(M.event_id)",
          "lm": "LAST(M.event_id)", "e": "LAST(E.event_id)"}

    def base_pat(entry_any=False, optional=False, combinations=False,
                 consecutive=False, with_end=True, where=True):
        p = Pattern.begin("C").where("name='c'")
        p = (p.followed_by_any("M") if entry_any else p.followed_by("M"))
        if where:
            p = p.where("name='a'")
        p = p.one_or_more()
        if combinations:
            p = p.allow_combinations()
        if consecutive:
            p = p.consecutive()
        if optional:
            p = p.optional()
        p = p.until("price = 5.0")
        if combinations:
            p = p.within(1, "minutes")
        if with_end:
            p = p.followed_by("E").where("price = 5.0")
        return p

    # fixture A (:48/:91/:226/:270): c, a@2.0, a@3.0, [a@4.0,]
    # breaking a@5.0, ignored a@6.0
    rows = [(1, 40, "c", 1.0, 1 * S), (1, 41, "a", 2.0, 3 * S),
            (1, 42, "a", 3.0, 4 * S), (1, 44, "a", 5.0, 6 * S),
            (1, 45, "a", 6.0, 7 * S)]
    rows3m = [(1, 40, "c", 1.0, 1 * S), (1, 41, "a", 2.0, 3 * S),
              (1, 42, "a", 3.0, 4 * S), (1, 43, "a", 4.0, 5 * S),
              (1, 44, "a", 5.0, 6 * S), (1, 45, "a", 6.0, 7 * S)]
    # :48 testUntilConditionFollowedByOneOrMore
    assert _run_cep_priced(spark, rows, base_pat(), MU) == sorted([
        (2, 41, 42, 44), (1, 41, 41, 44),
    ], key=str)
    # :91 ...OneOrMoreCombinations — m1-anchored subsets
    assert _run_cep_priced(
        spark, rows3m, base_pat(combinations=True), MU
    ) == sorted([
        (3, 41, 43, 44), (2, 41, 42, 44), (2, 41, 43, 44),
        (1, 41, 41, 44),
    ], key=str)
    # :226 ...ZeroOrMore — plus the empty branch
    assert _run_cep_priced(spark, rows, base_pat(optional=True), MU) == \
        sorted([
            (2, 41, 42, 44), (1, 41, 41, 44), (0, None, None, 44),
        ], key=str)
    # :270 ...ZeroOrMoreCombinations
    assert _run_cep_priced(
        spark, rows3m, base_pat(optional=True, combinations=True), MU
    ) == sorted([
        (3, 41, 43, 44), (2, 41, 42, 44), (2, 41, 43, 44),
        (1, 41, 41, 44), (0, None, None, 44),
    ], key=str)
    # fixture B (:139/:320): breaking/ignored later (consecutive runs)
    rows_c = [(1, 40, "c", 1.0, 1 * S), (1, 41, "a", 2.0, 3 * S),
              (1, 42, "a", 3.0, 4 * S), (1, 45, "a", 5.0, 7 * S),
              (1, 46, "a", 6.0, 8 * S)]
    # :139 ...OneOrMoreConsecutive
    assert _run_cep_priced(
        spark, rows_c, base_pat(consecutive=True), MU
    ) == sorted([(2, 41, 42, 45), (1, 41, 41, 45)], key=str)
    # :320 ...ZeroOrMoreConsecutive
    assert _run_cep_priced(
        spark, rows_c, base_pat(consecutive=True, optional=True), MU
    ) == sorted([
        (2, 41, 42, 45), (1, 41, 41, 45), (0, None, None, 45),
    ], key=str)
    # :182 ...OneOrMoreConsecutive2 — a b-row breaks the consecutive
    # run; only the single-take match survives (the followedBy entry
    # cannot skip the qualifying m1 to anchor at m3)
    rows_c2 = [(1, 40, "c", 1.0, 1 * S), (1, 41, "a", 2.0, 3 * S),
               (1, 42, "b", 3.0, 4 * S), (1, 43, "a", 4.0, 5 * S),
               (1, 45, "a", 5.0, 7 * S), (1, 46, "a", 6.0, 8 * S)]
    assert _run_cep_priced(
        spark, rows_c2, base_pat(consecutive=True), MU
    ) == [(1, 41, 41, 45)]
    # fixture C (:365/:402): a later qualifying row after the breaker
    rows_any = [(1, 40, "c", 1.0, 1 * S), (1, 41, "a", 2.0, 3 * S),
                (1, 42, "a", 3.0, 4 * S), (1, 44, "a", 5.0, 6 * S),
                (1, 45, "a", 6.0, 7 * S)]
    MN = {"n": "COUNT(M.*)", "fm": "FIRST(M.event_id)",
          "lm": "LAST(M.event_id)"}
    # :365 ...AnyOneOrMore — no end element; followedByAny anchors at
    # every qualifying row the until admits (the breaker itself is
    # rejected by the stop condition; m3 AFTER the breaker anchors)
    assert _run_cep_priced(
        spark, rows_any, base_pat(entry_any=True, with_end=False), MN
    ) == sorted([
        (2, 41, 42), (1, 41, 41), (1, 42, 42), (1, 45, 45),
    ], key=str)
    # :402 ...AnyZeroOrMore — plus the empty branch
    assert _run_cep_priced(
        spark, rows_any,
        base_pat(entry_any=True, optional=True, with_end=False), MN
    ) == sorted([
        (2, 41, 42), (1, 41, 41), (1, 42, 42), (1, 45, 45),
        (0, None, None),
    ], key=str)
    # :441 testUntilConditionWithEmptyWhere — a where()-less loop takes
    # EVERY row until the stop fires
    rows_ew = [(1, 40, "c", 1.0, 1 * S), (1, 41, "a", 2.0, 3 * S),
               (1, 42, "a", 3.0, 4 * S), (1, 43, "d", 1.0, 5 * S),
               (1, 44, "a", 5.0, 6 * S), (1, 45, "a", 6.0, 7 * S)]
    assert _run_cep_priced(
        spark, rows_ew, base_pat(with_end=False, where=False), MN
    ) == sorted([(3, 41, 43), (2, 41, 42), (1, 41, 41)], key=str)
    # :484/:540 testIterativeUntilCondition{OneOrMore,ZeroOrMore} — the
    # stop reads the ACCEPTED events' running sum (getEventsForPattern
    # excludes the candidate): the match REACHING the threshold emits,
    # the take after it is blocked
    p_it = (Pattern.begin("C").where("name='c'")
            .followed_by("M").one_or_more()
            .until("COALESCE(SUM(M.price), 0.0) = 6.0"))
    assert _run_cep_priced(spark, rows_ew, p_it, MN) == sorted([
        (3, 41, 43), (2, 41, 42), (1, 41, 41),
    ], key=str)
    p_it0 = (Pattern.begin("C").where("name='c'")
             .followed_by("M").one_or_more().optional()
             .until("COALESCE(SUM(M.price), 0.0) = 6.0"))
    assert _run_cep_priced(spark, rows_ew, p_it0, MN) == sorted([
        (3, 41, 43), (2, 41, 42), (1, 41, 41), (0, None, None),
    ], key=str)


# TimesRangeITCase / TimesOrMoreITCase (r11) — both reference suites,
# parameterized over the quantifier window exactly like the reference
# (@Parameterized: null and 3ms -> None and 3 seconds here). Scenario
# tuples: (name, quant(from,to), entry, mods, seq, base, null_only)
# where seq items are (name, ts_sec) and match sets are middle-id
# strings ("13" = {m1, m3}).
_TIMES_SUITE = [
    # TimesRangeITCase
    ("timesRange", (1, 3), "next", "comb",
     [("c", 1), ("a1", 2), ("a2", 3), ("a3", 4), ("b", 6)],
     ["123", "12", "13", "1"], []),
    ("timesRangeFromZero", (0, 2), "next", "comb",
     [("c", 1), ("a1", 2), ("a2", 3), ("a3", 4), ("b", 6)],
     ["12", "13", "1", ""], []),
    ("timesRangeNonStrict", (1, 3), "any", "comb",
     [("c", 1), ("f", 2), ("a1", 3), ("f", 4), ("a2", 5), ("a3", 6),
      ("b", 7)],
     ["123", "12", "13", "1"], ["23", "2", "3"]),
    ("timesRangeStrict", (0, 3), "any", "consec",
     [("c", 1), ("f", 2), ("a1", 3), ("f", 4), ("a2", 5), ("a3", 6),
      ("b", 7)],
     ["23", "1", "2", "3", ""], []),
    ("timesRangeStrictOptional", (1, 3), "any", "consec+opt",
     [("c", 1), ("f", 2), ("a1", 3), ("f", 4), ("a2", 5), ("a3", 6),
      ("b", 7)],
     ["23", "1", "2", "3", ""], []),
    ("timesRangeStrictOptional1", (1, 3), "next", "consec+opt",
     [("c", 1), ("a1", 3), ("a2", 5), ("a3", 6), ("b", 7)],
     ["123", "12", "1", ""], []),
    ("timesRangeNonStrictOptional1", (1, 3), "fb", "opt",
     [("c", 1), ("f", 2), ("b", 7)],
     [""], []),
    ("timesRangeNonStrictOptional2", (2, 3), "any", "comb+opt",
     [("c", 1), ("f", 2), ("a1", 3), ("f", 4), ("a2", 5), ("a3", 6),
      ("b", 7)],
     ["123", "12", "23", ""], ["13"]),
    ("timesRangeNonStrictOptional3", (2, 3), "any", "opt",
     [("c", 1), ("f", 2), ("a1", 3), ("f", 4), ("a2", 5), ("a3", 6),
      ("b", 7)],
     ["123", "12", "23", ""], []),
    ("timesRangeNonStrictWithNext", (2, 3), "next", "comb",
     [("c", 1), ("a1", 2), ("f", 3), ("a2", 4), ("f", 5), ("a3", 6),
      ("b", 7)],
     ["123", "12"], ["13"]),
    ("timesRangeNotStrictWithFollowedBy", (2, 3), "fb", "",
     [("c", 1), ("a1", 2), ("a2", 4), ("a3", 6), ("b", 7)],
     ["123", "12"], []),
    ("timesRangeNotStrictWithFollowedByAny", (2, 3), "any", "comb",
     [("c", 1), ("a1", 2), ("a2", 4), ("a3", 6), ("b", 7)],
     ["123", "12"], ["23", "13"]),
    # TimesOrMoreITCase (to=None -> timesOrMore)
    ("timesOrMore", (2, None), "fb", "comb",
     [("c", 1), ("a1", 2), ("a2", 3), ("a3", 4), ("b", 6)],
     ["123", "12", "13"], []),
    ("timesOrMoreNonStrict", (2, None), "any", "comb",
     [("c", 1), ("f", 2), ("a1", 3), ("f", 4), ("a2", 5), ("a3", 6),
      ("b", 7)],
     ["123", "12"], ["13", "23"]),
    # reference quirk: testTimesOrMoreStrict uses times(2) WITHOUT the
    # window parameter — identical for both parameterizations
    ("timesOrMoreStrict", (2, 2), "any", "consec+nowin",
     [("c", 1), ("f", 2), ("a1", 3), ("f", 4), ("a2", 5), ("a3", 6),
      ("b", 7)],
     ["23"], []),
    ("timesOrMoreStrictOptional", (2, None), "any", "consec+opt",
     [("c", 1), ("f", 2), ("a1", 3), ("f", 4), ("a2", 5), ("a3", 6),
      ("b", 7)],
     ["23", ""], []),
    ("timesOrMoreStrictOptional2", (2, None), "next", "consec+opt",
     [("c", 1), ("a1", 3), ("a2", 5), ("a3", 6), ("b", 7)],
     ["123", "12", ""], []),
    ("timesOrMoreNonStrictOptional", (2, None), "fb", "opt",
     [("c", 1), ("f", 2), ("b", 7)],
     [""], []),
    ("timesOrMoreNonStrictOptional2", (2, None), "any", "comb+opt",
     [("c", 1), ("f", 2), ("a1", 3), ("f", 4), ("a2", 5), ("a3", 6),
      ("b", 7)],
     ["123", "12", "23", ""], ["13"]),
    ("timesOrMoreNonStrictOptional3", (2, None), "any", "opt",
     [("c", 1), ("f", 2), ("a1", 3), ("f", 4), ("a2", 5), ("a3", 6),
      ("b", 7)],
     ["123", "12", "23", ""], []),
    ("timesOrMoreNonStrictWithNext", (2, None), "next", "comb",
     [("c", 1), ("a1", 2), ("f", 3), ("a2", 4), ("f", 5), ("a3", 6),
      ("b", 7)],
     ["123", "12"], ["13"]),
    ("timesOrMoreNotStrictWithFollowedBy", (2, None), "fb", "",
     [("c", 1), ("a1", 2), ("a2", 4), ("a3", 6), ("b", 7)],
     ["123", "12"], []),
    ("timesOrMoreNotStrictWithFollowedByAny", (2, None), "any", "comb",
     [("c", 1), ("a1", 2), ("a2", 4), ("a3", 6), ("b", 7)],
     ["123", "12"], ["23", "13"]),
]

_MID_ID = {"1": 41, "2": 42, "3": 43}


@pytest.mark.parametrize("window", [None, (3, "seconds")],
                         ids=["nowin", "win3s"])
def test_times_range_or_more_itcase(spark, window):
    """TimesRangeITCase + TimesOrMoreITCase (r11) — BOTH parameterized
    reference suites reproduced verbatim (23 scenarios x {no window,
    3s window}). The quantifier-window semantics follow the reference's
    state-name-keyed windowTimes exactly (see Pattern._set_loop_window):
    first take bounded vs the previous element's take (optional-loop
    heads unbind after an ignored row), required positions 2..from
    bounded through ignores, optional positions from+1..to-1 bounded
    only when immediate, and the FINAL position never bounded."""
    fcount = [0]
    for (name, (frm, to_), entry, mods, seq, base,
         null_only) in _TIMES_SUITE:
        fcount[0] = 0

        def mkrow(nm, ts):
            if nm == "c":
                return (1, 40, "c", ts * S)
            if nm == "b":
                return (1, 50, "b", ts * S)
            if nm == "f":
                fcount[0] += 1
                return (1, 89 + fcount[0], "f", ts * S)
            return (1, 40 + int(nm[1]), "a", ts * S)

        rows = [mkrow(nm, ts) for nm, ts in seq]
        p = Pattern.begin("C").where("name='c'")
        p = {"fb": p.followed_by, "any": p.followed_by_any,
             "next": p.next}[entry]("M")
        p = p.where("name='a'")
        win = None if "nowin" in mods else window
        if to_ is None:
            p = p.times_or_more(frm, window=win)
        elif frm == to_:
            p = p.times(frm, window=win)
        else:
            p = p.times(frm, to_, window=win)
        if "comb" in mods:
            p = p.allow_combinations()
        if "consec" in mods:
            p = p.consecutive()
        if "opt" in mods:
            p = p.optional()
        p = p.followed_by("E").where("name='b'")
        if "comb" in mods and to_ is None:
            p = p.within(1, "minutes")  # unbounded SKIP_TILL_ANY horizon
        meas = {"n": "COUNT(M.*)", "fm": "FIRST(M.event_id)",
                "sm": "SUM(M.event_id)", "e": "LAST(E.event_id)"}
        got = _run_cep(spark, rows, p, meas)
        expected_sets = list(base) + ([] if window else list(null_only))

        def tup(s):
            ids = [_MID_ID[ch] for ch in s]
            return ((len(ids), ids[0] if ids else None,
                     sum(ids) if ids else None, 50))

        exp = sorted((tup(s) for s in expected_sets), key=str)
        assert got == exp, (
            f"{name} window={window}: got {got}, expected {exp}"
        )


def test_same_element_itcase_scenarios(spark):
    """SameElementITCase harvest (r11) — value-equal events with equal
    timestamps are DISTINCT stream positions here (rows are schema
    records, not object identities), which matches the reference on
    every scenario whose expectation is positional:
    testEagerZeroOrMoreSameElement:50 (every prefix of the six-take
    run, duplicates included), testClearingBuffer:118 (same-ts tail
    chain), testClearingBufferWithUntilAtTheEnd:155 (iterative until
    over getEventsForPattern COUNT — accepted events only, so the
    prefix REACHING the stop emits), testSimplePatternWSameElement:324
    (two value-equal matches stay two matches). r12: the remaining
    scenarios (:204 :356 :410 :451) turned out to be positionally exact
    as value multisets too — see test_same_element_itcase_remaining;
    the r11 'SharedBuffer value-dedup divergence' reading was wrong."""
    M = {"n": "COUNT(M.*)", "fm": "FIRST(M.event_id)",
         "lm": "LAST(M.event_id)", "e": "LAST(E.event_id)"}
    # :50 — c, m1 x3 (same ts), m2, d, m3 x2 (same ts), b: every prefix
    rows = [(1, 40, "c", 1 * S), (1, 41, "a", 3 * S), (1, 41, "a", 3 * S),
            (1, 41, "a", 3 * S), (1, 42, "a", 4 * S), (1, 50, "d", 5 * S),
            (1, 43, "a", 6 * S), (1, 43, "a", 6 * S), (1, 44, "b", 7 * S)]
    p = (Pattern.begin("C").where("name='c'")
         .followed_by("M").where("name='a'").one_or_more().optional()
         .followed_by("E").where("name='b'"))
    assert _run_cep(spark, rows, p, M) == sorted([
        (6, 41, 43, 44), (5, 41, 43, 44), (4, 41, 42, 44),
        (3, 41, 41, 44), (2, 41, 41, 44), (1, 41, 41, 44),
        (0, None, None, 44),
    ], key=str)
    # :118 — a, then b/c/d all at the SAME timestamp: one match, the
    # same-ts tail binds in tie-break order
    rows2 = [(1, 40, "a", 1 * S), (1, 41, "b", 2 * S),
             (1, 42, "c", 2 * S), (1, 43, "d", 2 * S)]
    p2 = (Pattern.begin("A").where("name='a'")
          .followed_by("B").where("name='b'")
          .followed_by("Cc").where("name='c'")
          .followed_by("D").where("name='d'"))
    m2 = {"a": "LAST(A.event_id)", "b": "LAST(B.event_id)",
          "c": "LAST(Cc.event_id)", "d": "LAST(D.event_id)"}
    assert _run_cep(spark, rows2, p2, m2) == [(40, 41, 42, 43)]
    # :155 — until(count == 3) over three same-ts duplicates: the loop
    # stops extending once three are ACCEPTED (the candidate is never
    # in getEventsForPattern), so prefixes 1..3 emit and d4 never binds
    rows3 = [(1, 40, "a", 1 * S), (1, 41, "d", 2 * S),
             (1, 41, "d", 2 * S), (1, 41, "d", 2 * S),
             (1, 41, "d", 4 * S)]
    p3 = (Pattern.begin("A").where("name='a'")
          .followed_by("D").where("name='d'").one_or_more()
          .until("COUNT(D.event_id) = 3"))
    m3 = {"a": "LAST(A.event_id)", "n": "COUNT(D.*)"}
    assert _run_cep(spark, rows3, p3, m3) == sorted([
        (40, 1), (40, 2), (40, 3),
    ], key=str)
    # :324 — two value-equal middles under followedByAny: TWO matches
    # (multiset — identical rows, distinct positions)
    rows4 = [(1, 40, "c", 1 * S), (1, 41, "a", 3 * S),
             (1, 41, "a", 3 * S), (1, 44, "b", 7 * S)]
    p4 = (Pattern.begin("C").where("name='c'")
          .followed_by_any("M").where("name='a'")
          .followed_by("E").where("name='b'"))
    m4 = {"c": "LAST(C.event_id)", "m": "LAST(M.event_id)",
          "e": "LAST(E.event_id)"}
    assert _run_cep(spark, rows4, p4, m4) == [
        (40, 41, 44), (40, 41, 44),
    ]


def test_after_match_skip_itcase_long_tail(spark):
    """AfterMatchSkipITCase long tail (r11) — the skip strategies over
    MULTI-MATCH emission, reproduced verbatim. The reference applies
    the strategy as matches COMPLETE (end-event order); the engine
    enumerates the noSkip set and runs the same pruning sweep per key
    (cep.py _enum_skip_select). CEP's skipToNext (one match per start)
    is the 'SKIP TO NEXT' strategy string — distinct from SQL
    MATCH_RECOGNIZE's SKIP TO NEXT ROW, which equals CEP noSkip under
    multi-match emission. Misses follow the CEP DEFAULT (no
    throwExceptionOnMiss): a skip-to target that did not bind or would
    not advance leaves the pruning threshold unchanged
    (testSkipToFirstNonExistentPositionWithoutException:514)."""

    def run(rows, p, meas, skip):
        df = spark.createDataFrame(
            rows, "k long, event_id long, name string, ep long"
        )
        out = cep_select(spark, df, p, "k", "ep", meas, skip=skip)
        return sorted(
            (tuple(r[c] for c in meas) for r in out.collect()), key=str
        )

    # :86 testNoSkipWithFollowedByAny / :102 testSkipToNextWithFollowedByAny
    rows = [(1, 1, "a", 1 * S), (1, 2, "b", 2 * S),
            (1, 3, "a", 3 * S), (1, 4, "b", 4 * S)]
    p = (Pattern.begin("A").where("name='a'")
         .followed_by_any("B").where("name='b'"))
    m = {"a": "LAST(A.event_id)", "b": "LAST(B.event_id)"}
    assert run(rows, p, m, "SKIP TO NEXT ROW") == [(1, 2), (1, 4), (3, 4)]
    assert run(rows, p, m, "SKIP TO NEXT") == [(1, 2), (3, 4)]
    # :147 testNoSkipWithQuantifierAtTheEnd / :168 ...SkipToNext...
    rows2 = [(1, 1, "a", 1 * S), (1, 2, "b", 2 * S),
             (1, 3, "b", 3 * S), (1, 4, "b", 4 * S)]
    p2 = (Pattern.begin("A").where("name='a'")
          .followed_by("B").where("name='b'").one_or_more())
    m2 = {"a": "LAST(A.event_id)", "n": "COUNT(B.*)",
          "lb": "LAST(B.event_id)"}
    assert run(rows2, p2, m2, "SKIP TO NEXT ROW") == [
        (1, 1, 2), (1, 2, 3), (1, 3, 4),
    ]
    assert run(rows2, p2, m2, "SKIP TO NEXT") == [(1, 1, 2)]
    # :319 testSkipPastLast2 — two followedByAny stages; only the
    # earliest-completing combination survives the PAST LAST prune
    rows3 = [(1, 1, "a", 1 * S), (1, 2, "a", 2 * S),
             (1, 3, "b", 3 * S), (1, 4, "b", 4 * S),
             (1, 5, "c", 5 * S), (1, 6, "c", 6 * S),
             (1, 7, "d", 7 * S), (1, 8, "d", 8 * S)]
    p3 = (Pattern.begin("A").where("name='a'")
          .followed_by_any("B").where("name='b'")
          .followed_by_any("Cc").where("name='c'")
          .followed_by("D").where("name='d'"))
    m3 = {"a": "LAST(A.event_id)", "b": "LAST(B.event_id)",
          "c": "LAST(Cc.event_id)", "d": "LAST(D.event_id)"}
    assert run(rows3, p3, m3, "SKIP PAST LAST ROW") == [(1, 3, 5, 7)]
    # :358 testSkipPastLast3 — overlapping strict pair is consumed
    rows4 = [(1, 1, "a", 1 * S), (1, 2, "c", 2 * S),
             (1, 3, "a", 3 * S), (1, 4, "b", 4 * S)]
    p4 = (Pattern.begin("A").where("name='a'")
          .next("B").where("name='b'"))
    assert run(rows4, p4, m, "SKIP PAST LAST ROW") == [(3, 4)]
    # :385 testSkipToFirstWithOptionalMatch — the empty optional loop
    # makes the skip-to target the match start: a MISS under the CEP
    # default, so both matches emit
    rows5 = [(1, 1, "ab", 1 * S), (1, 2, "c", 2 * S),
             (1, 3, "ab", 3 * S), (1, 4, "c", 4 * S)]
    p5 = (Pattern.begin("X").where("name LIKE '%x%'")
          .one_or_more().optional()
          .next("B").where("name LIKE '%b%'")
          .next("Cc").where("name LIKE '%c%'"))
    m5 = {"b": "LAST(B.event_id)", "c": "LAST(Cc.event_id)"}
    assert run(rows5, p5, m5, "SKIP TO FIRST B") == [(1, 2), (3, 4)]
    # :445 testSkipToFirstWithOneOrMore / :570 testSkipToLastWithOneOrMore
    rows6 = [(1, 1, "a", 1 * S), (1, 2, "b", 2 * S),
             (1, 3, "a", 3 * S), (1, 4, "b", 4 * S),
             (1, 5, "b", 5 * S), (1, 6, "a", 6 * S),
             (1, 7, "b", 7 * S)]
    p6 = (Pattern.begin("A").where("name='a'")
          .next("B").where("name='b'").one_or_more().consecutive())
    m6 = {"a": "LAST(A.event_id)", "lb": "LAST(B.event_id)"}
    assert run(rows6, p6, m6, "SKIP TO FIRST B") == [
        (1, 2), (3, 4), (6, 7),
    ]
    assert run(rows6, p6, m6, "SKIP TO LAST B") == [
        (1, 2), (3, 4), (6, 7),
    ]
    # :514/:531 non-existent position WITHOUT exception: B never binds
    # (optional, zero rows match) — the skip is a silent miss
    rows7 = [(1, 1, "a", 1 * S), (1, 2, "c", 2 * S)]
    p7 = (Pattern.begin("A").where("name='a'")
          .next("B").where("name='b'").one_or_more().optional()
          .consecutive()
          .next("Cc").where("name='c'"))
    m7 = {"a": "LAST(A.event_id)", "c": "LAST(Cc.event_id)"}
    assert run(rows7, p7, m7, "SKIP TO FIRST B") == [(1, 2)]
    assert run(rows7, p7, m7, "SKIP TO LAST B") == [(1, 2)]
    # :610 testSkipPastLastWithOneOrMoreAtBeginning (docs example) —
    # greedy consecutive loop at the head, PAST LAST ROW
    rows8 = [(1, 1, "a", 1 * S), (1, 2, "a", 2 * S),
             (1, 3, "a", 3 * S), (1, 4, "b", 4 * S)]
    p8 = (Pattern.begin("A").where("name='a'")
          .one_or_more().consecutive().greedy()
          .next("B").where("name='b'"))
    m8 = {"fa": "FIRST(A.event_id)", "la": "LAST(A.event_id)",
          "b": "LAST(B.event_id)"}
    assert run(rows8, p8, m8, "SKIP PAST LAST ROW") == [(1, 3, 4)]
    # :708 testNoSkipWithOneOrMoreAtBeginning (docs example) — every
    # greedy suffix emits under noSkip
    assert run(rows8, p8, m8, "SKIP TO NEXT ROW") == [
        (1, 3, 4), (2, 3, 4), (3, 3, 4),
    ]


def test_greedy_zero_or_more_itcase(spark):
    """GreedyITCase zero-or-more harvest (r11) — the remaining 7
    scenarios, verbatim: greedy() on an OPTIONAL loop emits the single
    maximal match (:42 :79), dummies end the SKIP_TILL_NEXT run (:119)
    or empty it (:155), until(price > 3) stops the greedy run (:186)
    and empties it when the FIRST candidate trips it (:225), and a
    greedy zero-or-more composes before a times(2) GROUP pattern
    (:476)."""

    def runp(rows, p, meas):
        df = spark.createDataFrame(
            rows, "k long, event_id long, name string, price double, ep long"
        )
        out = cep_select(spark, df, p, "k", "ep, event_id", meas)
        return sorted(
            (tuple(r[c] for c in meas) for r in out.collect()), key=str
        )

    def base(until=None):
        p = (Pattern.begin("C").where("name='c'")
             .followed_by("M").where("name='a'")
             .one_or_more().optional().greedy())
        if until:
            p = p.until(until)
        return p.followed_by("D").where("name='d'")

    M = {"n": "COUNT(M.*)", "fm": "FIRST(M.event_id)",
         "lm": "LAST(M.event_id)", "d": "LAST(D.event_id)"}
    # :42 testGreedyZeroOrMore — single maximal match
    rows = [(1, 40, "c", 1.0, 1 * S), (1, 41, "a", 2.0, 2 * S),
            (1, 42, "a", 2.0, 3 * S), (1, 43, "a", 2.0, 4 * S),
            (1, 44, "d", 3.0, 5 * S)]
    assert runp(rows, base(), M) == [(3, 41, 43, 44)]
    # :79 ...InBetween — dummies between takes are skipped
    rows2 = [(1, 40, "c", 1.0, 1 * S), (1, 90, "y", 1.0, 2 * S),
             (1, 41, "a", 2.0, 3 * S), (1, 91, "y", 1.0, 4 * S),
             (1, 42, "a", 2.0, 5 * S), (1, 92, "y", 1.0, 6 * S),
             (1, 43, "a", 2.0, 7 * S), (1, 44, "d", 3.0, 8 * S)]
    assert runp(rows2, base(), M) == [(3, 41, 43, 44)]
    # :119 ...DummyEventsAfterQuantifier — the run ends at the dummy
    rows3 = [(1, 40, "c", 1.0, 1 * S), (1, 41, "a", 2.0, 2 * S),
             (1, 42, "a", 2.0, 3 * S), (1, 93, "y", 2.0, 4 * S),
             (1, 44, "d", 3.0, 5 * S)]
    assert runp(rows3, base(), M) == [(2, 41, 42, 44)]
    # :155 ...DummyEventsBeforeQuantifier — empty loop
    rows4 = [(1, 40, "c", 1.0, 1 * S), (1, 93, "y", 2.0, 2 * S),
             (1, 44, "d", 3.0, 5 * S)]
    assert runp(rows4, base(), M) == [(0, None, None, 44)]
    # :186 testGreedyUntilZeroOrMoreWithDummyEventsAfterQuantifier —
    # until(price > 3) stops the run before a4
    rows5 = [(1, 40, "c", 1.0, 1 * S), (1, 41, "a", 2.0, 2 * S),
             (1, 42, "a", 3.0, 3 * S), (1, 43, "a", 3.0, 4 * S),
             (1, 44, "a", 4.0, 5 * S), (1, 45, "d", 3.0, 6 * S)]
    assert runp(rows5, base(until="price > 3.0"), M) == [
        (3, 41, 43, 45),
    ]
    # :225 testGreedyUntilWithDummyEventsBeforeQuantifier — the FIRST
    # candidate trips the stop: empty loop
    rows6 = [(1, 40, "c", 1.0, 1 * S), (1, 44, "a", 4.0, 2 * S),
             (1, 41, "a", 2.0, 3 * S), (1, 42, "a", 3.0, 4 * S),
             (1, 43, "a", 3.0, 5 * S), (1, 45, "d", 3.0, 6 * S)]
    assert runp(rows6, base(until="price > 3.0"), M) == [
        (0, None, None, 45),
    ]
    # :476 testGreedyZeroOrMoreBeforeGroupPattern — the greedy run
    # SKIPS the dummy and takes a3 (all three a's), then (d e){2}, f
    rows7 = [(1, 40, "c", 1.0, 1 * S), (1, 41, "a", 1.0, 2 * S),
             (1, 42, "a", 1.0, 3 * S), (1, 93, "y", 2.0, 4 * S),
             (1, 43, "a", 1.0, 5 * S), (1, 51, "d", 1.0, 6 * S),
             (1, 52, "e", 1.0, 7 * S), (1, 53, "d", 1.0, 8 * S),
             (1, 54, "e", 1.0, 9 * S), (1, 60, "f", 3.0, 10 * S)]
    grp = (Pattern.begin("M1").where("name='d'")
           .followed_by("M2").where("name='e'"))
    p7 = (Pattern.begin("C").where("name='c'")
          .followed_by("M").where("name='a'")
          .one_or_more().optional().greedy()
          .followed_by(grp).times(2)
          .followed_by("F").where("name='f'"))
    m7 = {"n": "COUNT(M.*)", "lm": "LAST(M.event_id)",
          "l2": "LAST(M2.event_id)", "f": "LAST(F.event_id)"}
    assert runp(rows7, p7, m7) == [(3, 43, 54, 60)]


def test_not_next_basic_itcase(spark):
    """NotPatternITCase basic notNext trio (r11, completing the suite):
    :49 testNotNext (the guard kills only the branch whose next row is
    the forbidden one), :85 testNotNextNoMatches (forbidden row
    directly next to the start kills everything), :118
    testNotNextNoMatchesAtTheEnd (a TRAILING notNext checked on the
    final element)."""
    M3 = {"a": "LAST(A.event_id)", "m": "LAST(M.event_id)",
          "d": "LAST(D.event_id)"}
    # :49 — a c1 b c2 d: both c-branches survive (the row next to a is
    # c1, not b)
    rows = [(1, 40, "a", 1 * S), (1, 41, "c", 2 * S),
            (1, 42, "b", 3 * S), (1, 43, "c", 4 * S),
            (1, 44, "d", 5 * S)]
    p = (Pattern.begin("A").where("name='a'")
         .not_next("N").where("name='b'")
         .followed_by_any("M").where("name='c'")
         .followed_by("D").where("name='d'"))
    assert _run_cep(spark, rows, p, M3) == sorted(
        [(40, 41, 44), (40, 43, 44)], key=str
    )
    # :85 — a b c1 c2 d: the b directly after a kills everything
    rows2 = [(1, 40, "a", 1 * S), (1, 42, "b", 2 * S),
             (1, 41, "c", 3 * S), (1, 43, "c", 4 * S),
             (1, 44, "d", 5 * S)]
    p2 = (Pattern.begin("A").where("name='a'")
          .not_next("N").where("name='b'")
          .followed_by("M").where("name='c'")
          .followed_by("D").where("name='d'"))
    assert _run_cep(spark, rows2, p2, M3) == []
    # :118 — a c1 c2 d b: trailing notNext — the b right after d kills
    # every branch (both c-anchors end at the same d)
    rows3 = [(1, 40, "a", 1 * S), (1, 41, "c", 2 * S),
             (1, 43, "c", 3 * S), (1, 44, "d", 4 * S),
             (1, 42, "b", 5 * S)]
    p3 = (Pattern.begin("A").where("name='a'")
          .followed_by_any("M").where("name='c'")
          .followed_by_any("D").where("name='d'")
          .not_next("N").where("name='b'"))
    assert _run_cep(spark, rows3, p3, M3) == []


def test_after_match_skip_greedy_docs_examples(spark):
    """AfterMatchSkipITCase docs examples over GREEDY head loops (r11):
    :641 testSkipToLastWithOneOrMoreAtBeginning and :673
    testSkipToFirstWithOneOrMoreAtBeginning — skipTo targets inside the
    emitted match prune in completion order, and a resume at the match
    start is a silent miss (CEP default), never an error; :417
    testSkipToFirstAtStartPosition — skip-to the pattern HEAD is always
    a miss, so the behavior equals noSkip."""

    def run(rows, p, meas, skip):
        df = spark.createDataFrame(
            rows, "k long, event_id long, name string, ep long"
        )
        out = cep_select(spark, df, p, "k", "ep", meas, skip=skip)
        return sorted(
            (tuple(r[c] for c in meas) for r in out.collect()), key=str
        )

    rows = [(1, 1, "a", 1 * S), (1, 2, "a", 2 * S),
            (1, 3, "a", 3 * S), (1, 4, "b", 4 * S)]
    p = (Pattern.begin("A").where("name='a'")
         .one_or_more().consecutive().greedy()
         .next("B").where("name='b'"))
    m = {"fa": "FIRST(A.event_id)", "la": "LAST(A.event_id)",
         "b": "LAST(B.event_id)"}
    # :641 — resume at LAST a: {a1 a2 a3 b} then {a3 b}
    assert run(rows, p, m, "SKIP TO LAST A") == [
        (1, 3, 4), (3, 3, 4),
    ]
    # :673 — resume at FIRST a = the match start: silent miss -> noSkip
    assert run(rows, p, m, "SKIP TO FIRST A") == [
        (1, 3, 4), (2, 3, 4), (3, 3, 4),
    ]
    # :417 — skip-to the HEAD variable: every resume is a miss
    rows2 = [(1, 1, "ab", 1 * S), (1, 2, "c", 2 * S),
             (1, 3, "ab", 3 * S), (1, 4, "c", 4 * S)]
    p2 = (Pattern.begin("B").where("name LIKE '%b%'")
          .next("Cc").where("name LIKE '%c%'"))
    m2 = {"b": "LAST(B.event_id)", "c": "LAST(Cc.event_id)"}
    assert run(rows2, p2, m2, "SKIP TO FIRST B") == [(1, 2), (3, 4)]


def test_after_match_skip_throw_on_miss(spark):
    """AfterMatchSkipITCase throwExceptionOnMiss tier (r12 — the last 3
    of 26; SkipToElementStrategy.shouldThrowException, getPruningId
    throws FlinkRuntimeException on an unbound target or a bound that
    lands on the match's own first event):

    :483 testSkipToFirstElementOfMatch — skipToFirst on the single
    (head) variable: the pruning id IS the match's first event, which
    MATCH_RECOGNIZE treats as an infinite loop -> throw;
    :507 testSkipToFirstNonExistentPosition / :524 ...ToLast... — the
    optional 'b' never binds in the [a, c] match -> throw; their
    without-exception twins (:514/:534) stay the silent noSkip default.
    The engine spells throwExceptionOnMiss as a 'THROW ON MISS' skip-
    string suffix."""

    def run(rows, p, meas, skip):
        df = spark.createDataFrame(
            rows, "k long, event_id long, name string, ep long"
        )
        out = cep_select(spark, df, p, "k", "ep", meas, skip=skip)
        return sorted(
            (tuple(r[c] for c in meas) for r in out.collect()), key=str
        )

    # :483 — single-variable pattern, skip to its own FIRST
    rows = [(1, 1, "a1", 1 * S)]
    p = Pattern.begin("A").where("name LIKE 'a%'")
    m = {"a": "LAST(A.event_id)"}
    with pytest.raises(Exception, match="first element of a match"):
        run(rows, p, m, "SKIP TO FIRST A THROW ON MISS")
    # without the flag: silent miss == noSkip (the CEP default)
    assert run(rows, p, m, "SKIP TO FIRST A") == [(1,)]

    # :507/:524 — MissedSkipTo: a (b*? consecutive) c over [a, c]
    rows2 = [(1, 1, "a", 1 * S), (1, 4, "c", 2 * S)]
    p2 = (Pattern.begin("A").where("name='a'")
          .next("B").where("name='b'")
          .one_or_more().optional().consecutive()
          .next("Cc").where("name='c'"))
    m2 = {"a": "LAST(A.event_id)", "c": "LAST(Cc.event_id)"}
    with pytest.raises(Exception, match="Could not skip to B"):
        run(rows2, p2, m2, "SKIP TO FIRST B THROW ON MISS")
    with pytest.raises(Exception, match="Could not skip to B"):
        run(rows2, p2, m2, "SKIP TO LAST B THROW ON MISS")
    # :514/:534 — the without-exception twins: [a, c] emits
    assert run(rows2, p2, m2, "SKIP TO FIRST B") == [(1, 4)]
    assert run(rows2, p2, m2, "SKIP TO LAST B") == [(1, 4)]
    # suffix guard: THROW ON MISS is a SkipToElement-only modifier
    with pytest.raises(CepError, match="THROW ON MISS"):
        run(rows2, p2, m2, "SKIP PAST LAST ROW THROW ON MISS")


def test_iterative_conditions_branching_tier(spark):
    """IterativeConditionsITCase branching tier (r12 — the 4 remaining
    of 7; bind-aggregates x followedByAny/allowCombinations together):

    :73 testIterativeWithBranchingPatternCombinations — the eager
    scenario's loop with allowCombinations: row-skipping subsets whose
    RUNNING price sum stays < 5 join the match set;
    :158 testIterativeWithLoopingStartingCombination — a bind-aggregate
    LOOP AT THE PATTERN HEAD with allowCombinations + optional;
    :273 testIterativeWithABACPattern — followedByAny middle1, then a
    LOOP whose take condition aggregates its own binds (RUNNING sum
    <= 5), start rows interleaved with the foo rows;
    :335 testIterativeWithPrevPatternDependencyAfterBranching — the
    END's condition aggregates the HEAD loop's binds across an
    intervening followedByAny stage.

    allowCombinations forms carry a within() horizon larger than every
    fixture span (the supported surface for bounded SKIP_TILL_ANY; the
    horizon-less form is the documented reject). Reference match sets
    reproduced verbatim (multisets — NFATestUtilities.comparePatterns
    sorts inside each match)."""

    def run(rows, p, meas):
        df = spark.createDataFrame(
            rows,
            "k long, event_id long, name string, price double, ep long",
        )
        out = cep_select(spark, df, p, "k", "ep", meas)
        return sorted(
            (tuple(r[c] for c in meas) for r in out.collect()), key=str
        )

    # :73 — same fixture as the :58 eager pin (r10), loop switched to
    # allowCombinations: adds the row-skipping {m1,m3} and {m1,m4}
    rows = [(1, 40, "start", 1.0, 1 * S), (1, 41, "foo1", 1.0, 2 * S),
            (1, 42, "foo2", 2.0, 3 * S), (1, 45, "start", 2.0, 4 * S),
            (1, 43, "foo3", 3.0, 5 * S), (1, 44, "foo4", 1.0, 6 * S),
            (1, 47, "next-one", 1.0, 7 * S), (1, 46, "end", 1.0, 8 * S)]
    p = (Pattern.begin("ST").where("name = 'start'")
         .followed_by("M")
         .where("name LIKE 'foo%' AND SUM(M.price) < 5.0")
         .one_or_more().allow_combinations()
         .followed_by("E").where("name = 'end'")
         .within(1, "minutes"))
    m = {"s": "LAST(ST.event_id)", "n": "COUNT(M.*)",
         "fm": "FIRST(M.event_id)", "lm": "LAST(M.event_id)"}
    assert run(rows, p, m) == sorted([
        (40, 3, 41, 44), (40, 2, 41, 42), (40, 2, 41, 43),
        (40, 2, 41, 44), (40, 1, 41, 41),
        (45, 2, 43, 44), (45, 1, 43, 43),
    ], key=str)

    # :158 — head loop with combinations + optional: adds {s1,s3}
    rows2 = [(1, 40, "start", 1.0, 1 * S), (1, 41, "start", 2.0, 2 * S),
             (1, 42, "start", 3.0, 3 * S), (1, 46, "end", 1.0, 4 * S)]
    p2 = (Pattern.begin("ST")
          .where("name = 'start' AND SUM(ST.price) < 5.0")
          .one_or_more().allow_combinations().optional()
          .followed_by("E").where("name = 'end'")
          .within(1, "minutes"))
    m2 = {"fs": "FIRST(ST.event_id)", "n": "COUNT(ST.*)",
          "ls": "LAST(ST.event_id)", "e": "LAST(E.event_id)"}
    assert run(rows2, p2, m2) == sorted([
        (40, 2, 41, 46), (40, 2, 42, 46), (40, 1, 40, 46),
        (41, 1, 41, 46), (42, 1, 42, 46), (None, 0, None, 46),
    ], key=str)

    # :273 ABAC — start rows ARE the loop rows; RUNNING sum <= 5
    rows3 = [(1, 40, "start", 1.0, 1 * S), (1, 41, "foo1", 1.0, 2 * S),
             (1, 45, "start", 2.0, 3 * S), (1, 46, "start", 3.0, 4 * S),
             (1, 42, "foo2", 2.0, 5 * S), (1, 47, "start", 4.0, 6 * S),
             (1, 43, "foo3", 3.0, 7 * S), (1, 44, "foo4", 1.0, 8 * S),
             (1, 50, "end", 1.0, 9 * S)]
    p3 = (Pattern.begin("ST").where("name = 'start'")
          .followed_by_any("M1").where("name LIKE 'foo%'")
          .followed_by("M2")
          .where("name = 'start' AND SUM(M2.price) <= 5.0").one_or_more()
          .followed_by("E").where("name = 'end'"))
    m3 = {"st": "LAST(ST.event_id)", "m1": "LAST(M1.event_id)",
          "n2": "COUNT(M2.*)", "l2": "LAST(M2.event_id)"}
    assert run(rows3, p3, m3) == sorted([
        (40, 41, 2, 46), (40, 41, 1, 45), (40, 42, 1, 47),
        (45, 42, 1, 47), (46, 42, 1, 47),
    ], key=str)

    # :335 — END aggregates the HEAD loop's binds across followedByAny
    rows4 = [(1, 40, "start", 1.0, 1 * S), (1, 41, "start", 2.0, 2 * S),
             (1, 43, "foo1", 1.0, 3 * S), (1, 42, "start", 3.0, 4 * S),
             (1, 44, "foo2", 2.0, 5 * S), (1, 46, "end", 1.0, 6 * S)]
    p4 = (Pattern.begin("ST").where("name = 'start'").one_or_more()
          .followed_by_any("M1").where("name LIKE 'foo%'")
          .followed_by_any("E")
          .where("name = 'end' AND SUM(ST.price) >= 2.0"))
    m4 = {"n": "COUNT(ST.*)", "fs": "FIRST(ST.event_id)",
          "ls": "LAST(ST.event_id)", "m": "LAST(M1.event_id)"}
    assert run(rows4, p4, m4) == sorted([
        (2, 40, 41, 43), (1, 41, 41, 43),
        (2, 40, 41, 44), (3, 40, 42, 44), (2, 41, 42, 44),
        (1, 41, 41, 44), (1, 42, 42, 44),
    ], key=str)


def test_nfaitcase_basics_harvest(spark):
    """NFAITCase basics harvest (r12) — the condition-less and
    single-step scenarios, reproduced verbatim:

    :86 testNoConditionNFA — condition-less followedBy degenerates to
    adjacency (the SKIP_TILL_NEXT ignore edge is NOT(TRUE) = FALSE);
    :117 testNoConditionLoopingNFA — condition-less loop: every
    contiguous window of length >= 2;
    :154 testAnyWithNoConditionNFA — followedByAny: every ordered pair;
    :191 testSimplePatternNFA — subtype + volume discriminator (volume
    rides the price column; only the vol-10 SubEvent passes > 5);
    :225/:250 testStrictContinuity(With|No)Results — next over [a b]
    matches, over [a c b] does not."""
    # :86
    rows = [(1, 40, "a", 1 * S), (1, 41, "b", 2 * S), (1, 42, "c", 3 * S),
            (1, 43, "d", 4 * S), (1, 44, "e", 5 * S)]
    p = Pattern.begin("A").followed_by("B")
    m = {"a": "LAST(A.event_id)", "b": "LAST(B.event_id)"}
    assert _run_cep(spark, rows, p, m) == [
        (40, 41), (41, 42), (42, 43), (43, 44),
    ]
    # :117
    p2 = Pattern.begin("A").followed_by("B").one_or_more()
    m2 = {"a": "LAST(A.event_id)", "n": "COUNT(B.*)",
          "fb": "FIRST(B.event_id)", "lb": "LAST(B.event_id)"}
    assert _run_cep(spark, rows, p2, m2) == sorted([
        (40, 4, 41, 44), (40, 3, 41, 43), (40, 2, 41, 42), (40, 1, 41, 41),
        (41, 3, 42, 44), (41, 2, 42, 43), (41, 1, 42, 42),
        (42, 2, 43, 44), (42, 1, 43, 43), (43, 1, 44, 44),
    ], key=str)
    # :154
    p3 = Pattern.begin("A").followed_by_any("B")
    assert _run_cep(spark, rows, p3, m) == sorted([
        (i, j) for i in range(40, 44) for j in range(i + 1, 45)
    ], key=str)
    # :191 — price plays SubEvent.volume; barfoo (5.0) fails > 5.0
    rows4 = [(1, 41, "start", 1.0, 1 * S), (1, 90, "foobar", 1.0, 2 * S),
             (1, 91, "barfoo", 5.0, 3 * S), (1, 42, "foo", 10.0, 4 * S),
             (1, 92, "start", 1.0, 5 * S), (1, 43, "end", 1.0, 6 * S)]
    p4 = (Pattern.begin("ST").where("name = 'start'")
          .followed_by("M").where("price > 5.0")
          .followed_by("E").where("name = 'end'"))
    m4 = {"s": "LAST(ST.event_id)", "m": "LAST(M.event_id)",
          "e": "LAST(E.event_id)"}
    assert _run_cep_priced(spark, rows4, p4, m4) == [(41, 42, 43)]
    # :225 / :250
    p5 = (Pattern.begin("M").where("name = 'a'")
          .next("E").where("name = 'b'"))
    m5 = {"m": "LAST(M.event_id)", "e": "LAST(E.event_id)"}
    assert _run_cep(
        spark, [(1, 41, "a", 3 * S), (1, 42, "b", 5 * S)], p5, m5
    ) == [(41, 42)]
    assert _run_cep(
        spark,
        [(1, 41, "a", 3 * S), (1, 42, "c", 4 * S), (1, 43, "b", 5 * S)],
        p5, m5,
    ) == []


def test_nfaitcase_kleene_families_harvest(spark):
    """NFAITCase zero-or-more / at-least-one / optional families (r12),
    reproduced verbatim (allowCombinations forms carry a within()
    horizon larger than every fixture span — the supported surface for
    bounded SKIP_TILL_ANY):

    :694 testZeroOrMore (followedByAny + combinations + optional: all
    subsets incl. empty), :732 testEagerZeroOrMore (anchored prefixes
    through an ignorable 'd'), :982 testAtLeastOne (no empty branch),
    :1018 testBeginWithAtLeastOne (head loop + combinations),
    :1093 testAtLeastOneEager (followedByAny entry: prefixes from EVERY
    anchor), :1134 testOptional."""
    MU = {"n": "COUNT(M.*)", "fm": "FIRST(M.event_id)",
          "lm": "LAST(M.event_id)", "e": "LAST(E.event_id)"}
    # :694
    rows = [(1, 40, "c", 1 * S), (1, 41, "a", 3 * S),
            (1, 42, "a", 4 * S), (1, 44, "b", 6 * S)]
    p = (Pattern.begin("C").where("name = 'c'")
         .followed_by_any("M").where("name = 'a'")
         .one_or_more().allow_combinations().optional()
         .followed_by("E").where("name = 'b'")
         .within(1, "minutes"))
    assert _run_cep(spark, rows, p, MU) == sorted([
        (2, 41, 42, 44), (1, 41, 41, 44), (1, 42, 42, 44),
        (0, None, None, 44),
    ], key=str)
    # :732
    rows2 = [(1, 40, "c", 1 * S), (1, 41, "a", 3 * S), (1, 42, "a", 4 * S),
             (1, 90, "d", 5 * S), (1, 43, "a", 6 * S), (1, 44, "b", 7 * S)]
    p2 = (Pattern.begin("C").where("name = 'c'")
          .followed_by("M").where("name = 'a'").one_or_more().optional()
          .followed_by("E").where("name = 'b'"))
    assert _run_cep(spark, rows2, p2, MU) == sorted([
        (3, 41, 43, 44), (2, 41, 42, 44), (1, 41, 41, 44),
        (0, None, None, 44),
    ], key=str)
    # :982
    p3 = (Pattern.begin("C").where("name = 'c'")
          .followed_by_any("M").where("name = 'a'")
          .one_or_more().allow_combinations()
          .followed_by_any("E").where("name = 'b'")
          .within(1, "minutes"))
    assert _run_cep(spark, rows, p3, MU) == sorted([
        (2, 41, 42, 44), (1, 41, 41, 44), (1, 42, 42, 44),
    ], key=str)
    # :1018
    rows3 = [(1, 41, "a", 3 * S), (1, 42, "a", 4 * S),
             (1, 43, "a", 5 * S), (1, 44, "b", 6 * S)]
    p4 = (Pattern.begin("M").where("name = 'a'")
          .one_or_more().allow_combinations()
          .followed_by("E").where("name = 'b'")
          .within(1, "minutes"))
    assert _run_cep(spark, rows3, p4, MU) == sorted([
        (3, 41, 43, 44), (2, 41, 42, 44), (2, 41, 43, 44), (2, 42, 43, 44),
        (1, 41, 41, 44), (1, 42, 42, 44), (1, 43, 43, 44),
    ], key=str)
    # :1093
    rows4 = [(1, 40, "c", 1 * S), (1, 41, "a", 3 * S), (1, 42, "a", 4 * S),
             (1, 43, "a", 5 * S), (1, 44, "b", 6 * S)]
    p5 = (Pattern.begin("C").where("name = 'c'")
          .followed_by_any("M").where("name = 'a'").one_or_more()
          .followed_by_any("E").where("name = 'b'"))
    assert _run_cep(spark, rows4, p5, MU) == sorted([
        (3, 41, 43, 44), (2, 41, 42, 44), (2, 42, 43, 44),
        (1, 41, 41, 44), (1, 42, 42, 44), (1, 43, 43, 44),
    ], key=str)
    # :1134
    rows5 = [(1, 40, "c", 1 * S), (1, 43, "a", 5 * S), (1, 44, "b", 6 * S)]
    p6 = (Pattern.begin("C").where("name = 'c'")
          .followed_by("M").where("name = 'a'").optional()
          .followed_by("E").where("name = 'b'"))
    m6 = {"c": "LAST(C.event_id)", "m": "LAST(M.event_id)",
          "e": "LAST(E.event_id)"}
    assert _run_cep(spark, rows5, p6, m6) == sorted([
        (40, 43, 44), (40, None, 44),
    ], key=str)


def test_nfaitcase_endwith_startwith_harvest(spark):
    """NFAITCase end-with / start-with family (r12), verbatim: patterns
    that END in a loop or optional emit every viable prefix with no
    trailing element, and head loops anchor at every qualifying row.

    :1354 testTimesStrictWithNextAndConsecutive (next entry + broken
    consecutive run -> empty), :1382 testStartWithOptional,
    :1409 testEndWithZeroOrMore, :1444 testStartAndEndWithZeroOrMore
    (the pattern IS an optional loop; no empty match is emitted),
    :1485 testEndWithOptional, :1513 testEndWithOneOrMore,
    :2233/:2245 testStartWith(Zero|One)OrMoreStrict (head consecutive
    runs; the interposed 'c' splits them)."""
    MU = {"n": "COUNT(M.*)", "fm": "FIRST(M.event_id)",
          "lm": "LAST(M.event_id)"}
    # :1354
    rows = [(1, 40, "c", 1 * S), (1, 41, "a", 2 * S), (1, 90, "f", 3 * S),
            (1, 42, "a", 4 * S), (1, 43, "a", 6 * S), (1, 44, "b", 7 * S)]
    p = (Pattern.begin("C").where("name = 'c'")
         .next("M").where("name = 'a'").times(2).consecutive()
         .followed_by("E").where("name = 'b'"))
    m = {"fm": "FIRST(M.event_id)", "lm": "LAST(M.event_id)",
         "e": "LAST(E.event_id)"}
    assert _run_cep(spark, rows, p, m) == []
    # :1382
    rows2 = [(1, 40, "c", 1 * S), (1, 44, "b", 6 * S)]
    p2 = (Pattern.begin("C").where("name = 'c'").optional()
          .followed_by("E").where("name = 'b'"))
    m2 = {"c": "LAST(C.event_id)", "e": "LAST(E.event_id)"}
    assert _run_cep(spark, rows2, p2, m2) == sorted([
        (40, 44), (None, 44),
    ], key=str)
    # :1409
    rows3 = [(1, 40, "c", 1 * S), (1, 41, "a", 3 * S),
             (1, 42, "a", 4 * S), (1, 43, "a", 5 * S)]
    p3 = (Pattern.begin("C").where("name = 'c'")
          .followed_by("M").where("name = 'a'").one_or_more().optional())
    assert _run_cep(spark, rows3, p3, MU) == sorted([
        (3, 41, 43), (2, 41, 42), (1, 41, 41), (0, None, None),
    ], key=str)
    # :1444 — the whole pattern is one optional loop; NO empty match
    rows4 = [(1, 40, "c", 1 * S), (1, 41, "a", 3 * S), (1, 42, "a", 4 * S),
             (1, 43, "a", 5 * S), (1, 44, "d", 6 * S), (1, 45, "d", 7 * S),
             (1, 46, "d", 8 * S)]
    p4 = (Pattern.begin("M").where("name = 'a'").one_or_more().optional())
    assert _run_cep(spark, rows4, p4, MU) == sorted([
        (3, 41, 43), (2, 41, 42), (1, 41, 41),
        (2, 42, 43), (1, 42, 42), (1, 43, 43),
    ], key=str)
    # :1485
    rows5 = [(1, 40, "c", 1 * S), (1, 41, "a", 3 * S)]
    p5 = (Pattern.begin("C").where("name = 'c'")
          .followed_by("M").where("name = 'a'").optional())
    m5 = {"c": "LAST(C.event_id)", "m": "LAST(M.event_id)"}
    assert _run_cep(spark, rows5, p5, m5) == sorted([
        (40, 41), (40, None),
    ], key=str)
    # :1513
    p6 = (Pattern.begin("C").where("name = 'c'")
          .followed_by("M").where("name = 'a'").one_or_more())
    assert _run_cep(spark, rows3, p6, MU) == sorted([
        (3, 41, 43), (2, 41, 42), (1, 41, 41),
    ], key=str)
    # :2233 / :2245 — identical expected sets in the reference
    rows6 = [(1, 40, "c", 1 * S), (1, 41, "a", 3 * S), (1, 90, "c", 4 * S),
             (1, 42, "a", 5 * S), (1, 43, "a", 6 * S)]
    p7 = (Pattern.begin("M").where("name = 'a'")
          .one_or_more().optional().consecutive())
    p8 = (Pattern.begin("M").where("name = 'a'")
          .one_or_more().consecutive())
    expect = sorted([
        (1, 41, 41), (2, 42, 43), (1, 42, 42), (1, 43, 43),
    ], key=str)
    assert _run_cep(spark, rows6, p7, MU) == expect
    assert _run_cep(spark, rows6, p8, MU) == expect


def test_nfaitcase_strict_zero_or_more_and_times_harvest(spark):
    """NFAITCase consuming-strategy zero-or-more + times tier (r12),
    verbatim over the shared ConsecutiveData fixture
    [c, d, a1, a2, a3, d, a4, b]:

    :1997 testStrictEagerZeroOrMore (consecutive optional loop: the
    second 'd' ends the run), :2077 testSkipTillNextZeroOrMore (relaxed:
    anchored prefixes through the d's; :2022 SKIP_TILL_ANY is the r11
    pin), :2151 testTimesStrict (followedByAny entry, consecutive pair:
    only [a2 a3] is adjacent), :2187 testTimesNonStrict (bounded
    allowCombinations: all 2-subsets), :2414 the zero-or-more
    clearing-buffer fixture's MATCH-SET projection (the reference
    assertion is on SharedBuffer partial-match internals after
    advanceTime — n/a for a positional batch engine; the engine pins
    the emitted matches under the same within(8ms))."""
    rows = [(1, 40, "c", 1 * S), (1, 90, "d", 2 * S), (1, 41, "a", 3 * S),
            (1, 42, "a", 4 * S), (1, 43, "a", 5 * S), (1, 91, "d", 6 * S),
            (1, 44, "a", 7 * S), (1, 50, "b", 8 * S)]
    MU = {"n": "COUNT(M.*)", "fm": "FIRST(M.event_id)",
          "lm": "LAST(M.event_id)", "e": "LAST(E.event_id)"}
    # :1997
    p = (Pattern.begin("C").where("name = 'c'")
         .followed_by("M").where("name = 'a'")
         .one_or_more().optional().consecutive()
         .followed_by("E").where("name = 'b'"))
    assert _run_cep(spark, rows, p, MU) == sorted([
        (3, 41, 43, 50), (2, 41, 42, 50), (1, 41, 41, 50),
        (0, None, None, 50),
    ], key=str)
    # :2077
    p2 = (Pattern.begin("C").where("name = 'c'")
          .followed_by("M").where("name = 'a'").one_or_more().optional()
          .followed_by("E").where("name = 'b'"))
    assert _run_cep(spark, rows, p2, MU) == sorted([
        (4, 41, 44, 50), (3, 41, 43, 50), (2, 41, 42, 50),
        (1, 41, 41, 50), (0, None, None, 50),
    ], key=str)
    # :2151 — distinct fixture: [c f a1 f a2 a3 b]
    rows2 = [(1, 40, "c", 1 * S), (1, 90, "f", 2 * S), (1, 41, "a", 3 * S),
             (1, 91, "f", 4 * S), (1, 42, "a", 5 * S), (1, 43, "a", 6 * S),
             (1, 44, "b", 7 * S)]
    m2 = {"fm": "FIRST(M.event_id)", "lm": "LAST(M.event_id)",
          "e": "LAST(E.event_id)"}
    p3 = (Pattern.begin("C").where("name = 'c'")
          .followed_by_any("M").where("name = 'a'").times(2).consecutive()
          .followed_by("E").where("name = 'b'"))
    assert _run_cep(spark, rows2, p3, m2) == [(42, 43, 44)]
    # :2187
    p4 = (Pattern.begin("C").where("name = 'c'")
          .followed_by_any("M").where("name = 'a'").times(2)
          .allow_combinations()
          .followed_by("E").where("name = 'b'"))
    assert _run_cep(spark, rows2, p4, m2) == sorted([
        (41, 42, 44), (41, 43, 44), (42, 43, 44),
    ], key=str)
    # :2414 projection — eps in MICROS so within(8, millis) binds
    rows3 = [(1, 40, "c", 1_000), (1, 41, "a", 3_000),
             (1, 42, "a", 4_000), (1, 44, "b", 6_000)]
    p5 = (Pattern.begin("C").where("name = 'c'")
          .followed_by("M").where("name = 'a'")
          .one_or_more().allow_combinations().optional()
          .followed_by("E").where("name = 'b'")
          .within(8, "milliseconds"))
    assert _run_cep(spark, rows3, p5, MU) == sorted([
        (2, 41, 42, 44), (1, 41, 41, 44), (0, None, None, 44),
    ], key=str)


def test_nfaitcase_result_ordering_harvest(spark):
    """NFAITCase result-ordering pair (r12), verbatim:

    :2729 testNFAResultOrdering — times(4).allowCombinations() head
    loop + a consecutive times(3) tail: exactly ONE match whose bind
    lists hold the events in stream order (FIRST/LAST/COUNT per
    variable pin the order);
    :2775 testNFAResultKeyOrdering — the match map preserves pattern
    declaration order; the engine's contract is measure-dict order =
    output column order."""
    rows = [(1, 101, "a-1", 1 * S), (1, 102, "a-2", 3 * S),
            (1, 103, "a-3", 4 * S), (1, 104, "a-4", 5 * S),
            (1, 201, "b-1", 6 * S), (1, 202, "b-2", 7 * S),
            (1, 203, "b-3", 10 * S)]
    p = (Pattern.begin("ST").where("name LIKE 'a-%'")
         .times(4).allow_combinations()
         .followed_by_any("M").where("name LIKE 'b-%'")
         .times(3).consecutive()
         .within(1, "minutes"))
    m = {"fs": "FIRST(ST.event_id)", "ls": "LAST(ST.event_id)",
         "ns": "COUNT(ST.*)", "fm": "FIRST(M.event_id)",
         "lm": "LAST(M.event_id)", "nm": "COUNT(M.*)"}
    assert _run_cep(spark, rows, p, m) == [(101, 104, 4, 201, 203, 3)]
    # :2775 — five next-chained variables; output columns follow the
    # measures dict in declaration order
    rows2 = [(1, 1, "a", 1 * S), (1, 2, "b", 2 * S), (1, 3, "aa", 3 * S),
             (1, 4, "bb", 4 * S), (1, 5, "ab", 5 * S)]
    p2 = (Pattern.begin("A").where("name = 'a'")
          .next("B").where("name = 'b'")
          .next("AA").where("name = 'aa'")
          .next("BB").where("name = 'bb'")
          .next("AB").where("name = 'ab'"))
    m2 = {"a": "LAST(A.event_id)", "b": "LAST(B.event_id)",
          "aa": "LAST(AA.event_id)", "bb": "LAST(BB.event_id)",
          "ab": "LAST(AB.event_id)"}
    df = spark.createDataFrame(
        rows2, "k long, event_id long, name string, ep long"
    )
    out = cep_select(spark, df, p2, "k", "ep", m2)
    assert out.columns == ["k", "a", "b", "aa", "bb", "ab"]
    assert [tuple(r[c] for c in m2) for r in out.collect()] == [
        (1, 2, 3, 4, 5),
    ]


def test_same_element_itcase_remaining(spark):
    """SameElementITCase remaining tier (r12) — tally 8/8. The r11
    claim that :204/:356/:410/:451 'pin the SharedBuffer's
    VALUE-equality dedup, out of scope for a positional engine' was
    WRONG: on every one of these fixtures the reference emission is
    positionally exact as a value MULTISET (comparePatterns compares
    sorted event-value lists — the SharedBuffer never collapses two
    matches here, it only renders value-equal binds interchangeably,
    e.g. :204's '[m1, m1]' entry standing for the {m1, m1a} pair).
    Reproduced verbatim:

    :204 testZeroOrMoreSameElement — allowCombinations over five
    middles with two value-equal pairs: ALL 32 subsets, none deduped;
    :356 testIterativeConditionWSameElement — an END whose only
    condition is an aggregate over the loop's ACCEPTED binds (no name
    check: an 'a' row can bind as end);
    :410 testEndWLoopingWSameElement — end-with-loop over three
    value-equal middles: 7 positional prefixes;
    :451 testRepeatingPatternWSameElement — optional loop + optional
    middle + required end: all 8 (M1-prefix x M2-branch) combinations."""
    from collections import Counter
    from itertools import combinations

    # :204 — c, [41 41 42 | d | 43 43], b; all 32 subsets as a multiset
    rows = [(1, 40, "c", 1 * S), (1, 41, "a", 3 * S), (1, 41, "a", 3 * S),
            (1, 42, "a", 4 * S), (1, 50, "d", 5 * S), (1, 43, "a", 6 * S),
            (1, 43, "a", 6 * S), (1, 44, "b", 7 * S)]
    p = (Pattern.begin("C").where("name='c'")
         .followed_by_any("M").where("name='a'")
         .one_or_more().optional().allow_combinations()
         .followed_by_any("E").where("name='b'")
         .within(1, "minutes"))
    m = {"n": "COUNT(M.*)", "fm": "FIRST(M.event_id)",
         "sm": "SUM(M.event_id)", "lm": "LAST(M.event_id)"}
    got = Counter(_run_cep(spark, rows, p, m))
    mids = [41, 41, 42, 43, 43]
    expect = Counter()
    for k in range(6):
        for sub in combinations(range(5), k):
            ids = [mids[i] for i in sub]
            expect[(len(ids), ids[0] if ids else None,
                    sum(ids) if ids else None,
                    ids[-1] if ids else None)] += 1
    assert got == expect, got
    # :356 — end bound by a bind-aggregate alone; one end IS an 'a' row
    rows2 = [(1, 40, "c", 2.0, 1 * S), (1, 41, "a", 2.0, 3 * S),
             (1, 41, "a", 2.0, 3 * S), (1, 41, "a", 2.0, 3 * S),
             (1, 44, "b", 5.0, 7 * S)]
    p2 = (Pattern.begin("C").where("name='c'")
          .followed_by_any("M").where("name='a'")
          .one_or_more().optional().allow_combinations()
          .followed_by("E").where("COALESCE(SUM(M.price), 0.0) = 4.0")
          .within(1, "minutes"))
    m2 = {"n": "COUNT(M.*)", "fm": "FIRST(M.event_id)",
          "lm": "LAST(M.event_id)", "e": "LAST(E.event_id)"}
    got2 = sorted(_run_cep_priced(spark, rows2, p2, m2), key=str)
    assert got2 == sorted([
        (2, 41, 41, 41), (2, 41, 41, 44), (2, 41, 41, 44),
    ], key=str), got2
    # :410 — end-with-loop over three value-equal middles: 7 prefixes
    rows3 = [(1, 40, "c", 1 * S), (1, 41, "a", 3 * S),
             (1, 41, "a", 3 * S), (1, 41, "a", 3 * S)]
    p3 = (Pattern.begin("C").where("name='c'")
          .followed_by_any("M").where("name='a'").one_or_more().optional())
    m3 = {"n": "COUNT(M.*)", "fm": "FIRST(M.event_id)",
          "lm": "LAST(M.event_id)"}
    assert _run_cep(spark, rows3, p3, m3) == sorted([
        (0, None, None), (1, 41, 41), (1, 41, 41), (1, 41, 41),
        (2, 41, 41), (2, 41, 41), (3, 41, 41),
    ], key=str)
    # :451 — optional loop x optional middle x required end: 8 matches
    # (distinct ids stand in for the reference's value-equal objects;
    # no match is deduped so the translation is position-faithful)
    rows4 = [(1, 10, "c", 1 * S), (1, 21, "a", 2 * S), (1, 22, "a", 3 * S),
             (1, 23, "a", 4 * S), (1, 90, "d", 5 * S), (1, 30, "b", 6 * S),
             (1, 24, "a", 7 * S)]
    p4 = (Pattern.begin("C").where("name='c'")
          .followed_by("M1").where("name='a'").one_or_more().optional()
          .followed_by("M2").where("name='b'").optional()
          .followed_by("E").where("name='a'"))
    m4 = {"n1": "COUNT(M1.*)", "f1": "FIRST(M1.event_id)",
          "l1": "LAST(M1.event_id)", "m2": "LAST(M2.event_id)",
          "e": "LAST(E.event_id)"}
    assert _run_cep(spark, rows4, p4, m4) == sorted([
        (0, None, None, None, 21), (1, 21, 21, None, 22),
        (0, None, None, 30, 24), (2, 21, 22, None, 23),
        (1, 21, 21, 30, 24), (3, 21, 23, None, 24),
        (2, 21, 22, 30, 24), (3, 21, 23, 30, 24),
    ], key=str)


def test_pattern_api_validation_suite(spark):
    """PatternTest.java validation tier (r12) — the reference Pattern
    API's malformed-pattern rejects, reproduced verbatim:

    :193/:198 negative times arguments (Quantifier.Times from > 0,
    to >= from; Pattern.times(0, m) is legal — rewritten to an OPTIONAL
    quantifier with from=1 before the check);
    :203-:227 a quantifier can be specified once;
    :233-:279 negative patterns (notNext/notFollowedBy) take no
    quantifier;
    :289 until() applies to LOOPING quantifiers only (oneOrMore /
    timesOrMore — an exact or ranged times() has the TIMES property);
    :295 until() needs a quantifier; :301 only one until()."""
    base = lambda: Pattern.begin("A").where("TRUE")  # noqa: E731
    # :193 / :198 — plus the legal from==0 rewrite and to < from
    with pytest.raises(CepError, match="greater than 0"):
        base().times(-1)
    with pytest.raises(CepError, match="greater than 0"):
        base().times(-1, 2)
    with pytest.raises(CepError, match="greater than or equal to from"):
        base().times(2, 1)
    with pytest.raises(CepError, match="greater than or equal to from"):
        base().times(0, 0)
    with pytest.raises(CepError, match="greater than 0"):
        base().times(0)
    with pytest.raises(CepError, match="greater than 0"):
        base().times_or_more(0)
    base().times(0, 2)  # legal: optional times(1..2)
    # :203-:227 — quantifier once
    for fn in [
        lambda: base().one_or_more().one_or_more().optional(),
        lambda: base().one_or_more().optional().times(1),
        lambda: base().times(1).one_or_more(),
        lambda: base().one_or_more().one_or_more(),
    ]:
        with pytest.raises(CepError, match="already has a quantifier"):
            fn()
    # :233-:279 — no quantifiers on negative patterns
    for neg in ["not_next", "not_followed_by"]:
        for q in [
            lambda p: p.one_or_more(),
            lambda p: p.times(3),
            lambda p: p.optional(),
        ]:
            with pytest.raises(CepError, match="negative patterns"):
                q(getattr(base(), neg)("N").where("TRUE"))
    # :289 / :295 / :301 — until() placement
    with pytest.raises(CepError, match="only applicable to looping"):
        base().times(1).until("TRUE")
    with pytest.raises(CepError, match="only applicable to looping"):
        base().times(2, 4).until("TRUE")
    base().times_or_more(2).until("v > 1")  # legal: LOOPING
    with pytest.raises(CepError, match="until"):
        base().until("TRUE")
    with pytest.raises(CepError, match="Only one until"):
        base().one_or_more().until("v > 1").until("v > 2")


def test_nfatest_window_borders(spark):
    """NFATest.java harvest (r12) — the hand-built start->end NFA and
    the window-border semantics, reproduced verbatim via the Pattern
    API (the reference builds the same automaton by hand:
    createStartEndNFA = start TAKE, end TAKE + TRUE-ignore = relaxed
    followedBy):

    :50 testSimpleNFA (no window: both starts reach the shared end);
    :94 testTimeoutWindowPruningWithinFirstAndLast (window 2ms: the
    3ms-spanning match is pruned);
    :120 testTimeoutWindowPruningWithinPreviousAndNext (the 2ms gap
    window binds per transition);
    :158 testWindowBorders (span == window is NOT a match — the right
    window side is exclusive, NFA.isStateTimedOut at >=);
    :180 testTimeoutWindowPruningWindowBorders (pruning uses the same
    left-inclusive/right-exclusive rule)."""
    MS = 1_000  # micros per ms — NFATest timestamps are millis
    m = {"s": "LAST(ST.event_id)", "e": "LAST(E.event_id)"}

    def pat(within=None, within_type="FIRST_AND_LAST"):
        p = (Pattern.begin("ST").where("name = 'start'")
             .followed_by("E").where("name = 'end'"))
        if within is not None:
            return p.within(within, "milliseconds", within_type)
        return p

    # :50 — start bar start end, no window
    rows = [(1, 1, "start", 1 * MS), (1, 2, "bar", 2 * MS),
            (1, 3, "start", 3 * MS), (1, 4, "end", 4 * MS)]
    assert _run_cep(spark, rows, pat(), m) == [(1, 4), (3, 4)]
    # :94 — window 2ms: (1, 4) spans 3ms -> pruned
    assert _run_cep(spark, rows, pat(2), m) == [(3, 4)]
    # :120 — PREVIOUS_AND_CURRENT 2ms gap
    rows2 = [(1, 1, "start", 1 * MS), (1, 2, "end", 2 * MS),
             (1, 3, "start", 3 * MS), (1, 4, "end", 6 * MS),
             (1, 5, "start", 7 * MS), (1, 6, "end", 8 * MS)]
    assert _run_cep(
        spark, rows2, pat(2, "PREVIOUS_AND_CURRENT"), m
    ) == [(1, 2), (5, 6)]
    # :158 — span == window: excluded (right side exclusive)
    rows3 = [(1, 1, "start", 1 * MS), (1, 2, "end", 3 * MS)]
    assert _run_cep(spark, rows3, pat(2), m) == []
    # :180 — same border rule for pruning: only (2, 4) survives
    rows4 = [(1, 1, "start", 1 * MS), (1, 2, "start", 2 * MS),
             (1, 3, "foobar", 3 * MS), (1, 4, "end", 3 * MS + 1)]
    assert _run_cep(spark, rows4, pat(2), m) == [(2, 4)]


def test_time_window_border_first_and_last(spark):
    """NFAITCase.java:279 testSimplePatternWithTimeWindowNFAWithin-
    FirstAndLast (r12 — previously only the :317 PREVIOUS_AND_CURRENT
    twin was pinned): the fixture puts end@11 exactly at start1@1 + the
    10ms window, pinning the EXCLUSIVE right border (this pin exposed
    and now guards the r12 _limit fix — the batch WITHIN used
    searchsorted 'right', admitting span == window)."""
    MS = 1_000
    rows = [(1, 1, "start", 1 * MS), (1, 2, "start", 2 * MS),
            (1, 3, "middle", 3 * MS), (1, 4, "foobar", 4 * MS),
            (1, 5, "end", 11 * MS), (1, 6, "end", 13 * MS)]
    p = (Pattern.begin("ST").where("name = 'start'")
         .followed_by("M").where("name = 'middle'")
         .followed_by("E").where("name = 'end'")
         .within(10, "milliseconds"))
    m = {"s": "LAST(ST.event_id)", "mm": "LAST(M.event_id)",
         "e": "LAST(E.event_id)"}
    assert _run_cep(spark, rows, p, m) == [(2, 3, 5)]


def test_cepitcase_scenarios(spark):
    """CEPITCase harvest (r12) — the DataStream-level scenarios whose
    semantic content is portable:

    :1049 testPartialMatchTimeoutOutputCompletedMatch — a GREEDY
    consecutive head loop never backtracks to a shorter take: starts
    whose maximal run fails the next element's bind-count-switching
    condition fail ENTIRELY (expected single match '3,5' — the start1/
    start2 anchors with viable 2-run sub-matches do NOT emit);
    :705 testSimplePatternEventTimeWithComparator — the EventComparator
    is a secondary sort: same-timestamp events order by price (the
    engine's extra ORDER BY columns), and both same-ts middles match
    under followedByAny."""
    MS = 1_000
    # :1049
    rows = [(1, 1, "start", 1.0, 0), (1, 2, "start", 2.0, 1 * MS),
            (1, 3, "start", 3.0, 2 * MS), (1, 4, "start", 4.0, 3 * MS),
            (1, 5, "end", 5.0, 4 * MS)]
    p = (Pattern.begin("ST").where("name = 'start'")
         .one_or_more().consecutive().greedy()
         .followed_by("M")
         .where("(COUNT(ST.ep) > 2 AND name = 'middle') OR "
                "(COUNT(ST.ep) <= 2 AND name = 'end')")
         .within(100, "milliseconds"))
    m = {"fs": "FIRST(ST.event_id)", "mm": "LAST(M.event_id)"}
    df1049 = spark.createDataFrame(
        rows, "k long, event_id long, name string, price double, ep long"
    )
    out1049 = cep_select(
        spark, df1049, p, "k", "ep, event_id", m,
        skip="SKIP PAST LAST ROW",
    )
    assert sorted(
        (r.fs, r.mm) for r in out1049.collect()
    ) == [(3, 5)]
    # without the skip strategy: starts s3 and s4 both emit (their
    # maximal runs reach e5 with count <= 2) — s1/s2 still fail
    # entirely (greedy never backtracks to their viable 2-runs)
    assert _run_cep_priced(spark, rows, p, m) == [(3, 5), (4, 5)]
    # :705 — comparator = secondary ORDER BY price; ts in ms
    rows2 = [(1, 1, "start", 1.0, 5 * MS), (1, 2, "middle", 2.0, 1 * MS),
             (1, 3, "end", 3.0, 3 * MS), (1, 4, "end", 4.0, 10 * MS),
             (1, 5, "middle", 6.0, 7 * MS), (1, 6, "middle", 5.0, 7 * MS),
             (1, 7, "middle", 5.0, 100 * MS)]
    p2 = (Pattern.begin("ST").where("name = 'start'")
          .followed_by_any("M").where("name = 'middle'")
          .followed_by_any("E").where("name = 'end'"))
    df = spark.createDataFrame(
        rows2, "k long, event_id long, name string, price double, ep long"
    )
    out = cep_select(
        spark, df, p2, "k", "ep, price, event_id",
        {"s": "LAST(ST.event_id)", "mm": "LAST(M.event_id)",
         "e": "LAST(E.event_id)"},
    )
    got = sorted((r.s, r.mm, r.e) for r in out.collect())
    assert got == [(1, 5, 4), (1, 6, 4)]


def test_cepitcase_portable_tier(spark):
    """CEPITCase portable tier (r12) — the remaining DataStream-level
    scenarios whose semantic content ports to the batch engine
    (processing-time runs are arrival-order runs; the select/flatSelect
    mechanics are the measures projection):

    :91 testSimplePatternCEP — subtype middle (price > 3 discriminates
    the SubEvents here) under followedByAny: single match 2,6,8;
    :374 testSimplePatternWithSingleState — a one-variable pattern
    emits one match per qualifying row;
    :644 testSimpleOrFilterPatternCEP — or() filters (Pattern.java
    or(): the acceptance is the disjunction) across two starts;
    :796 testSimpleAfterMatchSkip — skipPastLastEvent over times(2)
    on a run of four: matches at rows 1 and 3.

    n/a (documented): :408/:413 processing-time within (wall-clock
    nondeterminism is the point of those tests), :841/:923/:1019
    Rich-function/serialization mechanics, :450/:544 timeout handling
    (pinned at the NFA level — NFAITCase:357/:435 verbatim ports)."""
    # :91 — SubEvents are the rows with sub=1; middle = sub AND name
    rows = [(1, 1, "barfoo", 0, 1 * S), (1, 2, "start", 0, 2 * S),
            (1, 3, "foobar", 0, 3 * S), (1, 4, "foo", 1, 4 * S),
            (1, 5, "middle", 0, 5 * S), (1, 6, "middle", 1, 6 * S),
            (1, 7, "bar", 1, 7 * S), (1, 42, "42", 0, 8 * S),
            (1, 8, "end", 0, 9 * S)]
    df = spark.createDataFrame(
        rows, "k long, event_id long, name string, sub long, ep long"
    )
    p = (Pattern.begin("ST").where("name = 'start'")
         .followed_by_any("M").where("name = 'middle' AND sub = 1")
         .followed_by_any("E").where("name = 'end'"))
    out = cep_select(
        spark, df, p, "k", "ep",
        {"s": "LAST(ST.event_id)", "m": "LAST(M.event_id)",
         "e": "LAST(E.event_id)"},
    )
    assert sorted((r.s, r.m, r.e) for r in out.collect()) == [(2, 6, 8)]
    # :374 — single-state pattern
    rows2 = [(1, 1, "one", 1 * S), (1, 2, "two", 2 * S)]
    p2 = Pattern.begin("ST").where("name = 'one'")
    assert _run_cep(spark, rows2, p2, {"s": "LAST(ST.event_id)"}) == [
        (1,),
    ]
    # :644 — or() filter on the middle
    rows3 = [(1, 1, "start", 1.0, 1 * S), (1, 2, "middle", 2.0, 2 * S),
             (1, 3, "end", 3.0, 3 * S), (1, 4, "start", 4.0, 4 * S),
             (1, 5, "middle", 5.0, 5 * S), (1, 6, "end", 6.0, 6 * S)]
    p3 = (Pattern.begin("ST").where("name = 'start'")
          .followed_by_any("M").where("price = 2.0").or_where("price = 5.0")
          .followed_by_any("E").where("name = 'end'"))
    m3 = {"s": "LAST(ST.event_id)", "m": "LAST(M.event_id)",
          "e": "LAST(E.event_id)"}
    assert _run_cep_priced(spark, rows3, p3, m3) == sorted([
        (1, 5, 6), (1, 2, 3), (4, 5, 6), (1, 2, 6),
    ], key=str)
    # :796 — skipPastLastEvent over times(2) on [a a a a]
    rows4 = [(1, 1, "a", 1 * S), (1, 2, "a", 2 * S),
             (1, 3, "a", 3 * S), (1, 4, "a", 4 * S)]
    p4 = Pattern.begin("ST").where("name = 'a'").times(2)
    df4 = spark.createDataFrame(
        rows4, "k long, event_id long, name string, ep long"
    )
    out4 = cep_select(
        spark, df4, p4, "k", "ep",
        {"f": "FIRST(ST.event_id)"},
        skip="SKIP PAST LAST ROW",
    )
    assert sorted(r.f for r in out4.collect()) == [1, 3]


def test_greedy_guard_covers_every_gap_row(spark):
    """r13 (ADVICE r12 #1 harvest of NFACompiler.updateWithGreedyCondition
    :1036): the guard is ANDed onto ALL of the sink state's transitions —
    ignore included — so EVERY row between a greedy loop's last take and
    the next element's bind must fail the loop's take condition. A
    take-satisfying row appearing as the SECOND gap row (which r12's
    first-row-only guard let through) kills the start entirely."""
    from apache_flink_spark.cep import Pattern, cep_select

    S = 1_000_000
    rows = [(1, 40, "c", 1.0, 1 * S), (1, 41, "a", 2.0, 2 * S),
            (1, 42, "a", 2.0, 3 * S), (1, 90, "y", 1.0, 4 * S),
            (1, 43, "a", 2.0, 5 * S), (1, 44, "d", 3.0, 6 * S)]
    df = spark.createDataFrame(
        rows, "k long, event_id long, name string, price double, ep long"
    )
    p = (Pattern.begin("C").where("name='c'")
         .followed_by("M").where("name='a'").times(1, 2).greedy()
         .followed_by("D").where("name='d'"))
    out = cep_select(
        spark, df, p, "k", "ep, event_id",
        {"n": "COUNT(M.*)", "d": "LAST(D.event_id)"},
    )
    # loop maxes at (41,42); gap rows to D are (y@90, a@43): the guarded
    # sink state dies at a@43 (it satisfies the loop take) — no match.
    assert out.collect() == []
    # control: without the stray take-satisfying gap row the maximal
    # match goes through
    rows_ok = [r for r in rows if r[1] != 43]
    df_ok = spark.createDataFrame(
        rows_ok, "k long, event_id long, name string, price double, ep long"
    )
    out_ok = cep_select(
        spark, df_ok, p, "k", "ep, event_id",
        {"n": "COUNT(M.*)", "d": "LAST(D.event_id)"},
    )
    assert [(r.n, r.d) for r in out_ok.collect()] == [(2, 44)]


def test_greedy_then_optional_rejects_loudly(spark):
    """r13 (ADVICE r12 #1): greedy loop -> optional element -> element
    cannot be guarded exactly in the batch compile (the reference NFA
    branches at the guarded optional sink state) — loud reject, never a
    silent divergence."""
    import pytest as _pytest

    from apache_flink_spark.cep import CepError, Pattern, cep_select

    S = 1_000_000
    rows = [(1, 40, "c", 1.0, 1 * S), (1, 41, "a", 2.0, 2 * S),
            (1, 44, "d", 3.0, 3 * S)]
    df = spark.createDataFrame(
        rows, "k long, event_id long, name string, price double, ep long"
    )
    p = (Pattern.begin("C").where("name='c'")
         .followed_by("M").where("name='a'").one_or_more().greedy()
         .followed_by("B").where("name='b'").optional()
         .followed_by("D").where("name='d'"))
    with _pytest.raises(CepError, match="optional"):
        cep_select(
            spark, df, p, "k", "ep, event_id",
            {"d": "LAST(D.event_id)"},
        )
