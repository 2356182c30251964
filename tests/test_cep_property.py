"""Property test: the CEP Pattern compiler vs a direct NFA reference.

For random event sequences and the four canonical two/three-element
pattern shapes, cep_select's MATCH_RECOGNIZE compilation must emit
exactly the matches of a handwritten reference matcher implementing
flink-cep's documented semantics (relaxed contiguity takes the FIRST
qualifying row; notFollowedBy is a stop state killing the in-flight
match; SKIP TO NEXT ROW starts a fresh attempt at every row)."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

KINDS = ["a", "b", "c", "x"]

#: gap-window size (micros) for the r10 window shapes — rows sit at
#: ep = event_id * 10, so adjacent rows gap 10, one intervening row 20
#: (both under), two intervening rows 30 (over): every boundary class
#: is reachable within an 18-row sequence
W_GAP = 25


def _ref_matches(rows, shape):
    """rows: list of (event_id, kind) in order. Returns set of match
    tuples per shape."""
    out = set()
    n = len(rows)
    for i in range(n):
        if rows[i][1] != "a" and shape != "zom":
            continue
        if shape == "next":
            if i + 1 < n and rows[i + 1][1] == "b":
                out.add((rows[i][0], rows[i + 1][0]))
        elif shape == "fb":
            # relaxed: first b after i
            for j in range(i + 1, n):
                if rows[j][1] == "b":
                    out.add((rows[i][0], rows[j][0]))
                    break
        elif shape == "fb_fb":
            # first b after i, then first c after that b
            jb = next(
                (j for j in range(i + 1, n) if rows[j][1] == "b"), None
            )
            if jb is None:
                continue
            jc = next(
                (j for j in range(jb + 1, n) if rows[j][1] == "c"), None
            )
            if jc is not None:
                out.add((rows[i][0], rows[jb][0], rows[jc][0]))
        elif shape == "nfb":
            # A notFollowedBy(x) followedBy(c): scan for first c; an x
            # before it kills the attempt (stop state)
            for j in range(i + 1, n):
                if rows[j][1] == "c":
                    out.add((rows[i][0], rows[j][0]))
                    break
                if rows[j][1] == "x":
                    break
        elif shape == "oom":
            # A+ (RELAXED default — Quantifier.java:49 SKIP_TILL_NEXT)
            # followedBy(b), reference DEFAULT emission (r9 —
            # NFAITCase.java:1871 testSkipTillNextOneOrMore): EVERY loop
            # prefix is its own match; the kept a's are consecutive
            # qualifying rows (the ignore edge cannot skip an a), each
            # prefix completed by the first b after its last a
            kept = [j for j in range(i, n) if rows[j][1] == "a"]
            for k in range(1, len(kept) + 1):
                b = next(
                    (j for j in range(kept[k - 1] + 1, n)
                     if rows[j][1] == "b"), None,
                )
                if b is not None:
                    out.add((k, rows[kept[0]][0], rows[kept[k - 1]][0],
                             rows[b][0]))
        elif shape == "oom_greedy":
            # A+ greedy() pins MAXIMAL-ONLY emission (the pre-r9 default):
            # every a before the LAST b; b = first b after the last kept a
            bs = [j for j in range(i + 1, n) if rows[j][1] == "b"]
            if not bs:
                continue
            kept = [j for j in range(i, n)
                    if rows[j][1] == "a" and j < bs[-1]]
            if not kept:
                continue
            b = next(j for j in bs if j > kept[-1])
            out.add((len(kept), rows[kept[0]][0], rows[kept[-1]][0],
                     rows[b][0]))
        elif shape == "oom_reluctant":
            # A+ reluctant(): MINIMAL-ONLY — one a, first b after it
            b = next((j for j in range(i + 1, n) if rows[j][1] == "b"),
                     None)
            if b is not None:
                out.add((1, rows[i][0], rows[i][0], rows[b][0]))
        elif shape == "oom_any":
            # A times(1,3) allowCombinations() (SKIP_TILL_ANY —
            # NFAITCase.java:1902 testSkipTillAnyOneOrMore): the ignore
            # edge accepts ANY row, so every increasing SUBSET of a's
            # anchored at i (sizes 1..3) is a separate match; b = first b
            # after the subset's last a. Multiset semantics: distinct
            # subsets with identical measures emit distinct rows, so the
            # reference set here keys on the subset itself.
            import itertools as _it

            later = [j for j in range(i + 1, n) if rows[j][1] == "a"]
            for sz in (0, 1, 2):
                for comb in _it.combinations(later, sz):
                    sub = (i, *comb)
                    b = next(
                        (j for j in range(sub[-1] + 1, n)
                         if rows[j][1] == "b"), None,
                    )
                    if b is not None:
                        out.add((sub,
                                 (len(sub), rows[sub[0]][0],
                                  rows[sub[-1]][0], rows[b][0])))
        elif shape == "oom_consec":
            # A+ consecutive() (Quantifier.java:113): prefixes of the run
            # of ADJACENT a's from i (testStrictOneOrMore emits every
            # prefix too); b = first b after each prefix's last a
            r = i
            while r + 1 < n and rows[r + 1][1] == "a":
                r += 1
            for k in range(0, r - i + 1):
                b = next(
                    (j for j in range(i + k + 1, n) if rows[j][1] == "b"),
                    None,
                )
                if b is not None:
                    out.add((k + 1, rows[i][0], rows[i + k][0],
                             rows[b][0]))
        elif shape == "zom":
            # A oneOrMore().optional() (zero-or-more) followedBy b
            # (testBeginWithZeroOrMore): the oom prefix family PLUS, for
            # every b row, the zero-occurrence match [b] (emitted once —
            # IGNOREd rows are not part of a match's identity)
            if rows[i][1] == "b":
                out.add((0, None, rows[i][0]))
            if rows[i][1] != "a":
                continue
            kept = [j for j in range(i, n) if rows[j][1] == "a"]
            for k in range(1, len(kept) + 1):
                b = next(
                    (j for j in range(kept[k - 1] + 1, n)
                     if rows[j][1] == "b"), None,
                )
                if b is not None:
                    out.add((k, rows[kept[0]][0], rows[b][0]))
        elif shape == "oom_window":
            # timesOrMore(2) with a quantifier window (r11 reference-
            # exact — Times.windowTime binds to delimited take states
            # only, NFACompiler createState:435): position 1 has no
            # previous element (begin) so it is unbounded; position 2
            # (the last REQUIRED take) is bounded vs take 1, strict <
            # (isStateTimedOut prunes at >=), through ignores; positions
            # 3+ sit at the undelimited looping state — unbounded.
            kept = []
            for j in range(i, n):
                if rows[j][1] != "a":
                    continue
                if (
                    len(kept) == 1
                    and (j + 1) * 10 - (kept[-1] + 1) * 10 >= W_GAP
                ):
                    kept = []
                    break  # required take 2 timed out: branch dies
                kept.append(j)
            for k in range(2, len(kept) + 1):
                b = next(
                    (j for j in range(kept[k - 1] + 1, n)
                     if rows[j][1] == "b"), None,
                )
                if b is not None:
                    out.add((k, rows[kept[0]][0], rows[kept[k - 1]][0],
                             rows[b][0]))
        elif shape == "fb_window":
            # A followedBy B within(W_GAP, PREVIOUS_AND_CURRENT) on B
            # (r10 — Pattern.java:267): B is the first b after the a
            # (SKIP_TILL_NEXT), match valid iff its gap to the a is
            # strictly under W_GAP
            b = next((j for j in range(i + 1, n) if rows[j][1] == "b"),
                     None)
            if b is not None and (b - i) * 10 < W_GAP:
                out.add((rows[i][0], rows[b][0]))
        elif shape == "times2_relaxed":
            # A{2} relaxed: second a = FIRST a after i (reluctant gap);
            # b = first b after it
            a2 = next((j for j in range(i + 1, n) if rows[j][1] == "a"),
                      None)
            if a2 is None:
                continue
            b = next((j for j in range(a2 + 1, n) if rows[j][1] == "b"),
                     None)
            if b is None:
                continue
            out.add((rows[i][0], rows[a2][0], rows[b][0]))
        elif shape == "not_next":
            # A notNext(x) followedBy(b): the row immediately after the a
            # must not be an x
            if i + 1 < n and rows[i + 1][1] == "x":
                continue
            for j in range(i + 1, n):
                if rows[j][1] == "b":
                    out.add((rows[i][0], rows[j][0]))
                    break
        elif shape == "group_times2":
            # (a followedBy b){2} relaxed between repetitions: the
            # first-next chain a->b->a->b
            b1 = next((j for j in range(i + 1, n) if rows[j][1] == "b"),
                      None)
            if b1 is None:
                continue
            a2 = next((j for j in range(b1 + 1, n) if rows[j][1] == "a"),
                      None)
            if a2 is None:
                continue
            b2 = next((j for j in range(a2 + 1, n) if rows[j][1] == "b"),
                      None)
            if b2 is None:
                continue
            out.add((rows[i][0], rows[a2][0], rows[b2][0]))
    return out


def _pattern_for(shape):
    from apache_flink_spark.cep import Pattern

    if shape == "next":
        return (
            Pattern.begin("A").where("kind = 'a'")
            .next("B").where("kind = 'b'"),
            {"a_id": "LAST(A.event_id)", "b_id": "LAST(B.event_id)"},
        )
    if shape == "fb":
        return (
            Pattern.begin("A").where("kind = 'a'")
            .followed_by("B").where("kind = 'b'"),
            {"a_id": "LAST(A.event_id)", "b_id": "LAST(B.event_id)"},
        )
    if shape == "fb_fb":
        return (
            Pattern.begin("A").where("kind = 'a'")
            .followed_by("B").where("kind = 'b'")
            .followed_by("C").where("kind = 'c'"),
            {
                "a_id": "LAST(A.event_id)",
                "b_id": "LAST(B.event_id)",
                "c_id": "LAST(C.event_id)",
            },
        )
    if shape == "nfb":
        return (
            Pattern.begin("A").where("kind = 'a'")
            .not_followed_by("N").where("kind = 'x'")
            .followed_by("C").where("kind = 'c'"),
            {"a_id": "LAST(A.event_id)", "c_id": "LAST(C.event_id)"},
        )
    if shape == "oom":
        return (
            Pattern.begin("A").where("kind = 'a'").one_or_more()
            .followed_by("B").where("kind = 'b'"),
            {
                "n_a": "COUNT(A.*)",
                "first_a": "FIRST(A.event_id)",
                "last_a": "LAST(A.event_id)",
                "b_id": "LAST(B.event_id)",
            },
        )
    if shape == "oom_greedy":
        return (
            Pattern.begin("A").where("kind = 'a'").one_or_more().greedy()
            .followed_by("B").where("kind = 'b'"),
            {
                "n_a": "COUNT(A.*)",
                "first_a": "FIRST(A.event_id)",
                "last_a": "LAST(A.event_id)",
                "b_id": "LAST(B.event_id)",
            },
        )
    if shape == "oom_reluctant":
        return (
            Pattern.begin("A").where("kind = 'a'").one_or_more()
            .reluctant()
            .followed_by("B").where("kind = 'b'"),
            {
                "n_a": "COUNT(A.*)",
                "first_a": "FIRST(A.event_id)",
                "last_a": "LAST(A.event_id)",
                "b_id": "LAST(B.event_id)",
            },
        )
    if shape == "oom_any":
        return (
            Pattern.begin("A").where("kind = 'a'").times(1, 3)
            .allow_combinations()
            .followed_by("B").where("kind = 'b'"),
            {
                "n_a": "COUNT(A.*)",
                "first_a": "FIRST(A.event_id)",
                "last_a": "LAST(A.event_id)",
                "b_id": "LAST(B.event_id)",
            },
        )
    if shape == "zom":
        return (
            Pattern.begin("A").where("kind = 'a'").one_or_more()
            .optional()
            .followed_by("B").where("kind = 'b'"),
            {
                "n_a": "COUNT(A.*)",
                "first_a": "FIRST(A.event_id)",
                "b_id": "LAST(B.event_id)",
            },
        )
    if shape == "oom_consec":
        return (
            Pattern.begin("A").where("kind = 'a'").one_or_more()
            .consecutive()
            .followed_by("B").where("kind = 'b'"),
            {
                "n_a": "COUNT(A.*)",
                "first_a": "FIRST(A.event_id)",
                "last_a": "LAST(A.event_id)",
                "b_id": "LAST(B.event_id)",
            },
        )
    if shape == "oom_window":
        return (
            Pattern.begin("A").where("kind = 'a'")
            .times_or_more(2, window=(W_GAP, "micros"))
            .followed_by("B").where("kind = 'b'"),
            {
                "n_a": "COUNT(A.*)",
                "first_a": "FIRST(A.event_id)",
                "last_a": "LAST(A.event_id)",
                "b_id": "LAST(B.event_id)",
            },
        )
    if shape == "fb_window":
        return (
            Pattern.begin("A").where("kind = 'a'")
            .followed_by("B").where("kind = 'b'")
            .within(W_GAP, "micros",
                    within_type="PREVIOUS_AND_CURRENT"),
            {"a_id": "LAST(A.event_id)", "b_id": "LAST(B.event_id)"},
        )
    if shape == "times2_relaxed":
        return (
            Pattern.begin("A").where("kind = 'a'").times(2)
            .followed_by("B").where("kind = 'b'"),
            {
                "first_a": "FIRST(A.event_id)",
                "last_a": "LAST(A.event_id)",
                "b_id": "LAST(B.event_id)",
            },
        )
    if shape == "not_next":
        return (
            Pattern.begin("A").where("kind = 'a'")
            .not_next("N").where("kind = 'x'")
            .followed_by("B").where("kind = 'b'"),
            {"a_id": "LAST(A.event_id)", "b_id": "LAST(B.event_id)"},
        )
    # group_times2
    inner = (
        Pattern.begin("A").where("kind = 'a'")
        .followed_by("B").where("kind = 'b'")
    )
    return (
        Pattern.begin(inner).times(2),
        {
            "first_a": "FIRST(A.event_id)",
            "last_a": "LAST(A.event_id)",
            "b_id": "LAST(B.event_id)",
        },
    )


@pytest.mark.parametrize(
    "shape",
    [
        "next", "fb", "fb_fb", "nfb",
        # r8: relaxed-contiguity loops (Quantifier.java:49 default),
        # the consecutive() strict upgrade, notNext, and GroupPattern;
        # r9: reference DEFAULT multi-match emission (oom/oom_consec/zom
        # emit every loop prefix — NFAITCase.java:1848-1900), the
        # greedy()/reluctant() single-match pins, and bounded
        # SKIP_TILL_ANY (oom_any — testSkipTillAnyOneOrMore, multiset)
        "oom", "oom_consec", "times2_relaxed", "not_next", "group_times2",
        "oom_greedy", "oom_reluctant", "oom_any", "zom",
        # r10: gap windows — quantifier window times and
        # within(PREVIOUS_AND_CURRENT) (Pattern.java:267,390)
        "oom_window", "fb_window",
    ],
)
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(kinds=st.lists(st.sampled_from(KINDS), min_size=4, max_size=18))
def test_pattern_compiler_matches_reference(spark, shape, kinds):
    from collections import Counter

    from apache_flink_spark.cep import cep_select

    rows = [(i + 1, k) for i, k in enumerate(kinds)]
    df = spark.createDataFrame(
        [(1, eid, k, eid * 10) for eid, k in rows],
        "k long, event_id long, kind string, ep long",
    )
    pattern, measures = _pattern_for(shape)
    if shape == "oom_any":
        # boundedness contract: allowCombinations needs times(m,n) or a
        # within horizon; distinct subsets may share measure values, so
        # compare as a MULTISET of measure tuples
        got = Counter(
            tuple(r[c] for c in measures)
            for r in cep_select(
                spark, df, pattern, "k", "ep", measures
            ).collect()
        )
        ref = Counter(
            meas for _sub, meas in _ref_matches(rows, shape)
        )
        assert got == ref, (shape, kinds)
        return
    got = {
        tuple(r[c] for c in measures)
        for r in cep_select(
            spark, df, pattern, "k", "ep", measures
        ).collect()
    }
    assert got == _ref_matches(rows, shape), (shape, kinds)
