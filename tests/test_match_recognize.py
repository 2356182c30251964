"""MATCH_RECOGNIZE compiler unit tests (SQL surface, semantics, errors).

Reference behaviors mirrored: greedy quantifiers, AFTER MATCH SKIP modes,
undefined-variable-is-TRUE, unsupported-feature errors (the reference's
MatchRecognize validator rejects what its NFA can't run; ours rejects what
the linear-pattern subset can't)."""

from __future__ import annotations

import pytest

from apache_flink_spark.environment import TableEnvironment
from apache_flink_spark.match_recognize import (
    MatchRecognizeError,
    sql_with_match_recognize,
)


@pytest.fixture(scope="module")
def seq_view(spark):
    rows = [
        # user 1: low low high low high  (values), types: a a b a b
        (1, 1, "a", 10.0),
        (1, 2, "a", 20.0),
        (1, 3, "b", 200.0),
        (1, 4, "a", 30.0),
        (1, 5, "b", 300.0),
        # user 2: one lone low, never a breakout
        (2, 1, "a", 5.0),
    ]
    df = spark.createDataFrame(rows, "user_id int, seq int, typ string, v double")
    df.createOrReplaceTempView("mr_seq")
    return "mr_seq"


def test_greedy_plus_consumes_maximal_run(spark, seq_view):
    out = sql_with_match_recognize(
        spark,
        """
        SELECT user_id, n_a, b_seq FROM mr_seq MATCH_RECOGNIZE (
            PARTITION BY user_id ORDER BY seq
            MEASURES COUNT(A.*) AS n_a, B.seq AS b_seq
            PATTERN (A+ B)
            DEFINE A AS A.v < 100, B AS B.v >= 100
        ) ORDER BY user_id, b_seq
        """,
    ).collect()
    assert [(r.user_id, r.n_a, r.b_seq) for r in out] == [(1, 2, 3), (1, 1, 5)]


def test_skip_to_next_row_overlaps(spark, seq_view):
    out = sql_with_match_recognize(
        spark,
        """
        SELECT user_id, a_seq FROM mr_seq MATCH_RECOGNIZE (
            PARTITION BY user_id ORDER BY seq
            MEASURES A.seq AS a_seq
            AFTER MATCH SKIP TO NEXT ROW
            PATTERN (A B)
            DEFINE B AS B.typ = 'b'
        ) ORDER BY user_id, a_seq
        """,
    ).collect()
    # A is undefined => TRUE for every row; every row directly before a 'b'
    # starts a match, and SKIP TO NEXT ROW allows overlapping starts.
    assert [r.a_seq for r in out] == [2, 4]


def test_optional_and_star_quantifiers(spark, seq_view):
    out = sql_with_match_recognize(
        spark,
        """
        SELECT user_id, n_a, b_seq FROM mr_seq MATCH_RECOGNIZE (
            PARTITION BY user_id ORDER BY seq
            MEASURES COUNT(A.*) AS n_a, B.seq AS b_seq
            PATTERN (A* B)
            DEFINE A AS A.v < 100, B AS B.v >= 100
        ) ORDER BY user_id, b_seq
        """,
    ).collect()
    # Same matches as A+ here (runs exist), but A* would also accept a bare B.
    assert [(r.n_a, r.b_seq) for r in out] == [(2, 3), (1, 5)]


def test_outer_query_composes(spark, seq_view):
    out = sql_with_match_recognize(
        spark,
        """
        SELECT user_id, n_a * 10 AS score FROM mr_seq MATCH_RECOGNIZE (
            PARTITION BY user_id ORDER BY seq
            MEASURES COUNT(A.*) AS n_a, B.seq AS b_seq
            PATTERN (A+ B)
            DEFINE A AS A.v < 100, B AS B.v >= 100
        ) WHERE n_a >= 2
        """,
    ).collect()
    assert [(r.user_id, r.score) for r in out] == [(1, 20)]


def test_tenv_routes_match_recognize(spark, seq_view):
    tenv = TableEnvironment(spark=spark)
    out = tenv.sql(
        """
        SELECT user_id, b_seq FROM mr_seq MATCH_RECOGNIZE (
            PARTITION BY user_id ORDER BY seq
            MEASURES B.seq AS b_seq
            PATTERN (A B)
            DEFINE A AS A.typ = 'a', B AS B.typ = 'b'
        ) ORDER BY b_seq
        """
    ).collect()
    assert [r.b_seq for r in out] == [3, 5]


@pytest.mark.parametrize(
    "frag,msg",
    [
        (
            # a function outside the cross-variable predicate subset
            # (comparisons/boolean/arithmetic/ABS) errors loudly
            "PATTERN (A B) DEFINE B AS SUBSTR(B.typ, 1) = LAST(A.typ)",
            "SUBSTR",
        ),
        (
            # unknown variable inside a bind
            "PATTERN (A B) DEFINE B AS B.v > LAST(Z.v)",
            "unknown pattern variable",
        ),
    ],
)
def test_unsupported_features_error_loudly(spark, seq_view, frag, msg):
    with pytest.raises(MatchRecognizeError, match=msg):
        sql_with_match_recognize(
            spark,
            f"""
            SELECT * FROM mr_seq MATCH_RECOGNIZE (
                PARTITION BY user_id ORDER BY seq
                MEASURES A.seq AS a_seq
                {frag}
            )
            """,
        )


def test_cross_define_last_bind(spark, seq_view):
    """r5: DEFINE referencing LAST of ANOTHER variable's rows (bind
    tracking, reference NFA sharedBuffer) — B matches only when its v
    exceeds the A row's v."""
    out = sql_with_match_recognize(
        spark,
        """
        SELECT * FROM mr_seq MATCH_RECOGNIZE (
            PARTITION BY user_id ORDER BY seq
            MEASURES A.seq AS a_seq, B.seq AS b_seq
            AFTER MATCH SKIP TO NEXT ROW
            PATTERN (A B)
            DEFINE B AS B.v > LAST(A.v)
        ) ORDER BY user_id, a_seq
        """,
    ).collect()
    # ground truth: consecutive pairs with rising v
    rows = sorted(
        (r.user_id, r.seq, r.v)
        for r in spark.table("mr_seq").collect()
    )
    expect = []
    for (u1, s1, v1), (u2, s2, v2) in zip(rows, rows[1:]):
        if u1 == u2 and v2 > v1:
            expect.append((u1, s1, s2))
    assert sorted((r.user_id, r.a_seq, r.b_seq) for r in out) == sorted(expect)


def test_cross_define_forward_reference_is_null(spark, seq_view):
    """SQL semantics: a reference to a variable matched LATER evaluates to
    NULL, so the predicate is false and nothing matches — no loud error
    (the r4 restriction is lifted)."""
    out = sql_with_match_recognize(
        spark,
        """
        SELECT * FROM mr_seq MATCH_RECOGNIZE (
            PARTITION BY user_id ORDER BY seq
            MEASURES A.seq AS a_seq
            PATTERN (A B)
            DEFINE A AS A.v > B.v
        )
        """,
    ).collect()
    assert out == []


def test_count_of_pattern_variable_rejected(spark, seq_view):
    """r13 (ADVICE r12 #2): COUNT(A) where A is a pattern variable is a
    misspelling of COUNT(A.*) — reject loudly at compile time instead of
    reading it as a non-null count of an input column named 'A'."""
    with pytest.raises(MatchRecognizeError, match=r"COUNT\(A\.\*\)"):
        sql_with_match_recognize(
            spark,
            """
            SELECT * FROM mr_seq MATCH_RECOGNIZE (
                PARTITION BY user_id ORDER BY seq
                MEASURES COUNT(A) AS n_a
                PATTERN (A+ B)
                DEFINE A AS A.v < 100, B AS B.v >= 100
            )
            """,
        )
    # and a universal aggregate over a non-existent column errors too
    with pytest.raises(MatchRecognizeError, match="unknown column"):
        sql_with_match_recognize(
            spark,
            """
            SELECT * FROM mr_seq MATCH_RECOGNIZE (
                PARTITION BY user_id ORDER BY seq
                MEASURES COUNT(nope) AS n
                PATTERN (A+ B)
                DEFINE A AS A.v < 100, B AS B.v >= 100
            )
            """,
        )


def test_unknown_measure_column_errors(spark, seq_view):
    with pytest.raises(MatchRecognizeError, match="unknown column"):
        sql_with_match_recognize(
            spark,
            """
            SELECT * FROM mr_seq MATCH_RECOGNIZE (
                PARTITION BY user_id ORDER BY seq
                MEASURES A.nope AS x
                PATTERN (A)
                DEFINE A AS A.v > 0
            )
            """,
        )


def test_bounded_quantifiers(spark, seq_view):
    """{m} / {m,} / {m,n} bounds (reference Pattern.times(from, to)):
    greedy within the cap, match fails below the floor."""
    # A{2} exactly two lows then a high: only user 1's (1,2)->3 qualifies.
    out = sql_with_match_recognize(
        spark,
        """
        SELECT user_id, n_a, b_seq FROM mr_seq MATCH_RECOGNIZE (
            PARTITION BY user_id ORDER BY seq
            MEASURES COUNT(A.*) AS n_a, B.seq AS b_seq
            PATTERN (A{2} B)
            DEFINE A AS A.v < 100, B AS B.v >= 100
        ) ORDER BY user_id, b_seq
        """,
    ).collect()
    assert [(r.user_id, r.n_a, r.b_seq) for r in out] == [(1, 2, 3)]

    # A{1,} == A+ (maximal greedy run).
    out = sql_with_match_recognize(
        spark,
        """
        SELECT user_id, n_a, b_seq FROM mr_seq MATCH_RECOGNIZE (
            PARTITION BY user_id ORDER BY seq
            MEASURES COUNT(A.*) AS n_a, B.seq AS b_seq
            PATTERN (A{1,} B)
            DEFINE A AS A.v < 100, B AS B.v >= 100
        ) ORDER BY user_id, b_seq
        """,
    ).collect()
    assert [(r.user_id, r.n_a, r.b_seq) for r in out] == [(1, 2, 3), (1, 1, 5)]

    # A{1,1} caps the greedy take at one row even though two lows precede.
    out = sql_with_match_recognize(
        spark,
        """
        SELECT user_id, a_seq, b_seq FROM mr_seq MATCH_RECOGNIZE (
            PARTITION BY user_id ORDER BY seq
            MEASURES FIRST(A.seq) AS a_seq, B.seq AS b_seq
            PATTERN (A{1,1} B)
            DEFINE A AS A.v < 100, B AS B.v >= 100
        ) ORDER BY user_id, b_seq
        """,
    ).collect()
    assert [(r.user_id, r.a_seq, r.b_seq) for r in out] == [(1, 2, 3), (1, 4, 5)]

    with pytest.raises(MatchRecognizeError, match="max < min"):
        sql_with_match_recognize(
            spark,
            """
            SELECT * FROM mr_seq MATCH_RECOGNIZE (
                PARTITION BY user_id ORDER BY seq
                MEASURES COUNT(A.*) AS n_a
                PATTERN (A{3,2})
                DEFINE A AS A.v < 100
            )
            """,
        )


def test_within_horizon_truncates_greedy_run(spark):
    """WITHIN (reference Pattern.within): rows beyond match-start +
    interval are outside the match scope — the greedy B+ run is cut at the
    horizon, and a match needs at least one in-horizon B."""
    rows = [
        # user 1: trigger at t=0s, lows at 1s, 2s, 10s — a 5s horizon
        # keeps only the first two lows.
        (1, 0_000_000, "hi"),
        (1, 1_000_000, "lo"),
        (1, 2_000_000, "lo"),
        (1, 10_000_000, "lo"),
        # user 2: trigger at 0s, first low at 8s — no in-horizon B, no match.
        (2, 0_000_000, "hi"),
        (2, 8_000_000, "lo"),
    ]
    df = spark.createDataFrame(rows, "user_id int, ep bigint, typ string")
    df.createOrReplaceTempView("mr_within_seq")
    out = sql_with_match_recognize(
        spark,
        """
        SELECT user_id, n_b, last_ep FROM mr_within_seq MATCH_RECOGNIZE (
            PARTITION BY user_id ORDER BY ep
            MEASURES COUNT(B.*) AS n_b, LAST(B.ep) AS last_ep
            PATTERN (A B+)
            WITHIN INTERVAL '5' SECONDS
            DEFINE A AS A.typ = 'hi', B AS B.typ = 'lo'
        ) ORDER BY user_id
        """,
    ).collect()
    assert [(r.user_id, r.n_b, r.last_ep) for r in out] == [(1, 2, 2_000_000)]


def test_all_rows_per_match_with_classifier(spark, seq_view):
    """ALL ROWS PER MATCH emits every matched input row with per-row
    CLASSIFIER() and per-partition MATCH_NUMBER() (SQL-standard mode;
    reference supports it through StreamExecMatch)."""
    out = sql_with_match_recognize(
        spark,
        """
        SELECT user_id, seq, role, mn FROM mr_seq MATCH_RECOGNIZE (
            PARTITION BY user_id ORDER BY seq
            MEASURES CLASSIFIER() AS role, MATCH_NUMBER() AS mn
            ALL ROWS PER MATCH
            PATTERN (A+ B)
            DEFINE A AS A.v < 100, B AS B.v >= 100
        ) ORDER BY user_id, seq
        """,
    ).collect()
    # user 1: match 1 = rows 1,2 (A) + 3 (B); match 2 = 4 (A) + 5 (B).
    assert [(r.user_id, r.seq, r.role, r.mn) for r in out] == [
        (1, 1, "A", 1),
        (1, 2, "A", 1),
        (1, 3, "B", 1),
        (1, 4, "A", 2),
        (1, 5, "B", 2),
    ]


def test_one_row_mode_classifier_is_last_variable(spark, seq_view):
    out = sql_with_match_recognize(
        spark,
        """
        SELECT user_id, role FROM mr_seq MATCH_RECOGNIZE (
            PARTITION BY user_id ORDER BY seq
            MEASURES CLASSIFIER() AS role
            PATTERN (A+ B)
            DEFINE A AS A.v < 100, B AS B.v >= 100
        )
        """,
    ).collect()
    assert {r.role for r in out} == {"B"}


def test_alternation_prefers_leftmost_branch(spark, seq_view):
    """(B|C) with OVERLAPPING predicates: a row satisfying both is labeled
    B (leftmost preference, the reference's branch order)."""
    out = sql_with_match_recognize(
        spark,
        """
        SELECT user_id, a_seq, kind FROM mr_seq MATCH_RECOGNIZE (
            PARTITION BY user_id ORDER BY seq
            MEASURES A.seq AS a_seq, CLASSIFIER() AS kind
            PATTERN (A (B|C))
            DEFINE A AS A.typ = 'a',
                   B AS B.v >= 100,
                   C AS C.v >= 0
        )
        """,
    ).collect()
    got = sorted((r.user_id, r.a_seq, r.kind) for r in out)
    # user 1: (a@1 -> a@2 has v=20: B false, C true -> 'C'),
    #         (a@4 -> b@5 has v=300: both true -> 'B' wins)
    assert got == [(1, 1, "C"), (1, 4, "B")]


def test_alternation_disjoint_branches_classify(spark, seq_view):
    out = sql_with_match_recognize(
        spark,
        """
        SELECT user_id, coalesce(a_s, b_s) AS s, kind
        FROM mr_seq MATCH_RECOGNIZE (
            PARTITION BY user_id ORDER BY seq
            MEASURES A.seq AS a_s, B.seq AS b_s, CLASSIFIER() AS kind
            PATTERN ((A|B))
            DEFINE A AS A.typ = 'b', B AS B.v < 15
        )
        """,
    ).collect()
    # rows: u1 seq1 (a,10: B), seq3 (b,200: A), seq5 (b,300: A); u2 seq1 (a,5: B)
    assert sorted((r.user_id, r.s, r.kind) for r in out) == [
        (1, 1, "B"), (1, 3, "A"), (1, 5, "A"), (2, 1, "B"),
    ]


def test_reluctant_binds_first_not_last(spark, seq_view):
    """A X*? B stops at the FIRST b; greedy A X* B extends to the LAST b.
    Same data, opposite bindings — reluctance is observable."""
    reluctant = sql_with_match_recognize(
        spark,
        """
        SELECT user_id, b_seq, n_x FROM mr_seq MATCH_RECOGNIZE (
            PARTITION BY user_id ORDER BY seq
            MEASURES B.seq AS b_seq, COUNT(X.*) AS n_x
            PATTERN (A X*? B)
            DEFINE A AS A.seq = 1, B AS B.typ = 'b'
        )
        """,
    ).collect()
    assert [(r.user_id, r.b_seq, r.n_x) for r in reluctant] == [(1, 3, 1)]
    greedy = sql_with_match_recognize(
        spark,
        """
        SELECT user_id, b_seq, n_x FROM mr_seq MATCH_RECOGNIZE (
            PARTITION BY user_id ORDER BY seq
            MEASURES B.seq AS b_seq, COUNT(X.*) AS n_x
            PATTERN (A X* B)
            DEFINE A AS A.seq = 1, B AS B.typ = 'b'
        )
        """,
    ).collect()
    assert [(r.user_id, r.b_seq, r.n_x) for r in greedy] == [(1, 5, 3)]


def test_skip_to_first_var_overlapping_resume(spark):
    rows = [(1, 1, "x"), (1, 2, "b"), (1, 3, "b")]
    spark.createDataFrame(rows, "k int, seq int, typ string").createOrReplaceTempView(
        "mr_skipfirst"
    )
    out = sql_with_match_recognize(
        spark,
        """
        SELECT k, a_seq, b_seq FROM mr_skipfirst MATCH_RECOGNIZE (
            PARTITION BY k ORDER BY seq
            MEASURES A.seq AS a_seq, B.seq AS b_seq
            AFTER MATCH SKIP TO FIRST B
            PATTERN (A B)
            DEFINE B AS B.typ = 'b'
        )
        """,
    ).collect()
    # match (1,2) resumes AT seq 2, which starts match (2,3) — overlap.
    assert sorted((r.a_seq, r.b_seq) for r in out) == [(1, 2), (2, 3)]


def test_skip_to_first_of_leading_var_rejected(spark, seq_view):
    with pytest.raises(MatchRecognizeError, match="infinite loop"):
        sql_with_match_recognize(
            spark,
            """
            SELECT user_id FROM mr_seq MATCH_RECOGNIZE (
                PARTITION BY user_id ORDER BY seq
                MEASURES A.seq AS a_seq
                AFTER MATCH SKIP TO FIRST A
                PATTERN (A B)
                DEFINE A AS A.typ = 'a', B AS B.typ = 'b'
            )
            """,
        )


def test_skip_to_last_sliding_pairs(spark):
    rows = [(1, i, "c") for i in range(1, 5)]  # c c c c
    spark.createDataFrame(rows, "k int, seq int, typ string").createOrReplaceTempView(
        "mr_skiplast"
    )
    body = """
        SELECT k, a_seq, b_seq FROM mr_skiplast MATCH_RECOGNIZE (
            PARTITION BY k ORDER BY seq
            MEASURES A.seq AS a_seq, B.seq AS b_seq
            {skip}
            PATTERN (A B)
            DEFINE A AS A.typ = 'c', B AS B.typ = 'c'
        )
    """
    sliding = sql_with_match_recognize(
        spark, body.format(skip="AFTER MATCH SKIP TO LAST B")
    ).collect()
    assert sorted((r.a_seq, r.b_seq) for r in sliding) == [(1, 2), (2, 3), (3, 4)]
    tumbling = sql_with_match_recognize(
        spark, body.format(skip="AFTER MATCH SKIP PAST LAST ROW")
    ).collect()
    assert sorted((r.a_seq, r.b_seq) for r in tumbling) == [(1, 2), (3, 4)]


def test_prev_navigation_is_physical(spark):
    """PREV(X.col) is PHYSICAL previous-row navigation (SQL standard): the
    variable prefix only names the column. Rising-pair pattern over a
    zigzag sequence."""
    rows = [(1, 1, 10), (1, 2, 20), (1, 3, 5), (1, 4, 30), (1, 5, 30)]
    spark.createDataFrame(rows, "k int, seq int, v int").createOrReplaceTempView(
        "mr_nav"
    )
    out = sql_with_match_recognize(
        spark,
        """
        SELECT k, up_seq FROM mr_nav MATCH_RECOGNIZE (
            PARTITION BY k ORDER BY seq
            MEASURES UP.seq AS up_seq
            AFTER MATCH SKIP TO NEXT ROW
            PATTERN (UP)
            DEFINE UP AS UP.v > PREV(UP.v)
        )
        """,
    ).collect()
    # rises at seq 2 (10->20) and seq 4 (5->30); seq 1 has no PREV (null),
    # seq 3 falls, seq 5 ties.
    assert sorted(r.up_seq for r in out) == [2, 4]


def test_next_navigation_and_offset(spark):
    rows = [(1, 1, 10), (1, 2, 20), (1, 3, 30), (1, 4, 5)]
    spark.createDataFrame(rows, "k int, seq int, v int").createOrReplaceTempView(
        "mr_nav2"
    )
    out = sql_with_match_recognize(
        spark,
        """
        SELECT k, s FROM mr_nav2 MATCH_RECOGNIZE (
            PARTITION BY k ORDER BY seq
            MEASURES A.seq AS s
            AFTER MATCH SKIP TO NEXT ROW
            PATTERN (A)
            DEFINE A AS NEXT(A.v) < A.v AND PREV(A.v, 2) IS NOT NULL
        )
        """,
    ).collect()
    # NEXT falls only at seq 3 (30 -> 5); PREV(.,2) non-null from seq 3 on.
    assert sorted(r.s for r in out) == [3]


def test_v_shape_with_prev(spark):
    """The canonical Ticker V pattern (the reference's flagship
    MATCH_RECOGNIZE example): STRT DOWN+ UP+ with PREV-based direction
    predicates and AFTER MATCH SKIP TO LAST UP, so the peak that ends one
    V starts the next."""
    #              v: 10  9   8   11  12  7   8
    rows = [(1, i + 1, v) for i, v in enumerate([10, 9, 8, 11, 12, 7, 8])]
    spark.createDataFrame(rows, "k int, seq int, v int").createOrReplaceTempView(
        "mr_vshape"
    )
    out = sql_with_match_recognize(
        spark,
        """
        SELECT k, strt_seq, n_down, n_up FROM mr_vshape MATCH_RECOGNIZE (
            PARTITION BY k ORDER BY seq
            MEASURES STRT.seq AS strt_seq, COUNT(DOWN.*) AS n_down,
                     COUNT(UP.*) AS n_up
            AFTER MATCH SKIP TO LAST UP
            PATTERN (STRT DOWN+ UP+)
            DEFINE DOWN AS DOWN.v < PREV(DOWN.v),
                   UP AS UP.v > PREV(UP.v)
        )
        """,
    ).collect()
    # V1: start seq1, down 9,8, up 11,12; resume AT seq5 (last UP) ->
    # V2: start seq5 (the peak), down 7, up 8.
    assert sorted((r.strt_seq, r.n_down, r.n_up) for r in out) == [
        (1, 2, 2),
        (5, 1, 1),
    ]
    # SKIP PAST LAST ROW consumes the peak -> only the first V.
    out2 = sql_with_match_recognize(
        spark,
        """
        SELECT k, strt_seq FROM mr_vshape MATCH_RECOGNIZE (
            PARTITION BY k ORDER BY seq
            MEASURES STRT.seq AS strt_seq
            AFTER MATCH SKIP PAST LAST ROW
            PATTERN (STRT DOWN+ UP+)
            DEFINE DOWN AS DOWN.v < PREV(DOWN.v),
                   UP AS UP.v > PREV(UP.v)
        )
        """,
    ).collect()
    assert [r.strt_seq for r in out2] == [1]


def test_desc_order_walks_newest_first(spark, seq_view):
    """r5: ORDER BY DESC — PATTERN (A B) over a descending walk pairs each
    row with its predecessor."""
    out = sql_with_match_recognize(
        spark,
        """
        SELECT * FROM mr_seq MATCH_RECOGNIZE (
            PARTITION BY user_id ORDER BY seq DESC
            MEASURES A.seq AS a_seq, B.seq AS b_seq
            AFTER MATCH SKIP TO NEXT ROW
            PATTERN (A B)
            DEFINE B AS B.v > LAST(A.v)
        ) ORDER BY user_id, a_seq
        """,
    ).collect()
    rows = sorted(
        (r.user_id, r.seq, r.v) for r in spark.table("mr_seq").collect()
    )
    expect = []
    for (u1, s1, v1), (u2, s2, v2) in zip(rows, rows[1:]):
        if u1 == u2 and v1 > v2:  # predecessor strictly higher
            expect.append((u1, s2, s1))
    assert sorted((r.user_id, r.a_seq, r.b_seq) for r in out) == sorted(expect)


def test_desc_order_with_within_errors(spark, seq_view):
    with pytest.raises(MatchRecognizeError, match="ASCENDING"):
        sql_with_match_recognize(
            spark,
            """
            SELECT * FROM mr_seq MATCH_RECOGNIZE (
                PARTITION BY user_id ORDER BY seq DESC
                MEASURES A.seq AS a_seq
                PATTERN (A B) WITHIN INTERVAL '5' MINUTES
                DEFINE A AS A.v > 0
            )
            """,
        )


def test_cross_define_string_literal_survives_rewrite(spark, seq_view):
    """Review r5: operator/keyword lookalikes INSIDE string literals must
    not be rewritten by the cross-variable predicate converter."""
    out = sql_with_match_recognize(
        spark,
        """
        SELECT * FROM mr_seq MATCH_RECOGNIZE (
            PARTITION BY user_id ORDER BY seq
            MEASURES A.seq AS a_seq, B.seq AS b_seq
            AFTER MATCH SKIP TO NEXT ROW
            PATTERN (A B)
            DEFINE A AS A.typ = 'a',
                   B AS B.typ <> 'TRUE AND x=y' AND B.v >= LAST(A.v)
        ) ORDER BY user_id, a_seq
        """,
    ).collect()
    rows = sorted(
        (r.user_id, r.seq, r.typ, r.v) for r in spark.table("mr_seq").collect()
    )
    expect = []
    for (u1, s1, t1, v1), (u2, s2, t2, v2) in zip(rows, rows[1:]):
        if u1 == u2 and t1 == "a" and t2 != "TRUE AND x=y" and v2 >= v1:
            expect.append((u1, s1, s2))
    assert sorted((r.user_id, r.a_seq, r.b_seq) for r in out) == sorted(expect)


def test_permute_mixed_and_quantified(spark):
    """r9: PERMUTE as a pattern primary — mixed with other elements and
    quantified — parses into an alternation node on the VM (the SQL
    standard places no whole-pattern restriction)."""
    from apache_flink_spark.match_recognize import sql_with_match_recognize

    rows = [
        (1, 1, "s", 10), (1, 2, "a", 20), (1, 3, "b", 30),
        (1, 4, "s", 40), (1, 5, "b", 50), (1, 6, "a", 60),
        (1, 7, "s", 70), (1, 8, "a", 80), (1, 9, "x", 90),
    ]
    spark.createDataFrame(
        rows, "k long, event_id long, kind string, ep long"
    ).createOrReplaceTempView("pm_mixed_t")
    out = sql_with_match_recognize(
        spark,
        """
        SELECT * FROM pm_mixed_t MATCH_RECOGNIZE (
            PARTITION BY k
            ORDER BY ep
            MEASURES FIRST(S.event_id) AS s_id,
                     FIRST(A.event_id) AS a_id,
                     FIRST(B.event_id) AS b_id
            ONE ROW PER MATCH
            AFTER MATCH SKIP PAST LAST ROW
            PATTERN (S PERMUTE(A, B))
            DEFINE S AS S.kind = 's',
                   A AS A.kind = 'a',
                   B AS B.kind = 'b'
        )
        """,
    )
    got = sorted((r.s_id, r.a_id, r.b_id) for r in out.collect())
    # signup 1: a then b; signup 4: b then a (the second permutation);
    # signup 7: a then x — no match
    assert got == [(1, 2, 3), (4, 6, 5)], got

    # quantified PERMUTE: (a b | b a) twice, strictly adjacent
    rows2 = [
        (1, 1, "a", 10), (1, 2, "b", 20), (1, 3, "b", 30), (1, 4, "a", 40),
        (2, 5, "a", 10), (2, 6, "b", 20), (2, 7, "a", 30),
    ]
    spark.createDataFrame(
        rows2, "k long, event_id long, kind string, ep long"
    ).createOrReplaceTempView("pm_quant_t")
    out2 = sql_with_match_recognize(
        spark,
        """
        SELECT * FROM pm_quant_t MATCH_RECOGNIZE (
            PARTITION BY k
            ORDER BY ep
            MEASURES COUNT(A.*) AS n_a, FIRST(A.event_id) AS first_a
            ONE ROW PER MATCH
            AFTER MATCH SKIP PAST LAST ROW
            PATTERN (PERMUTE(A, B){2})
            DEFINE A AS A.kind = 'a', B AS B.kind = 'b'
        )
        """,
    )
    got2 = sorted((r.n_a, r.first_a) for r in out2.collect())
    assert got2 == [(2, 1)], got2


def test_sql_mr_itcase_batch_tier(spark):
    """flink-table batch MatchRecognizeITCase harvest (r12) — the SQL
    MATCH_RECOGNIZE surface's distinctive scenarios, reproduced
    verbatim (flink-table-planner .../runtime/batch/sql/
    MatchRecognizeITCase.java):

    :161 testTimeConstraint — WITHIN '1' MINUTE: the 58s-spanning
    triple matches, the 61s one does not (and the right border is
    exclusive — the r12 strict-within pin at the SQL surface);
    :210 testSimplePatternWithNulls — NULL columns navigate as SQL
    NULL: LAST(A.nullField) IS NULL holds inside DEFINE, null measures
    emit as NULL;
    :506 testLogicalOffsets (offset subset) — LAST(DOWN.price, 1)
    DEFINE navigation + FIRST/LAST(DOWN.tstamp) measures (the
    expression measures of the reference query are exercised by the
    UP-total check in :604's engine probe instead — expression
    MEASURES stay unsupported);
    :604 testLogicalOffsetsWithStarVariable — the UNIVERSAL row
    pattern variable: FIRST/LAST(col, n) without a variable prefix
    navigates the WHOLE match, in MEASURES and in DEFINE (new in r12);
    :666 testLogicalOffsetOutsideOfRangeInMeasures — an offset past
    the variable's bind count measures NULL;
    :789 testAggregatesWithNullInputs — COUNT(A.id)/COUNT(A.price)
    count NON-NULL values only, COUNT(*) counts rows, COUNT(price)
    counts non-null over the whole match, SUM skips NULLs (new in
    r12: column-argument COUNT)."""
    # :161 — seconds as epoch-MICROS BIGINT order key (the engine's
    # WITHIN time axis)
    S = 1_000_000
    rows = [(1, 1, "z", 1 * S), (1, 2, "a", 2 * S), (1, 3, "b", 30 * S),
            (1, 4, "c", 60 * S), (1, 5, "x", 100 * S),
            (1, 6, "a", 101 * S), (1, 7, "b", 131 * S),
            (1, 8, "c", 162 * S), (1, 9, "z", 200 * S)]
    spark.createDataFrame(
        rows, "k int, id int, name string, ts bigint"
    ).createOrReplaceTempView("mr_tc")
    out = sql_with_match_recognize(spark, """
        SELECT * FROM mr_tc MATCH_RECOGNIZE (
          PARTITION BY k
          ORDER BY ts
          MEASURES A.id AS aid, B.id AS bid, C.id AS cid
          PATTERN (A B C) WITHIN INTERVAL '1' MINUTE
          DEFINE A AS name = 'a', B AS name = 'b', C AS name = 'c'
        )""")
    assert sorted((r.aid, r.bid, r.cid) for r in out.collect()) == [
        (2, 3, 4),
    ]
    # :210 — NULL field navigation
    rows2 = [(1, i, n, None, i * 1000) for i, n in
             [(1, "a"), (2, "b"), (3, "c"), (4, "d"), (5, None),
              (6, "a"), (7, "b"), (8, "c"), (9, None)]]
    spark.createDataFrame(
        rows2, "k int, id int, name string, nullField string, ts bigint"
    ).createOrReplaceTempView("mr_nulls")
    out2 = sql_with_match_recognize(spark, """
        SELECT * FROM mr_nulls MATCH_RECOGNIZE (
          PARTITION BY k
          ORDER BY ts
          MEASURES A.id AS aid, LAST(B.nullField) AS bNull,
                   C.id AS cid, A.nullField AS aNull
          PATTERN (A B C)
          DEFINE A AS name = 'a' AND nullField IS NULL,
                 B AS name = 'b' AND LAST(A.nullField) IS NULL,
                 C AS name = 'c'
        )""")
    assert sorted(
        (r.aid, r.bNull, r.cid, r.aNull) for r in out2.collect()
    ) == [(1, None, 3, None), (6, None, 8, None)]
    # :506 (offset subset) + :666 — shared Ticker fixture
    rows3 = [(1, "ACME", 1, 19, 1), (1, "ACME", 2, 17, 2),
             (1, "ACME", 3, 13, 3), (1, "ACME", 4, 20, 4)]
    spark.createDataFrame(
        rows3, "k int, symbol string, tstamp bigint, price int, tax int"
    ).createOrReplaceTempView("mr_ticker4")
    out3 = sql_with_match_recognize(spark, """
        SELECT * FROM mr_ticker4 MATCH_RECOGNIZE (
          PARTITION BY k
          ORDER BY tstamp
          MEASURES FIRST(DOWNV.price) AS fp, LAST(DOWNV.price) AS lp,
                   FIRST(DOWNV.price, 5) AS nullPrice,
                   FIRST(DOWNV.tstamp) AS start_t,
                   LAST(DOWNV.tstamp) AS bottom_t, UP.tstamp AS end_t
          ONE ROW PER MATCH
          AFTER MATCH SKIP PAST LAST ROW
          PATTERN (DOWNV{2,} UP)
          DEFINE DOWNV AS price < LAST(DOWNV.price, 1)
                        OR LAST(DOWNV.price, 1) IS NULL,
                 UP AS price > LAST(DOWNV.price)
        )""")
    assert [
        (r.fp, r.lp, r.nullPrice, r.start_t, r.bottom_t, r.end_t)
        for r in out3.collect()
    ] == [(19, 13, None, 1, 3, 4)]
    # :604 — universal (star) variable navigation, verbatim
    rows4 = [(1, i, "ACME", i * 1000, p) for i, p in
             [(1, 20), (2, 19), (3, 18), (4, 17), (5, 16), (6, 15),
              (7, 14), (8, 20)]]
    spark.createDataFrame(
        rows4, "k int, id int, symbol string, ts bigint, price int"
    ).createOrReplaceTempView("mr_star")
    meas = ", ".join(
        [f"FIRST(id, {n}) AS id{n}" for n in range(8)]
        + [f"LAST(id, {n}) AS id{8 + n}" for n in range(8)]
    )
    out4 = sql_with_match_recognize(spark, f"""
        SELECT * FROM mr_star MATCH_RECOGNIZE (
          PARTITION BY k
          ORDER BY ts
          MEASURES {meas}
          ONE ROW PER MATCH
          AFTER MATCH SKIP PAST LAST ROW
          PATTERN (DOWNV{{2,}} UP)
          DEFINE DOWNV AS price < LAST(price, 1)
                        OR LAST(price, 1) IS NULL,
                 UP AS price = FIRST(price) AND price > FIRST(price, 3)
                       AND price = LAST(price, 7)
        )""")
    got4 = [tuple(r)[1:] for r in out4.collect()]
    assert got4 == [(1, 2, 3, 4, 5, 6, 7, 8, 8, 7, 6, 5, 4, 3, 2, 1)]
    # :789 — null-skipping COUNT/SUM aggregates
    rows5 = [(1, 1, "a", 10, 1000), (1, 2, "z", 10, 2000),
             (1, 3, "b", None, 3000), (1, 4, "c", None, 4000),
             (1, 5, "d", 3, 5000), (1, 6, "c", 3, 6000),
             (1, 7, "c", 3, 7000), (1, 8, "c", 3, 8000),
             (1, 9, "c", 2, 9000)]
    spark.createDataFrame(
        rows5, "k int, id int, name string, price int, ts bigint"
    ).createOrReplaceTempView("mr_aggnull")
    out5 = sql_with_match_recognize(spark, """
        SELECT * FROM mr_aggnull MATCH_RECOGNIZE (
          PARTITION BY k
          ORDER BY ts
          MEASURES SUM(A.price) AS sumA, COUNT(A.id) AS countAId,
                   COUNT(A.price) AS countAPrice, COUNT(*) AS countAll,
                   COUNT(price) AS countAllPrice, LAST(id) AS endId
          AFTER MATCH SKIP PAST LAST ROW
          PATTERN (A+ C)
          DEFINE A AS SUM(A.price) < 30, C AS C.name = 'c'
        )""")
    assert [
        (r.sumA, r.countAId, r.countAPrice, r.countAll,
         r.countAllPrice, r.endId)
        for r in out5.collect()
    ] == [(29, 7, 5, 8, 6, 8)]


def test_sql_mr_windowed_grouping_compositions(spark):
    """flink-table batch MatchRecognizeITCase composition pair (r12),
    verbatim semantics on the idiomatic-Spark pipeline:

    :383 testMatchRecognizeAppliedToWindowedGrouping — MATCH_RECOGNIZE
    over the output of a TUMBLE grouping (window sums become the MR
    input rows, ordered by the window rowtime);
    :444 testWindowedGroupingAppliedToMatchRecognize — a TUMBLE
    grouping over MATCH_RECOGNIZE output keyed on MATCH_ROWTIME()
    (new in r12: the rowtime of the match = universal LAST of the
    event-time ORDER BY column)."""
    from pyspark.sql import functions as F

    S = 1_000_000
    # :383 — ticker rows; four extra ACME rows land in the first window
    rows = [("ACME", 1, 1), ("ACME", 2, 2), ("ACME", 4, 1),
            ("ACME", 5, 1), ("ACME", 7, 2), ("ACME", 8, 2),
            ("ACME", 1, 20), ("ACME", 1, 24), ("ACME", 1, 25),
            ("ACME", 1, 19)]
    df = spark.createDataFrame(rows, "symbol string, sec int, price int")
    tumbled = (
        df.withColumn("ts", F.timestamp_seconds("sec"))
        .groupBy("symbol", F.window("ts", "3 seconds").alias("w"))
        .agg(F.sum("price").alias("price"))
        .select(
            "symbol", "price",
            (F.unix_micros(F.col("w.end")) - 1000).alias("rowTime"),
            F.unix_micros(F.col("w.start")).alias("startTime"),
        )
    )
    tumbled.createOrReplaceTempView("mr_tumbled")
    out = sql_with_match_recognize(spark, """
        SELECT * FROM mr_tumbled MATCH_RECOGNIZE (
          PARTITION BY symbol
          ORDER BY rowTime
          MEASURES B.price AS dPrice, B.startTime AS dTime
          ONE ROW PER MATCH
          PATTERN (A B)
          DEFINE B AS B.price < A.price
        )""")
    assert [(r.symbol, r.dPrice, r.dTime) for r in out.collect()] == [
        ("ACME", 2, 3 * S),
    ]
    # :444 — MR emits per-row matches with MATCH_ROWTIME(), then a
    # TUMBLE grouping on the match rowtime
    rows2 = [("ACME", 1, 1, 1), ("ACME", 2, 2, 2),
             ("ACME", 4, 1, 4), ("ACME", 5, 1, 3)]
    spark.createDataFrame(
        rows2, "symbol string, sec int, price int, tax int"
    ).select(
        "symbol", (F.col("sec").cast("bigint") * S).alias("ts"),
        "price", "tax",
    ).createOrReplaceTempView("mr_ticker_rt")
    matched = sql_with_match_recognize(spark, """
        SELECT * FROM mr_ticker_rt MATCH_RECOGNIZE (
          PARTITION BY symbol
          ORDER BY ts
          MEASURES A.price AS price, A.tax AS tax,
                   MATCH_ROWTIME() AS matchRowtime
          ONE ROW PER MATCH
          PATTERN (A)
          DEFINE A AS A.price > 0
        )""")
    grouped = (
        matched.withColumn(
            "mrt", F.timestamp_micros(F.col("matchRowtime"))
        )
        .groupBy("symbol", F.window("mrt", "3 seconds").alias("w"))
        .agg(F.sum("price").alias("price"))
        .select(
            "symbol", "price",
            (F.unix_micros(F.col("w.end")) - 1000).alias("rowTime"),
            F.unix_micros(F.col("w.start")).alias("startTime"),
        )
    )
    got = sorted(
        (r.symbol, r.price, r.rowTime, r.startTime)
        for r in grouped.collect()
    )
    assert got == sorted([
        ("ACME", 3, 3 * S - 1000, 0),
        ("ACME", 2, 6 * S - 1000, 3 * S),
    ])
