"""Property-based tests (hypothesis) — algebraic laws the operators must
hold on arbitrary inputs, not just the fixtures. SURVEY §5 notes the
reference has no randomized testing; this goes beyond its strategy.
"""

from __future__ import annotations

import pandas as pd
from hypothesis import HealthCheck, given, settings, strategies as st

from pyspark.sql import Window
from pyspark.sql import functions as F

from apache_flink_spark.changelog import derive_changelog, materialize

_settings = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# (key, seq, value) rows: few keys, small ints — enough to hit empty/
# singleton/duplicate-free/update-heavy shapes.
rows_strategy = st.lists(
    st.tuples(
        st.integers(0, 3),
        st.integers(0, 20),
        st.integers(-5, 5),
    ),
    min_size=1,
    max_size=30,
    unique_by=lambda r: (r[0], r[1]),  # unique (key, seq) -> total order
)


@given(rows=rows_strategy)
@_settings
def test_changelog_roundtrip_is_keep_last(spark, rows):
    """materialize(derive(T)) == keep-last-per-key(T) for any keyed,
    totally-ordered table."""
    df = spark.createDataFrame(rows, "k long, seq long, v long")
    got = (
        materialize(
            derive_changelog(df, ["k"], ["seq"], "v"), ["k"], ["seq"], "v"
        )
        .orderBy("k")
        .toPandas()
    )
    w = Window.partitionBy("k").orderBy(F.desc("seq"))
    want = (
        df.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .select("k", "seq", "v")
        .orderBy("k")
        .toPandas()
    )
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True), check_dtype=False
    )


@given(
    a=st.lists(st.integers(0, 5), min_size=0, max_size=20),
    b=st.lists(st.integers(0, 5), min_size=0, max_size=20),
)
@_settings
def test_multiset_partition_law(spark, a, b):
    """|A intersectAll B| + |A exceptAll B| == |A| (multiset partition)."""
    da = spark.createDataFrame([(x,) for x in a], "v long")
    db = spark.createDataFrame([(x,) for x in b], "v long")
    inter = da.intersectAll(db).count()
    minus = da.exceptAll(db).count()
    assert inter + minus == len(a)


@given(
    ts_list=st.lists(
        st.integers(0, 10**7), min_size=1, max_size=25, unique=True
    )
)
@_settings
def test_window_coverage_law(spark, ts_list):
    """Every row lands in exactly 1 tumble window and exactly size/slide
    hop windows — the slice-assigner invariant (SURVEY §2.5)."""
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(ts_list)], "id long, sec long"
    ).select("id", F.timestamp_seconds("sec").alias("ts"))
    n = df.count()
    tumble = df.groupBy(F.window("ts", "97 seconds")).count()
    assert tumble.agg(F.sum("count")).collect()[0][0] == n
    hop = df.groupBy(F.window("ts", "100 seconds", "25 seconds")).count()
    assert hop.agg(F.sum("count")).collect()[0][0] == 4 * n


@given(rows=rows_strategy)
@_settings
def test_dedup_keep_first_last_partition(spark, rows):
    """keep-first(T) and keep-last(T) pick rows OF T, one per key, and
    agree on keys with a single row."""
    df = spark.createDataFrame(rows, "k long, seq long, v long")
    wf = Window.partitionBy("k").orderBy("seq")
    wl = Window.partitionBy("k").orderBy(F.desc("seq"))
    first = df.withColumn("rn", F.row_number().over(wf)).filter("rn = 1").drop("rn")
    last = df.withColumn("rn", F.row_number().over(wl)).filter("rn = 1").drop("rn")
    keys = df.select("k").distinct().count()
    assert first.count() == keys and last.count() == keys
    singles = (
        df.groupBy("k").count().filter("count = 1").select("k")
    )
    f1 = first.join(singles, "k").orderBy("k").toPandas()
    l1 = last.join(singles, "k").orderBy("k").toPandas()
    pd.testing.assert_frame_equal(f1, l1, check_dtype=False)


import pytest as _pytest


@_pytest.mark.parametrize(
    "pattern",
    [
        ("A B+", "ab+"),
        ("A B{1,2}", "ab{1,2}"),
        ("A B* C", "ab*c"),
        # r4 additions: alternation and reluctant quantifiers — the
        # regex engine is again the independent oracle (same scan
        # order: leftmost, non-overlapping, lazy vs greedy).
        ("A (B|C)+", "a[bc]+"),
        ("A B*? C", "ab*?c"),
        ("A B+? C", "ab+?c"),
        # r8: nested sequence groups with quantifiers + alternation
        # of sequences — the backtracking-VM path; the regex engine
        # stays the independent oracle (same greedy/lazy preference,
        # same leftmost branch order, same non-overlapping scan).
        # Parametrized (not hypothesis-sampled) so EVERY shape runs.
        ("(A B)+ C", "(?:ab)+c"),
        ("A (B C)+", "a(?:bc)+"),
        ("(A B+)+ C", "(?:ab+)+c"),
        ("A (B | C B)+", "a(?:b|cb)+"),
        ("A (B*? C)+", "a(?:b*?c)+"),
        ("(A B){1,2} C", "(?:ab){1,2}c"),
    ],
    ids=lambda p: p[1] if isinstance(p, tuple) else str(p),
)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 2),            # key
            st.integers(0, 25),           # seq
            st.sampled_from("aabbc"),     # symbol (a/b dense, c noise)
        ),
        min_size=1,
        max_size=30,
        unique_by=lambda r: (r[0], r[1]),
    ),
)
@_settings
def test_match_recognize_equals_regex(spark, rows, pattern):
    """The MR matcher's greedy leftmost non-overlapping semantics are
    EXACTLY a regex scan over the per-key symbol string — an independent
    oracle sharing no code with the NFA. Checks (key, first_seq, n_rows)
    of every match for three pattern shapes."""
    import re as _re

    from apache_flink_spark.match_recognize import sql_with_match_recognize

    mr_pat, rx = pattern
    defines = ", ".join(
        f"{v} AS {v}.typ = '{v.lower()}'" for v in "ABC" if v in mr_pat
    )
    df = spark.createDataFrame(rows, "k int, seq int, typ string")
    df.createOrReplaceTempView("prop_mr_seq")
    out = sql_with_match_recognize(
        spark,
        f"""
        SELECT k, first_seq, n FROM prop_mr_seq MATCH_RECOGNIZE (
            PARTITION BY k ORDER BY seq
            MEASURES A.seq AS first_seq, COUNT(*) AS n
            PATTERN ({mr_pat})
            DEFINE {defines}
        )
        """,
    ).collect()
    got = sorted((r.k, r.first_seq, r.n) for r in out)

    want = []
    by_key: dict[int, list[tuple[int, str]]] = {}
    for k, seq, typ in rows:
        by_key.setdefault(k, []).append((seq, typ))
    for k, seq_rows in by_key.items():
        seq_rows.sort()
        s = "".join(t for _, t in seq_rows)
        for m in _re.finditer(rx, s):
            want.append((k, seq_rows[m.start()][0], m.end() - m.start()))
    assert got == sorted(want)


@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 2),          # key
            st.integers(0, 25),         # seq
            st.integers(-3, 3),         # value
        ),
        min_size=1,
        max_size=25,
        unique_by=lambda r: (r[0], r[1]),
    ),
)
@_settings
def test_cross_define_last_equals_pairwise_scan(spark, rows):
    """r5 cross-variable DEFINE property: PATTERN (A B), B AS
    B.v > LAST(A.v), SKIP TO NEXT ROW is exactly the per-key consecutive
    rising-pair scan — an independent oracle for the bind-tracking DFS
    (the vectorized matcher never runs here)."""
    from apache_flink_spark.match_recognize import sql_with_match_recognize

    df = spark.createDataFrame(rows, "k int, seq int, v int")
    df.createOrReplaceTempView("prop_mr_cross")
    out = sql_with_match_recognize(
        spark,
        """
        SELECT k, a_seq, b_seq FROM prop_mr_cross MATCH_RECOGNIZE (
            PARTITION BY k ORDER BY seq
            MEASURES A.seq AS a_seq, B.seq AS b_seq
            AFTER MATCH SKIP TO NEXT ROW
            PATTERN (A B)
            DEFINE B AS B.v > LAST(A.v)
        )
        """,
    ).collect()
    got = sorted((r.k, r.a_seq, r.b_seq) for r in out)
    by_key: dict[int, list[tuple[int, int]]] = {}
    for k, seq, v in rows:
        by_key.setdefault(k, []).append((seq, v))
    want = []
    for k, seq_rows in by_key.items():
        seq_rows.sort()
        for (s1, v1), (s2, v2) in zip(seq_rows, seq_rows[1:]):
            if v2 > v1:
                want.append((k, s1, s2))
    assert got == sorted(want)


# Two keyed event lists: (key, ts, id). Ids globally unique per side; ts
# collisions both within and across sides are deliberately likely.
_asof_side = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 8), st.integers(0, 1000)),
    min_size=0,
    max_size=20,
    unique_by=lambda r: r[2],
)


@given(left=_asof_side, right=_asof_side)
@_settings
def test_asof_join_matches_bruteforce(spark, left, right):
    """asof_join == per-left-row brute force: the right row with max
    (ts, id) among same-key rows with right.ts <= left.ts."""
    from apache_flink_spark.queries.temporal_joins import asof_join

    ldf = spark.createDataFrame(left, "k long, ts long, event_id long")
    rdf = spark.createDataFrame(right, "k long, ts long, event_id long")
    rdf = rdf.withColumn("carry", F.col("event_id"))
    got = {
        r.event_id: r.carry
        for r in asof_join(
            ldf, rdf, key="k", ts="ts", carry="carry", tiebreak="event_id"
        ).collect()
    }
    want = {}
    for lk, lts, lid in left:
        cands = [(rts, rid) for rk, rts, rid in right if rk == lk and rts <= lts]
        want[lid] = max(cands)[1] if cands else None
    assert got == want


@given(
    ts_list=st.lists(
        # negatives included: pre-1970 epochs pin the pmod (not %) floor
        st.integers(-200, 200), min_size=1, max_size=25, unique=True
    ),
    step=st.sampled_from([2, 4, 8]),
    n_slices=st.integers(1, 4),
)
@_settings
def test_cumulate_slice_invariants(spark, ts_list, step, n_slices):
    """CumulativeSliceAssigner laws on arbitrary timestamps (including
    negative epochs — Python's floor-semantics // and % are the spec): a
    row at offset o into its max-window lands in exactly n - o // step
    slices; every slice is step-aligned, covers the row, and is at most
    max long."""
    from apache_flink_spark.queries.event_windows import cumulate_slices

    mx = step * n_slices
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(ts_list)], "id long, ep long"
    )
    rows = cumulate_slices(df, "ep", step, mx).collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r.id, []).append(r)
        assert r.win_start == (r.ep // mx) * mx
        assert (r.win_end - r.win_start) % step == 0
        assert r.win_start <= r.ep < r.win_end <= r.win_start + mx
    for i, ts in enumerate(ts_list):
        expect = n_slices - (ts % mx) // step
        assert len(by_id.get(i, [])) == expect


@given(
    docs=st.lists(
        st.lists(st.sampled_from(["aa", "bb", "cc", "dd", "e"]), min_size=0, max_size=12),
        min_size=1,
        max_size=6,
    )
)
@_settings
def test_minhash_signature_matches_python_reference(spark, docs):
    """The Spark shingle->md5->arithmetic-permutation-min chain must equal a
    direct Python evaluation on arbitrary token lists (incl. <3-token docs,
    which have no shingles and therefore no signature row)."""
    import hashlib

    from apache_flink_spark.queries.pipeline_dedup import (
        _COEFFS,
        _MERSENNE_P,
        _SHINGLES_SPARK,
    )

    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(docs)],
        "doc_id long, text string",
    )
    sh = df.select(
        "doc_id", F.split("text", " ").alias("toks")
    ).select("doc_id", F.explode(F.expr(_SHINGLES_SPARK)).alias("sh"))
    hashed = sh.select(
        "doc_id",
        F.conv(F.substring(F.md5("sh"), 1, 8), 16, 10).cast("long").alias("h"),
    )
    sig = hashed.groupBy("doc_id").agg(
        *[
            F.min(
                (F.lit(a) * F.col("h") + F.lit(b)) % F.lit(_MERSENNE_P)
            ).alias(f"m{k}")
            for k, (a, b) in enumerate(_COEFFS)
        ]
    )
    got = {r.doc_id: [r[f"m{k}"] for k in range(len(_COEFFS))] for r in sig.collect()}

    want = {}
    for i, toks in enumerate(docs):
        shingles = {
            " ".join(toks[j : j + 3]) for j in range(len(toks) - 2)
        } if len(toks) >= 3 else set()
        if not shingles:
            continue
        hs = [int(hashlib.md5(s.encode()).hexdigest()[:8], 16) for s in shingles]
        want[i] = [
            min((a * h + b) % _MERSENNE_P for h in hs) for a, b in _COEFFS
        ]
    assert got == want


@given(
    ops=st.lists(
        st.tuples(
            st.integers(0, 3),  # key
            st.sampled_from(["set", "set", "del"]),  # upsert-biased
            st.integers(-50, 50),  # value
        ),
        min_size=1,
        max_size=25,
    )
)
@_settings
def test_debezium_roundtrip_matches_dict_replay(spark, ops):
    """CDC law: encode a CONSISTENT debezium stream (c for new keys, u
    with the true before-image, d with the last image), decode with
    parse_debezium, materialize — and the result must equal a plain
    Python dict replay of the same operations. Covers op interleavings,
    re-inserts after delete, and delete-of-last-write shapes the fixture
    query can't reach."""
    import json as _json

    from pyspark.sql.types import LongType, StructField, StructType

    from apache_flink_spark.cdc import parse_debezium
    from apache_flink_spark.changelog import materialize as _mat

    payload = StructType(
        [
            StructField("id", LongType()),
            StructField("seq", LongType()),
            StructField("val", LongType()),
        ]
    )
    live: dict[int, tuple[int, int]] = {}  # key -> (seq, val)
    envelopes = []
    for seq, (key, kind, val) in enumerate(ops):
        cur = live.get(key)
        img = lambda s, v: {"id": key, "seq": s, "val": v}  # noqa: E731
        if kind == "del":
            if cur is None:
                continue  # delete of absent key: no wire event
            envelopes.append(
                {"before": img(*cur), "after": None, "op": "d", "ts_ms": seq}
            )
            del live[key]
            continue
        if cur is None:
            envelopes.append(
                {"before": None, "after": img(seq, val), "op": "c", "ts_ms": seq}
            )
        else:
            envelopes.append(
                {
                    "before": img(*cur),
                    "after": img(seq, val),
                    "op": "u",
                    "ts_ms": seq,
                }
            )
        live[key] = (seq, val)
    if not envelopes:
        return
    df = spark.createDataFrame(
        [(_json.dumps(e),) for e in envelopes], "value string"
    )
    got = sorted(
        (r.id, r.seq, r.val)
        for r in _mat(
            parse_debezium(df, payload), ["id"], ["seq"], "val"
        ).collect()
    )
    want = sorted((k, s, v) for k, (s, v) in live.items())
    assert got == want
