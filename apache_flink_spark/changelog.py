"""Changelog / retraction modeling — the ``__rowkind`` convention.

Reference parity (SURVEY.md §1.1): every streaming row in the reference
carries a RowKind (+I insert, -U update-before/retract, +U update-after,
-D delete — flink-core .../types/RowKind.java:31-52), and operators consume
and emit changelogs (ChangelogMode). Structured Streaming has output modes
instead of per-row kinds, so where changelog semantics are required this
engine models them explicitly as a ``__rowkind`` string column (the SURVEY
§1.1 mapping decision), with:

  - :func:`derive_changelog` — turn a keyed, time-ordered table into its
    insert/retract event stream (what a Flink group-agg or upsert source
    emits downstream).
  - :func:`materialize` — ChangelogNormalize
    (StreamExecChangelogNormalize.java:77): collapse a changelog back into
    the latest non-deleted row per key.
  - :func:`drop_update_before` — StreamExecDropUpdateBefore
    (DropUpdateBeforeFunction.java): strip -U rows for sinks that key on
    upserts and don't need the retract half.

Scale: both derive and materialize are one window/group pass over the key
partitioning; no state beyond the per-key frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

INSERT = "+I"
UPDATE_BEFORE = "-U"
UPDATE_AFTER = "+U"
DELETE = "-D"

ROWKIND_COL = "__rowkind"


def derive_changelog(
    df: DataFrame, key_cols: list[str], order_cols: list[str], value_col: str
) -> DataFrame:
    """Emit the changelog of a keyed, time-ordered table: the first row per
    key is +I; every later row emits -U (prior value) then +U (new value),
    both stamped with the current row's order columns."""
    w = Window.partitionBy(*key_cols).orderBy(*order_cols)
    base = df.select(*key_cols, *order_cols, value_col).withColumn(
        "__prev", F.lag(value_col).over(w)
    )
    # r8: one pass — a 3-branch unionAll recomputes the scan+window per
    # branch; exploding each row into its rowkind events keeps the same
    # output set from a single window pass (first row -> [+I]; later
    # rows -> [-U prior, +U new])
    ev = F.explode(
        F.when(
            F.col("__prev").isNull(),
            F.array(
                F.struct(
                    F.lit(INSERT).alias(ROWKIND_COL),
                    F.col(value_col).alias(value_col),
                )
            ),
        ).otherwise(
            F.array(
                F.struct(
                    F.lit(UPDATE_BEFORE).alias(ROWKIND_COL),
                    F.col("__prev").alias(value_col),
                ),
                F.struct(
                    F.lit(UPDATE_AFTER).alias(ROWKIND_COL),
                    F.col(value_col).alias(value_col),
                ),
            )
        )
    ).alias("__ev")
    return base.select(*key_cols, *order_cols, ev).select(
        *key_cols, *order_cols,
        F.col(f"__ev.{ROWKIND_COL}").alias(ROWKIND_COL),
        F.col(f"__ev.{value_col}").alias(value_col),
    )


def materialize(
    changelog: DataFrame, key_cols: list[str], order_cols: list[str], value_col: str
) -> DataFrame:
    """ChangelogNormalize: latest +I/+U row per key wins; keys whose final
    event is -D disappear. One row_number pass on the key partitioning."""
    w = Window.partitionBy(*key_cols).orderBy(
        *[F.desc(c) for c in order_cols],
        # At equal order position, +U/-D outrank the -U retract half.
        F.desc(ROWKIND_COL),
    )
    ranked = changelog.filter(F.col(ROWKIND_COL) != UPDATE_BEFORE).withColumn(
        "__rn", F.row_number().over(w)
    )
    return (
        ranked.filter((F.col("__rn") == 1) & (F.col(ROWKIND_COL) != DELETE))
        .select(*key_cols, *order_cols, value_col)
    )


def drop_update_before(changelog: DataFrame) -> DataFrame:
    """DropUpdateBefore: forward only +I/+U/-D (upsert-keyed sinks)."""
    return changelog.filter(F.col(ROWKIND_COL) != UPDATE_BEFORE)


def materialize_retract(changelog: DataFrame) -> DataFrame:
    """Materialize a RETRACT changelog with no primary key: +I/+U add a
    row, -U/-D remove a row matching by FULL VALUE (the reference's
    'changelog-mode' = 'I,UA,UB,D' source without a PK —
    ChangelogSourceITCase registerChangelogSource; retraction is a
    multiset operation, not a keyed upsert). The final table is the net
    multiset: each distinct payload survives max(0, inserts - retracts)
    times.

    Scale: one hash aggregation over the payload columns (map-side
    partial combine); the explode rebuilds multiplicity without a second
    shuffle."""
    payload = [c for c in changelog.columns if c != ROWKIND_COL]
    sign = F.when(
        F.col(ROWKIND_COL).isin(INSERT, UPDATE_AFTER), F.lit(1)
    ).otherwise(F.lit(-1))
    net = changelog.groupBy(*payload).agg(F.sum(sign).alias("__net"))
    return (
        net.filter(F.col("__net") > 0)
        .withColumn(
            "__dup",
            F.explode(F.sequence(F.lit(1), F.col("__net").cast("int"))),
        )
        .select(*payload)
    )


def versioned_table(
    changelog: DataFrame, time_col: str, arrival_col: str
) -> DataFrame:
    """Build an event-time VERSIONED TABLE from a keyed changelog — the
    right side of a ``FOR SYSTEM_TIME AS OF`` temporal join
    (flink-table-runtime TemporalRowTimeJoinOperator's right-state
    timeline; TemporalJoinITCase registers these via changelog sources
    with a PK + watermark).

    Version timeline per key: every +I/+U event starts a new version at
    its event time; -U (the retract half) carries no timeline
    information and is dropped; -D ends the key's validity at the
    DELETE's own event time (the reference: "the event time semantics in
    delete event is when the delete event happened") — modeled as a
    TOMBSTONE version that keeps its full payload (so the join-key
    equality can still pick it, shadowing older versions) and is marked
    ``__version_deleted``; the temporal_sql rewrite filters a picked
    tombstone AFTER the as-of pick, yielding NULLs under LEFT JOIN and a
    dropped row under INNER. Hidden columns ``__version_time``
    (ordering) and ``__version_seq`` (arrival tiebreak: at equal version
    time the later event wins, and a -D at the same time as a +U shadows
    it) drive the pick.

    Scale: a pure projection — no shuffle; the temporal join itself
    shuffles on the version key."""
    payload = [
        c for c in changelog.columns if c not in (ROWKIND_COL, arrival_col)
    ]
    return changelog.filter(F.col(ROWKIND_COL) != UPDATE_BEFORE).select(
        *payload,
        F.col(time_col).alias("__version_time"),
        F.col(arrival_col).alias("__version_seq"),
        (F.col(ROWKIND_COL) == DELETE).alias("__version_deleted"),
    )


def dedup_changelog(
    df: DataFrame,
    keys: list[str],
    rowtime_col: str,
    arrival_col: str,
    keep: str = "first",
) -> DataFrame:
    """Rowtime deduplicate with RETRACTION EMISSION — the reference's
    RowTimeDeduplicateFunction (flink-table-runtime .../deduplicate/
    RowTimeDeduplicateFunction.java; pinned verbatim against streaming
    DeduplicateITCase.scala:181/:289 in tests/test_itcase_dedup.py):

    per key, rows arrive in ``arrival_col`` order; the current winner is
    the min (keep='first') or max (keep='last') of ``(rowtime, arrival)``
    — so for keep-first a STRICTLY earlier rowtime replaces (ties keep
    the earlier arrival), and for keep-last a later-or-EQUAL rowtime
    replaces (the reference's shouldKeepCurrentRow asymmetry). The first
    winner per key emits +I; every replacement emits -U(old), +U(new)
    under the ``__rowkind`` convention.

    Scale: one hash exchange on ``keys`` + two window passes over the
    same sort (running winner, then change-point changelog) — the same
    keyed distribution the reference's dedup state requires; no
    driver-side collection.
    """
    if keep not in ("first", "last"):
        raise ValueError(f"keep must be 'first' or 'last', got {keep!r}")
    data_cols = list(df.columns)
    w = (
        Window.partitionBy(*keys)
        .orderBy(arrival_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cand = F.struct(
        F.col(rowtime_col).alias("__rt"),
        F.col(arrival_col).alias("__arr"),
        *[F.col(c).alias(c) for c in data_cols],
    )
    winner = (F.min(cand) if keep == "first" else F.max(cand)).over(w)
    wdf = df.withColumn("__winner", winner)
    # change points: the winner differs from the previous row's winner
    lag_w = Window.partitionBy(*keys).orderBy(arrival_col)
    points = (
        wdf.withColumn("__prev_winner", F.lag("__winner").over(lag_w))
        .filter(
            F.col("__prev_winner").isNull()
            | ~(F.col("__winner") == F.col("__prev_winner"))
        )
    )
    ev = F.explode(
        F.when(
            F.col("__prev_winner").isNull(),
            F.array(
                F.struct(
                    F.lit(INSERT).alias(ROWKIND_COL),
                    F.col("__winner").alias("__row"),
                )
            ),
        ).otherwise(
            F.array(
                F.struct(
                    F.lit(UPDATE_BEFORE).alias(ROWKIND_COL),
                    F.col("__prev_winner").alias("__row"),
                ),
                F.struct(
                    F.lit(UPDATE_AFTER).alias(ROWKIND_COL),
                    F.col("__winner").alias("__row"),
                ),
            )
        )
    ).alias("__ev")
    return points.select(ev).select(
        F.col(f"__ev.{ROWKIND_COL}").alias(ROWKIND_COL),
        *[F.col(f"__ev.__row.{c}").alias(c) for c in data_cols],
    )
