"""Time-centric joins — interval, as-of (temporal), window join, lookup join.

Reference parity (SURVEY.md §2.3):
  - Interval join: StreamExecIntervalJoin / TimeIntervalJoin (flink-table-runtime
    .../join/interval/TimeIntervalJoin.java) — equi-key join bounded by a time
    range on both sides.
  - Temporal / as-of join (FOR SYSTEM_TIME AS OF): StreamExecTemporalJoin /
    TemporalRowTimeJoinOperator — probe side picks the latest build-side row
    with ts <= probe.ts per key.
  - Window join: StreamExecWindowJoin / WindowJoinOperator — equi-join that
    additionally requires both rows in the same time window.
  - Lookup join: StreamExecLookupJoin / LookupJoinRunner — per-row probe into
    a dimension table.

Spark-first implementations and their scale story:
  - Interval join = equi-join on the key plus a range predicate; Catalyst
    plans a ShuffledHashJoin/SortMergeJoin on user_id and evaluates the range
    as a post-join filter — state is bounded by the key partitioning, no
    cross product.
  - As-of join deliberately avoids join-then-filter (which is O(clicks x
    views) per key before ranking): tag both sides, union, and take
    ``last(value, ignorenulls=True)`` over a (key, time)-sorted window. One
    shuffle + one sort over clicks+views — the same single-pass merge the
    reference's TemporalRowTimeJoinOperator does with keyed state, and it
    survives 100TB because the window never materializes more than a
    partition.
  - Window join = plain equi-join with the window struct as an extra key.
  - Lookup join at batch = broadcast hash join against the dim table (the
    probe-per-row semantics collapse to a broadcast map lookup; Spark ships
    the dim once per executor instead of per-row RPCs).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from apache_flink_spark.queries._util import t
from apache_flink_spark.queries.registry import query

MIN10 = 600_000_000


def _clicks_errors_interval(spark, sf_dir, how: str):
    """Shared body of the interval-join family (one place for the
    30-minute bound and the column set; only the join mode varies)."""
    e = t(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), F.col("ts").alias("c_ts")
    )
    errors = e.filter(F.col("event_type") == "error").select(
        F.col("user_id").alias("e_user"),
        F.col("event_id").alias("error_id"),
        F.col("ts").alias("e_ts"),
    )
    return clicks.join(
        errors,
        (F.col("user_id") == F.col("e_user"))
        & (F.col("e_ts") >= F.col("c_ts") - F.expr("INTERVAL 30 MINUTES"))
        & (F.col("e_ts") <= F.col("c_ts")),
        how,
    )


@query(
    "interval_join",
    oracle="""
    SELECT c.user_id,
           c.event_id AS click_id,
           er.event_id AS error_id,
           epoch_us(c.ts) AS click_ts,
           epoch_us(er.ts) AS error_ts
    FROM events c JOIN events er
      ON c.user_id = er.user_id
     AND er.ts >= c.ts - INTERVAL 30 MINUTE
     AND er.ts <= c.ts
    WHERE c.event_type = 'click' AND er.event_type = 'error'
    """,
)
def interval_join(spark, sf_dir):
    """Interval join (TimeIntervalJoin): errors within the 30 minutes
    preceding each click by the same user."""
    return _clicks_errors_interval(spark, sf_dir, "inner").select(
        "user_id",
        "click_id",
        "error_id",
        F.unix_micros("c_ts").alias("click_ts"),
        F.unix_micros("e_ts").alias("error_ts"),
    )


@query(
    "interval_join_left",
    oracle="""
    SELECT c.user_id,
           c.event_id AS click_id,
           er.event_id AS error_id,
           epoch_us(c.ts) AS click_ts,
           epoch_us(er.ts) AS error_ts
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'error') er
      ON c.user_id = er.user_id
     AND er.ts >= c.ts - INTERVAL 30 MINUTE
     AND er.ts <= c.ts
    """,
)
def interval_join_left(spark, sf_dir):
    """LEFT OUTER interval join (TimeIntervalJoin.java — the reference
    plans all four outer modes for interval joins; its joinType drives
    whether unmatched left rows emit with nulls once the time bound
    passes). Batch twin: clicks keep a row even when no error preceded
    them within 30 minutes. Same plan shape as the inner variant — equi
    shuffle on user_id, range as a post-join filter, outer rows preserved
    by the join mode, so the scale story is unchanged."""
    return _clicks_errors_interval(spark, sf_dir, "left").select(
        "user_id",
        "click_id",
        "error_id",
        F.unix_micros("c_ts").alias("click_ts"),
        F.unix_micros("e_ts").alias("error_ts"),
    )


@query(
    "interval_join_full",
    oracle="""
    SELECT c.user_id AS click_user,
           er.user_id AS error_user,
           c.event_id AS click_id,
           er.event_id AS error_id
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    FULL JOIN (SELECT * FROM events WHERE event_type = 'error') er
      ON c.user_id = er.user_id
     AND er.ts >= c.ts - INTERVAL 30 MINUTE
     AND er.ts <= c.ts
    """,
)
def interval_join_full(spark, sf_dir):
    """FULL OUTER interval join (TimeIntervalJoin.java joinType=FULL):
    clicks with no preceding error AND errors followed by no click within
    the bound both survive with nulls — the reference emits each side's
    unmatched rows when its time bound expires."""
    j = _clicks_errors_interval(spark, sf_dir, "full")
    return j.select(
        F.col("user_id").alias("click_user"),
        F.col("e_user").alias("error_user"),
        "click_id",
        "error_id",
    )


def asof_join(left, right, key: str, ts: str, carry: str, tiebreak: str):
    """Reusable as-of / temporal join (TemporalRowTimeJoinOperator, FOR
    SYSTEM_TIME AS OF): for every LEFT row, the value of ``carry`` from the
    latest RIGHT row with ``right[ts] <= left[ts]`` on the same ``key``
    (NULL when none — left-outer semantics).

    Union-merge rewrite, NOT a join: both sides shuffle ONCE on the key and
    a single sorted window pass carries the newest right value forward —
    at 100 TB this is one exchange + one in-partition sort, versus the
    range-join + per-row max a naive formulation pays. Right rows sort
    before left rows at equal ts, so a same-instant right row is visible
    (the reference's <= semantics); ``tiebreak`` must exist on both sides
    and make the per-key order total, which also makes ties among right
    rows deterministic (largest tiebreak wins)."""
    l = left.withColumn("__side", F.lit(1))
    r = right.withColumn("__side", F.lit(0))
    u = l.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy(key)
        .orderBy(ts, "__side", tiebreak)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.withColumn(
        carry,
        F.last(
            F.when(F.col("__side") == 0, F.col(carry)), ignorenulls=True
        ).over(w),
    )
    return carried.filter(F.col("__side") == 1).drop("__side")


@query(
    "asof_join_latest_view",
    oracle="""
    WITH u AS (
        SELECT user_id, epoch_us(ts) AS ep, event_id, 1 AS is_click
        FROM events WHERE event_type = 'click'
        UNION ALL
        SELECT user_id, epoch_us(ts), event_id, 0
        FROM events WHERE event_type = 'view'
    )
    SELECT user_id, event_id AS click_id, ep AS click_ts, view_event_id
    FROM (
        SELECT user_id, ep, event_id, is_click,
               LAST_VALUE(CASE WHEN is_click = 0 THEN event_id END IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY ep, is_click, event_id
                         ROWS UNBOUNDED PRECEDING) AS view_event_id
        FROM u
    )
    WHERE is_click = 1
    """,
)
def asof_join_latest_view(spark, sf_dir):
    """As-of / temporal join: for every click, the latest view by the same
    user at or before it (see ``asof_join`` for the union-merge rewrite;
    property-tested against a brute-force reference in
    tests/test_properties.py)."""
    e = t(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", F.unix_micros("ts").alias("ep"), "event_id"
    )
    views = e.filter(F.col("event_type") == "view").select(
        "user_id",
        F.unix_micros("ts").alias("ep"),
        "event_id",
        F.col("event_id").alias("view_event_id"),
    )
    return asof_join(
        clicks, views, key="user_id", ts="ep", carry="view_event_id",
        tiebreak="event_id",
    ).select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.col("ep").alias("click_ts"),
        "view_event_id",
    )


@query(
    "win_join_same_window",
    oracle=f"""
    SELECT c.user_id,
           (epoch_us(c.ts) // {MIN10}) * {MIN10} AS win_start,
           c.event_id AS click_id,
           p.event_id AS purchase_id
    FROM events c JOIN events p
      ON c.user_id = p.user_id
     AND (epoch_us(c.ts) // {MIN10}) = (epoch_us(p.ts) // {MIN10})
    WHERE c.event_type = 'click' AND p.event_type = 'purchase'
    """,
)
def win_join_same_window(spark, sf_dir):
    """Window join (WindowJoinOperator): clicks and purchases by the same
    user inside the same 10-minute tumbling window — equi-join with the
    window struct as an extra join key."""
    e = t(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id",
        F.window("ts", "10 minutes").alias("win"),
        F.col("event_id").alias("click_id"),
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.window("ts", "10 minutes").alias("p_win"),
        F.col("event_id").alias("purchase_id"),
    )
    joined = clicks.join(
        purchases,
        (F.col("user_id") == F.col("p_user")) & (F.col("win") == F.col("p_win")),
    )
    return joined.select(
        "user_id",
        F.unix_micros("win.start").alias("win_start"),
        "click_id",
        "purchase_id",
    )


def _window_join_sides(spark, sf_dir):
    """Shared sides for the window-join family: clicks and purchases with
    their 10-minute tumbling window struct as an extra join key."""
    e = t(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id",
        F.window("ts", "10 minutes").alias("win"),
        F.col("event_id").alias("click_id"),
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.window("ts", "10 minutes").alias("p_win"),
        F.col("event_id").alias("purchase_id"),
    )
    cond = (F.col("user_id") == F.col("p_user")) & (
        F.col("win") == F.col("p_win")
    )
    return clicks, purchases, cond


@query(
    "win_join_semi",
    oracle=f"""
    SELECT c.user_id,
           (epoch_us(c.ts) // {MIN10}) * {MIN10} AS win_start,
           c.event_id AS click_id
    FROM events c
    WHERE c.event_type = 'click' AND EXISTS (
        SELECT 1 FROM events p
        WHERE p.event_type = 'purchase' AND p.user_id = c.user_id
          AND (epoch_us(p.ts) // {MIN10}) = (epoch_us(c.ts) // {MIN10})
    )
    """,
)
def win_join_semi(spark, sf_dir):
    """Window SEMI join (reference WindowJoinOperator.java:262 plans
    SemiAntiJoinOperator for IN/EXISTS over a shared window): clicks that
    saw at least one same-user purchase inside the same 10-minute tumble —
    left_semi with the window struct as an extra equi-key, so matching
    stays window-local and per-window state is droppable on watermark."""
    clicks, purchases, cond = _window_join_sides(spark, sf_dir)
    return clicks.join(purchases, cond, "left_semi").select(
        "user_id",
        F.unix_micros("win.start").alias("win_start"),
        "click_id",
    )


@query(
    "win_join_anti",
    oracle=f"""
    SELECT c.user_id,
           (epoch_us(c.ts) // {MIN10}) * {MIN10} AS win_start,
           c.event_id AS click_id
    FROM events c
    WHERE c.event_type = 'click' AND NOT EXISTS (
        SELECT 1 FROM events p
        WHERE p.event_type = 'purchase' AND p.user_id = c.user_id
          AND (epoch_us(p.ts) // {MIN10}) = (epoch_us(c.ts) // {MIN10})
    )
    """,
)
def win_join_anti(spark, sf_dir):
    """Window ANTI join (SemiAntiJoinOperator, anti side): clicks with NO
    same-user purchase in their 10-minute window. On a stream the window
    bound is what makes anti emission decidable — once the watermark
    closes the window, absence is final (cf. stream_anti_join, where the
    bound comes from the interval condition)."""
    clicks, purchases, cond = _window_join_sides(spark, sf_dir)
    return clicks.join(purchases, cond, "left_anti").select(
        "user_id",
        F.unix_micros("win.start").alias("win_start"),
        "click_id",
    )


@query(
    "win_join_full_outer",
    oracle=f"""
    SELECT COALESCE(c.user_id, p.user_id) AS user_id,
           COALESCE((epoch_us(c.ts) // {MIN10}) * {MIN10},
                    (epoch_us(p.ts) // {MIN10}) * {MIN10}) AS win_start,
           c.event_id AS click_id,
           p.event_id AS purchase_id
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    FULL JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON c.user_id = p.user_id
     AND (epoch_us(c.ts) // {MIN10}) = (epoch_us(p.ts) // {MIN10})
    """,
)
def win_join_full_outer(spark, sf_dir):
    """Window FULL OUTER join (WindowJoinOperator outer spec): clicks and
    purchases paired within their shared 10-minute window; unmatched rows
    on either side emit null-padded. Window-locality again bounds state —
    each window's buffered rows are emitted and dropped when it closes."""
    clicks, purchases, cond = _window_join_sides(spark, sf_dir)
    return clicks.join(purchases, cond, "full_outer").select(
        F.coalesce(F.col("user_id"), F.col("p_user")).alias("user_id"),
        F.unix_micros(
            F.coalesce(F.col("win.start"), F.col("p_win.start"))
        ).alias("win_start"),
        "click_id",
        "purchase_id",
    )


@query(
    "lookup_join_enrich",
    oracle="""
    SELECT e.event_id, e.user_id, e.event_type,
           c.c_name AS customer_name, c.c_mktsegment AS mktsegment
    FROM events e LEFT JOIN customer c ON c.c_custkey = e.user_id + 1
    """,
)
def lookup_join_enrich(spark, sf_dir):
    """Lookup join (LookupJoinRunner): enrich the event stream with dimension
    attributes. Batch collapse of probe-per-row: an explicit broadcast hash
    join — the dimension ships once per executor, the fact side never
    shuffles (the plan must show BroadcastHashJoin; a shuffled join here
    would move 100TB of facts to co-locate with a MB-scale dim)."""
    e = t(spark, sf_dir, "events")
    c = t(spark, sf_dir, "customer")
    return e.join(
        F.broadcast(c), c["c_custkey"] == e["user_id"] + 1, "left"
    ).select(
        "event_id",
        "user_id",
        "event_type",
        F.col("c_name").alias("customer_name"),
        F.col("c_mktsegment").alias("mktsegment"),
    )


@query(
    "temporal_join_sql",
    oracle="""
    SELECT c.user_id, c.event_id AS click_id, epoch_us(c.ts) AS click_ts,
           v.event_id AS view_event_id
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
      ON c.user_id = v.user_id AND v.ts <= c.ts
    """,
)
def temporal_join_sql(spark, sf_dir):
    """FOR SYSTEM_TIME AS OF from a SQL string (reference temporal-join
    syntax -> TemporalRowTimeJoinOperator; here temporal_sql.py rewrites the
    site to a correlated LATERAL top-1 subquery): every click joined to the
    newest same-user view at or before it, NULL when none. The oracle is
    DuckDB's native ASOF LEFT JOIN — an independent third formulation of
    the same semantics (the DataFrame union-merge twin is
    asof_join_latest_view)."""
    from apache_flink_spark.environment import TableEnvironment

    tenv = TableEnvironment(spark=spark)
    tenv.use_data_dir(sf_dir)
    tenv.create_view(
        "clicks_v", tenv.sql("SELECT * FROM events WHERE event_type = 'click'")
    )
    tenv.create_view(
        "views_v", tenv.sql("SELECT * FROM events WHERE event_type = 'view'")
    )
    return tenv.sql(
        """
        SELECT c.user_id, c.event_id AS click_id,
               unix_micros(c.ts) AS click_ts,
               v.event_id AS view_event_id
        FROM clicks_v c
        LEFT JOIN views_v FOR SYSTEM_TIME AS OF c.ts AS v
          ON v.user_id = c.user_id
        """
    )


@query(
    "lookup_join_snapshot",
    oracle="""
    SELECT e.event_id, n.n_name, n.n_regionkey
    FROM events e JOIN nation n
      ON e.user_id % 25 = n.n_nationkey AND e.event_id % 11 = 0
    """,
)
def lookup_join_snapshot(spark, sf_dir):
    """Lookup join (r13 — LookupJoinITCase.scala:206 shape): ``FOR
    SYSTEM_TIME AS OF T.ts`` against a dimension table with NO time
    attribute (nation) — the reference's StreamExecLookupJoin probes the
    dimension's current snapshot and emits all matches, so temporal_sql's
    LOOKUP mode compiles it to a plain join on the snapshot. Catalyst
    broadcasts the 25-row dim side; at 100 TB this is the canonical
    broadcast-hash lookup with no LIMIT-1 domain join."""
    from apache_flink_spark.environment import TableEnvironment

    tenv = TableEnvironment(spark=spark)
    tenv.use_data_dir(sf_dir)
    return tenv.sql(
        """
        SELECT T.event_id, D.n_name, D.n_regionkey
        FROM events AS T JOIN nation FOR SYSTEM_TIME AS OF T.ts AS D
          ON T.user_id % 25 = D.n_nationkey AND T.event_id % 11 = 0
        """
    )
