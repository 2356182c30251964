"""Temporal-join SQL syntax — ``FOR SYSTEM_TIME AS OF``.

Reference parity: Flink SQL's event-time temporal join
(``JOIN versioned FOR SYSTEM_TIME AS OF left.ts ON ...`` — planned into
TemporalRowTimeJoinOperator, flink-table-runtime
.../join/temporal/TemporalRowTimeJoinOperator.java): each left row joins
the newest version of the right table whose time attribute is <= the left
row's time. Spark SQL lacks the syntax; the rewrite compiles each site to
a correlated LATERAL subquery (`ORDER BY version-time DESC LIMIT 1`).

r13 (TemporalJoinITCase harvest) semantics refinements, matching the
reference operator exactly:

- **Version lookup vs residual predicates.** Only the left-to-right
  EQUALITY conjuncts (``o.k = r.k``) key the version lookup; every other
  conjunct (``r.rate > 102``, ``o.currency = 'Euro'``,
  ``substr(o.currency, 1, 2) = 'US'``) filters the PICKED version — it
  does not fall back to an older version that satisfies it
  (TemporalRowTimeJoinOperator keys state by the join key and applies
  the remaining condition to the latest version only;
  TemporalJoinITCase.scala:600 testEventTimeTemporalJoinWithNonEqualCondition).
- **Versioned tables with tombstones.** A right side built by
  :func:`apache_flink_spark.changelog.versioned_table` carries hidden
  ``__version_time`` / ``__version_seq`` / ``__version_deleted`` columns:
  the as-of pick orders by (version time, arrival seq) and a picked
  tombstone (-D) yields no match — NULLs under LEFT JOIN, a dropped row
  under INNER (the reference's "event time semantics in delete event is
  when the delete event happened", TemporalJoinITCase.scala:540). Pass
  ``columns_of`` (table name -> column list) so the rewrite can detect
  these tables; without it, the legacy name-match rule applies (version
  time column named like the AS OF column).

Restricted subset (loud errors otherwise, like the reference's
unsupported-feature validation):
  - at least one left-to-right equality conjunct in ON (the version
    lookup key — the reference requires the join key to contain the
    versioned table's primary key);
  - without ``columns_of`` metadata, the right-side version time column
    must have the same name as the left's AS OF column.

PLAN NOTE — this surface is for SQL compatibility, not fact-scale use:
Catalyst decorrelates the non-equi time predicate with a DOMAIN JOIN that
broadcasts the distinct AS-OF timestamp set and theta-joins it against the
versioned table. With a bounded version/timestamp domain that is fine; on
a fact-scale left side the domain approaches the row count and the plan
degrades to O(|domain| x |versions|). The scalable formulation — one
union + last-ignore-nulls window pass, a single shuffle, no domain join —
is queries/temporal_joins.asof_join_latest_view; use it (or its pattern)
when the left side is large. See SCALE.md.
"""

from __future__ import annotations

import re
from typing import Callable

VERSION_TIME = "__version_time"
VERSION_SEQ = "__version_seq"
VERSION_DELETED = "__version_deleted"
_VERSION_COLS = {VERSION_TIME, VERSION_SEQ, VERSION_DELETED}


class TemporalSqlError(ValueError):
    pass


_ASOF_RE = re.compile(
    r"(?P<left>LEFT\s+)?JOIN\s+(?P<tbl>\w+)\s+FOR\s+SYSTEM_TIME\s+AS\s+OF\s+"
    r"(?P<la>\w+)\.(?P<ts>\w+)\s+(?:AS\s+)?(?P<ra>\w+)\s+ON\s+"
    r"(?P<cond>.+?)"
    r"(?=\s+(?:WHERE|GROUP|ORDER|LIMIT|HAVING|LEFT|RIGHT|INNER|JOIN)\b|\s*$)",
    re.I | re.S,
)

_KEY_EQ_RE = re.compile(
    r"^\s*(\w+)\s*\.\s*`?(\w+)`?\s*=\s*(\w+)\s*\.\s*`?(\w+)`?\s*$"
)


def _split_conjuncts(cond: str) -> list[str]:
    """Top-level AND split, parenthesis-aware."""
    parts, depth, start = [], 0, 0
    i, n = 0, len(cond)
    while i < n:
        c = cond[i]
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif depth == 0 and cond[i:i + 3].upper() == "AND" and (
            i == 0 or not (cond[i - 1].isalnum() or cond[i - 1] == "_")
        ) and (
            i + 3 >= n or not (cond[i + 3].isalnum() or cond[i + 3] == "_")
        ):
            parts.append(cond[start:i])
            i += 3
            start = i
            continue
        i += 1
    parts.append(cond[start:])
    return [p.strip() for p in parts if p.strip()]


def rewrite_system_time_joins(
    sql: str, columns_of: Callable[[str], list[str] | None] | None = None
) -> str:
    """Rewrite every ``[LEFT] JOIN t FOR SYSTEM_TIME AS OF l.ts AS r ON c``
    site into a correlated LATERAL subquery; unchanged if none present.

    ``columns_of`` (optional): resolve a table/view name to its column
    list — enables the versioned-table (tombstone) mode for right sides
    carrying ``__version_time``/``__version_seq``/``__version_deleted``.
    """
    if re.search(r"FOR\s+SYSTEM_TIME", sql, re.I) is None:
        return sql

    def sub(m: re.Match) -> str:
        la, ts, ra, tbl = (
            m.group("la"),
            m.group("ts"),
            m.group("ra"),
            m.group("tbl"),
        )
        cond = m.group("cond").strip()
        join_kw = "LEFT JOIN" if m.group("left") else "JOIN"

        cols = columns_of(tbl) if columns_of is not None else None
        # LOOKUP mode (StreamExecLookupJoin / LookupJoinRunner — the
        # reference's LookupJoinITCase): ``FOR SYSTEM_TIME AS OF
        # l.proctime`` against a table with NO time attribute is a
        # lookup join — every probe sees the dimension table's current
        # snapshot and emits ALL matching rows, so it compiles to a
        # plain join on the snapshot (constant keys, UDF conjuncts and
        # non-equi predicates all follow ordinary join ON semantics).
        if cols is not None and VERSION_TIME not in cols and ts not in cols:
            return f"{join_kw} {tbl} AS {ra} ON ({cond})"

        key_conds, residual = [], []
        for c in _split_conjuncts(cond):
            km = _KEY_EQ_RE.match(c)
            if km and {km.group(1), km.group(3)} == {la, ra}:
                key_conds.append(c)
            else:
                residual.append(c)
        if not key_conds:
            raise TemporalSqlError(
                "temporal join requires at least one equality conjunct "
                f"between {la!r} and {ra!r} in the ON condition (the "
                "version lookup key); got: " + cond
            )

        versioned = bool(cols) and VERSION_TIME in cols
        if versioned:
            vt, payload = VERSION_TIME, [c for c in cols if c not in _VERSION_COLS]
            out_list = ", ".join(f"{ra}.`{c}`" for c in payload)
            order = f"{ra}.`{vt}` DESC, {ra}.`{VERSION_SEQ}` DESC"
            post = [f"NOT {ra}.`{VERSION_DELETED}`"] + residual
        else:
            vt, out_list = ts, f"{ra}.*"
            order = f"{ra}.`{vt}` DESC"
            post = residual

        inner = (
            f"SELECT * FROM {tbl} AS {ra}"
            f" WHERE ({' AND '.join(key_conds)})"
            f" AND {ra}.`{vt}` <= {la}.`{ts}`"
            f" ORDER BY {order} LIMIT 1"
        )
        if post:
            body = (
                f"SELECT {out_list} FROM ({inner}) AS {ra}"
                f" WHERE {' AND '.join(post)}"
            )
        elif versioned:
            body = f"SELECT {out_list} FROM ({inner}) AS {ra}"
        else:
            body = inner
        return f"{join_kw} LATERAL ({body}) AS {ra}"

    out = _ASOF_RE.sub(sub, sql)
    if re.search(r"FOR\s+SYSTEM_TIME", out, re.I):
        raise TemporalSqlError(
            "unsupported FOR SYSTEM_TIME AS OF form — supported subset: "
            "[LEFT] JOIN <table> FOR SYSTEM_TIME AS OF <alias>.<tscol> "
            "[AS] <alias2> ON <condition with at least one left-to-right "
            "equality conjunct>; without catalog metadata the version "
            "time column must be named like the AS OF column"
        )
    return out
