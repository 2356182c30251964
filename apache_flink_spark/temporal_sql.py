"""Temporal-join SQL syntax — ``FOR SYSTEM_TIME AS OF``.

Reference parity: Flink SQL's event-time temporal join
(``JOIN versioned FOR SYSTEM_TIME AS OF left.ts ON ...`` — planned into
TemporalRowTimeJoinOperator, flink-table-runtime
.../join/temporal/TemporalRowTimeJoinOperator.java): each left row joins
the newest version of the right table whose time attribute is <= the left
row's time. Spark SQL lacks the syntax; the rewrite compiles each site to
a correlated LATERAL subquery (`ORDER BY version-time DESC LIMIT 1`).

PLAN NOTE — this surface is for SQL compatibility, not fact-scale use:
Catalyst decorrelates the non-equi time predicate with a DOMAIN JOIN that
broadcasts the distinct AS-OF timestamp set and theta-joins it against the
versioned table. With a bounded version/timestamp domain that is fine; on
a fact-scale left side the domain approaches the row count and the plan
degrades to O(|domain| x |versions|). The scalable formulation — one
union + last-ignore-nulls window pass, a single shuffle, no domain join —
is queries/temporal_joins.asof_join_latest_view; use it (or its pattern)
when the left side is large. See SCALE.md.

Restricted subset (loud errors otherwise, like the reference's
unsupported-feature validation):
  - right-side version time column must have the same name as the left's
    AS OF column (the common versioned-table convention);
  - the ON condition is parenthesis-free (equality/AND chain);
  - version timestamps are assumed unique per key (Flink's versioned
    tables guarantee unique (pk, ts) after version dedup).
"""

from __future__ import annotations

import re


class TemporalSqlError(ValueError):
    pass


_ASOF_RE = re.compile(
    r"(?P<left>LEFT\s+)?JOIN\s+(?P<tbl>\w+)\s+FOR\s+SYSTEM_TIME\s+AS\s+OF\s+"
    r"(?P<la>\w+)\.(?P<ts>\w+)\s+(?:AS\s+)?(?P<ra>\w+)\s+ON\s+"
    r"(?P<cond>[^()]+?)"
    r"(?=\s+(?:WHERE|GROUP|ORDER|LIMIT|HAVING|LEFT|RIGHT|INNER|JOIN)\b|\s*$)",
    re.I | re.S,
)


def rewrite_system_time_joins(sql: str) -> str:
    """Rewrite every ``[LEFT] JOIN t FOR SYSTEM_TIME AS OF l.ts AS r ON c``
    site into a correlated LATERAL subquery; unchanged if none present."""
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
        return (
            f"{join_kw} LATERAL ("
            f"SELECT {ra}.* FROM {tbl} AS {ra}"
            f" WHERE ({cond}) AND {ra}.`{ts}` <= {la}.`{ts}`"
            f" ORDER BY {ra}.`{ts}` DESC LIMIT 1"
            f") AS {ra}"
        )

    out = _ASOF_RE.sub(sub, sql)
    if re.search(r"FOR\s+SYSTEM_TIME", out, re.I):
        raise TemporalSqlError(
            "unsupported FOR SYSTEM_TIME AS OF form — supported subset: "
            "[LEFT] JOIN <table> FOR SYSTEM_TIME AS OF <alias>.<tscol> "
            "[AS] <alias2> ON <parenthesis-free condition>, with the "
            "version time column named like the AS OF column"
        )
    return out
