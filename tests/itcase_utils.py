"""Shared harness for the streaming-SQL ITCase harvest (r13 — VERDICT r12
next-item #1): run the reference suites' VERBATIM data + SQL through the
engine and compare against the reference's VERBATIM expected strings.

The reference's ``TestingRetractSink.getRetractResults`` and
``TestingUpsertTableSink.getUpsertResults`` both materialize the
retraction/upsert changelog into the FINAL table, compared as sorted
``Row.toString`` lines — so a pin is: build the test's exact input rows,
run its SQL through ``TableEnvironment.sql``, format the result rows the
way Flink's ``Row.toString`` does, sort, and compare to the expected list
copied verbatim from the suite (file:line cited at each pin).

Proctime convention (established by the r12 CEPITCase portable tier): a
processing-time run is an arrival-order run — tests materialize arrival
order as an explicit ``proctime`` BIGINT column (the row's position in the
test's data list).
"""

from __future__ import annotations

import datetime
import decimal


def flink_val(v) -> str:
    """One value as Flink's Row.toString renders it (flink-core
    types/Row.java deepToString): null literal, Java Double/Float
    ``toString`` (always a decimal point), BigDecimal scale preserved,
    java.time ISO strings (LocalDateTime drops :00 seconds)."""
    if v is None:
        return "null"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        # Java Double.toString: integral doubles print one decimal
        if v != v:  # NaN
            return "NaN"
        if v == int(v) and abs(v) < 1e16:
            return f"{v:.1f}"
        return repr(v)
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, datetime.datetime):
        # LocalDateTime.toString: ISO-8601, second/fraction omitted when
        # 0; fractions print in 3-digit groups (millis ".020", micros
        # ".000123")
        s = v.isoformat()
        if s.endswith(":00") and len(s) == 19:
            s = s[:-3]
        elif "." in s:
            head, frac = s.split(".")
            frac = frac.rstrip("0")
            if not frac:
                s = head
            else:
                pad = (3 - len(frac) % 3) % 3
                s = f"{head}.{frac}{'0' * pad}"
        return s
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, datetime.time):
        s = v.isoformat()
        if s.endswith(":00") and len(s) == 8:
            s = s[:-3]
        return s
    if isinstance(v, (list, tuple)):
        return "[" + ", ".join(flink_val(x) for x in v) + "]"
    return str(v)


def flink_rows(df) -> list[str]:
    """Collect a DataFrame as sorted Flink Row.toString lines (the
    ``sink.getRetractResults.sorted`` comparison)."""
    return sorted(",".join(flink_val(v) for v in row) for row in df.collect())


def view(tenv, name: str, rows, schema: str):
    """Register the test's verbatim data list as a temp view."""
    df = tenv.spark.createDataFrame(rows, schema)
    df.createOrReplaceTempView(name)
    return df


def with_proctime(rows) -> list[tuple]:
    """Arrival order as an explicit column (appended LAST): the
    r12-established proctime convention for a micro-batch engine."""
    return [tuple(r) + (i,) for i, r in enumerate(rows)]


def run_retract(tenv, sql: str) -> list[str]:
    """The TestingRetractSink pin: final materialized result of the
    query, as sorted Flink row strings."""
    return flink_rows(tenv.sql(sql))
