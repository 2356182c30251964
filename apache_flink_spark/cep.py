"""CEP Pattern API — the flink-cep ``Pattern`` builder over DataFrames.

Reference parity: flink-libraries/flink-cep
``.../pattern/Pattern.java`` (begin:98, next:240, followedBy:258,
notFollowedBy:326, where:130, times/oneOrMore/optional quantifiers,
within:204) and ``CEP.pattern(...)`` + ``PatternStream.select`` — the
programmatic twin of SQL MATCH_RECOGNIZE.

Execution model (Spark-first): a Pattern COMPILES to a MATCH_RECOGNIZE
statement and runs on the engine's batch NFA (match_recognize.py — JVM-side
DEFINE predicates, one keyed shuffle, Arrow-batched matcher):

  - ``next``          -> strict contiguity: adjacent pattern variables
  - ``followedBy``    -> relaxed contiguity: a reluctant any-row gap
                         variable (``Gi*?`` DEFINE TRUE) before the next
                         variable — the NFA's ignore-edge
  - ``notFollowedBy`` -> the NFA STOP state: the gap variable's predicate
                         is the NEGATION of the forbidden condition
                         (``Ni*? DEFINE NOT(cond)``), so any intervening
                         row matching the condition kills the match —
                         exactly Pattern.java:326's semantics
  - ``within``        -> the MATCH_RECOGNIZE WITHIN horizon
  - quantifiers       -> times(n) / times(n,m) / oneOrMore / optional map
                         to {n} / {n,m} / + / ?  (greedy; ``reluctant()``
                         adds the lazy '?')

``notFollowedBy`` as the LAST element needs a ``within`` horizon (same
rule the reference enforces) and a different plan: absence-until-horizon
cannot end a row-pattern match, so it compiles to one range-frame window
scan (min forbidden-event time in (0, horizon]) — no join, no second pass.
"""

from __future__ import annotations

import itertools
import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame

_cep_view_counter = itertools.count()

__all__ = ["Pattern", "CepError", "pattern_to_match_recognize", "cep_select"]


class CepError(ValueError):
    pass


_UNIT_US = {
    "second": 1_000_000,
    "seconds": 1_000_000,
    "minute": 60_000_000,
    "minutes": 60_000_000,
    "hour": 3_600_000_000,
    "hours": 3_600_000_000,
    "day": 86_400_000_000,
    "days": 86_400_000_000,
}


@dataclass
class _Elem:
    name: str
    contiguity: str  # "begin" | "next" | "followed_by" | "not_followed_by"
    conds: list[str] = field(default_factory=list)
    or_conds: list[str] = field(default_factory=list)
    until_conds: list[str] = field(default_factory=list)
    quant: str = ""  # "", "+", "?", "{n}", "{n,m}" (+ trailing "?" lazy)

    def condition_sql(self) -> str:
        base = " AND ".join(f"({c})" for c in self.conds) or "TRUE"
        if self.or_conds:
            ors = " OR ".join(f"({c})" for c in self.or_conds)
            base = f"({base}) OR ({ors})"
        for u in self.until_conds:
            # until() gates the WHOLE element, including or_where branches
            # (the reference applies the stop check per event regardless
            # of which condition accepted it — r7 review)
            base = f"({base}) AND (NOT ({u}))"
        return base


class Pattern:
    """Fluent pattern builder (reference Pattern.java). Conditions are SQL
    boolean expressions over the row's columns (the SimpleCondition
    analog — evaluated JVM-side by Catalyst, never in Python)."""

    def __init__(self) -> None:
        self._elems: list[_Elem] = []
        self._within: tuple[int, str] | None = None

    # -- construction ------------------------------------------------

    @staticmethod
    def begin(name: str) -> "Pattern":
        p = Pattern()
        p._elems.append(_Elem(name=p._check_name(name), contiguity="begin"))
        return p

    def _check_name(self, name: str) -> str:
        if not re.fullmatch(r"[A-Za-z_]\w*", name):
            raise CepError(f"pattern name {name!r} is not an identifier")
        if any(e.name.upper() == name.upper() for e in self._elems):
            raise CepError(
                f"pattern name {name!r} already used (the reference "
                "rejects duplicate pattern names too)"
            )
        return name

    def next(self, name: str) -> "Pattern":
        """Strict contiguity (Pattern.java:240)."""
        self._elems.append(_Elem(name=self._check_name(name),
                                 contiguity="next"))
        return self

    def followed_by(self, name: str) -> "Pattern":
        """Relaxed contiguity (Pattern.java:258): other events may occur
        between the previous element and this one."""
        self._elems.append(_Elem(name=self._check_name(name),
                                 contiguity="followed_by"))
        return self

    def not_followed_by(self, name: str) -> "Pattern":
        """Negative pattern (Pattern.java:326): the match is DISCARDED if
        an event matching this element's condition occurs before the next
        positive element (or, as the final element, within the horizon)."""
        self._elems.append(_Elem(name=self._check_name(name),
                                 contiguity="not_followed_by"))
        return self

    def not_next(self, name: str) -> "Pattern":
        raise CepError(
            "notNext is not supported — its stop state inspects exactly "
            "one physical row; express it as a PREV() predicate on the "
            "following variable in SQL MATCH_RECOGNIZE instead"
        )

    # -- conditions / quantifiers (apply to the LAST element) ---------

    def _last(self) -> _Elem:
        if not self._elems:
            raise CepError("call Pattern.begin(name) first")
        return self._elems[-1]

    def where(self, condition_sql: str) -> "Pattern":
        self._last().conds.append(condition_sql)
        return self

    def or_where(self, condition_sql: str) -> "Pattern":
        self._last().or_conds.append(condition_sql)
        return self

    def _set_quant(self, q: str) -> None:
        e = self._last()
        if e.contiguity == "not_followed_by":
            raise CepError(
                "quantifiers on notFollowedBy are not supported (the "
                "reference rejects optional negative patterns too)"
            )
        if e.quant:
            raise CepError(f"element {e.name!r} already has a quantifier")
        e.quant = q

    def times(self, n: int, m: int | None = None) -> "Pattern":
        self._set_quant(f"{{{n}}}" if m is None else f"{{{n},{m}}}")
        return self

    def one_or_more(self) -> "Pattern":
        self._set_quant("+")
        return self

    def times_or_more(self, n: int) -> "Pattern":
        self._set_quant(f"{{{n},}}")
        return self

    def optional(self) -> "Pattern":
        self._set_quant("?")
        return self

    def reluctant(self) -> "Pattern":
        e = self._last()
        if not e.quant or e.quant.endswith("?") and e.quant != "?":
            raise CepError("reluctant() needs a preceding quantifier")
        e.quant += "?"
        return self

    def consecutive(self) -> "Pattern":
        """Pattern.java consecutive(): strict internal contiguity for the
        looping element. Quantifiers here COMPILE to MATCH_RECOGNIZE
        repetitions, which are consecutive by construction — so this is
        the (already-active) default and the call is a no-op kept for
        source compatibility. The reference's RELAXED internal contiguity
        (its oneOrMore default, skipping non-matching rows inside the
        loop) is the unsupported direction — see allow_combinations()."""
        return self

    def allow_combinations(self) -> "Pattern":
        raise CepError(
            "allowCombinations / relaxed internal contiguity is not "
            "supported — quantifiers compile to MATCH_RECOGNIZE "
            "repetitions, which are consecutive; interleave an explicit "
            "gap variable (followedBy) or use the batch MATCH_RECOGNIZE "
            "alternation syntax instead"
        )

    def until(self, condition_sql: str) -> "Pattern":
        """Pattern.java until(): stop condition for a looping element —
        the loop must not extend over a row matching the condition.
        Compiles by strengthening the element's predicate with
        NOT(condition): identical acceptance for every row the loop
        consumes (the reference also applies until as a per-event stop
        check)."""
        e = self._last()
        if not e.quant:
            raise CepError("until() needs a preceding quantifier")
        e.until_conds.append(condition_sql)
        return self

    def subtype(self, _cls) -> "Pattern":
        raise CepError(
            "subtype() filters by Java event class — rows here are "
            "schema-typed, not class-typed; express the discriminator as "
            "a column predicate in where()"
        )

    def within(self, n: int, unit: str = "minutes") -> "Pattern":
        u = unit.lower()
        if u not in _UNIT_US:
            raise CepError(f"unsupported within unit {unit!r}")
        self._within = (n, u)
        return self


def pattern_to_match_recognize(
    pattern: Pattern,
    table: str,
    partition_by: str,
    order_by: str,
    measures: dict[str, str],
    skip: str = "SKIP TO NEXT ROW",
) -> str:
    """Compile a Pattern to a MATCH_RECOGNIZE statement. Default AFTER
    MATCH is SKIP TO NEXT ROW — the reference CEP's no-skip strategy
    (every start row may begin a match)."""
    elems = pattern._elems
    if not elems:
        raise CepError("empty pattern")
    if elems[-1].contiguity == "not_followed_by":
        raise CepError(
            "trailing notFollowedBy compiles to a window scan, not "
            "MATCH_RECOGNIZE — use cep_select (it picks the right plan)"
        )
    pat_parts: list[str] = []
    defines: list[str] = []
    gap_i = 0
    for i, e in enumerate(elems):
        if e.contiguity == "not_followed_by":
            nxt = elems[i + 1]
            if nxt.contiguity != "followed_by":
                raise CepError(
                    "notFollowedBy must be followed by followedBy (the "
                    "reference forbids notFollowedBy+next adjacency too)"
                )
            gap = f"G{gap_i}"
            gap_i += 1
            pat_parts.append(f"{gap}*?")
            defines.append(f"{gap} AS NOT ({e.condition_sql()})")
            continue
        if e.contiguity == "followed_by" and not (
            i > 0 and elems[i - 1].contiguity == "not_followed_by"
        ):
            gap = f"G{gap_i}"
            gap_i += 1
            pat_parts.append(f"{gap}*?")
            defines.append(f"{gap} AS TRUE")
        pat_parts.append(f"{e.name}{e.quant}")
        defines.append(f"{e.name} AS {e.condition_sql()}")
    within = ""
    if pattern._within:
        n, u = pattern._within
        within = f"WITHIN INTERVAL '{n}' {u.rstrip('s').upper()}\n        "
    meas = ",\n            ".join(f"{v} AS {k}" for k, v in measures.items())
    defs = ",\n            ".join(defines)
    pat = " ".join(pat_parts)
    return f"""
    SELECT * FROM {table} MATCH_RECOGNIZE (
        PARTITION BY {partition_by}
        ORDER BY {order_by}
        MEASURES
            {meas}
        ONE ROW PER MATCH
        AFTER MATCH {skip}
        PATTERN ({pat}) {within}DEFINE
            {defs}
    )
    """


def cep_select(
    spark,
    df: DataFrame,
    pattern: Pattern,
    partition_by: str,
    order_by: str,
    measures: dict[str, str],
    skip: str = "SKIP TO NEXT ROW",
) -> DataFrame:
    """CEP.pattern(stream, pattern).select(...) — run the pattern over a
    DataFrame. ``order_by`` must be an epoch-micros BIGINT column when the
    pattern has a ``within`` horizon (the NFA's time arithmetic)."""
    elems = pattern._elems

    if elems and elems[-1].contiguity == "not_followed_by":
        # Trailing negative pattern: absence-until-horizon. One range-frame
        # window scan per partition — the forbidden event's earliest time
        # within (0, horizon] rides the same sort as a positive match scan.
        if pattern._within is None:
            raise CepError(
                "notFollowedBy as the last element of a pattern requires "
                "within() (reference: Pattern.java forbids it without a "
                "time horizon)"
            )
        if len(elems) != 2 or elems[0].contiguity != "begin":
            raise CepError(
                "trailing notFollowedBy supports the two-element form "
                "begin(A).notFollowedBy(B).within(h); compose longer "
                "prefixes in SQL MATCH_RECOGNIZE"
            )
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        n, u = pattern._within
        horizon_us = n * _UNIT_US[u]
        a, b = elems[0], elems[1]
        keys = [k.strip() for k in partition_by.split(",")]
        w = (
            Window.partitionBy(*keys)
            .orderBy(order_by)
            .rangeBetween(1, horizon_us)
        )
        scanned = df.withColumn(
            "__cep_forbidden_ep",
            F.min(
                F.when(F.expr(b.condition_sql()), F.col(order_by))
            ).over(w),
        )
        out = scanned.filter(
            F.expr(a.condition_sql()) & F.col("__cep_forbidden_ep").isNull()
        )
        cols = [F.col(k) for k in keys]
        for alias, expr in measures.items():
            # trailing-not measures reference the single positive variable
            cols.append(
                F.expr(
                    re.sub(
                        rf"(?:FIRST|LAST)?\(?\b{a.name}\.(\w+)\)?",
                        r"\1",
                        expr,
                        flags=re.I,
                    )
                ).alias(alias)
            )
        return out.select(*cols)

    from apache_flink_spark.match_recognize import sql_with_match_recognize

    # monotonically increasing view id: two patterns with identical
    # partition/order clauses must not share (and re-bind) one temp view —
    # a lazily-evaluated DataFrame from the first cep_select would read
    # the second call's input (r7 advice)
    view = f"__cep_input_{next(_cep_view_counter)}"
    df.createOrReplaceTempView(view)
    stmt = pattern_to_match_recognize(
        pattern, view, partition_by, order_by, measures, skip
    )
    return sql_with_match_recognize(spark, stmt)
