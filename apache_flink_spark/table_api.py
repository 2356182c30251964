"""Fluent Table API — the reference's entry point B re-expressed over
DataFrames.

Reference parity (SURVEY.md §3 entry point B): the PyFlink ``Table`` surface
(flink-python pyflink/table/table.py — select:117, filter:151, group_by:181,
join:209, minus:408, intersect:489, order_by:533, offset:551, fetch:574,
limit:599, window:624, over_window:663, aggregate:820) and the window
descriptors (pyflink/table/window.py — Tumble:54, Session:131, Slide:209,
Over:318). The reference builds QueryOperation trees that its planner
translates; here every method augments a Spark DataFrame directly, so the
fluent chain IS the logical plan Catalyst optimizes — no separate
planner layer exists or is needed.

Expressions: methods accept PySpark ``Column`` objects or SQL strings
(parsed with ``F.expr``), mirroring PyFlink's col()/string duality.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _col(e) -> Column:
    return e if isinstance(e, Column) else F.expr(e)


class Table:
    """Fluent relational table (reference Table.java / pyflink table.py)."""

    def __init__(self, df: DataFrame):
        self._df = df

    # -- conversion ------------------------------------------------------
    def to_df(self) -> DataFrame:
        return self._df

    def to_pandas(self):
        """pyflink table.py to_pandas:915."""
        return self._df.toPandas()

    def execute(self) -> DataFrame:
        return self._df

    def explain(self, extended: bool = False) -> str:
        """Plan explanation — reference Table.explain (pyflink table.py
        explain:1004, ExplainDetail). Physical plan by default; the full
        parsed→analyzed→optimized→physical chain with ``extended=True``."""
        qe = self._df._jdf.queryExecution()
        return qe.toString() if extended else qe.simpleString()

    # -- row-level ops ---------------------------------------------------
    def select(self, *exprs) -> "Table":
        return Table(self._df.select(*[_col(e) for e in exprs]))

    def filter(self, predicate) -> "Table":
        return Table(self._df.filter(_col(predicate)))

    where = filter

    def add_columns(self, **named_exprs) -> "Table":
        df = self._df
        for name, e in named_exprs.items():
            df = df.withColumn(name, _col(e))
        return Table(df)

    def rename_columns(self, **renames) -> "Table":
        df = self._df
        for old, new in renames.items():
            df = df.withColumnRenamed(old, new)
        return Table(df)

    def drop_columns(self, *names) -> "Table":
        return Table(self._df.drop(*names))

    def distinct(self) -> "Table":
        return Table(self._df.distinct())

    # -- aggregation -----------------------------------------------------
    def group_by(self, *keys) -> "GroupedTable":
        return GroupedTable(self._df, [_col(k) for k in keys])

    def aggregate(self, *aggs) -> "Table":
        """Global aggregate (no keys) — pyflink aggregate:820."""
        return Table(self._df.agg(*[_col(a) for a in aggs]))

    def window(self, window_desc: "GroupWindow") -> "WindowedTable":
        """pyflink window:624 — group-window aggregation entry."""
        return WindowedTable(self._df, window_desc)

    # -- joins -----------------------------------------------------------
    def join(self, other: "Table", on, how: str = "inner") -> "Table":
        return Table(self._df.join(other._df, _col(on), how))

    def left_outer_join(self, other: "Table", on) -> "Table":
        return self.join(other, on, "left")

    def right_outer_join(self, other: "Table", on) -> "Table":
        return self.join(other, on, "right")

    def full_outer_join(self, other: "Table", on) -> "Table":
        return self.join(other, on, "full")

    def cross_join(self, other: "Table") -> "Table":
        return Table(self._df.crossJoin(other._df))

    # -- set ops (pyflink minus:408, intersect:489) ----------------------
    def union(self, other: "Table") -> "Table":
        return Table(self._df.union(other._df).distinct())

    def union_all(self, other: "Table") -> "Table":
        return Table(self._df.union(other._df))

    def minus(self, other: "Table") -> "Table":
        return Table(self._df.subtract(other._df))

    def minus_all(self, other: "Table") -> "Table":
        return Table(self._df.exceptAll(other._df))

    def intersect(self, other: "Table") -> "Table":
        return Table(self._df.intersect(other._df))

    def intersect_all(self, other: "Table") -> "Table":
        return Table(self._df.intersectAll(other._df))

    # -- ordering (pyflink order_by:533, offset:551, fetch:574) ----------
    def order_by(self, *exprs) -> "Table":
        return Table(self._df.orderBy(*[_col(e) for e in exprs]))

    def limit(self, n: int) -> "Table":
        return Table(self._df.limit(n))

    fetch = limit

    def offset_fetch(self, offset: int, n: int) -> "Table":
        return Table(self._df.offset(offset).limit(n))


class GroupedTable:
    def __init__(self, df: DataFrame, keys: Sequence[Column]):
        self._df = df
        self._keys = list(keys)

    def select(self, *aggs) -> Table:
        """Aggregate projection over the grouping (pyflink GroupedTable)."""
        return Table(self._df.groupBy(*self._keys).agg(*[_col(a) for a in aggs]))


class WindowedTable:
    def __init__(self, df: DataFrame, window_desc: "GroupWindow"):
        self._df = df
        self._desc = window_desc

    def group_by(self, *extra_keys) -> GroupedTable:
        """Group by the window plus optional keys; the window struct is
        exposed under its alias with .start/.end fields."""
        wcol = self._desc.to_column().alias(self._desc.alias_name)
        return GroupedTable(self._df, [wcol, *[_col(k) for k in extra_keys]])


class GroupWindow:
    """Base for Tumble/Slide/Session descriptors (pyflink window.py)."""

    def __init__(self):
        self.time_col: str | None = None
        self.alias_name: str = "w"

    def on(self, time_col: str) -> "GroupWindow":
        self.time_col = time_col
        return self

    def alias(self, name: str) -> "GroupWindow":
        self.alias_name = name
        return self

    def to_column(self) -> Column:  # pragma: no cover — abstract
        raise NotImplementedError


class Tumble(GroupWindow):
    """pyflink window.py Tumble:54 — Tumble.over("10 minutes").on("ts")."""

    def __init__(self):
        super().__init__()
        self.size: str | None = None

    @classmethod
    def over(cls, size: str) -> "Tumble":
        w = cls()
        w.size = size
        return w

    def to_column(self) -> Column:
        return F.window(self.time_col, self.size)


class Slide(GroupWindow):
    """pyflink window.py Slide:209 — Slide.over(size).every(slide).on(ts)."""

    def __init__(self):
        super().__init__()
        self.size: str | None = None
        self.slide: str | None = None

    @classmethod
    def over(cls, size: str) -> "Slide":
        w = cls()
        w.size = size
        return w

    def every(self, slide: str) -> "Slide":
        self.slide = slide
        return self

    def to_column(self) -> Column:
        return F.window(self.time_col, self.size, self.slide)


class Session(GroupWindow):
    """pyflink window.py Session:131 — Session.with_gap(gap).on(ts)."""

    def __init__(self):
        super().__init__()
        self.gap: str | None = None

    @classmethod
    def with_gap(cls, gap: str) -> "Session":
        w = cls()
        w.gap = gap
        return w

    def to_column(self) -> Column:
        return F.session_window(self.time_col, self.gap)


class Over:
    """Over-window descriptor (pyflink window.py Over:318):
    ``Over.partition_by("k").order_by("ts").preceding(2).as_("w")`` —
    yields a pyspark.sql.Window spec consumable by ``col.over(spec)``."""

    def __init__(self):
        self._partition: list = []
        self._order: list = []
        self._rows: tuple[int, int] | None = None

    @classmethod
    def partition_by(cls, *cols) -> "Over":
        o = cls()
        o._partition = list(cols)
        return o

    def order_by(self, *cols) -> "Over":
        self._order = list(cols)
        return self

    def preceding(self, n: int) -> "Over":
        self._rows = (-n, 0)
        return self

    def unbounded_preceding(self) -> "Over":
        from pyspark.sql import Window as W

        self._rows = (W.unboundedPreceding, W.currentRow)
        return self

    def spec(self):
        from pyspark.sql import Window as W

        s = W.partitionBy(*self._partition).orderBy(*self._order)
        if self._rows is not None:
            s = s.rowsBetween(*self._rows)
        return s
