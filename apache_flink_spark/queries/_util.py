"""Shared helpers for oracle-exact query building.

Money/quantity columns in the fixtures are DOUBLE; summing doubles is
order-dependent, so any float aggregate would hash-differently between Spark
(partition-parallel sum) and DuckDB. Casting to DECIMAL first makes the
aggregation exact and order-independent in BOTH engines, and the final
DECIMAL->DOUBLE cast is deterministic, giving bit-identical output. Precisions
are sized so products stay well under 38 digits in both engines' widening
rules (Spark: p1+p2+1 / DuckDB: w1+w2).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from apache_flink_spark.catalog import load_tables

# DECIMAL(12,4) fits every money/qty value in the fixtures (< 1e8).
MONEY = "decimal(12,4)"
# Discount/tax are fractions in [0,1].
FRAC = "decimal(6,4)"


def dec(c, t: str = MONEY) -> Column:
    return (F.col(c) if isinstance(c, str) else c).cast(t)


def dround(agg: Column, scale: int = 2) -> Column:
    """Deterministic DECIMAL -> DOUBLE: round the exact decimal to a small
    scale first so the scaled integer stays < 2^53 — then both Spark's
    (BigDecimal.doubleValue, correctly rounded) and DuckDB's (int128/10^s)
    conversions produce the identical double. Verified empirically: at scale
    12 DuckDB's cast is off-by-one-ulp ~27% of the time; at scale 2 never."""
    return F.round(agg, scale).cast("double")


def dsum(c, t: str = MONEY) -> Column:
    """Exact order-independent SUM of a double column, returned as DOUBLE."""
    return dround(F.sum(dec(c, t)))


def davg(c, t: str = MONEY) -> Column:
    """Deterministic AVG: exact rounded decimal sum as double, / count."""
    col = F.col(c) if isinstance(c, str) else c
    return dround(F.sum(dec(col, t))) / F.count(col)


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_tables(spark, sf_dir)[name]


def ts_micros(c) -> Column:
    """Timestamp -> epoch microseconds BIGINT (DuckDB: epoch_us)."""
    return F.unix_micros(F.col(c) if isinstance(c, str) else c)
