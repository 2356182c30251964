"""UDF / UDAF / UDTF surface — the five user-function kinds of the reference.

Reference parity (SURVEY.md §2.11):
  - ScalarFunction            -> @udf (row-at-a-time; the SLOW path, kept
                                 only as API parity evidence)
  - pandas ScalarFunction     -> @pandas_udf (Arrow-vectorized — the fast
                                 path, ~10-100x the row UDF)
  - AggregateFunction (UDAF)  -> @pandas_udf grouped-agg
  - TableAggregateFunction    -> applyInPandas (multi-row per group)
  - TableFunction (UDTF)      -> @udtf + SQL LATERAL join

PyFlink runs these over a Beam portability layer (flink-python
pyflink/table/udf.py:627-785, fn_execution/beam/); PySpark executes them
in-engine over Arrow — same user surface, less machinery.

Every UDF here is semantically replicable in ANSI SQL so the DuckDB oracle
can verify the execution path end-to-end (integer/string logic only — no
libm floats whose rounding could differ across engines).

Scale: pandas UDFs stream Arrow batches (10k rows/batch per session conf)
per partition — no driver involvement; applyInPandas shuffles once on the
group key and must fit ONE GROUP in memory (fine for per-customer groups;
a skewed mega-group would need salting first).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udf, udtf

from apache_flink_spark.catalog import load_tables
from apache_flink_spark.queries.registry import query
from apache_flink_spark.queries._util import t


@query(
    "udf_scalar_row",
    oracle="""
    SELECT p_partkey,
           upper(regexp_replace(p_name, '[aeiou]', '', 'g')) AS devoweled
    FROM part
    """,
)
def udf_scalar_row(spark, sf_dir):
    """Row-at-a-time Python scalar UDF (reference ScalarFunction). Exists for
    API parity; the hot path belongs to built-ins / pandas UDFs."""

    @udf("string")
    def devowel(s: str) -> str:
        return "".join(ch for ch in s if ch not in "aeiou").upper()

    p = t(spark, sf_dir, "part")
    return p.select("p_partkey", devowel("p_name").alias("devoweled"))


@query(
    "udf_pandas_vectorized",
    oracle="""
    SELECT o_orderkey,
           length(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR)) AS price_digits,
           CAST(floor(o_totalprice) AS BIGINT) % 97 AS price_mod97
    FROM orders
    """,
)
def udf_pandas_vectorized(spark, sf_dir):
    """Arrow-vectorized pandas UDF (reference pandas-mode ScalarFunction,
    pyflink udf.py func_type='pandas'): whole-column NumPy ops per Arrow
    batch. Integer-only logic -> bit-identical to the SQL oracle."""

    @pandas_udf("long")
    def price_digits(x: pd.Series) -> pd.Series:
        return x.astype("int64").astype(str).str.len().astype("int64")

    @pandas_udf("long")
    def price_mod97(x: pd.Series) -> pd.Series:
        return x.astype("int64") % 97

    o = t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        price_digits(F.floor("o_totalprice")).alias("price_digits"),
        price_mod97(F.floor("o_totalprice")).alias("price_mod97"),
    )


@query(
    "udaf_grouped_median",
    oracle="""
    SELECT l_returnflag,
           median(l_quantity) AS median_qty,
           count(*) AS n
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def udaf_grouped_median(spark, sf_dir):
    """Grouped-agg pandas UDF (reference AggregateFunction/UDAF): median —
    an aggregate Spark SQL lacks as a builtin in exact form. Quantities are
    small integers stored as double, so the even-count interpolation is an
    exact .0/.5 — deterministic across engines."""

    @pandas_udf("double")
    def pd_median(x: pd.Series) -> float:
        return x.median()

    # Spark disallows mixing grouped-agg pandas UDFs with built-in
    # aggregates in one agg — so the count is a pandas UDAF too.
    @pandas_udf("long")
    def pd_count(x: pd.Series) -> int:
        return len(x)

    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        pd_median("l_quantity").alias("median_qty"),
        pd_count("l_quantity").alias("n"),
    )


@query(
    "udtaf_apply_in_pandas",
    oracle="""
    SELECT o_custkey, o_orderkey,
           ROW_NUMBER() OVER (PARTITION BY o_custkey
                              ORDER BY o_orderdate, o_orderkey) AS order_rank,
           COALESCE(date_diff('day',
               LAG(CAST(o_orderdate AS DATE)) OVER (PARTITION BY o_custkey
                                                    ORDER BY o_orderdate, o_orderkey),
               CAST(o_orderdate AS DATE)), 0) AS gap_days
    FROM orders
    """,
)
def udtaf_apply_in_pandas(spark, sf_dir):
    """Table-aggregate via applyInPandas (reference TableAggregateFunction /
    GroupTableAggFunction): emits every row of the group with per-group
    computed columns (rank + days since previous order). One shuffle on the
    group key; each group processed as a single pandas frame."""
    o = t(spark, sf_dir, "orders")

    def per_customer(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["o_orderdate", "o_orderkey"], kind="mergesort")
        gaps = pdf["o_orderdate"].diff().dt.days.fillna(0).astype("int64")
        return pd.DataFrame(
            {
                "o_custkey": pdf["o_custkey"],
                "o_orderkey": pdf["o_orderkey"],
                "order_rank": range(1, len(pdf) + 1),
                "gap_days": gaps,
            }
        )

    # Explicit partition count (r13): keeps the Python table-aggregate at
    # cluster parallelism instead of AQE's JVM-sized advisory coalesce;
    # the groupBy reuses this exchange. r14: size-derived with the
    # per-ROW bytes floor (parallelism.py) — the per-customer pandas
    # construction saturates width early (measured 2.98s@32 vs 6.9s@9).
    from apache_flink_spark.parallelism import (
        PYTHON_ROW_STAGE_BYTES_PER_PARTITION,
        python_stage_partitions,
    )

    proj = o.select("o_custkey", "o_orderkey", "o_orderdate")
    return proj.repartition(
        python_stage_partitions(proj, PYTHON_ROW_STAGE_BYTES_PER_PARTITION),
        "o_custkey",
    ).groupBy("o_custkey").applyInPandas(
        per_customer,
        "o_custkey long, o_orderkey long, order_rank long, gap_days long",
    )


@query(
    "udtf_lateral_split",
    oracle="""
    SELECT doc_id, u.i - 1 AS pos, u.w AS word
    FROM (
        SELECT doc_id,
               unnest([{'i': i, 'w': l[i]}
                       for i in generate_series(1, len(l))]) AS u
        FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents
              WHERE doc_id < 50)
    )
    """,
)
def udtf_lateral_split(spark, sf_dir):
    """Python UDTF in a SQL LATERAL join (reference TableFunction +
    StreamExecCorrelate): one input row -> many output rows, with the
    generator running vectorized per partition."""

    @udtf(returnType="pos: int, word: string")
    class SplitWords:
        def eval(self, text: str):
            for i, w in enumerate(text.split(" ")):
                yield i, w

    load_tables(spark, sf_dir)
    spark.udtf.register("split_words", SplitWords)
    return spark.sql(
        """
        SELECT d.doc_id, s.pos, s.word
        FROM documents d, LATERAL split_words(d.text) s
        WHERE d.doc_id < 50
        """
    )
