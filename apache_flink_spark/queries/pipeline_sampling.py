"""Deterministic sampling / dataset splitting — training-pipeline primitives.

A 100 TB corpus pipeline needs REPRODUCIBLE sampling: random() splits
change across runs, partitionings and engines, so production splits are
content-hash based — every engine that hashes the same key derives the same
assignment, forever. Both queries use the first 8 hex chars of
md5(doc_id) as a uniform 32-bit integer (the same cross-engine trick the
MinHash signatures use), so the DuckDB oracles are exact.

Scale: both are one narrow projection (+ one per-stratum window for the
stratified variant) — no shuffle for the split assignment at all; the
stratified top-K shuffles once on the (lang, source) stratum key with a
WindowGroupLimit pushdown bounding each partition's sort.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from apache_flink_spark.queries._util import t
from apache_flink_spark.queries.registry import query

# Spark: md5-hex prefix -> BIGINT via conv(); DuckDB: per-char parse
# (conv() there is unrelated), identical value.
_SPARK_H32 = "CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 8), 16, 10) AS BIGINT)"
_DUCK_H32 = " + ".join(
    f"(strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), {i + 1}, 1)) - 1)"
    f" * {16 ** (7 - i)}"
    for i in range(8)
)


@query(
    "pipeline_hash_split",
    oracle=f"""
    SELECT doc_id,
           CAST({_DUCK_H32} AS BIGINT) % 100 AS bucket,
           CASE WHEN CAST({_DUCK_H32} AS BIGINT) % 100 < 80 THEN 'train'
                WHEN CAST({_DUCK_H32} AS BIGINT) % 100 < 90 THEN 'val'
                ELSE 'holdout' END AS split
    FROM documents
    """,
)
def pipeline_hash_split(spark, sf_dir):
    """Deterministic 80/10/10 train/val/holdout assignment by content hash:
    the same doc lands in the same split on any engine, any run, any
    partitioning — the reproducibility property random() cannot give.
    Narrow projection, zero shuffle."""
    d = t(spark, sf_dir, "documents")
    bucket = (F.expr(_SPARK_H32) % 100).alias("bucket")
    return d.select("doc_id", bucket).select(
        "doc_id",
        "bucket",
        F.when(F.col("bucket") < 80, "train")
        .when(F.col("bucket") < 90, "val")
        .otherwise("holdout")
        .alias("split"),
    )


_STRATUM_K = 30


@query(
    "pipeline_stratified_sample",
    oracle=f"""
    SELECT lang, source, doc_id, n_chars
    FROM (
        SELECT lang, source, doc_id, n_chars,
               ROW_NUMBER() OVER (
                   PARTITION BY lang, source
                   ORDER BY CAST({_DUCK_H32} AS BIGINT), doc_id) AS rn
        FROM documents
    )
    WHERE rn <= {_STRATUM_K}
    """,
)
def pipeline_stratified_sample(spark, sf_dir):
    """Stratified equal-allocation sample: the hash-order top-K (30)
    per (lang, source) stratum — deterministic (hash order is a fixed
    pseudo-random shuffle of each stratum), balanced across strata
    regardless of their sizes. One shuffle on the stratum key;
    WindowGroupLimit caps each partition's sort at K."""
    d = t(spark, sf_dir, "documents")
    w = Window.partitionBy("lang", "source").orderBy(
        F.expr(_SPARK_H32), "doc_id"
    )
    return (
        d.select("lang", "source", "doc_id", "n_chars")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _STRATUM_K)
        .drop("rn")
    )
