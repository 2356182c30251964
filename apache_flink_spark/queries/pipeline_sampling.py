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


_PACK_BUDGET = 512  # tokens per packed sequence (context-window budget)


@query(
    "pipeline_token_pack",
    oracle=f"""
    WITH ordered AS (
        SELECT doc_id,
               len(string_split(text, ' ')) AS n_tokens,
               SUM(len(string_split(text, ' '))) OVER (
                   ORDER BY CAST({_DUCK_H32} AS BIGINT), doc_id
                   ROWS UNBOUNDED PRECEDING) AS cum_tokens
        FROM documents
    )
    SELECT doc_id, n_tokens,
           CAST((cum_tokens - n_tokens) // {_PACK_BUDGET} AS BIGINT) AS bin_id
    FROM ordered
    """,
)
def pipeline_token_pack(spark, sf_dir):
    """Sequence packing: assign docs to fixed token-budget bins (the
    pretraining context-window packing step) by cumulative token count in
    hash order — deterministic, engine-independent, and equivalent to
    greedy sequential packing over a fixed pseudo-random shuffle. The
    cumulative sum is one global ordered window; at 100 TB the same
    assignment runs per-shard (hash-partition first, pack within shards) —
    the bin ids stay deterministic because the shard key is the same hash.
    """
    d = t(spark, sf_dir, "documents")
    n_tok = F.size(F.split("text", " ")).cast("long").alias("n_tokens")
    w = (
        Window.orderBy(F.expr(_SPARK_H32), "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        d.select("doc_id", n_tok)
        .withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .select(
            "doc_id",
            "n_tokens",
            F.expr(f"(cum_tokens - n_tokens) div {_PACK_BUDGET}").alias("bin_id"),
        )
    )


@query(
    "pipeline_decontaminate",
    oracle=f"""
    WITH splits AS (
        SELECT doc_id, text,
               CAST({_DUCK_H32} AS BIGINT) % 100 AS bucket
        FROM documents
    ),
    train AS (SELECT doc_id, text FROM splits WHERE bucket < 80),
    bench AS (SELECT doc_id, text FROM splits WHERE bucket >= 90),
    tsh AS (
        SELECT doc_id, unnest(list_distinct([l[i] || ' ' || l[i+1] || ' ' || l[i+2]
                       for i in generate_series(1, len(l) - 2)])) AS sh
        FROM (SELECT doc_id, string_split(text, ' ') AS l FROM train)
    ),
    bsh AS (
        SELECT DISTINCT unnest(list_distinct([l[i] || ' ' || l[i+1] || ' ' || l[i+2]
                        for i in generate_series(1, len(l) - 2)])) AS sh
        FROM (SELECT doc_id, string_split(text, ' ') AS l FROM bench)
    )
    SELECT DISTINCT t.doc_id AS contaminated_doc
    FROM tsh t JOIN bsh b ON t.sh = b.sh
    """,
)
def pipeline_decontaminate(spark, sf_dir):
    """Benchmark decontamination: train-split docs sharing any 3-token
    shingle with the holdout split are flagged (the n-gram-overlap
    contamination check run before every pretraining job). Composition of
    the hash split + the inverted shingle index: the holdout shingle set is
    small (10% of corpus, distinct), so it broadcasts and the check is one
    semi join — no pair explosion at any scale."""
    d = t(spark, sf_dir, "documents")
    bucket = F.expr(_SPARK_H32) % 100
    docs = d.select("doc_id", "text", bucket.alias("bucket"))
    toks = lambda df: df.select(  # noqa: E731
        "doc_id", F.split("text", " ").alias("toks")
    )
    from apache_flink_spark.queries.pipeline_dedup import _SHINGLES_SPARK

    def shingles(df):
        return toks(df).select(
            "doc_id", F.explode(F.expr(_SHINGLES_SPARK)).alias("sh")
        )

    train_sh = shingles(docs.filter(F.col("bucket") < 80))
    bench_sh = (
        shingles(docs.filter(F.col("bucket") >= 90)).select("sh").distinct()
    )
    return (
        train_sh.join(F.broadcast(bench_sh), "sh", "left_semi")
        .select(F.col("doc_id").alias("contaminated_doc"))
        .distinct()
    )


@query(
    "pipeline_domain_mix",
    oracle="""
    WITH c AS (
        SELECT lang, source, COUNT(*) AS n_docs FROM documents GROUP BY 1, 2
    ), tot AS (
        SELECT CAST(SUM(n_docs) AS BIGINT) AS total,
               CAST(COUNT(*) AS BIGINT) AS cells
        FROM c
    )
    SELECT c.lang, c.source, c.n_docs,
           ROUND(CAST(t.total AS DOUBLE) / (t.cells * c.n_docs), 6)
               AS sample_weight,
           CAST(10000 // t.cells AS BIGINT) AS uniform_quota
    FROM c, tot t
    """,
)
def pipeline_domain_mix(spark, sf_dir):
    """Domain-mixture reweighting — compute per-(lang, source) sampling
    weights that rebalance the corpus to a uniform target mixture (the
    DoReMi/Pile-style domain-weighting step before sampling a training
    epoch): weight = target_share / actual_share, plus the per-cell doc
    quota for a fixed 10k-doc budget. One tiny rollup + a broadcast of the
    single-row totals — the 100 TB cost is exactly one map-side-combined
    groupBy over the corpus."""
    d = t(spark, sf_dir, "documents")
    c = d.groupBy("lang", "source").agg(F.count("*").alias("n_docs"))
    tot = c.agg(
        F.sum("n_docs").cast("bigint").alias("total"),
        F.count("*").cast("bigint").alias("cells"),
    )
    joined = c.crossJoin(F.broadcast(tot))
    weight = F.round(
        F.col("total").cast("double") / (F.col("cells") * F.col("n_docs")), 6
    )
    return joined.select(
        "lang",
        "source",
        "n_docs",
        weight.alias("sample_weight"),
        F.expr("CAST(10000 div cells AS BIGINT)").alias("uniform_quota"),
    )


@query(
    "pipeline_length_buckets",
    oracle="""
    WITH d AS (
        SELECT doc_id,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        FROM documents
    ), b AS (
        SELECT doc_id, n_tokens, n_tokens // 64 AS bucket FROM d
    )
    SELECT bucket,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST(MAX(n_tokens) AS BIGINT) AS max_tokens,
           CAST(COUNT(*) * MAX(n_tokens) - SUM(n_tokens) AS BIGINT)
               AS padding_waste
    FROM b
    GROUP BY bucket
    """,
)
def pipeline_length_buckets(spark, sf_dir):
    """Length-bucketed batching accounting: group documents into 64-token
    buckets and measure the padding waste of batching each bucket to its max
    length — the quantity a sequence-packing scheduler minimizes. One narrow
    projection + one small rollup (map-side combined); the bucket key is a
    pure integer division so the shuffle is uniform by construction."""
    d = t(spark, sf_dir, "documents")
    toks = F.size(F.split("text", " ")).cast("bigint")
    b = d.select("doc_id", toks.alias("n_tokens")).select(
        "doc_id", "n_tokens", F.expr("n_tokens div 64").alias("bucket")
    )
    return b.groupBy("bucket").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        F.max("n_tokens").cast("bigint").alias("max_tokens"),
        (F.count("*") * F.max("n_tokens") - F.sum("n_tokens"))
        .cast("bigint")
        .alias("padding_waste"),
    )


@query(
    "pipeline_epoch_shuffle",
    oracle=f"""
    WITH h AS (
        SELECT doc_id, {_DUCK_H32} AS h32 FROM documents
    ), s AS (
        SELECT doc_id, h32 % 8 AS shard, h32 FROM h
    )
    SELECT doc_id, CAST(shard AS BIGINT) AS shard,
           CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY h32, doc_id)
                AS BIGINT) AS pos
    FROM s
    """,
)
def pipeline_epoch_shuffle(spark, sf_dir):
    """Deterministic epoch shuffle: every engine/run derives the same
    training order from md5(doc_id) — shard assignment (h % 8) plus a
    within-shard position. Content-hash ordering is the reproducible
    replacement for random() shuffles (identical rationale to the hash
    split above); at 100 TB the shard count matches the writer parallelism
    and each shard's sort is partition-local (one WindowGroupLimit-free
    window per shard, no global sort)."""
    d = t(spark, sf_dir, "documents")
    h = d.select("doc_id", F.expr(_SPARK_H32).alias("h32"))
    s = h.select("doc_id", (F.col("h32") % 8).alias("shard"), "h32")
    w = Window.partitionBy("shard").orderBy("h32", "doc_id")
    return s.select(
        "doc_id",
        F.col("shard").cast("bigint").alias("shard"),
        F.row_number().over(w).cast("bigint").alias("pos"),
    )



# DuckDB-side parse of the first 4 md5 hex chars of a WORD -> BIGINT
# (the Spark side uses conv(); same digits, same value).
_DSIR_MD5_INT = " + ".join(
    f"(strpos('0123456789abcdef', substr(md5(w), {i + 1}, 1)) - 1)"
    f" * {16 ** (3 - i)}"
    for i in range(4)
)
_DSIR_BUCKETS = 256

_DSIR_ORACLE = f"""
    WITH words AS (
        SELECT doc_id, lang,
               ({_DSIR_MD5_INT}) % {_DSIR_BUCKETS} AS b
        FROM (
            SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w
            FROM documents WHERE text IS NOT NULL
        ) WHERE w <> ''
    ), feats AS (
        SELECT b,
               COUNT(*) AS cnt_s,
               COALESCE(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END), 0)
                   AS cnt_t
        FROM words GROUP BY b
    )
    SELECT w.doc_id,
           COUNT(*) AS n_words,
           CAST(SUM(f.cnt_t) AS BIGINT) AS target_mass,
           CAST(SUM(f.cnt_s) AS BIGINT) AS source_mass
    FROM words w JOIN feats f ON f.b = w.b
    GROUP BY w.doc_id
"""


@query("pipeline_dsir_weights", oracle=_DSIR_ORACLE)
def pipeline_dsir_weights(spark, sf_dir):
    """DSIR-style importance accounting (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): hashed word features
    (md5 % 256 buckets), a target distribution (lang='en' docs) vs the
    full source corpus, and per-document feature-mass sums under each —
    the exact-integer numerator/denominator of the importance ratio
    (consumers apply the log/ratio; shipping integers keeps the oracle
    bit-exact, the engine's float-determinism rule).

    Scale shape: one explode over words, ONE tiny groupBy (256 buckets,
    map-side combined), a BROADCAST join of the 256-row feature table
    back onto the word stream, one per-doc sum — no corpus-sized shuffle
    except the final doc_id aggregation, and the feature table stays
    256 rows at ANY corpus size (that is the point of hashed features)."""
    d = t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    words = d.select(
        "doc_id", "lang", F.explode(F.split("text", " ")).alias("w")
    ).filter(F.col("w") != "").select(
        "doc_id",
        "lang",
        (
            F.conv(F.substring(F.md5("w"), 1, 4), 16, 10).cast("long")
            % _DSIR_BUCKETS
        ).alias("b"),
    )
    feats = words.groupBy("b").agg(
        F.count(F.lit(1)).alias("cnt_s"),
        F.sum(
            F.when(F.col("lang") == "en", F.lit(1)).otherwise(F.lit(0))
        ).alias("cnt_t"),
    )
    return (
        words.join(F.broadcast(feats), "b")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("cnt_t").cast("long").alias("target_mass"),
            F.sum("cnt_s").cast("long").alias("source_mass"),
        )
    )
