"""Text-analysis operators for training-data pipelines — token statistics,
quality scoring, language-ID heuristic, document fingerprinting.

These are the north-star additions beyond the reference's operator set
(SURVEY.md §7 step 6): the text-prep stages an LLM data pipeline runs over
billions of documents. No reference counterpart exists; semantics follow
standard corpus-prep practice (C4/RefinedWeb-style heuristics).

Spark-first: everything is built-in higher-order array/string functions
(split/transform/filter/aggregate/regexp_*) evaluated JVM-side — a 100 TB
corpus runs these as narrow map-only stages with full column pruning; no
Python, no shuffle, no state.

Determinism: ratios are single integer-divisions in double (exact inputs,
one correctly-rounded op — identical cross-engine); fingerprints are md5
strings (exact); rounding at scale 4 per the dround analysis in
queries/_util.py.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from apache_flink_spark.queries.registry import query
from apache_flink_spark.queries._util import t
from apache_flink_spark.run_cache import run_persist

# Tiny English stopword list shared by the quality/lang-id heuristics.
STOPWORDS = ("the", "a", "of", "and", "to", "in")
_STOP_SQL = "('" + "', '".join(STOPWORDS) + "')"

# BPE-ish pre-tokenizer: letter runs, digit runs, single other non-space.
BPE_RE = "[a-z]+|[0-9]+|[^a-z0-9 ]"


@query(
    "text_token_stats",
    oracle=f"""
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_tokens,
           len(list_distinct(string_split(text, ' '))) AS n_unique,
           CAST(length(replace(text, ' ', '')) AS DOUBLE)
             / len(string_split(text, ' ')) AS avg_token_len,
           len(regexp_extract_all(text, '{BPE_RE}')) AS n_bpe
    FROM documents
    """,
)
def text_token_stats(spark, sf_dir):
    """Token counting: whitespace tokens, unique tokens, mean token length,
    and a BPE-ish regex pre-tokenizer count."""
    d = t(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_unique"),
        (
            F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))).cast("double")
            / F.size(toks)
        ).alias("avg_token_len"),
        F.size(F.regexp_extract_all("text", F.lit(BPE_RE), 0)).alias("n_bpe"),
    )


@query(
    "text_quality_score",
    oracle=f"""
    SELECT doc_id,
           length(text) AS n_chars,
           ROUND(CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) AS DOUBLE)
                 / length(text), 4) AS alpha_ratio,
           ROUND(CAST(len(list_filter(string_split(text, ' '),
                                      x -> x IN {_STOP_SQL})) AS DOUBLE)
                 / len(string_split(text, ' ')), 4) AS stop_ratio,
           len(string_split(text, ' ')) BETWEEN 10 AND 1000
             AND length(text) >= 50 AS len_ok
    FROM documents
    """,
)
def text_quality_score(spark, sf_dir):
    """Quality scoring: alphabetic-character ratio, stopword ratio, and a
    length gate — the standard cheap filters applied before expensive
    pipeline stages."""
    d = t(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    n_tokens = F.size(toks)
    stop_arr = ", ".join(f"'{s}'" for s in STOPWORDS)
    n_stop = F.size(
        F.filter(toks, lambda x: x.isin(*STOPWORDS))
    )
    return d.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        F.round(
            F.length(F.regexp_replace("text", "[^a-z]", "")).cast("double")
            / F.length("text"),
            4,
        ).alias("alpha_ratio"),
        F.round(n_stop.cast("double") / n_tokens, 4).alias("stop_ratio"),
        (
            n_tokens.between(10, 1000) & (F.length("text") >= 50)
        ).alias("len_ok"),
    )


@query(
    "text_lang_id",
    oracle=f"""
    SELECT doc_id, lang AS labeled_lang,
           CASE WHEN ascii_ratio >= 0.99 AND stop_ratio >= 0.02 THEN 'en'
                WHEN ascii_ratio >= 0.99 THEN 'latin-other'
                ELSE 'non-latin' END AS predicted_lang
    FROM (
        SELECT doc_id, lang,
               CAST(length(regexp_replace(text, '[^a-z ]', '', 'g')) AS DOUBLE)
                 / length(text) AS ascii_ratio,
               CAST(len(list_filter(string_split(text, ' '),
                                    x -> x IN {_STOP_SQL})) AS DOUBLE)
                 / len(string_split(text, ' ')) AS stop_ratio
        FROM documents
    )
    """,
)
def text_lang_id(spark, sf_dir):
    """Language-ID heuristic: character-class ratio + stopword-hit ratio (the
    n-gram-free tier of fastText-style LID). The fixture's text is synthetic
    same-vocabulary English regardless of its lang label, so the classifier
    legitimately predicts 'en' — the operator under test is the heuristic
    computation, not the fixture's labels."""
    d = t(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    ascii_ratio = (
        F.length(F.regexp_replace("text", "[^a-z ]", "")).cast("double")
        / F.length("text")
    )
    stop_ratio = (
        F.size(F.filter(toks, lambda x: x.isin(*STOPWORDS))).cast("double")
        / F.size(toks)
    )
    return d.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        F.when((ascii_ratio >= 0.99) & (stop_ratio >= 0.02), "en")
        .when(ascii_ratio >= 0.99, "latin-other")
        .otherwise("non-latin")
        .alias("predicted_lang"),
    )


@query(
    "text_top_bigrams",
    oracle="""
    SELECT bigram, n, rnk
    FROM (
        SELECT bigram, n,
               ROW_NUMBER() OVER (ORDER BY n DESC, bigram) AS rnk
        FROM (
            SELECT bg AS bigram, COUNT(*) AS n
            FROM (
                SELECT unnest([l[i] || ' ' || l[i+1]
                               for i in generate_series(1, len(l) - 1)]) AS bg
                FROM (SELECT string_split(text, ' ') AS l FROM documents)
            )
            GROUP BY 1
        )
    )
    WHERE rnk <= 20
    """,
)
def text_top_bigrams(spark, sf_dir):
    """Corpus n-gram statistics: global top-20 bigrams — the vocabulary/
    collocation profiling stage of corpus analysis. Explode is narrow;
    the count is one shuffle with map-side partial aggregation absorbing
    the bigram blowup; the final top-20 is a TakeOrdered merge, not a
    global sort."""
    from pyspark.sql import Window

    d = t(spark, sf_dir, "documents")
    toks = d.select(F.split("text", " ").alias("toks"))
    bigrams = toks.select(
        F.explode(
            F.expr(
                # Guard single-token docs: sequence(0, -1) would descend and
                # fabricate bigrams the oracle's empty generate_series lacks.
                "CASE WHEN size(toks) >= 2 THEN"
                " transform(sequence(0, size(toks) - 2),"
                " i -> concat_ws(' ', toks[i], toks[i+1]))"
                " ELSE CAST(array() AS ARRAY<STRING>) END"
            )
        ).alias("bigram")
    )
    counts = bigrams.groupBy("bigram").agg(F.count(F.lit(1)).alias("n"))
    w = Window.orderBy(F.desc("n"), "bigram")
    return (
        counts.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 20)
        .select("bigram", "n", "rnk")
    )


@query(
    "text_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(lower(trim(text))) AS content_md5,
           list_min([md5(l[i] || ' ' || l[i+1] || ' ' || l[i+2])
                     for i in generate_series(1, len(l) - 2)]) AS shingle_minhash
    FROM (SELECT doc_id, text, string_split(text, ' ') AS l FROM documents)
    """,
)
def text_fingerprint(spark, sf_dir):
    """Document fingerprinting: full-content hash (exact-dup key) plus a
    1-permutation MinHash over 3-word shingles (rolling near-dup signature).
    At 100 TB both are map-only; the minhash column is what the MinHash-LSH
    dedup stage (pipeline_dedup) banding extends to K permutations."""
    d = t(spark, sf_dir, "documents")
    # Pre-materialize the token array so the transform lambda indexes an
    # attribute instead of re-splitting text per element (O(tokens^2)).
    staged = d.select(
        "doc_id", "text", F.split("text", " ").alias("toks")
    )
    return staged.select(
        "doc_id",
        F.md5(F.lower(F.trim("text"))).alias("content_md5"),
        F.array_min(
            F.expr(
                # Short-doc guard: <3 tokens => empty array => array_min NULL,
                # matching DuckDB's list_min over an empty comprehension.
                "CASE WHEN size(toks) >= 3 THEN"
                " transform(sequence(0, size(toks) - 3),"
                " i -> md5(concat_ws(' ', toks[i], toks[i+1], toks[i+2])))"
                " ELSE CAST(array() AS ARRAY<STRING>) END"
            )
        ).alias("shingle_minhash"),
    )


@query(
    "pipeline_corpus_curation",
    oracle="""
    WITH base AS (
        SELECT doc_id, lang, source,
               len(string_split(lower(text), ' ')) AS n_tokens,
               md5(array_to_string(string_split(lower(text), ' ')[1:8], ' '))
                 AS dedup_key
        FROM documents
        WHERE lang IN ('en', 'de') AND n_chars >= 50
          AND len(string_split(lower(text), ' ')) BETWEEN 5 AND 1000
    ), ranked AS (
        SELECT *,
               ROW_NUMBER() OVER (PARTITION BY dedup_key ORDER BY doc_id) AS rn,
               COUNT(*) OVER (PARTITION BY dedup_key) AS n_copies
        FROM base
    )
    SELECT lang, source,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST(SUM(n_copies - 1) AS BIGINT) AS dups_removed
    FROM ranked
    WHERE rn = 1
    GROUP BY lang, source
    """,
)
def pipeline_corpus_curation(spark, sf_dir):
    """End-to-end corpus curation — the composed shape a training-data run
    executes: language filter -> cheap quality gate -> prefix-fingerprint
    dedup (first 8 tokens, deterministic min-doc_id survivor) -> per-source
    token accounting.

    Scale notes (100 TB): the filters are narrow map stages fully pushed to
    the scan (lang/n_chars reach PushedFilters); the only wide op is ONE
    shuffle on the md5 dedup key — uniformly distributed by construction, so
    no salting needed — followed by a tiny (lang, source) rollup. Python
    never touches the data.
    """
    from pyspark.sql import Window

    d = t(spark, sf_dir, "documents")
    toks = F.split(F.lower("text"), " ")
    base = (
        d.where(F.col("lang").isin("en", "de") & (F.col("n_chars") >= 50))
        .select("doc_id", "lang", "source", toks.alias("toks"))
        .where(F.size("toks").between(5, 1000))
        .select(
            "doc_id",
            "lang",
            "source",
            F.size("toks").alias("n_tokens"),
            F.md5(F.concat_ws(" ", F.slice("toks", 1, 8))).alias("dedup_key"),
        )
    )
    w = Window.partitionBy("dedup_key").orderBy("doc_id")
    wall = Window.partitionBy("dedup_key")
    ranked = base.withColumn("rn", F.row_number().over(w)).withColumn(
        "n_copies", F.count(F.lit(1)).over(wall)
    )
    return (
        ranked.where(F.col("rn") == 1)
        .groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.sum(F.col("n_copies") - 1).alias("dups_removed"),
        )
    )


# PII patterns — kept to syntax valid in BOTH Java regex (Spark) and RE2
# (DuckDB): character classes, bounded repetition, no lookarounds.
_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PHONE_RE = r"\+1-555-[0-9]{4}"

# The synthetic corpus plants no PII, so derive a deterministic PII-bearing
# text from the fixture (identical construction in both engines) — the scrub
# then has real matches to find instead of a vacuously-clean pass.
_PII_TEXT_SQL = (
    "text || ' Contact user' || CAST(doc_id AS STRING) || '@example.com"
    " or +1-555-' || lpad(CAST(doc_id % 10000 AS STRING), 4, '0') || ' now.'"
)
_PII_TEXT_DUCK = (
    "text || ' Contact user' || CAST(doc_id AS VARCHAR) || '@example.com"
    " or +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' now.'"
)


@query(
    "text_pii_scrub",
    oracle=f"""
    WITH src AS (
        SELECT doc_id, {_PII_TEXT_DUCK} AS raw FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(raw, '{_EMAIL_RE}')) AS BIGINT)
               AS n_emails,
           CAST(len(regexp_extract_all(raw, '{_PHONE_RE}')) AS BIGINT)
               AS n_phones,
           md5(regexp_replace(regexp_replace(raw, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                              '{_PHONE_RE}', '<PHONE>', 'g')) AS scrub_sig
    FROM src
    """,
)
def text_pii_scrub(spark, sf_dir):
    """PII redaction — the compliance pass every training-data pipeline runs
    before tokenization: regex-scrub emails/phones, count redactions, emit a
    digest of the scrubbed text. Pure built-in regexp_replace/regexp_count —
    a narrow JVM map stage with full pushdown at 100 TB; patterns restricted
    to the Java-regex ∩ RE2 common subset so the DuckDB oracle runs the
    byte-identical scrub."""
    d = t(spark, sf_dir, "documents")
    raw = F.expr(_PII_TEXT_SQL)
    scrubbed = F.regexp_replace(
        F.regexp_replace(raw, F.lit(_EMAIL_RE), F.lit("<EMAIL>")),
        F.lit(_PHONE_RE),
        F.lit("<PHONE>"),
    )
    return d.select(
        "doc_id",
        F.regexp_count(raw, F.lit(_EMAIL_RE)).cast("bigint").alias("n_emails"),
        F.regexp_count(raw, F.lit(_PHONE_RE)).cast("bigint").alias("n_phones"),
        F.md5(scrubbed).alias("scrub_sig"),
    )


@query(
    "text_repetition_filter",
    oracle="""
    WITH s AS (
        SELECT doc_id, string_split(lower(text), ' ') AS l FROM documents
    ), g AS (
        SELECT doc_id,
               greatest(len(l) - 2, 0) AS n_grams,
               CASE WHEN len(l) >= 3 THEN
                   len(list_distinct([l[i] || ' ' || l[i+1] || ' ' || l[i+2]
                                      for i in generate_series(1, len(l) - 2)]))
               ELSE 0 END AS n_distinct
        FROM s
    )
    SELECT doc_id, CAST(n_grams AS BIGINT) AS n_grams,
           CASE WHEN n_grams > 0
                THEN ROUND(CAST(n_grams - n_distinct AS DOUBLE) / n_grams, 6)
                ELSE CAST(0.0 AS DOUBLE) END AS dup3_frac,
           (n_grams = 0 OR
            CAST(n_grams - n_distinct AS DOUBLE) / n_grams <= 0.2) AS keep
    FROM g
    """,
)
def text_repetition_filter(spark, sf_dir):
    """Within-document repetition filter (Gopher/MassiveText-style quality
    rule): the fraction of duplicated word 3-grams inside each document;
    docs above 20% duplicated content are dropped before training. One
    narrow JVM map stage — transform/array_distinct higher-order functions,
    no shuffle, no Python; at 100 TB this composes with the curation
    pipeline's other per-doc gates in the same scan pass."""
    d = t(spark, sf_dir, "documents")
    s = d.select("doc_id", F.split(F.lower("text"), " ").alias("l"))
    n_grams = F.greatest(F.size("l") - 2, F.lit(0))
    distinct3 = F.when(
        F.size("l") >= 3,
        F.size(
            F.array_distinct(
                F.expr(
                    "transform(sequence(0, size(l) - 3),"
                    " i -> concat_ws(' ', l[i], l[i+1], l[i+2]))"
                )
            )
        ),
    ).otherwise(F.lit(0))
    g = s.select(
        "doc_id",
        n_grams.cast("bigint").alias("n_grams"),
        distinct3.alias("n_distinct"),
    )
    dup_raw = (F.col("n_grams") - F.col("n_distinct")).cast("double") / F.col(
        "n_grams"
    )
    return g.select(
        "doc_id",
        "n_grams",
        F.when(F.col("n_grams") > 0, F.round(dup_raw, 6))
        .otherwise(F.lit(0.0))
        .alias("dup3_frac"),
        ((F.col("n_grams") == 0) | (dup_raw <= 0.2)).alias("keep"),
    )


@query(
    "text_tfidf_topterms",
    oracle="""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
        FROM documents
    ),
    tf AS (
        SELECT doc_id, term, COUNT(*) AS tf
        FROM toks WHERE term <> '' GROUP BY doc_id, term
    ),
    df AS (
        SELECT term, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY term
    ),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
        SELECT tf.doc_id, tf.term, tf.tf, df.df,
               tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df) AS score
        FROM tf JOIN df USING (term) CROSS JOIN n
    )
    SELECT doc_id, term, tf, df
    FROM (
        SELECT doc_id, term, tf, df,
               ROW_NUMBER() OVER (PARTITION BY doc_id
                                  ORDER BY score DESC, term) AS rn
        FROM scored
    )
    WHERE rn <= 3
    """,
)
def text_tfidf_topterms(spark, sf_dir):
    """TF-IDF keyword extraction: top-3 terms per document by
    tf * ln(N/df). Classic corpus analytics over the same whitespace
    tokens as text_token_stats. Plan: one explode + two hash aggregates
    (term frequency per doc, document frequency per term) + an equi-join
    on term + a per-doc top-n window — at 100 TB the df table is tiny
    relative to the corpus (vocabulary-sized) and every shuffle is keyed,
    no all-pairs shape anywhere. The emitted columns are the integer
    (tf, df) pair — the float score only ORDERS (desc, term tiebreak), so
    cross-engine libm ulp differences in ln() cannot flip a hash, only a
    pathological near-tie could (distinct small-integer (tf, df) pairs
    whose scores collide within 1 ulp)."""
    d = t(spark, sf_dir, "documents")
    # Corpus size joined in as a 1-row aggregate (the oracle's CROSS JOIN
    # n) — an eager d.count() here would run a second full scan of the
    # documents table per invocation just to fetch a scalar.
    n = d.agg(F.count(F.lit(1)).cast("double").alias("__n"))
    toks = d.select(
        "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("term")
    ).filter(F.col("term") != "")
    # r8: tf feeds BOTH the df aggregation and the scored join's left
    # side — persist it so the tokenize+explode+aggregate pipeline runs
    # once instead of twice (tf is (doc, term)-aggregated, far smaller
    # than the raw token stream it replaces).
    tf = run_persist(
        toks.groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf")),
        "text_tfidf_topterms.tf",
    )
    # tf is keyed by (doc_id, term), so each doc appears at most once per
    # term — document frequency is a plain COUNT, not a two-phase
    # DISTINCT aggregate (r9: countDistinct here planned an extra
    # partial/final distinct pass for nothing)
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = tf.join(df, "term").crossJoin(F.broadcast(n)).select(
        "doc_id",
        "term",
        "tf",
        "df",
        (F.col("tf") * F.log(F.col("__n") / F.col("df"))).alias("score"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), "term")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "term", "tf", "df")
    )


@query(
    "text_char_entropy",
    oracle="""
    WITH chars AS (
        SELECT doc_id, unnest(string_split(text, '')) AS ch FROM documents
    ), cnt AS (
        SELECT doc_id, ch, COUNT(*) AS c FROM chars GROUP BY 1, 2
    ), tot AS (
        SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n FROM cnt GROUP BY 1
    )
    SELECT cnt.doc_id, tot.n AS n_chars, COUNT(*) AS n_distinct,
           ROUND(ln(CAST(tot.n AS DOUBLE))
                 - SUM(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE)))
                   / tot.n, 3) AS entropy
    FROM cnt JOIN tot ON cnt.doc_id = tot.doc_id
    GROUP BY cnt.doc_id, tot.n
    """,
)
def text_char_entropy(spark, sf_dir):
    """Character-level Shannon entropy per document — the cheap
    perplexity proxy corpus pipelines use to flag binary junk, boilerplate
    and repetitive spam (low entropy) without running a language model.
    Computed as ln(n) - (1/n)*sum(c*ln(c)) over the per-char counts —
    one explode + two hash aggregates, narrow JVM stages. Rounded at
    scale 3: the term values are identical cross-engine (counts are exact
    integers, ln and * single correctly-rounded ops); only the SUM's
    accumulation order differs, a ~1e-15 relative wobble far below the
    rounding quantum."""
    d = t(spark, sf_dir, "documents")
    chars = d.select(
        "doc_id", F.explode(F.split("text", "")).alias("ch")
    )
    cnt = chars.groupBy("doc_id", "ch").agg(F.count(F.lit(1)).alias("c"))
    tot = cnt.groupBy("doc_id").agg(F.sum("c").alias("n"))
    joined = cnt.join(tot, "doc_id")
    return joined.groupBy("doc_id", "n").agg(
        F.count(F.lit(1)).alias("n_distinct"),
        F.round(
            F.log(F.col("n").cast("double"))
            - F.sum(
                F.col("c").cast("double") * F.log(F.col("c").cast("double"))
            )
            / F.col("n"),
            3,
        ).alias("entropy"),
    ).select(
        "doc_id",
        F.col("n").alias("n_chars"),
        "n_distinct",
        "entropy",
    )
