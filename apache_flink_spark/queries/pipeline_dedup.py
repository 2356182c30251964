"""Deduplication operators for training-data pipelines — exact, n-gram
Jaccard, MinHash+LSH, SimHash.

North-star additions beyond the reference (SURVEY.md §7 step 6). All four are
the standard corpus-dedup algorithms (Broder MinHash / Charikar SimHash /
shingle Jaccard), expressed as distributed DataFrame plans:

  - Exact: one hash-groupBy on a content digest — the cheapest stage,
    always first.
  - Jaccard: inverted-index formulation (explode shingles -> self-join on
    shingle -> count per pair) instead of array_intersect over a cross
    join: the join only materializes pairs that SHARE a shingle, which is
    the only formulation that survives 100 TB. Hot shingles fan out
    quadratically — at scale the MinHash-LSH candidates below replace the
    raw shingle join; AQE skew-join splitting handles the residual.
  - MinHash-LSH: K=8 permutations via min(md5(k:shingle)), banded 2 rows x
    4 bands -> equi-join on (band, hash). Candidate generation is a plain
    shuffle join on band hash; no cross product anywhere.
  - SimHash: 16-bit signatures from frequency-weighted token hashes — one
    explode + one groupBy.

Everything is built-in JVM expressions (md5/conv/shiftright/higher-order
array fns); md5-derived integers make every value bit-identical to the
DuckDB oracle (hex parsed with conv() in Spark, strpos arithmetic in the
oracle — same digits, same value).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import functions as F

from apache_flink_spark.queries.registry import query
from apache_flink_spark.queries._util import t

# Distinct 3-word shingles per doc, as a DuckDB expression over l (token list).
_SHINGLES_SQL = (
    "list_distinct([l[i] || ' ' || l[i+1] || ' ' || l[i+2]"
    " for i in generate_series(1, len(l) - 2)])"
)
# Same, as a Spark SQL expression over a pre-materialized token array.
# The token array MUST be its own projection below the explode: inlining
# split(text) into the transform lambda makes Catalyst re-split the text for
# every shingle element (O(tokens^2) per doc — measured 8x slower at sf0.1).
# Generate (explode) is not a Project, so CollapseProject cannot undo this.
# Docs with < 3 tokens must yield ZERO shingles: Spark's sequence(0, n) with
# n < 0 produces a DESCENDING [0, -1] (spurious partial shingles through
# concat_ws's null-skipping), while the oracle's generate_series is empty —
# the CASE guard keeps both engines at "no shingles" for short docs.
_SHINGLES_SPARK = (
    "CASE WHEN size(toks) >= 3 THEN"
    " array_distinct(transform(sequence(0, size(toks) - 3),"
    " i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])))"
    " ELSE CAST(array() AS ARRAY<STRING>) END"
)


def _shingles(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    # Spread docs across cores BEFORE the shingle explode + hashing: the
    # fixture is one parquet file (one input split), and the expensive
    # map work sits above the scan — at 100 TB the many input files give
    # this parallelism for free; locally the small shuffle buys it.
    toks = d.repartition(int(spark.conf.get("spark.sql.shuffle.partitions"))).select(
        "doc_id", F.split("text", " ").alias("toks")
    )
    return toks.select(
        "doc_id", F.explode(F.expr(_SHINGLES_SPARK)).alias("sh")
    )


@query(
    "dedup_exact_content",
    oracle="""
    SELECT md5(lower(trim(text))) AS content_md5,
           min(doc_id) AS keep_doc_id,
           count(*) AS n_copies
    FROM documents
    GROUP BY 1
    """,
)
def dedup_exact_content(spark, sf_dir):
    """Exact dedup: hash-groupBy on the normalized content digest, keeping
    the smallest doc_id per group (deterministic survivor rule)."""
    d = t(spark, sf_dir, "documents")
    return (
        d.groupBy(F.md5(F.lower(F.trim("text"))).alias("content_md5"))
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


@query(
    "dedup_ngram_jaccard",
    oracle=f"""
    WITH sh AS (
        SELECT doc_id, unnest({_SHINGLES_SQL}) AS sh
        FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents)
    ), cnt AS (
        SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
    ), inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
        FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT doc_a, doc_b, n_inter,
           ca.n + cb.n - n_inter AS n_union,
           ROUND(CAST(n_inter AS DOUBLE) / (ca.n + cb.n - n_inter), 4) AS jaccard
    FROM inter
    JOIN cnt ca ON ca.doc_id = doc_a
    JOIN cnt cb ON cb.doc_id = doc_b
    WHERE CAST(n_inter AS DOUBLE) / (ca.n + cb.n - n_inter) >= 0.3
    """,
)
def dedup_ngram_jaccard(spark, sf_dir):
    """n-gram Jaccard near-dup pairs (threshold 0.3) via the inverted-index
    join — only pairs sharing >= 1 shingle are ever materialized."""
    from pyspark.sql import Window

    # Ride the per-doc shingle count along on every shingle row with a
    # window count (same doc_id partitioning the explode already has)
    # instead of joining a separate cnt aggregate back twice — that
    # formulation re-executed the shingle subtree 4x; this one appears
    # twice (join sides) and the identical window exchanges dedupe via
    # ReusedExchange, so the shingles are computed once.
    # Join on xxhash64(shingle), not the shingle string: the shuffle then
    # carries 8 bytes per key instead of the raw n-gram (~20-30 bytes) — at
    # corpus scale the exchange is the cost, and a 64-bit collision merging
    # two distinct shingles (~2^-64 per pair) is far below the near-dup
    # threshold's own noise floor.
    sh = (
        _shingles(spark, sf_dir)
        .withColumn("shh", F.xxhash64("sh"))
        .drop("sh")
        .withColumn("n", F.count(F.lit(1)).over(Window.partitionBy("doc_id")))
    )
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shh") == F.col("b.shh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(
            F.count(F.lit(1)).alias("n_inter"),
            F.min(F.col("a.n")).alias("na"),
            F.min(F.col("b.n")).alias("nb"),
        )
    )
    jac = F.col("n_inter").cast("double") / (
        F.col("na") + F.col("nb") - F.col("n_inter")
    )
    return inter.filter(jac >= 0.3).select(
        "doc_a",
        "doc_b",
        "n_inter",
        (F.col("na") + F.col("nb") - F.col("n_inter")).alias("n_union"),
        F.round(jac, 4).alias("jaccard"),
    )


_N_HASH = 8  # MinHash permutations; banded 2 rows x 4 bands.

# One md5 per shingle, then arithmetic permutations m_k = (a_k*h + b_k) mod P
# of its 32-bit prefix — 8x fewer digest computations than md5-per-
# permutation with identical LSH behavior (the permutation family only needs
# pairwise independence). h < 2^32 and a_k < 2^31 keep every product inside
# 63 bits — no overflow in either engine's BIGINT.
_MERSENNE_P = (1 << 61) - 1


def _perm_coeffs(k: int) -> tuple[int, int]:
    import hashlib

    # a_k masked to 31 bits: (2^31-1) * (2^32-1) + b stays under 2^63.
    ha = (int(hashlib.md5(f"a{k}".encode()).hexdigest()[:8], 16) & 0x7FFFFFFF) | 1
    hb = int(hashlib.md5(f"b{k}".encode()).hexdigest()[:8], 16)
    return ha, hb


_COEFFS = [_perm_coeffs(k) for k in range(_N_HASH)]

# DuckDB-side parse of the first 8 md5 hex chars -> BIGINT.
_HEX8 = " + ".join(
    f"(strpos('0123456789abcdef', substr(md5(sh), {i + 1}, 1)) - 1) * {16 ** (7 - i)}"
    for i in range(8)
)

_MINHASH_ORACLE = f"""
    WITH sh AS (
        SELECT doc_id, unnest({_SHINGLES_SQL}) AS sh
        FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents)
    ), hashed AS (
        SELECT doc_id, CAST({_HEX8} AS BIGINT) AS h FROM sh
    ), sig AS (
        SELECT doc_id,
               {", ".join(
                   f"min(({a} * h + {b}) % {_MERSENNE_P}) AS m{k}"
                   for k, (a, b) in enumerate(_COEFFS)
               )}
        FROM hashed GROUP BY doc_id
    ), bands AS (
        {" UNION ALL ".join(
            f"SELECT doc_id, {b} AS band_id,"
            f" CAST(m{2 * b} AS VARCHAR) || ':' || CAST(m{2 * b + 1} AS VARCHAR) AS bh"
            f" FROM sig"
            for b in range(_N_HASH // 2)
        )}
    ), capped AS (
        SELECT doc_id, band_id, bh
        FROM (
            SELECT doc_id, band_id, bh,
                   ROW_NUMBER() OVER (PARTITION BY band_id, bh
                                      ORDER BY doc_id) AS rn
            FROM bands
        )
        WHERE rn <= {{cap}}
    )
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM capped a
    JOIN capped b ON a.band_id = b.band_id AND a.bh = b.bh
                 AND a.doc_id < b.doc_id
"""

# Degenerate hot buckets (boilerplate/empty docs hashing identically) would
# otherwise explode quadratically; the cap bounds any bucket's pair fan-out
# at C(cap,2) and keeps collect_list's worst case O(cap) per bucket. The
# kept members are the cap smallest doc_ids — deterministic, so the oracle
# applies the identical truncation.
_BUCKET_CAP = 64
_MINHASH_ORACLE = _MINHASH_ORACLE.format(cap=_BUCKET_CAP)


@query("dedup_minhash_lsh", oracle=_MINHASH_ORACLE)
def dedup_minhash_lsh(spark, sf_dir):
    """MinHash + LSH candidate pairs: 8 md5-keyed min-hash permutations over
    distinct shingles, banded into 4 bands of 2; docs colliding in any band
    are near-dup candidates. The only shuffles are the signature groupBy and
    the band-hash equi-join — candidate generation never compares all
    pairs."""
    sh = _shingles(spark, sf_dir)
    hashed = sh.select(
        "doc_id",
        F.conv(F.substring(F.md5("sh"), 1, 8), 16, 10).cast("long").alias("h"),
    )
    sig = hashed.groupBy("doc_id").agg(
        *[
            F.min(
                (F.lit(a) * F.col("h") + F.lit(b)) % F.lit(_MERSENNE_P)
            ).alias(f"m{k}")
            for k, (a, b) in enumerate(_COEFFS)
        ]
    )
    # One Generate for all bands (a 4-arm union would re-execute the whole
    # shingle+signature subtree per arm — measured 4x the work), then
    # bucket-local pair generation via collect_list instead of a self-join
    # (which would execute the subtree twice more). The plan computes the
    # signatures exactly once; bucket sizes bound the pair fan-out (cap hot
    # buckets before exploding pairs when corpus-scale skew appears).
    bands = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"),
                        F.concat_ws(
                            ":",
                            F.col(f"m{2 * b}").cast("string"),
                            F.col(f"m{2 * b + 1}").cast("string"),
                        ).alias("bh"),
                    )
                    for b in range(_N_HASH // 2)
                ]
            ).alias("band")
        ),
    ).select("doc_id", F.col("col.band_id").alias("band_id"), F.col("col.bh").alias("bh"))
    # Hot-bucket cap: keep the _BUCKET_CAP smallest doc_ids per bucket
    # (array_sort makes collect_list's arrival order irrelevant) so a
    # degenerate bucket can at most yield C(cap,2) pairs — the oracle's
    # ROW_NUMBER <= cap truncation is identical.
    buckets = (
        bands.groupBy("band_id", "bh")
        .agg(F.collect_list("doc_id").alias("ds_all"))
        .filter(F.size("ds_all") >= 2)
        .select(F.slice(F.array_sort("ds_all"), 1, _BUCKET_CAP).alias("ds"))
    )
    pairs = buckets.select(
        F.explode(
            F.expr(
                "flatten(transform(ds, (x, i) ->"
                " transform(slice(ds, i + 2, size(ds)),"
                " y -> struct(least(x, y) AS a, greatest(x, y) AS b))))"
            )
        ).alias("p")
    )
    return pairs.select(
        F.col("p.a").alias("doc_a"), F.col("p.b").alias("doc_b")
    ).distinct()


_N_BITS = 16
# DuckDB-side hex parse of the first 4 md5 chars (Spark side uses conv()).
_HEXPARSE = " + ".join(
    f"(strpos('0123456789abcdef', substr(md5(tok), {i + 1}, 1)) - 1) * {16 ** (3 - i)}"
    for i in range(4)
)
_SIMHASH_ORACLE = f"""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    ), hashed AS (
        SELECT doc_id, {_HEXPARSE} AS h FROM toks
    ), bits AS (
        SELECT doc_id,
               {", ".join(
                   f"sum(CASE WHEN (h // {1 << b}) % 2 = 1 THEN 1 ELSE -1 END) AS s{b}"
                   for b in range(_N_BITS)
               )}
        FROM hashed GROUP BY doc_id
    )
    SELECT doc_id,
           {" + ".join(
               f"CASE WHEN s{b} > 0 THEN {1 << b} ELSE 0 END" for b in range(_N_BITS)
           )} AS simhash
    FROM bits
"""


@query("dedup_simhash", oracle=_SIMHASH_ORACLE)
def dedup_simhash(spark, sf_dir):
    """SimHash signatures: each token votes +-1 on 16 bits of its md5-derived
    hash (frequency-weighted, per Charikar); the signature's set bits are the
    positive sums. Near-dup = small Hamming distance between signatures.
    One explode + one groupBy — map-side partial aggregation absorbs the
    token blowup before the shuffle."""
    d = t(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    hashed = toks.select(
        "doc_id",
        F.conv(F.substring(F.md5("tok"), 1, 4), 16, 10).cast("long").alias("h"),
    )
    bits = hashed.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when((F.shiftright(F.col("h"), b) % 2) == 1, 1).otherwise(-1)
            ).alias(f"s{b}")
            for b in range(_N_BITS)
        ]
    )
    simhash = reduce(
        lambda acc, b: acc
        + F.when(F.col(f"s{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0)),
        range(1, _N_BITS),
        F.when(F.col("s0") > 0, F.lit(1)).otherwise(F.lit(0)),
    )
    return bits.select("doc_id", simhash.alias("simhash"))


# Shared CTE chain of the components/survivor oracles — pair graph ->
# symmetric edges -> transitive closure -> min-label components.
_CLUSTER_CTES = f"""
    WITH RECURSIVE sh AS (
        SELECT doc_id, unnest({_SHINGLES_SQL}) AS sh
        FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents)
    ), cnt AS (
        SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
    ), inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
        FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ), pairs AS (
        SELECT doc_a, doc_b
        FROM inter
        JOIN cnt ca ON ca.doc_id = doc_a
        JOIN cnt cb ON cb.doc_id = doc_b
        WHERE CAST(n_inter AS DOUBLE) / (ca.n + cb.n - n_inter) >= 0.3
    ), edges AS (
        SELECT doc_a AS a, doc_b AS b FROM pairs
        UNION ALL
        SELECT doc_b, doc_a FROM pairs
    ), reach AS (
        SELECT doc_id AS src, doc_id AS dst FROM documents
        UNION
        SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a
    ), comp AS (
        SELECT src AS doc_id, MIN(dst) AS cluster_id FROM reach GROUP BY src
    )
"""

_CLUSTER_ORACLE = _CLUSTER_CTES + """
    SELECT doc_id, cluster_id, doc_id = cluster_id AS is_kept
    FROM comp
"""

# Same CTE chain, quality-based survivor rule instead of min-doc_id.
_SURVIVOR_ORACLE = _CLUSTER_CTES + """
    SELECT c.doc_id, c.cluster_id, d.n_chars,
           ROW_NUMBER() OVER (PARTITION BY c.cluster_id
                              ORDER BY d.n_chars DESC, c.doc_id) = 1
               AS keep
    FROM comp c JOIN documents d ON d.doc_id = c.doc_id
"""


@query("dedup_cluster_components", oracle=_CLUSTER_ORACLE)
def dedup_cluster_components(spark, sf_dir):
    """Near-dup CLUSTERING: connected components over the Jaccard pair graph,
    keeping the smallest doc_id per component (the canonical corpus-dedup
    survivor rule: candidate pairs -> clusters -> one kept doc per cluster).

    r7: runs on the shared LARGE-STAR/SMALL-STAR contraction
    (graph_queries.connected_components_star — Kiveris et al., O(log n)
    rounds, edge volume never exceeds input, loud non-convergence), the
    same engine the graph suite uses: duplicate chains hundreds of docs
    long (mirror farms) converge in ~10 rounds where the previous
    min-label loop needed diameter rounds. The DuckDB oracle computes the
    same components with a recursive transitive-closure CTE."""
    from apache_flink_spark.queries.graph_queries import (
        connected_components_star,
    )

    pairs = dedup_ngram_jaccard(spark, sf_dir).select("doc_a", "doc_b")
    docs = t(spark, sf_dir, "documents").select(F.col("doc_id").alias("v"))
    labels = connected_components_star(pairs, docs)
    return labels.select(
        F.col("v").alias("doc_id"),
        F.col("comp").alias("cluster_id"),
        (F.col("v") == F.col("comp")).alias("is_kept"),
    )


@query(
    "dedup_edit_distance",
    oracle="""
    WITH blocked AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               levenshtein(a.text, b.text) AS dist,
               greatest(len(a.text), len(b.text)) AS max_len
        FROM documents a JOIN documents b
          ON md5(substring(a.text, 1, 64)) = md5(substring(b.text, 1, 64))
         AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b, dist, max_len
    FROM blocked
    WHERE 50 * dist <= max_len
    """,
)
def dedup_edit_distance(spark, sf_dir):
    """Edit-distance near-dup confirmation — the high-precision second
    stage after cheap blocking (the pattern real dedup pipelines run:
    MinHash/prefix blocking proposes, Levenshtein disposes). Blocking key
    here = md5 of the first 64 chars (an equi-join, so candidates scale
    with bucket occupancy, never corpus^2 — same story and same hot-bucket
    caveat as dedup_ngram_jaccard, with MinHash-LSH as the escalation);
    the confirm filter keeps pairs whose edit distance is <= 2% of the
    longer text, compared as exact integers (50*d <= max_len) so no
    cross-engine float boundary exists. Levenshtein runs JVM-side
    (O(len^2) per CANDIDATE pair only)."""
    d = t(spark, sf_dir, "documents").select("doc_id", "text")
    a = d.select(
        F.col("doc_id").alias("doc_a"),
        F.col("text").alias("text_a"),
        F.md5(F.substring("text", 1, 64)).alias("bk"),
    )
    b = d.select(
        F.col("doc_id").alias("doc_b"),
        F.col("text").alias("text_b"),
        F.md5(F.substring("text", 1, 64)).alias("bk"),
    )
    cand = a.join(b, "bk").filter(F.col("doc_a") < F.col("doc_b"))
    out = cand.select(
        "doc_a",
        "doc_b",
        F.levenshtein("text_a", "text_b").alias("dist"),
        F.greatest(F.length("text_a"), F.length("text_b")).alias("max_len"),
    )
    return out.filter(50 * F.col("dist") <= F.col("max_len"))


@query("pipeline_dedup_survivor", oracle=_SURVIVOR_ORACLE)
def pipeline_dedup_survivor(spark, sf_dir):
    """Quality-based dedup survivorship: within each near-dup cluster keep
    the HIGHEST-QUALITY member (longest text, doc_id tiebreak) instead of
    the smallest id — the rule production corpus dedup actually applies
    (drop the truncated/boilerplate copies, keep the fullest one).
    Composes dedup_cluster_components' label propagation with one join to
    the documents table and a per-cluster rank — the added cost over
    min-id survivorship is a single window pass on the (tiny relative to
    the corpus) membership table."""
    from pyspark.sql import Window

    comp = dedup_cluster_components(spark, sf_dir).select(
        "doc_id", "cluster_id"
    )
    d = t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    j = comp.join(d, "doc_id")
    w = Window.partitionBy("cluster_id").orderBy(
        F.desc("n_chars"), "doc_id"
    )
    return j.select(
        "doc_id",
        "cluster_id",
        "n_chars",
        (F.row_number().over(w) == 1).alias("keep"),
    )


_SPAN_K = 40     # duplicate n-gram length (chars)
_SPAN_STRIDE = 10  # sampling stride: catches any duplicate run >= K+STRIDE

_SPAN_ORACLE = f"""
    WITH pos AS (
        SELECT doc_id, text,
               unnest(generate_series(1, length(text) - {_SPAN_K - 1},
                                      {_SPAN_STRIDE})) AS p
        FROM documents
        WHERE text IS NOT NULL AND length(text) >= {_SPAN_K}
    ), g AS (
        SELECT doc_id, p, substr(text, CAST(p AS BIGINT), {_SPAN_K}) AS gram
        FROM pos
    ), dup AS (
        SELECT gram FROM g GROUP BY gram HAVING COUNT(*) > 1
    ), occ AS (
        SELECT g.doc_id, g.p, g.p + {_SPAN_K} AS e
        FROM g JOIN dup USING (gram)
    ), isl AS (
        SELECT doc_id, p, e,
               CASE WHEN p > COALESCE(MAX(e) OVER (
                   PARTITION BY doc_id ORDER BY p
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), -1) THEN 1 ELSE 0 END AS new_isl
        FROM occ
    ), isl2 AS (
        SELECT doc_id, p, e,
               SUM(new_isl) OVER (PARTITION BY doc_id ORDER BY p
                                  ROWS UNBOUNDED PRECEDING) AS isl_id
        FROM isl
    ), spans AS (
        SELECT doc_id, isl_id, MAX(e) - MIN(p) AS span_chars
        FROM isl2 GROUP BY doc_id, isl_id
    )
    SELECT s.doc_id,
           CAST(SUM(s.span_chars) AS BIGINT) AS dup_chars,
           COUNT(*) AS n_spans,
           MIN(d.n_chars) AS n_chars
    FROM spans s JOIN documents d ON d.doc_id = s.doc_id
    GROUP BY s.doc_id
"""


@query("dedup_span_ngrams", oracle=_SPAN_ORACLE)
def dedup_span_ngrams(spark, sf_dir):
    """Exact duplicate-SPAN detection — the scalable first stage of
    suffix-array substring dedup (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better"): every K-char gram
    sampled at STRIDE is grouped corpus-wide; grams occurring 2+ times
    mark duplicated spans, which merge per document into maximal runs
    (dup_chars / n_spans per doc — the removal targets).

    Scale shape: one explode (rows = chars/STRIDE), one gram groupBy
    (HAVING count>1 — map-side combined), one equi-join back, one per-doc
    window pass. No all-pairs anything; at 100 TB the gram key would be a
    64-bit hash instead of the 40-char string (identical plan, narrower
    shuffle), and STRIDE trades cost for the minimum detectable duplicate
    run (K + STRIDE chars). The suffix array of the paper is the
    single-machine construction; the grouped-gram form is its
    shuffle-native equivalent."""
    from pyspark.sql import Window

    d = t(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull() & (F.length("text") >= _SPAN_K)
    ).select("doc_id", "text", "n_chars")
    g = d.select(
        "doc_id",
        F.explode(
            F.sequence(
                F.lit(1),
                F.length("text") - F.lit(_SPAN_K - 1),
                F.lit(_SPAN_STRIDE),
            )
        ).alias("p"),
        "text",
    ).select(
        "doc_id",
        "p",
        # the shuffle key is the 64-bit gram hash, not the 40-char string
        # (the jaccard join's trick): 8-byte exchange rows; a collision
        # (~2^-64/pair) merging two distinct grams is noise far below the
        # stride approximation
        F.xxhash64(
            F.substring("text", F.col("p"), _SPAN_K)
        ).alias("gh"),
    )
    dup = g.groupBy("gh").count().filter(F.col("count") > 1).select("gh")
    occ = g.join(dup, "gh").select(
        "doc_id", "p", (F.col("p") + _SPAN_K).alias("e")
    )
    w_prev = (
        Window.partitionBy("doc_id")
        .orderBy("p")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy("doc_id")
        .orderBy("p")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    isl = occ.withColumn(
        "new_isl",
        F.when(
            F.col("p") > F.coalesce(F.max("e").over(w_prev), F.lit(-1)),
            F.lit(1),
        ).otherwise(F.lit(0)),
    ).withColumn("isl_id", F.sum("new_isl").over(w_run))
    spans = isl.groupBy("doc_id", "isl_id").agg(
        (F.max("e") - F.min("p")).alias("span_chars")
    )
    docs = t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return (
        spans.groupBy("doc_id")
        .agg(
            F.sum("span_chars").alias("dup_chars"),
            F.count(F.lit(1)).alias("n_spans"),
        )
        .join(docs, "doc_id")
        .select(
            "doc_id", "dup_chars", "n_spans",
            F.col("n_chars").cast("long").alias("n_chars"),
        )
    )
