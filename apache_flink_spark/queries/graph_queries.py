"""Graph algorithms — flink-gelly library parity on DataFrames.

Reference parity: the reference ships a graph library (flink-gelly
.../graph/library/ — SingleSourceShortestPaths.java, PageRank.java,
TriangleEnumerator.java) built on iterative joins over edge DataSets. The
Spark-first equivalents below run the same vertex-centric iterations as
DataFrame joins + aggregations with ``localCheckpoint`` lineage truncation
(the pattern proven by dedup_cluster_components), so every round is one
shuffle on the vertex key and the plan never grows.

Graph fixture: the part co-purchase graph — parts appearing in the same
order are connected. ~2k vertices / ~116k undirected edges at sf0.01;
derivable identically in both engines, so oracles are exact.

Determinism: all three algorithms use pure integer arithmetic (hop counts,
triangle counts, micro-unit ranks with floor division) — integer sums are
order-independent, so Spark and DuckDB agree bit-for-bit.

Scale: edges shuffle on the vertex key per round; at 100 TB the same loops
run with the usual escalations (salting for power-law hot vertices, the
large-star/small-star trick for components — see SCALE.md).

Join strategy: every iterative join carries an explicit SHUFFLE_HASH hint.
``localCheckpoint`` erases size statistics (a checkpointed relation reports
``defaultSizeInBytes``), so Catalyst's broadcast selection becomes
arbitrary — on a 100 TB edge set a mis-chosen broadcast of the edge or
frontier relation is fatal (locally it already OOMs the driver at sf0.1).
Hash-shuffling both sides on the vertex key is the correct shape at every
scale and keeps one reusable partitioning across rounds.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from apache_flink_spark.queries._util import t
from apache_flink_spark.queries.registry import query

# Undirected co-purchase edges, oriented pa < pb, deduplicated.
_EDGES_SQL = """
    SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb
    FROM lineitem a
    JOIN lineitem b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
"""


def _edges(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a, b = li.alias("a"), li.alias("b")
    return (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(
            F.col("a.l_partkey").alias("pa"), F.col("b.l_partkey").alias("pb")
        )
        .distinct()
    )


def _bidirected(edges):
    """Symmetric closure: one directed row per (src, dst) direction."""
    return edges.selectExpr("pa AS src", "pb AS dst").unionAll(
        edges.selectExpr("pb AS src", "pa AS dst")
    )


_SSSP_ROUNDS = 4


@query(
    "graph_sssp_hops",
    oracle=f"""
    WITH edges AS ({_EDGES_SQL}),
    bi AS (SELECT pa AS src, pb AS dst FROM edges
           UNION ALL SELECT pb, pa FROM edges),
    nodes AS (SELECT DISTINCT src AS node FROM bi),
    d0 AS (SELECT node, CASE WHEN node = (SELECT MIN(node) FROM nodes)
                             THEN 0 END AS dist FROM nodes),
    {", ".join(
        f"d{k} AS (SELECT n.node, MIN(LEAST(COALESCE(n.dist, 999999),"
        f" COALESCE(m.dist + 1, 999999))) AS dist"
        f" FROM d{k - 1} n LEFT JOIN bi e ON e.dst = n.node"
        f" LEFT JOIN d{k - 1} m ON m.node = e.src"
        f" GROUP BY n.node)"
        for k in range(1, _SSSP_ROUNDS + 1)
    )}
    SELECT node, dist FROM d{_SSSP_ROUNDS} WHERE dist < 999999
    """,
)
def graph_sssp_hops(spark, sf_dir):
    """Single-source shortest paths in hops (reference flink-gelly
    .../library/SingleSourceShortestPaths.java — scatter-gather min-distance
    propagation): BFS distance from the smallest vertex id over 4
    synchronous supersteps (both engines run the identical fixed round
    count, so partial frontiers match exactly). Each round = one join on the
    vertex key + one min-aggregate, localCheckpointed."""
    bi = _bidirected(_edges(spark, sf_dir)).localCheckpoint(eager=True)
    nodes = bi.select(F.col("src").alias("node")).distinct()
    source = nodes.agg(F.min("node")).collect()[0][0]
    inf = F.lit(999999)
    dist = nodes.select(
        "node",
        F.when(F.col("node") == source, F.lit(0)).alias("dist"),
    ).localCheckpoint(eager=True)
    for _ in range(_SSSP_ROUNDS):
        nbr = (
            dist.alias("n")
            .join(
                bi.alias("e").hint("shuffle_hash"),
                F.col("e.dst") == F.col("n.node"),
                "left",
            )
            .join(
                dist.alias("m").hint("shuffle_hash"),
                F.col("m.node") == F.col("e.src"),
                "left",
            )
            .groupBy(F.col("n.node").alias("node"))
            .agg(
                F.min(
                    F.least(
                        F.coalesce(F.col("n.dist"), inf),
                        F.coalesce(F.col("m.dist") + 1, inf),
                    )
                ).alias("dist")
            )
        )
        dist = nbr.localCheckpoint(eager=True)
    return dist.filter(F.col("dist") < 999999)


_PR_ROUNDS = 5
_PR_SCALE = 1_000_000  # micro-units; integer arithmetic = order-independent


@query(
    "graph_pagerank",
    oracle=f"""
    WITH edges AS ({_EDGES_SQL}),
    bi AS (SELECT pa AS src, pb AS dst FROM edges
           UNION ALL SELECT pb, pa FROM edges),
    deg AS (SELECT src AS node, COUNT(*) AS d FROM bi GROUP BY 1),
    r0 AS (SELECT node, CAST({_PR_SCALE} AS BIGINT) AS r FROM deg),
    {", ".join(
        f"r{k} AS (SELECT d.node,"
        f" 150000 + (850 * COALESCE(c.s, 0)) // 1000 AS r"
        f" FROM deg d LEFT JOIN ("
        f"   SELECT e.dst AS node, SUM(p.r // g.d) AS s"
        f"   FROM bi e JOIN r{k - 1} p ON p.node = e.src"
        f"   JOIN deg g ON g.node = e.src GROUP BY 1) c USING (node))"
        for k in range(1, _PR_ROUNDS + 1)
    )}
    SELECT node, CAST(r AS BIGINT) AS rank_micros FROM r{_PR_ROUNDS}
    """,
)
def graph_pagerank(spark, sf_dir):
    """PageRank (reference flink-gelly .../library/PageRank.java — damping
    0.85, fixed iteration count): ranks kept in integer micro-units with
    floor division, so the per-round neighbor sums are order-independent and
    both engines agree exactly. Each round = one join edges->ranks + one
    sum-aggregate on the destination key, localCheckpointed. Rank mass from
    dangling vertices leaks (as in the reference's basic variant); every
    vertex here has degree >= 1 by construction."""
    bi = _bidirected(_edges(spark, sf_dir)).localCheckpoint(eager=True)
    deg = bi.groupBy(F.col("src").alias("node")).agg(F.count("*").alias("d"))
    deg = deg.localCheckpoint(eager=True)
    ranks = deg.select("node", F.lit(_PR_SCALE).cast("long").alias("r"))
    for _ in range(_PR_ROUNDS):
        contrib = (
            bi.alias("e")
            .join(
                ranks.alias("p").hint("shuffle_hash"),
                F.col("p.node") == F.col("e.src"),
            )
            .join(
                deg.alias("g").hint("shuffle_hash"),
                F.col("g.node") == F.col("e.src"),
            )
            .groupBy(F.col("e.dst").alias("node"))
            .agg(F.sum(F.expr("p.r div g.d")).alias("s"))
        )
        ranks = (
            deg.alias("d")
            .join(contrib.alias("c").hint("shuffle_hash"), "node", "left")
            .select(
                "node",
                (
                    F.lit(150000)
                    + F.expr("850 * coalesce(c.s, 0) div 1000")
                ).cast("long").alias("r"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks.select("node", F.col("r").alias("rank_micros"))


@query(
    "graph_triangle_count",
    oracle=f"""
    WITH edges AS ({_EDGES_SQL}),
    tris AS (
        SELECT e1.pa AS a, e1.pb AS b, e2.pb AS c
        FROM edges e1
        JOIN edges e2 ON e2.pa = e1.pb
        JOIN edges e3 ON e3.pa = e1.pa AND e3.pb = e2.pb
    ),
    per_node AS (
        SELECT a AS node FROM tris
        UNION ALL SELECT b FROM tris
        UNION ALL SELECT c FROM tris
    )
    SELECT node, COUNT(*) AS n_triangles
    FROM per_node GROUP BY 1
    """,
)
def graph_triangle_count(spark, sf_dir):
    """Per-vertex triangle count (reference flink-gelly
    .../library/TriangleEnumerator.java): with edges oriented low->high id,
    each triangle a<b<c is enumerated exactly once by the wedge join
    (a,b)+(b,c) closed by (a,c); every vertex of the triangle is then
    credited. Two equi-joins on vertex keys — no theta join, no
    re-enumeration. The wedge intermediate is inherently Θ(Σ C(deg,2)) for
    EXACT counting (measured 49M rows at sf0.1 — size executor memory for
    it, it spills cleanly). Degree-ordered orientation only helps skewed
    graphs (measured: 49.28M -> 49.19M wedges here, the co-purchase graph is
    near-regular); the real scale escalation is approximate counting via
    edge sampling (DOULION: keep each edge w.p. p, scale by 1/p^3), which
    shrinks wedges by p^2 with the same plan shape."""
    e = _edges(spark, sf_dir).localCheckpoint(eager=True)
    e1, e2, e3 = e.alias("e1"), e.alias("e2"), e.alias("e3")
    # Sort-merge, not shuffle-hash: the wedge join's inputs scale with
    # sum-of-degrees-squared, and SMJ spills where a hash build cannot
    # (shuffle_hash OOMs this join at sf0.1 already).
    tris = (
        e1.join(e2.hint("merge"), F.col("e2.pa") == F.col("e1.pb"))
        .join(
            e3.hint("merge"),
            (F.col("e3.pa") == F.col("e1.pa"))
            & (F.col("e3.pb") == F.col("e2.pb")),
        )
        .select(
            F.col("e1.pa").alias("a"),
            F.col("e1.pb").alias("b"),
            F.col("e2.pb").alias("c"),
        )
    )
    per_node = (
        tris.select(F.col("a").alias("node"))
        .unionAll(tris.select(F.col("b").alias("node")))
        .unionAll(tris.select(F.col("c").alias("node")))
    )
    return per_node.groupBy("node").agg(F.count("*").alias("n_triangles"))


# Deterministic DOULION edge sampling: keep an edge iff the md5 of
# "pa:pb" starts with a hex digit in 0-3 (p = 1/4) — both engines compute
# the identical keep set, so the oracle is exact while the estimate itself
# is the classic 1/p^3-scaled triangle count.
_KEEP_SPARK = (
    "conv(substring(md5(concat(CAST(pa AS STRING), ':', CAST(pb AS STRING))),"
    " 1, 1), 16, 10) < 4"
)
_KEEP_DUCK = (
    "(strpos('0123456789abcdef',"
    " substr(md5(CAST(pa AS VARCHAR) || ':' || CAST(pb AS VARCHAR)), 1, 1))"
    " - 1) < 4"
)


@query(
    "graph_triangle_sample",
    oracle=f"""
    WITH edges AS ({_EDGES_SQL}),
    s AS (SELECT pa, pb FROM edges WHERE {_KEEP_DUCK}),
    tris AS (
        SELECT e1.pa AS a, e1.pb AS b, e2.pb AS c
        FROM s e1
        JOIN s e2 ON e2.pa = e1.pb
        JOIN s e3 ON e3.pa = e1.pa AND e3.pb = e2.pb
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS sampled_triangles,
           CAST(COUNT(*) * 64 AS BIGINT) AS estimated_triangles
    FROM tris
    """,
)
def graph_triangle_sample(spark, sf_dir):
    """Approximate global triangle count via DOULION edge sampling — the
    scale escalation graph_triangle_count documents: keep each edge with
    p=1/4 (deterministic content hash, so every engine/run agrees), count
    triangles on the sampled graph, scale by 1/p^3 = 64. The wedge
    intermediate shrinks by p^2 = 16x (measured 49M -> ~3M rows at sf0.1)
    while the plan shape — two equi-joins — is unchanged; at 100 TB p is
    the knob that trades variance for wedge volume."""
    e = (
        _edges(spark, sf_dir)
        .filter(F.expr(_KEEP_SPARK))
        .localCheckpoint(eager=True)
    )
    e1, e2, e3 = e.alias("e1"), e.alias("e2"), e.alias("e3")
    tris = (
        e1.join(e2.hint("merge"), F.col("e2.pa") == F.col("e1.pb"))
        .join(
            e3.hint("merge"),
            (F.col("e3.pa") == F.col("e1.pa"))
            & (F.col("e3.pb") == F.col("e2.pb")),
        )
        .select(F.col("e1.pa").alias("a"))
    )
    return tris.agg(
        F.count("*").cast("bigint").alias("sampled_triangles"),
        (F.count("*") * 64).cast("bigint").alias("estimated_triangles"),
    )


@query(
    "graph_label_propagation",
    oracle=f"""
    WITH edges AS ({_EDGES_SQL}),
    sym AS (
        SELECT pa AS src, pb AS dst FROM edges
        UNION ALL
        SELECT pb AS src, pa AS dst FROM edges
    ),
    l0 AS (SELECT DISTINCT src AS node, src AS label FROM sym),
    c1 AS (
        SELECT s.src, l.label, COUNT(*) AS cnt
        FROM sym s JOIN l0 l ON l.node = s.dst
        GROUP BY 1, 2
    ),
    l1 AS (
        SELECT src AS node, label FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY src
                                         ORDER BY cnt DESC, label ASC) AS rn
            FROM c1
        ) WHERE rn = 1
    ),
    c2 AS (
        SELECT s.src, l.label, COUNT(*) AS cnt
        FROM sym s JOIN l1 l ON l.node = s.dst
        GROUP BY 1, 2
    ),
    l2 AS (
        SELECT src AS node, label FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY src
                                         ORDER BY cnt DESC, label ASC) AS rn
            FROM c2
        ) WHERE rn = 1
    )
    SELECT node, label FROM l2
    """,
)
def graph_label_propagation(spark, sf_dir):
    """Label propagation community detection (flink-gelly
    LabelPropagation.java parity): synchronous rounds where every vertex
    adopts the most frequent label among its neighbors, ties broken by
    the SMALLEST label (an explicit deterministic rule — gelly's
    hash-order tie behavior is nondeterministic, which an oracle cannot
    tolerate). Two unrolled rounds over the co-purchase graph; per round
    one shuffle-hash join on the vertex key + one count/argmax — the same
    round shape as the other gelly loops, so the 100 TB escalations
    (salting hot vertices) apply unchanged."""
    from pyspark.sql import Window

    edges = _edges(spark, sf_dir)
    sym = edges.select(
        F.col("pa").alias("src"), F.col("pb").alias("dst")
    ).unionAll(edges.select(F.col("pb").alias("src"), F.col("pa").alias("dst")))
    sym = sym.localCheckpoint()
    labels = (
        sym.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
    )
    w = Window.partitionBy("src").orderBy(F.desc("cnt"), F.asc("label"))
    for _ in range(2):
        cand = (
            sym.join(
                labels.withColumnRenamed("node", "dst").hint("shuffle_hash"),
                "dst",
            )
            .groupBy("src", "label")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        labels = (
            cand.withColumn("rn", F.row_number().over(w))
            .filter("rn = 1")
            .select(F.col("src").alias("node"), "label")
            .localCheckpoint()
        )
    return labels


@query(
    "graph_jaccard_index",
    oracle=f"""
    WITH edges AS ({_EDGES_SQL}),
    bi AS (SELECT pa AS src, pb AS dst FROM edges
           UNION ALL SELECT pb, pa FROM edges),
    deg AS (SELECT src AS node, COUNT(*) AS d FROM bi GROUP BY 1),
    common AS (
        SELECT x.dst AS a, y.dst AS b, COUNT(*) AS n_common
        FROM bi x JOIN bi y ON y.src = x.src AND x.dst < y.dst
        GROUP BY 1, 2
    )
    SELECT a, b, n_common,
           da.d + db.d - n_common AS n_union
    FROM common
    JOIN deg da ON da.node = a
    JOIN deg db ON db.node = b
    ORDER BY n_common DESC, a, b
    LIMIT 100
    """,
)
def graph_jaccard_index(spark, sf_dir):
    """Jaccard similarity of vertex neighborhoods (flink-gelly
    .../library/similarity/JaccardIndex.java parity): for every vertex
    pair sharing >= 1 neighbor, |N(a) ∩ N(b)| and |N(a) ∪ N(b)| as exact
    integers (numerator/denominator instead of a float ratio, so both
    engines agree bit-for-bit). The pair generation is the inverted-index
    shape — join the adjacency list with itself on the SHARED NEIGHBOR, so
    only co-neighbor pairs materialize, never all-pairs; the intermediate
    is Θ(Σ C(deg,2)), the same wedge bound (and the same spill/sampling
    escalations) as triangle counting. Top-100 by count with a total
    deterministic tiebreak, TakeOrdered — no global sort; degrees join
    AFTER the limit, so the expensive pair relation is never joined —
    only the 100 survivors touch the degree dim (broadcast)."""
    bi = _bidirected(_edges(spark, sf_dir)).localCheckpoint(eager=True)
    deg = bi.groupBy(F.col("src").alias("node")).agg(F.count("*").alias("d"))
    x, y = bi.alias("x"), bi.alias("y")
    top = (
        x.join(
            y.hint("shuffle_hash"),
            (F.col("y.src") == F.col("x.src"))
            & (F.col("x.dst") < F.col("y.dst")),
        )
        .groupBy(F.col("x.dst").alias("a"), F.col("y.dst").alias("b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
        .orderBy(F.desc("n_common"), "a", "b")
        .limit(100)
    )
    # broadcast the 100-row survivors against the O(V) degree relation —
    # never the reverse (deg is vertex-cardinality; unbroadcastable at scale)
    da = deg.join(
        F.broadcast(top), F.col("node") == F.col("a")
    ).select("a", "b", "n_common", F.col("d").alias("da"))
    return (
        deg.join(F.broadcast(da), F.col("node") == F.col("b"))
        .select(
            "a",
            "b",
            "n_common",
            (F.col("da") + F.col("d") - F.col("n_common")).alias("n_union"),
        )
        .orderBy(F.desc("n_common"), "a", "b")
    )


@query(
    "graph_summarization",
    oracle=f"""
    WITH edges AS ({_EDGES_SQL}),
    lbl AS (SELECT p_partkey, p_brand FROM part)
    SELECT LEAST(la.p_brand, lb.p_brand) AS brand_a,
           GREATEST(la.p_brand, lb.p_brand) AS brand_b,
           COUNT(*) AS n_edges,
           COUNT(DISTINCT CASE WHEN la.p_brand <= lb.p_brand
                               THEN pa ELSE pb END) AS n_src_vertices
    FROM edges
    JOIN lbl la ON la.p_partkey = pa
    JOIN lbl lb ON lb.p_partkey = pb
    GROUP BY 1, 2
    """,
)
def graph_summarization(spark, sf_dir):
    """Graph summarization (flink-gelly .../library/Summarization.java
    parity): condense the vertex set by a label (part brand) and emit one
    summary edge per label pair with the multiplicity of underlying edges
    (canonicalized LEAST/GREATEST so the undirected summary is unique) plus
    the count of distinct source vertices feeding each summary edge. Two
    broadcast joins against the small part-label dim + one hash aggregate —
    the summary relation is O(|labels|^2), independent of graph size, so
    this is the cheap first look at a 100 TB graph."""
    edges = _edges(spark, sf_dir)
    lbl = t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    la, lb = lbl.alias("la"), lbl.alias("lb")
    joined = (
        edges.join(F.broadcast(la), F.col("la.p_partkey") == F.col("pa"))
        .join(F.broadcast(lb), F.col("lb.p_partkey") == F.col("pb"))
        .select(
            F.least("la.p_brand", "lb.p_brand").alias("brand_a"),
            F.greatest("la.p_brand", "lb.p_brand").alias("brand_b"),
            F.when(
                F.col("la.p_brand") <= F.col("lb.p_brand"), F.col("pa")
            ).otherwise(F.col("pb")).alias("src_vertex"),
        )
    )
    return joined.groupBy("brand_a", "brand_b").agg(
        F.count(F.lit(1)).alias("n_edges"),
        F.countDistinct("src_vertex").alias("n_src_vertices"),
    )


def connected_components_star(edges, vertices, max_rounds: int = 25):
    """Connected components by LARGE-STAR / SMALL-STAR contraction —
    O(log n) rounds (Kiveris et al., "Connected Components in MapReduce
    and Beyond"; the reference's gelly ConnectedComponents is the
    O(diameter) min-label loop this replaces, VERDICT r5 item #5).

    ``edges``: undirected distinct pairs (pa, pb), pa != pb;
    ``vertices``: one column ``v``. Returns (v, comp) labels where comp
    is the component's minimum vertex id.

    Per round: large-star hangs every neighbor LARGER than u onto u's
    minimum neighbor; small-star re-hangs the smaller neighbors. Both
    are one groupBy-min + one equi-join over the CURRENT edge set —
    never a transitive-closure blow-up — and edge count stays <= input
    edges, so a round costs the same at any scale while the component
    diameter collapses geometrically (a 1000-hop path converges in ~10
    rounds where label propagation needs 1000). Convergence (r14, was
    edge-set-checksum stability): stop as soon as the round's output IS
    a star forest — the exact fixpoint characterization of Kiveris et
    al. (the return logic below already ASSUMES the fixpoint is a star
    forest; on one, large-star and small-star provably reproduce the
    identical edge set, so this returns the same edges one full round —
    two joins, two aggregations, a distinct and a checkpoint — earlier
    than waiting for the checksum to repeat). Loud failure at the cap."""
    e = edges.select(
        F.col(edges.columns[0]).alias("a"), F.col(edges.columns[1]).alias("b")
    ).localCheckpoint(eager=True)

    def _is_star_forest(df):
        """True iff ``df`` is a star forest: every ``a`` (leaf) occurs
        exactly once, and no vertex is both a leaf and a center
        (``b < a`` holds by construction). One aggregate pass over
        2|E| tiny rows — far cheaper than the round it saves. As the
        round's FIRST action it also materializes the round's lazy
        localCheckpoint in the same job."""
        occ = df.select(
            F.col("a").alias("x"), F.lit(1).alias("na"), F.lit(0).alias("nb")
        ).unionAll(
            df.select(
                F.col("b").alias("x"), F.lit(0).alias("na"), F.lit(1).alias("nb")
            )
        )
        row = (
            occ.groupBy("x")
            .agg(F.sum("na").alias("na"), F.max("nb").alias("hb"))
            .agg(
                F.max(
                    F.when(
                        (F.col("na") > 1)
                        | ((F.col("na") >= 1) & (F.col("hb") == 1)),
                        1,
                    ).otherwise(0)
                ).alias("bad")
            )
            .first()
        )
        return (row.bad or 0) == 0

    converged = False
    for _rnd in range(1, max_rounds + 1):
        # large-star: reducer u over ALL neighbors; larger ones re-hang
        # onto m = min(neighbors + self).
        bi = e.select(F.col("a").alias("u"), F.col("b").alias("v")).unionAll(
            e.select(F.col("b").alias("u"), F.col("a").alias("v"))
        )
        mins = (
            bi.groupBy("u")
            .agg(F.min("v").alias("mv"))
            .select("u", F.least(F.col("mv"), F.col("u")).alias("m"))
        )
        ls = (
            bi.join(mins, "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("a"), F.col("m").alias("b"))
            .where(F.col("a") != F.col("b"))
            # no distinct here: small-star's groupBy+distinct below
            # re-canonicalizes, and skipping saves one exchange per round
        )
        # small-star: canonical small<-large direction; every smaller
        # neighbor (and u itself) hangs onto the minimum.
        dirn = ls.select(
            F.greatest("a", "b").alias("u"), F.least("a", "b").alias("v")
        )
        smins = dirn.groupBy("u").agg(F.min("v").alias("m"))
        ss = (
            dirn.join(smins, "u")
            .select(F.col("v").alias("a"), F.col("m").alias("b"))
            .unionAll(
                smins.select(F.col("u").alias("a"), F.col("m").alias("b"))
            )
            .where(F.col("a") != F.col("b"))
            .distinct()
            # lazy: the star-forest test below is the round's single
            # action and materializes the checkpoint in the same job
            # (r14 — was eager + a separate checksum job per round)
            .localCheckpoint(eager=False)
        )
        e = ss
        if _is_star_forest(ss):
            converged = True
            break
    if not converged:
        raise RuntimeError(
            "connected components (star contraction) did not converge in "
            f"{max_rounds} rounds — edge set is still not a star forest"
        )
    # Fixpoint edges form stars centered at each component's minimum:
    # every non-center vertex appears exactly once as `a` with its
    # center as `b`.
    return (
        vertices.join(
            e.select(F.col("a").alias("v"), F.col("b").alias("center")),
            "v",
            "left",
        )
        .select("v", F.coalesce("center", F.col("v")).alias("comp"))
    )


@query(
    "graph_connected_components",
    oracle=f"""
    WITH RECURSIVE e AS ({_EDGES_SQL}),
    bi AS (
        SELECT pa AS src, pb AS dst FROM e
        UNION ALL
        SELECT pb, pa FROM e
    ),
    reach AS (
        SELECT src AS v, dst AS r FROM bi
        UNION
        SELECT reach.v, bi.dst FROM reach JOIN bi ON reach.r = bi.src
    ),
    comp AS (
        SELECT p.p_partkey AS v,
               LEAST(p.p_partkey, COALESCE(MIN(r.r), p.p_partkey)) AS comp
        FROM part p LEFT JOIN reach r ON r.v = p.p_partkey
        GROUP BY p.p_partkey
    )
    SELECT comp AS component_id, COUNT(*) AS n_vertices,
           MIN(v) AS min_vertex, MAX(v) AS max_vertex
    FROM comp GROUP BY comp
    """,
)
def graph_connected_components(spark, sf_dir):
    """Connected components (reference flink-gelly
    .../library/ConnectedComponents.java — min-vertex-id label
    propagation to fixpoint; same labels). Vertices are ALL parts, so
    parts never co-purchased stay singleton components (the result is
    the giant co-purchase component plus the isolates). r6: executes via
    ``connected_components_star`` — large-star/small-star contraction,
    O(log n) rounds instead of the r5 min-label loop's O(diameter), so a
    deep path graph that exhausted the old 20-round cap now converges
    (pinned by tests/test_graph_star_cc.py). The oracle computes the
    same fixpoint with a recursive transitive-closure CTE.

    Edge build (r5): STAR CONTRACTION instead of the all-pairs
    co-purchase self-join — each part links to its order's MIN part,
    which preserves components exactly (every order's parts form a star)
    while replacing the |order|^2 pair blow-up (2.39M directed pairs at
    sf0.1) with <= one edge per lineitem before dedup (two orderkey
    shuffles, no self-join). Same trick the large-star/small-star CC
    algorithm uses to keep per-round edge volume linear at any scale."""
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    om = li.groupBy("l_orderkey").agg(F.min("l_partkey").alias("mp"))
    star = (
        li.join(om, "l_orderkey")
        .where(F.col("l_partkey") != F.col("mp"))
        .select(F.col("l_partkey").alias("pa"), F.col("mp").alias("pb"))
        .distinct()
    )
    vertices = t(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("v")
    )
    labels = connected_components_star(star, vertices)
    return labels.groupBy(F.col("comp").alias("component_id")).agg(
        F.count(F.lit(1)).alias("n_vertices"),
        F.min("v").alias("min_vertex"),
        F.max("v").alias("max_vertex"),
    )


@query(
    "graph_clustering_coefficient",
    oracle=f"""
    WITH edges AS ({_EDGES_SQL}),
    bi AS (
        SELECT pa AS src, pb AS dst FROM edges
        UNION ALL SELECT pb, pa FROM edges
    ),
    deg AS (SELECT src AS node, COUNT(*) AS degree FROM bi GROUP BY 1),
    tris AS (
        SELECT e1.pa AS a, e1.pb AS b, e2.pb AS c
        FROM edges e1
        JOIN edges e2 ON e2.pa = e1.pb
        JOIN edges e3 ON e3.pa = e1.pa AND e3.pb = e2.pb
    ),
    per_node AS (
        SELECT a AS node FROM tris
        UNION ALL SELECT b FROM tris
        UNION ALL SELECT c FROM tris
    ),
    tcount AS (SELECT node, COUNT(*) AS n_triangles FROM per_node GROUP BY 1)
    SELECT d.node, d.degree,
           COALESCE(t.n_triangles, 0) AS n_triangles,
           d.degree * (d.degree - 1) // 2 AS n_wedges
    FROM deg d LEFT JOIN tcount t ON t.node = d.node
    """,
)
def graph_clustering_coefficient(spark, sf_dir):
    """Local clustering coefficient (reference flink-gelly
    .../library/clustering/undirected/LocalClusteringCoefficient.java):
    per vertex, closed triangles vs possible wedges C(deg, 2). Emitted as
    the exact integer (triangles, wedges) pair — the coefficient is their
    ratio, and publishing numerator/denominator keeps the oracle
    bit-exact (the reference's result type also carries the counts and
    computes the ratio lazily). Reuses the oriented wedge-join triangle
    enumeration and the degree aggregate — no new join shapes; vertices
    in no triangle surface with 0 (left join from degrees)."""
    e = _edges(spark, sf_dir).localCheckpoint(eager=True)
    bi = _bidirected(e)
    deg = bi.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("degree")
    )
    e1, e2, e3 = e.alias("e1"), e.alias("e2"), e.alias("e3")
    tris = (
        e1.join(e2.hint("merge"), F.col("e2.pa") == F.col("e1.pb"))
        .join(
            e3.hint("merge"),
            (F.col("e3.pa") == F.col("e1.pa"))
            & (F.col("e3.pb") == F.col("e2.pb")),
        )
        .select(
            F.col("e1.pa").alias("a"),
            F.col("e1.pb").alias("b"),
            F.col("e2.pb").alias("c"),
        )
    )
    per_node = (
        tris.select(F.col("a").alias("node"))
        .unionAll(tris.select(F.col("b").alias("node")))
        .unionAll(tris.select(F.col("c").alias("node")))
    )
    tcount = per_node.groupBy("node").agg(
        F.count(F.lit(1)).alias("n_triangles")
    )
    return deg.join(tcount, "node", "left").select(
        "node",
        "degree",
        F.coalesce("n_triangles", F.lit(0)).alias("n_triangles"),
        (F.col("degree") * (F.col("degree") - 1) / 2)
        .cast("long")
        .alias("n_wedges"),
    )


@query(
    "graph_vertex_degrees",
    oracle=f"""
    WITH edges AS ({_EDGES_SQL}),
    outd AS (SELECT pa AS node, COUNT(*) AS out_degree FROM edges GROUP BY 1),
    ind AS (SELECT pb AS node, COUNT(*) AS in_degree FROM edges GROUP BY 1)
    SELECT COALESCE(o.node, i.node) AS node,
           COALESCE(o.out_degree, 0) AS out_degree,
           COALESCE(i.in_degree, 0) AS in_degree,
           COALESCE(o.out_degree, 0) + COALESCE(i.in_degree, 0) AS degree
    FROM outd o FULL JOIN ind i ON o.node = i.node
    """,
)
def graph_vertex_degrees(spark, sf_dir):
    """Vertex degree annotation (reference flink-gelly
    .../asm/degree/annotate/directed/VertexDegrees.java): in/out/total
    degree per vertex on the low->high oriented edge set. Two narrow
    aggregates + one full outer join on the vertex key."""
    # r8: one pass — each edge contributes (pa, out=1) and (pb, in=1) via
    # an explode, so the edge derivation runs ONCE instead of twice (the
    # full outer join of the two degree aggregates is the same grouped
    # sum over the exploded endpoint rows).
    e = _edges(spark, sf_dir)
    ex = e.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("pa").alias("node"),
                    F.lit(1).cast("long").alias("o"),
                    F.lit(0).cast("long").alias("i"),
                ),
                F.struct(
                    F.col("pb").alias("node"),
                    F.lit(0).cast("long").alias("o"),
                    F.lit(1).cast("long").alias("i"),
                ),
            )
        ).alias("x")
    ).select("x.*")
    return ex.groupBy("node").agg(
        F.sum("o").alias("out_degree"),
        F.sum("i").alias("in_degree"),
        (F.sum("o") + F.sum("i")).alias("degree"),
    )


_HITS_ROUNDS = 2
_HITS_SCALE = 1_000_000


def _hits_round_sql(k: int) -> str:
    """One HITS round as two CTEs (auth from hubs, hubs from auths),
    each max-normalized to integer micro-units via a scalar subquery."""
    return (
        f"a{k}r AS (SELECT e.pb AS node, SUM(h.h) AS raw"
        f" FROM edges e JOIN h{k - 1} h ON h.node = e.pa GROUP BY 1),"
        f" a{k} AS (SELECT node, raw * {_HITS_SCALE}"
        f" // (SELECT MAX(raw) FROM a{k}r) AS a FROM a{k}r),"
        f" h{k}r AS (SELECT e.pa AS node, SUM(a.a) AS raw"
        f" FROM edges e JOIN a{k} a ON a.node = e.pb GROUP BY 1),"
        f" h{k} AS (SELECT node, raw * {_HITS_SCALE}"
        f" // (SELECT MAX(raw) FROM h{k}r) AS h FROM h{k}r)"
    )


@query(
    "graph_hits",
    oracle=f"""
    WITH edges AS ({_EDGES_SQL}),
    nodes AS (SELECT DISTINCT pa AS node FROM edges
              UNION SELECT DISTINCT pb FROM edges),
    h0 AS (SELECT node, CAST({_HITS_SCALE} AS BIGINT) AS h FROM nodes),
    {", ".join(_hits_round_sql(k) for k in range(1, _HITS_ROUNDS + 1))}
    SELECT n.node,
           CAST(COALESCE(h.h, 0) AS BIGINT) AS hub_micros,
           CAST(COALESCE(a.a, 0) AS BIGINT) AS auth_micros
    FROM nodes n
    LEFT JOIN h{_HITS_ROUNDS} h ON h.node = n.node
    LEFT JOIN a{_HITS_ROUNDS} a ON a.node = n.node
    """,
)
def graph_hits(spark, sf_dir):
    """HITS hubs-and-authorities (reference flink-gelly
    .../library/linkanalysis/HITS.java — alternating hub/authority
    updates with per-step score normalization, fixed iteration count).
    The co-purchase edges are oriented pa < pb, giving a directed graph;
    each round is (1) authority = sum of hub scores over in-edges,
    (2) hub = sum of authority scores over out-edges — one SHUFFLE_HASH
    join + one sum-aggregate on the vertex key each, the same per-round
    shape (and 100 TB story) as graph_pagerank. Normalization divides by
    the global max (a SINGLE-ROW broadcast — the reference normalizes
    per step too) in integer micro-units with floor division, so both
    engines agree exactly. Nodes with no out-edges have hub 0; no
    in-edges, authority 0."""
    e = _edges(spark, sf_dir).localCheckpoint(eager=True)
    nodes = (
        e.selectExpr("pa AS node")
        .union(e.selectExpr("pb AS node"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    h = nodes.select("node", F.lit(_HITS_SCALE).cast("long").alias("h"))
    a = None
    for _ in range(_HITS_ROUNDS):
        araw = (
            e.alias("e")
            .join(
                h.alias("p").hint("shuffle_hash"),
                F.col("p.node") == F.col("e.pa"),
            )
            .groupBy(F.col("e.pb").alias("node"))
            .agg(F.sum("p.h").alias("raw"))
        )
        a = (
            araw.crossJoin(F.broadcast(araw.agg(F.max("raw").alias("mx"))))
            .select("node", F.expr(f"raw * {_HITS_SCALE} div mx").alias("a"))
            .localCheckpoint(eager=True)
        )
        hraw = (
            e.alias("e")
            .join(
                a.alias("q").hint("shuffle_hash"),
                F.col("q.node") == F.col("e.pb"),
            )
            .groupBy(F.col("e.pa").alias("node"))
            .agg(F.sum("q.a").alias("raw"))
        )
        h = (
            hraw.crossJoin(F.broadcast(hraw.agg(F.max("raw").alias("mx"))))
            .select("node", F.expr(f"raw * {_HITS_SCALE} div mx").alias("h"))
            .localCheckpoint(eager=True)
        )
    return (
        nodes.join(h, "node", "left")
        .join(a, "node", "left")
        .select(
            "node",
            F.coalesce("h", F.lit(0)).cast("long").alias("hub_micros"),
            F.coalesce("a", F.lit(0)).cast("long").alias("auth_micros"),
        )
    )
