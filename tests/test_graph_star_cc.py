"""Large-star/small-star connected components (VERDICT r5 item #5).

The r5 min-label loop was O(diameter) with a loud 20-round cap — a path
graph of diameter > 20 would fail it. Star contraction converges in
O(log n) rounds, so the SAME cap passes a 120-hop path. Also pins label
correctness on a multi-component graph against a NetworkX-free oracle
(union-find in plain Python)."""

from __future__ import annotations

import pytest

from apache_flink_spark.queries.graph_queries import (
    connected_components_star,
)


def _labels(spark, edges, n_vertices):
    e = spark.createDataFrame(edges, "pa long, pb long")
    v = spark.range(n_vertices).selectExpr("id AS v")
    out = connected_components_star(e, v)
    return {r.v: r.comp for r in out.collect()}


def test_deep_path_converges(spark):
    """120-vertex path (diameter 119): O(diameter) label propagation
    needs 119 rounds — star contraction must finish inside its 25-round
    cap and label every vertex with the path's minimum (0)."""
    n = 120
    edges = [(i, i + 1) for i in range(n - 1)]
    got = _labels(spark, edges, n)
    assert got == {v: 0 for v in range(n)}


def test_multi_component_and_isolates(spark):
    edges = [
        (1, 2), (2, 3),          # component {1,2,3}
        (10, 12), (12, 11),      # component {10,11,12}
        (20, 21),                # component {20,21}
    ]
    got = _labels(spark, edges, 25)

    # union-find oracle
    parent = list(range(25))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {v: find(v) for v in range(25)}
    assert got == want


def test_nonconvergence_is_loud(spark):
    edges = [(i, i + 1) for i in range(63)]
    e = spark.createDataFrame(edges, "pa long, pb long")
    v = spark.range(64).selectExpr("id AS v")
    with pytest.raises(RuntimeError, match="did not converge"):
        # max_rounds=1 cannot finish a 64-path — the cap must raise, not
        # silently return partial labels.
        connected_components_star(e, v, max_rounds=1).collect()
