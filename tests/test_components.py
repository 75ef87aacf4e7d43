"""Connected-components / fuzzy-dedup clustering (operators/components.py).

Ground truth is a pure-Python union-find; the Spark alternating-star
result must match it on random graphs, adversarial shapes (paths = worst
case for naive label propagation, stars, disjoint cliques), and messy
inputs (reversed duplicates, self-loops)."""

import random

import pytest
from pyspark.sql import functions as F

from deidentify_spark.operators.components import (
    connected_components,
    dedup_clusters,
    fuzzy_dedup_keep,
)


def _uf_components(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # path-compress to final roots
    return {n: find(n) for n in parent}


def _spark_components(spark, edges, **kw):
    df = spark.createDataFrame(edges, "doc_a: long, doc_b: long")
    out = connected_components(df, **kw).collect()
    return {r["node"]: r["component"] for r in out}


def test_random_graphs_match_union_find(spark):
    rng = random.Random(0xC0C0)
    for trial in range(6):
        n = rng.randrange(5, 120)
        m = rng.randrange(1, 3 * n)
        edges = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(m)
        ]
        want = _uf_components([e for e in edges if e[0] != e[1]])
        got = _spark_components(spark, edges)
        assert got == want, f"trial {trial}: n={n} m={m}"


def test_path_graph_converges_fast(spark):
    # a 64-node path needs 64 rounds under naive min-label propagation;
    # alternating stars must close it well inside 12.
    edges = [(i, i + 1) for i in range(63)]
    got = _spark_components(spark, edges, max_iter=12)
    assert got == {i: 0 for i in range(64)}


def test_messy_input_selfloops_reversed_dups(spark):
    edges = [(1, 2), (2, 1), (2, 2), (1, 2), (5, 5), (7, 8), (8, 9)]
    got = _spark_components(spark, edges)
    # (5,5) is a pure self-loop: node 5 has no real edge, so it is a
    # singleton and does not appear in the mapping at all
    assert got == {1: 1, 2: 1, 7: 7, 8: 7, 9: 7}


def test_empty_pairs(spark):
    df = spark.createDataFrame([], "doc_a: long, doc_b: long")
    assert connected_components(df).count() == 0


def test_determinism(spark):
    edges = [(i, (i * 7) % 40) for i in range(40)]
    a = _spark_components(spark, edges)
    b = _spark_components(spark, edges)
    assert a == b


def test_dedup_clusters_counts(spark):
    # two cliques {0,1,2} and {10,11}, plus chain {20,21,22,23}
    edges = [(0, 1), (1, 2), (0, 2), (10, 11), (20, 21), (21, 22), (22, 23)]
    df = spark.createDataFrame(edges, "doc_a: long, doc_b: long")
    rows = {
        r["component"]: (r["n_docs"], r["n_dropped"])
        for r in dedup_clusters(df).collect()
    }
    assert rows == {0: (3, 2), 10: (2, 1), 20: (4, 3)}


def test_fuzzy_dedup_keep(spark):
    docs = spark.createDataFrame(
        [(i, f"d{i}") for i in range(8)], "doc_id: long, text: string"
    )
    pairs = spark.createDataFrame(
        [(0, 3), (3, 5), (6, 7)], "doc_a: long, doc_b: long"
    )
    kept = sorted(
        r["doc_id"] for r in fuzzy_dedup_keep(docs, pairs).collect()
    )
    # cluster {0,3,5} keeps 0; cluster {6,7} keeps 6; 1,2,4 untouched
    assert kept == [0, 1, 2, 4, 6]


def test_no_cartesian_in_star_rounds(spark):
    from deidentify_spark.operators.components import _large_star, _small_star

    df = spark.createDataFrame(
        [(3, 1), (5, 1), (9, 2)], "src: long, dst: long"
    )
    for stage in (_large_star(df), _small_star(df)):
        plan = stage._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


def test_keep_best_per_cluster(spark):
    from deidentify_spark.operators.components import keep_best_per_cluster

    docs = spark.createDataFrame(
        [(0, 10), (1, 99), (2, 7), (3, 40), (4, 5), (5, 40), (6, 1), (7, 2)],
        "doc_id: long, score: long",
    )
    pairs = spark.createDataFrame(
        [(0, 3), (3, 5), (6, 7)], "doc_a: long, doc_b: long"
    )
    kept = sorted(
        r["doc_id"]
        for r in keep_best_per_cluster(docs, pairs, "score").collect()
    )
    # cluster {0,3,5}: scores 10/40/40 -> tie at 40 keeps min id 3;
    # cluster {6,7}: scores 1/2 -> keeps 7; 1,2,4 untouched
    assert kept == [1, 2, 3, 4, 7]


def test_keep_best_matches_python_reference(spark):
    from deidentify_spark.operators.components import keep_best_per_cluster

    rng = random.Random(13)
    n = 60
    scores = {i: rng.randint(0, 5) for i in range(n)}
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(40)]
    edges = [(a, b) for a, b in edges if a != b]
    docs = spark.createDataFrame(
        [(i, scores[i]) for i in range(n)], "doc_id: long, score: long"
    )
    pairs = spark.createDataFrame(edges, "doc_a: long, doc_b: long")
    got = sorted(
        r["doc_id"]
        for r in keep_best_per_cluster(docs, pairs, "score").collect()
    )
    comp = _uf_components(edges)
    clusters = {}
    for node, c in comp.items():
        clusters.setdefault(c, []).append(node)
    dropped = set()
    for members in clusters.values():
        best = max(members, key=lambda i: (scores[i], -i))
        dropped.update(m for m in members if m != best)
    want = sorted(i for i in range(n) if i not in dropped)
    assert got == want
