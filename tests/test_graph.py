"""PageRank (operators/graph.py): closed-form fixtures, invariants, and
the plan shapes the 100-TB posture depends on."""

import math

import pytest
from pyspark.sql import functions as F

from deidentify_spark.operators.graph import pagerank, pagerank_oracle_sql


def _ranks(df):
    return {r["node"]: r["rank"] for r in df.collect()}


def test_two_node_cycle_is_uniform(spark):
    """A symmetric 2-cycle has the uniform stationary distribution at
    every iteration, so even a 1-iteration run is exact."""
    edges = spark.createDataFrame([(1, 2), (2, 1)], ["src", "dst"])
    r = _ranks(pagerank(edges, n_iter=1))
    assert r[1] == pytest.approx(0.5) and r[2] == pytest.approx(0.5)


def test_star_matches_hand_iteration(spark):
    """3 leaves -> 1 hub, hub -> leaf 2 (so no dangling). Compare one
    power-iteration step against the hand-computed update."""
    edges = spark.createDataFrame(
        [(1, 0), (2, 0), (3, 0), (0, 2)], ["src", "dst"]
    )
    r = _ranks(pagerank(edges, n_iter=1))
    n, d = 4, 0.85
    base = (1 - d) / n
    # r0 = 1/4 everywhere; hub gets the three leaves' full mass,
    # leaf 2 gets the hub's full mass, leaves 1/3 get teleport only.
    assert r[0] == pytest.approx(base + d * 3 * 0.25)
    assert r[2] == pytest.approx(base + d * 0.25)
    assert r[1] == pytest.approx(base)
    assert r[3] == pytest.approx(base)


def test_dangling_mass_redistributed_rank_sums_to_one(spark):
    """Node 3 has no out-edges; its rank must be folded back uniformly,
    keeping the rank vector a probability distribution each round."""
    edges = spark.createDataFrame([(1, 2), (2, 3), (1, 3)], ["src", "dst"])
    for n_iter in (1, 3):
        r = _ranks(pagerank(edges, n_iter=n_iter))
        assert sum(r.values()) == pytest.approx(1.0, abs=1e-12)
    # dangling sink accumulates the most rank
    r = _ranks(pagerank(edges, n_iter=4))
    assert r[3] == max(r.values())


def test_weighted_edges_shift_rank(spark):
    """1 -> {2 (w=9), 3 (w=1)}: node 2 must end above node 3, and the
    split of node 1's transported mass must be exactly 9:1."""
    edges = spark.createDataFrame(
        [(1, 2, 9.0), (1, 3, 1.0), (2, 1, 1.0), (3, 1, 1.0)],
        ["src", "dst", "w"],
    )
    r = _ranks(pagerank(edges, weight="w", n_iter=1))
    base = 0.15 / 3
    transported2 = r[2] - base
    transported3 = r[3] - base
    assert transported2 == pytest.approx(9 * transported3)


def test_duplicate_edges_sum_like_weights(spark):
    """(1,2) listed twice must equal a single (1,2) edge of weight 2."""
    dup = spark.createDataFrame(
        [(1, 2), (1, 2), (1, 3), (2, 1), (3, 1)], ["src", "dst"]
    )
    wtd = spark.createDataFrame(
        [(1, 2, 2.0), (1, 3, 1.0), (2, 1, 1.0), (3, 1, 1.0)],
        ["src", "dst", "w"],
    )
    r_dup = _ranks(pagerank(dup, n_iter=3))
    r_wtd = _ranks(pagerank(wtd, weight="w", n_iter=3))
    for k in r_dup:
        assert r_dup[k] == pytest.approx(r_wtd[k], abs=1e-12)


def test_converges_toward_power_iteration_fixed_point(spark):
    """More iterations approach the numpy fixed point on a small random
    graph (deterministic edge list)."""
    import numpy as np

    edges_py = [(i, (i * 7 + 3) % 11) for i in range(11)] + [
        (i, (i * 5 + 1) % 11) for i in range(11)
    ]
    edges_py = [(a, b) for a, b in edges_py if a != b]
    edges = spark.createDataFrame(edges_py, ["src", "dst"])
    n = 11
    m = np.zeros((n, n))
    from collections import Counter

    w = Counter(edges_py)
    outw = Counter()
    for (a, b), c in w.items():
        outw[a] += c
    for (a, b), c in w.items():
        m[b, a] = c / outw[a]
    r = np.full(n, 1.0 / n)
    for _ in range(8):
        r = 0.15 / n + 0.85 * (m @ r)
    got = _ranks(pagerank(edges, n_iter=8))
    for i in range(n):
        assert got[i] == pytest.approx(r[i], abs=1e-9)


def test_oracle_sql_matches_spark(spark):
    """The unrolled DuckDB CTE twin reproduces the Spark ranks on an
    asymmetric weighted graph with a dangling node."""
    import duckdb

    edges_py = [
        (1, 2, 3.0), (1, 3, 1.0), (2, 3, 2.0), (3, 4, 1.0), (2, 4, 5.0)
    ]  # node 4 dangles
    edges = spark.createDataFrame(edges_py, ["src", "dst", "w"])
    got = _ranks(pagerank(edges, weight="w", n_iter=4))
    con = duckdb.connect()
    vals = ", ".join(f"({a}, {b}, {w})" for a, b, w in edges_py)
    sql = pagerank_oracle_sql(
        f"SELECT * FROM (VALUES {vals}) AS t(src, dst, w)", n_iter=4
    )
    for node, rank in con.execute(sql).fetchall():
        assert got[node] == pytest.approx(rank, abs=1e-12)


def test_plan_no_cartesian_and_rank_vector_stays_distributed(spark):
    """The iteration must be equi-joins only: the lone nested-loop join
    is the 1-row broadcast dangling-mass scalar. No CartesianProduct."""
    edges = spark.createDataFrame(
        [(i % 50, (i * 13 + 7) % 50) for i in range(400)], ["src", "dst"]
    )
    df = pagerank(edges, n_iter=2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    # The only nested-loop joins are the 1-row dangling-mass scalars,
    # and they are all broadcast (the plan STRING repeats shared
    # subtrees — ranks feeds both dmass and contrib — so the count is
    # bounded by occurrences, not asserted exactly).
    import re

    for m in re.finditer(r"BroadcastNestedLoopJoin (\w+)", plan):
        assert m.group(1) in ("BuildLeft", "BuildRight")
