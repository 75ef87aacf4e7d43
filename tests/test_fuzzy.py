"""Exact fuzzy (edit-distance) join — PassJoin segment blocking.

The operator claims LOSSLESS blocking: output identical to the
all-pairs theta join. These tests hold it to that against a pure-Python
Levenshtein brute force, across edge shapes (NULL/empty/short strings,
d=0) and a seeded randomized corpus, and pin the plan (no cartesian).
"""

from __future__ import annotations

import itertools
import random

import pytest
from pyspark.sql import functions as F

from deidentify_spark.operators.fuzzy import fuzzy_join, fuzzy_self_join


def _lev(a: str | None, b: str | None) -> int:
    a, b = a or "", b or ""
    dp = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        prev, dp[0] = dp[0], i
        for j, cb in enumerate(b, 1):
            cur = dp[j]
            dp[j] = min(dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb))
            prev = cur
    return dp[-1]


def _brute(data, d):
    return sorted(
        (i, j, _lev(x, y))
        for (i, x), (j, y) in itertools.combinations(data, 2)
        if _lev(x, y) <= d
    )


def _got(spark, data, d):
    df = spark.createDataFrame(data, "id int, name string")
    return sorted(
        (r.id_a, r.id_b, r.dist)
        for r in fuzzy_self_join(df, d, col="name", id_col="id").collect()
    )


def test_fuzzy_edge_shapes(spark):
    data = [
        (1, None),
        (2, ""),
        (3, "a"),
        (4, "ab"),
        (5, "abc"),
        (6, "abd"),
        (7, "xyz"),
        (8, "abcd"),
        (9, "b"),
        (10, "ba"),
    ]
    for d in (0, 1, 2, 3):
        assert _got(spark, data, d) == _brute(data, d), f"d={d}"


def test_fuzzy_randomized_vs_brute_force(spark):
    rng = random.Random(1234)
    # small alphabet + short strings => dense near-matches, including
    # length changes that cross segment-partition boundaries
    data = [
        (i, "".join(rng.choice("abc") for _ in range(rng.randint(0, 9))))
        for i in range(90)
    ]
    for d in (1, 2):
        assert _got(spark, data, d) == _brute(data, d), f"d={d}"


def test_fuzzy_two_table_and_null_semantics(spark):
    left = spark.createDataFrame(
        [(1, "kitten"), (2, None)], "lid int, a string"
    )
    right = spark.createDataFrame(
        [(10, "sitting"), (11, "kitten"), (12, "")], "rid int, b string"
    )
    got = sorted(
        (r.id_a, r.id_b, r.dist)
        for r in fuzzy_join(
            left, right, 3, left_col="a", right_col="b",
            left_id="lid", right_id="rid",
        ).collect()
    )
    # ed(kitten, sitting)=3; NULL compares as '' -> matches '' at 0
    assert got == [(1, 10, 3), (1, 11, 0), (2, 12, 0)]


def test_fuzzy_bucket_cap_drops_hot_keys(spark):
    # every name shares the hot template prefix; with an aggressive cap
    # the shared-segment buckets drop and recall is (deliberately) lost
    data = [(i, f"user#{i:04d}") for i in range(50)]
    df = spark.createDataFrame(data, "id int, name string")
    full = fuzzy_self_join(df, 2, col="name", id_col="id").count()
    capped = fuzzy_self_join(
        df, 2, col="name", id_col="id", max_bucket_size=5
    ).count()
    assert full == len(_brute(data, 2))
    assert capped < full


def test_fuzzy_block_cols_equal_blocked_brute_force(spark):
    # pre-block on an exact key: result == brute-force pairs restricted
    # to equal (non-NULL) block keys; a NULL block key matches nothing
    rng = random.Random(7)
    blocks = ["b1", "b2", None]
    data = [
        (i, rng.choice(["abcde", "abcdx", "abxde", "zzzzz"]), rng.choice(blocks))
        for i in range(40)
    ]
    df = spark.createDataFrame(data, "id int, name string, grp string")
    got = sorted(
        (r.id_a, r.id_b, r.dist)
        for r in fuzzy_self_join(
            df, 2, col="name", id_col="id", block_cols=["grp"]
        ).collect()
    )
    want = sorted(
        (i, j, _lev(x, y))
        for (i, x, gi), (j, y, gj) in itertools.combinations(data, 2)
        if gi is not None and gi == gj and _lev(x, y) <= 2
    )
    assert got == want


def test_fuzzy_plan_has_no_cartesian(spark):
    df = spark.createDataFrame([(1, "abc"), (2, "abd")], "id int, name string")
    plan = fuzzy_self_join(df, 2, col="name", id_col="id")._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_fuzzy_rejects_negative_distance(spark):
    df = spark.createDataFrame([(1, "a")], "id int, name string")
    with pytest.raises(ValueError):
        fuzzy_self_join(df, -1, col="name", id_col="id")


def test_pmi_collocations_small_corpus(spark):
    from deidentify_spark.operators.vocab import pmi_collocations

    # "new york" always adjacent; "the" ubiquitous -> PMI(new, york)
    # must top the list and carry the exact closed-form value
    docs = spark.createDataFrame(
        [
            (1, "the new york times the story"),
            (2, "the new york subway the map"),
            (3, "the story the map the times"),
        ],
        "doc_id int, text string",
    )
    rows = pmi_collocations(docs, min_count=2, k=10).collect()
    assert rows[0].w1 == "new" and rows[0].w2 == "york"
    import math

    # counts: c(new,york)=2, B=15 bigram tokens, c(new)=c(york)=2, U=18
    want = round(math.log((2 / 15) / ((2 / 18) * (2 / 18))), 4)
    assert rows[0].pmi == pytest.approx(want, abs=1e-9)
    # min_count suppresses hapax pairs
    assert all(r.n >= 2 for r in rows)
