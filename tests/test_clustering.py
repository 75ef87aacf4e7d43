"""Distributed Lloyd's k-means (operators/clustering.py): numpy
reference parity, DuckDB unrolled-SQL twin parity on the real
embeddings table, empty-cluster handling, and plan shape."""

import numpy as np
import pandas as pd
import pytest

from deidentify_spark.operators.clustering import (
    kmeans_assign,
    kmeans_cluster_stats,
    kmeans_oracle_sql,
)

SF_DIR = "/root/testdata/sf0.001"


def ref_kmeans(X, k, n_iter):
    """Plain-numpy Lloyd's with the operator's exact conventions:
    init = first k rows (caller pre-sorts by id), lowest-index argmin
    tie-break, empty clusters keep their previous centroid."""
    X = X.astype(np.float64)
    C = X[:k].copy()
    for _ in range(n_iter + 1):
        d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        a = d2.argmin(axis=1)
        if _ == n_iter:
            break
        newC = C.copy()
        for j in range(k):
            if (a == j).any():
                newC[j] = X[a == j].mean(axis=0)
        C = newC
    return a, d2[np.arange(len(X)), a]


@pytest.fixture()
def small_emb(spark):
    rng = np.random.default_rng(7)
    X = rng.normal(size=(40, 6)).astype(np.float32)
    rows = [(i, X[i].tolist()) for i in range(40)]
    return X, spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_kmeans_matches_numpy_reference(small_emb):
    X, emb = small_emb
    a_ref, d2_ref = ref_kmeans(X, k=4, n_iter=3)
    out = {
        r["vec_id"]: (r["cluster"], r["d2"])
        for r in kmeans_assign(emb, k=4, n_iter=3).collect()
    }
    for i in range(40):
        assert out[i][0] == a_ref[i]
        assert out[i][1] == pytest.approx(d2_ref[i], rel=1e-9)


def test_kmeans_empty_cluster_keeps_previous_centroid(spark):
    # two far groups, k=3 with the first three ids all in group one:
    # at least one init centroid ends up empty after the first assign
    rows = [(i, [0.0 + i * 0.01, 0.0]) for i in range(3)] + [
        (10 + i, [100.0 + i * 0.01, 0.0]) for i in range(3)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    X = np.array([r[1] for r in sorted(rows)], dtype=np.float64)
    a_ref, d2_ref = ref_kmeans(X, k=3, n_iter=2)
    got = {
        r["vec_id"]: r["cluster"]
        for r in kmeans_assign(emb, k=3, n_iter=2).collect()
    }
    ids = [r[0] for r in sorted(rows)]
    assert [got[i] for i in ids] == list(a_ref)


def test_kmeans_duckdb_twin_on_embeddings(spark):
    import duckdb

    stats = kmeans_cluster_stats(
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet"), k=8, n_iter=3
    ).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS "
        f"SELECT * FROM '{SF_DIR}/embeddings.parquet'"
    )
    o = con.execute(kmeans_oracle_sql("embeddings", 8, 3, 64)).df()
    cols = sorted(stats.columns)
    pd.testing.assert_frame_equal(
        stats[cols].sort_values("cluster").reset_index(drop=True),
        o[cols].sort_values("cluster").reset_index(drop=True),
        check_dtype=False,
    )
    # every vector lands somewhere and clusters are non-trivial
    assert stats["n"].sum() == 500
    assert len(stats) > 1


def test_kmeans_assign_final_pass_is_map_only(small_emb):
    """After the fit, the final assignment must be one Arrow projection
    over the persisted input: no Exchange, no Join in its plan."""
    _, emb = small_emb
    plan = (
        kmeans_assign(emb, k=4, n_iter=1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "Join" not in plan
