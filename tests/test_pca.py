"""Distributed spectral operators (operators/pca.py).

Two distinct claims are certified separately, because the synthetic
embeddings table is nearly isotropic (λ1/λ2 ≈ 1.07 measured), where
power iteration's (λ2/λ1)^T rate needs ~64 steps:

* ITERATE parity — the fixed-T distributed iterate equals a
  step-for-step numpy reference on the real table (this is what the
  DuckDB oracle certifies cross-engine);
* CONVERGENCE — on a deliberately gapped input, 8 steps land on
  numpy's exact top eigenvector/eigenvalue;
* the one-pass ``covariance_matrix`` is exact vs numpy, and driver
  eigh of it recovers the true top PC with NO iteration count at all.
"""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from deidentify_spark.operators.pca import (
    covariance_matrix,
    power_iteration_top_pc,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").persist()


@pytest.fixture(scope="module")
def X(emb):
    rows = emb.select("embedding").collect()
    return np.stack([np.asarray(r.embedding, dtype=np.float64) for r in rows])


def ref_power_iteration(X, n_iter):
    """Step-for-step numpy reference with the operator's conventions:
    center, uniform init, T un-normalized-then-normalized steps,
    eigval = ‖s_T‖/n."""
    Xc = X - X.mean(axis=0)
    d = X.shape[1]
    v = np.ones(d) / math.sqrt(d)
    for _ in range(n_iter):
        s = Xc.T @ (Xc @ v)
        v = s / np.linalg.norm(s)
    return v, float(np.linalg.norm(s)) / X.shape[0]


def test_iterate_matches_numpy_reference(spark, emb, X):
    got = power_iteration_top_pc(emb, n_iter=8, dim=64).collect()
    v = np.array([r.loading for r in sorted(got, key=lambda r: r.dim)])
    rv, rl = ref_power_iteration(X, 8)
    assert np.allclose(v, rv, atol=1e-9)
    assert got[0].eigval == pytest.approx(rl, rel=1e-9)
    assert float(np.linalg.norm(v)) == pytest.approx(1.0, abs=1e-9)


def test_converges_on_gapped_spectrum(spark, emb, X):
    """Stretch dimension 7 of the real embeddings 5x -> clear spectral
    gap; 8 iterations must land on numpy eigh's top eigenpair."""
    stretched = emb.select(
        F.array(
            *[
                (F.element_at("embedding", i + 1) * (5.0 if i == 7 else 1.0))
                .cast("float")
                for i in range(64)
            ]
        ).alias("embedding")
    )
    got = power_iteration_top_pc(stretched, n_iter=8, dim=64).collect()
    v = np.array([r.loading for r in sorted(got, key=lambda r: r.dim)])
    Xs = X.copy()
    Xs[:, 7] *= 5.0
    Xc = Xs - Xs.mean(axis=0)
    C = (Xc.T @ Xc) / Xs.shape[0]
    w, V = np.linalg.eigh(C)
    assert abs(float(np.dot(v, V[:, -1]))) >= 0.9999
    assert got[0].eigval == pytest.approx(w[-1], rel=1e-4)


def test_covariance_exact_and_eigh_recovers_top_pc(spark, emb, X):
    rows = covariance_matrix(emb, dim=64).collect()
    C = np.zeros((64, 64))
    for r in rows:
        C[r.i, r.j] = C[r.j, r.i] = r.cov
    Xc = X - X.mean(axis=0)
    Cref = (Xc.T @ Xc) / X.shape[0]
    assert np.allclose(C, Cref, atol=1e-9)
    # the one-pass route: driver eigh of the bounded distributed output
    w, V = np.linalg.eigh(C)
    wr, Vr = np.linalg.eigh(Cref)
    assert w[-1] == pytest.approx(wr[-1], rel=1e-9)
    assert abs(float(np.dot(V[:, -1], Vr[:, -1]))) >= 0.999999


def test_deterministic_across_partitioning(spark, emb):
    a = power_iteration_top_pc(emb, n_iter=4, dim=64, round_to=6).collect()
    b = power_iteration_top_pc(
        emb.repartition(13), n_iter=4, dim=64, round_to=6
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_plan_has_no_explode(spark, emb):
    """The per-iteration d-sum aggregate is d codegen SUM exprs over
    element_at — no Generate (posexplode) node may appear."""
    centered = emb.select(
        F.array(
            *[
                F.element_at(F.col("embedding"), i + 1).cast("double")
                for i in range(64)
            ]
        ).alias("_cv")
    )
    agg = centered.agg(
        *[
            F.sum(F.element_at(F.col("_cv"), i + 1)).alias(f"s{i}")
            for i in range(64)
        ]
    )
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Generate" not in plan, plan
