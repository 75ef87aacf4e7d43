"""Distributed Lloyd's k-means over an embedding column — the corpus
curation clustering primitive (SemDeDup / density-based pruning both
start from exactly this: cluster the embedding space, then act on
cluster structure). `operators/dedup.py`'s semantic-dedup and
`similarity.py`'s IVF index both *sample* centroids driver-side; this
operator runs the full Lloyd's loop DISTRIBUTED, so the centroids are
exact functions of the whole corpus, not of a sample.

No reference counterpart (aliengiraffe/deidentify is a PII scrubber);
§2.G training-data-pipeline surface.

Scale posture
-------------
* assignment is a map-only vectorized Arrow stage: the k×d centroid
  matrix (bounded — k ≤ 10^4, d ≤ 10^3) broadcasts into a pandas UDF
  that computes a batched argmin; no join, no shuffle, no per-row
  Python;
* the update step is posexplode(embedding) → groupBy(cluster, dim)
  avg — map-side combined, k×d output rows collected to the driver
  per iteration (the same bounded O(k·d) driver action as
  similarity.ivf_centroids, documented there);
* per-iteration cost is one corpus pass; lineage does not grow with
  iterations because each pass reads the SAME persisted input — only
  the broadcast centroid matrix changes;
* empty clusters keep their previous centroid (mirrored in the SQL
  twin via LEFT JOIN + COALESCE), so k is stable across iterations.

Determinism / oracle parity: init is the k lowest-id vectors; argmin
ties break on the lowest cluster id; all arithmetic is float64 (the
float32 → float64 upcast is exact in both engines). Cross-engine
float-sum associativity noise is ~1e-13 relative; the registered
query rounds inertia at 4 decimals, ~9 orders above it.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    StructField,
    StructType,
)

__all__ = ["kmeans_assign", "kmeans_cluster_stats", "kmeans_oracle_sql"]


def _assign_udf(centroids: np.ndarray):
    """Vectorized (cluster, d2) assignment against a broadcast k×d
    float64 centroid matrix. Distances are computed per-centroid as
    ((X - c)**2).sum(axis=1) — the same left-to-right per-dimension
    accumulation order the SQL twin's list_distance uses, so the two
    engines agree far below the rounding step."""
    C = np.asarray(centroids, dtype=np.float64)

    @F.pandas_udf(
        StructType(
            [
                StructField("cluster", IntegerType()),
                StructField("d2", DoubleType()),
            ]
        )
    )
    def assign(vecs: pd.Series) -> pd.DataFrame:
        X = np.stack(vecs.to_numpy()).astype(np.float64)
        d2 = np.empty((X.shape[0], C.shape[0]), dtype=np.float64)
        for j in range(C.shape[0]):
            d2[:, j] = ((X - C[j]) ** 2).sum(axis=1)
        cid = d2.argmin(axis=1)  # np.argmin: first (lowest) index on ties
        return pd.DataFrame(
            {
                "cluster": cid.astype(np.int32),
                "d2": d2[np.arange(X.shape[0]), cid],
            }
        )

    return assign


def _fit_centroids(
    emb: DataFrame, k: int, n_iter: int, id_col: str, vec_col: str
) -> np.ndarray:
    """Lloyd's loop; returns the k×d float64 centroid matrix after
    ``n_iter`` exact distributed updates."""
    init_rows = (
        emb.select(id_col, vec_col).orderBy(id_col).limit(k).collect()
    )
    C = np.asarray([r[vec_col] for r in init_rows], dtype=np.float64)
    for _ in range(n_iter):
        assigned = emb.select(
            _assign_udf(C)(F.col(vec_col)).getField("cluster").alias(
                "cluster"
            ),
            F.posexplode(vec_col).alias("dim", "val"),
        )
        means = (
            assigned.groupBy("cluster", "dim")
            .agg(F.avg(F.col("val").cast("double")).alias("m"))
            .collect()
        )
        newC = C.copy()  # empty clusters keep their previous centroid
        for row in means:
            newC[row["cluster"], row["dim"]] = row["m"]
        C = newC
    return C


def kmeans_assign(
    emb: DataFrame,
    k: int = 8,
    n_iter: int = 3,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All input columns plus ``cluster`` (0..k-1) and ``d2`` (squared
    euclidean distance to the final centroid). ``n_iter`` exact Lloyd's
    updates from the k lowest-``id_col`` init, then one final
    assignment pass."""
    from deidentify_spark.runtime import tracked_persist

    if not (emb.storageLevel.useMemory or emb.storageLevel.useDisk):
        emb = tracked_persist(emb)  # read n_iter+2 times
    C = _fit_centroids(emb, k, n_iter, id_col, vec_col)
    return (
        emb.withColumn("_a", _assign_udf(C)(F.col(vec_col)))
        .withColumn("cluster", F.col("_a.cluster"))
        .withColumn("d2", F.col("_a.d2"))
        .drop("_a")
    )


def kmeans_cluster_stats(
    emb: DataFrame,
    k: int = 8,
    n_iter: int = 3,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-cluster summary of the final assignment:
    (cluster, n, inertia) with inertia = Σ d2 rounded to 4."""
    return (
        kmeans_assign(emb, k, n_iter, id_col=id_col, vec_col=vec_col)
        .groupBy("cluster")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("d2"), 4).alias("inertia"),
        )
        .orderBy("cluster")
    )


def kmeans_oracle_sql(
    table: str,
    k: int = 8,
    n_iter: int = 3,
    dim: int = 64,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """DuckDB twin of ``kmeans_cluster_stats``: the ENTIRE Lloyd's loop
    unrolled into CTE stages — init from the k lowest ids, per-iteration
    argmin assignment (ROW_NUMBER over (distance, cid) — same
    lowest-cid tie-break as np.argmin) and per-dimension AVG update
    with LEFT JOIN + COALESCE for empty clusters, then the final
    assignment and per-cluster Σd² (list_distance² == the Spark side's
    Σ(x-c)² up to ~1e-16 relative, 12 orders below the ROUND)."""
    avg_list = ", ".join(f"AVG(v[{i + 1}])" for i in range(dim))
    parts = [
        f"WITH e AS (SELECT {id_col} AS vid, CAST({vec_col} AS DOUBLE[]) AS v"
        f" FROM {table})",
        f"c0 AS (SELECT CAST(ROW_NUMBER() OVER (ORDER BY vid) - 1 AS INT)"
        f" AS cid, v FROM (SELECT vid, v FROM e ORDER BY vid LIMIT {k}))",
    ]
    for i in range(1, n_iter + 1):
        prev = f"c{i - 1}"
        parts.append(
            f"a{i} AS (SELECT vid, v, cid FROM ("
            f" SELECT e.vid, e.v, c.cid,"
            f" ROW_NUMBER() OVER (PARTITION BY e.vid"
            f" ORDER BY list_distance(e.v, c.v), c.cid) AS rn"
            f" FROM e CROSS JOIN {prev} c) WHERE rn = 1)"
        )
        parts.append(
            f"m{i} AS (SELECT cid, [{avg_list}] AS v FROM a{i} GROUP BY cid)"
        )
        parts.append(
            f"c{i} AS (SELECT {prev}.cid, COALESCE(m{i}.v, {prev}.v) AS v"
            f" FROM {prev} LEFT JOIN m{i} USING (cid))"
        )
    parts.append(
        f"fin AS (SELECT vid, cid, dist FROM ("
        f" SELECT e.vid, c.cid, list_distance(e.v, c.v) AS dist,"
        f" ROW_NUMBER() OVER (PARTITION BY e.vid"
        f" ORDER BY list_distance(e.v, c.v), c.cid) AS rn"
        f" FROM e CROSS JOIN c{n_iter} c) WHERE rn = 1)"
    )
    return (
        ",\n".join(parts)
        + """
    SELECT cid AS cluster, COUNT(*) AS n,
           ROUND(SUM(dist * dist), 4) AS inertia
    FROM fin GROUP BY cid ORDER BY cluster
    """
    )
