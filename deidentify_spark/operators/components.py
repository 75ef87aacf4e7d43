"""Connected components over near-dup candidate pairs — the clustering
step a fuzzy-dedup pipeline needs between "candidate pairs" and "keep
one document per duplicate cluster".

`minhash_lsh_candidates` / `ngram_jaccard_pairs` / the embedding pair
miners emit edges (doc_a, doc_b); transitive closure over those edges is
what defines a duplicate CLUSTER (a~b and b~c means a,b,c are one
group even if (a,c) was never emitted).  At 10^12 documents the closure
cannot be computed driver-side — this module implements the alternating
large-star / small-star algorithm (Kiveris et al., "Connected Components
in MapReduce and Beyond", SoCC 2014) as pure DataFrame rounds:

* each round is two groupBy-min + equi-join passes over the edge set —
  no cartesian products, no collect of the graph to the driver;
* converges in O(log^2 n) rounds (in practice <10 even for path graphs;
  near-dup clusters are almost always stars already, converging in 1-2);
* every round strictly shrinks edge count toward a star forest
  (node -> component-min), so shuffle volume decreases monotonically;
* lineage is cut per round with localCheckpoint — an iterative join
  otherwise compounds the plan exponentially.  On a real cluster prefer
  `spark.sparkContext.setCheckpointDir` + `.checkpoint()` for fault
  tolerance; localCheckpoint keeps the sandbox dependency-free.

The driver-visible query `dedup_cc_clusters_documents` runs it over the
registered minhash-LSH candidate pairs and is oracle-checked against a
DuckDB recursive-CTE closure of the identical pair SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _canonical(edges: DataFrame) -> DataFrame:
    """Orient every edge (big, small), drop self-loops, dedupe."""
    big = F.greatest(F.col("src"), F.col("dst"))
    small = F.least(F.col("src"), F.col("dst"))
    return (
        edges.select(big.alias("src"), small.alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )


def _large_star(edges: DataFrame) -> DataFrame:
    """(v, min(N(u) u {u})) for every neighbor v > u.

    Works on the symmetric view so every node's full neighborhood is
    visible; emitted edges keep the (big, small) orientation because
    m <= u < v by construction.

    No trailing distinct (round-7): duplicate (v, m) rows — bounded by
    one per original edge, never a blowup — are absorbed by
    ``_small_star``'s min-aggregate and its own final distinct, so the
    per-round edge SET (what the fixpoint test hashes) is identical
    while each round runs one exchange fewer.
    """
    sym = edges.union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    mins = sym.groupBy("src").agg(F.min("dst").alias("_mn"))
    mins = mins.select(
        "src", F.least(F.col("src"), F.col("_mn")).alias("_m")
    )
    return (
        sym.join(mins, "src")
        .where(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("_m").alias("dst"))
        .where(F.col("src") != F.col("dst"))
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Rewire every node's smaller-neighbor set to its minimum.

    Input is (big, small)-oriented, so grouping by src sees exactly the
    smaller neighbors N-(u); emit (v, m) for v in N-(u) and (u, m).
    """
    mins = edges.groupBy("src").agg(F.min("dst").alias("_m"))
    rewired = (
        edges.join(mins, "src")
        .select(F.col("dst").alias("src"), F.col("_m").alias("dst"))
        .union(mins.select("src", F.col("_m").alias("dst")))
    )
    return rewired.where(F.col("src") != F.col("dst")).distinct()


def _fingerprint(edges: DataFrame) -> tuple[int, int]:
    """(count, order-independent xor-hash) of the edge set — an exact
    set-equality probe in one tiny aggregate (no sort, no collect)."""
    row = edges.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.expr("bit_xor(xxhash64(src, dst))"), F.lit(0)).alias("h"),
    ).head()
    return int(row["n"]), int(row["h"])


def _ckpt_with_fingerprint(edges: DataFrame) -> tuple[DataFrame, tuple[int, int]]:
    """Eagerly localCheckpoint ``edges`` with the set fingerprint riding
    the SAME job as a CollectMetrics (observe) node — the round's
    convergence probe costs zero extra actions (round-7; previously
    every round paid a second full pass for the fingerprint
    aggregate)."""
    from pyspark.sql import Observation

    obs = Observation()
    observed = edges.observe(
        obs,
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.expr("bit_xor(xxhash64(src, dst))"), F.lit(0)).alias("h"),
    )
    out = observed.localCheckpoint(eager=True)
    try:
        m = obs.get
        return out, (int(m["n"]), int(m["h"]))
    except Exception:
        # AQE's empty-relation propagation can drop the CollectMetrics
        # node when the edge set is globally empty (same caveat as
        # minhash_lsh_candidates' cap metrics) — fall back to one tiny
        # aggregate over the already-checkpointed (empty) set
        return out, _fingerprint(out)


def connected_components(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 25,
) -> DataFrame:
    """(node, component) for every node in `pairs`; component = the
    minimum node id reachable from it.  Alternating large-star /
    small-star until the edge set reaches a fixpoint (a star forest).

    max_iter bounds the O(log^2 n) convergence — 25 rounds covers any
    graph that fits in 2^60 ids many times over; hitting it means a bug,
    so it raises rather than returning a partial closure.
    """
    edges, fp = _ckpt_with_fingerprint(
        _canonical(pairs.select(F.col(src).alias("src"), F.col(dst).alias("dst")))
    )
    if fp[0] == 0:
        return edges.select(
            F.col("src").alias("node"), F.col("dst").alias("component")
        )
    for _ in range(max_iter):
        edges, nfp = _ckpt_with_fingerprint(_small_star(_large_star(edges)))
        if nfp == fp:
            break
        fp = nfp
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds"
        )
    # Fixpoint edge set is a star forest: every edge is (member, root).
    # groupBy-min guards the (impossible at fixpoint, cheap to enforce)
    # case of a node carrying two labels.
    members = edges.groupBy(F.col("src").alias("node")).agg(
        F.min("dst").alias("component")
    )
    roots = edges.select(
        F.col("dst").alias("node"), F.col("dst").alias("component")
    ).distinct()
    # a root never appears on the member side at fixpoint, but keep the
    # min-per-node contract exact under union anyway
    return (
        members.union(roots)
        .groupBy("node")
        .agg(F.min("component").alias("component"))
    )


def dedup_clusters(
    pairs: DataFrame, src: str = "doc_a", dst: str = "doc_b"
) -> DataFrame:
    """Per-cluster dedup summary over candidate pairs: the canonical
    kept doc (= component min), member count, and how many docs fuzzy
    dedup would drop.  Singleton docs never enter `pairs` and are kept
    implicitly."""
    comp = connected_components(pairs, src, dst)
    return comp.groupBy("component").agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.count(F.lit(1)) - F.lit(1)).alias("n_dropped"),
    )


def fuzzy_dedup_keep(
    df: DataFrame, pairs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Drop every non-canonical member of every duplicate cluster: the
    end-to-end fuzzy-dedup operator (pairs -> clusters -> keep min id
    per cluster, plus all docs that never appeared in a pair)."""
    comp = connected_components(pairs)
    dropped = comp.where(F.col("node") != F.col("component")).select(
        F.col("node").alias(id_col)
    )
    return df.join(dropped, id_col, "left_anti")


def keep_best_per_cluster(
    df: DataFrame,
    pairs: DataFrame,
    score_col: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """Quality-aware fuzzy dedup: keep the HIGHEST-``score_col`` member
    of every duplicate cluster (tie -> min id), not the min-id one —
    the curation posture when near-dup copies differ in rendering
    quality (truncated mirrors, boilerplate-injected rehosts) and the
    canonical copy should be the best one, as FineWeb/Dolma do when a
    quality signal is already on the row.

    Shape: ``connected_components`` over the candidate pairs (the
    module's O(log^2 n) star algorithm — no driver graph), then ONE
    groupBy(component) with ``max_by(id, struct(score, -id))`` — a
    declarative aggregate with map-side partial combine, so a giant
    cluster never funnels into a window task — and a left_anti join
    dropping the non-canonical members.  Docs that never entered a
    pair are kept implicitly (they have no component row).

    Ties break to the SMALLEST id via the negated-id struct field, so
    the choice is total and engine-independent whenever ``score_col``
    is deterministic. ``id_col`` MUST be numeric (ADVICE r6): the
    negation in the tie-break silently casts a string id to NULL,
    making ties arbitrary — enforced below.
    """
    id_type = dict(df.dtypes).get(id_col, "")
    if id_type in ("string", "binary", "boolean", "date", "timestamp"):
        raise ValueError(
            f"keep_best_per_cluster requires a numeric {id_col!r} for its "
            f"total tie-break; got {id_type} — map ids to a numeric key "
            "(e.g. xxhash64) first"
        )
    comp = connected_components(pairs)
    members = df.select(
        F.col(id_col).alias("node"), F.col(score_col).alias("_s")
    ).join(comp, "node")
    best = members.groupBy("component").agg(
        F.max_by(
            "node", F.struct(F.col("_s"), (-F.col("node")).alias("_t"))
        ).alias("_keep")
    )
    dropped = (
        members.join(best, "component")
        .where(F.col("node") != F.col("_keep"))
        .select(F.col("node").alias(id_col))
    )
    return df.join(dropped, id_col, "left_anti")
