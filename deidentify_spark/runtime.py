"""Session-level runtime helpers shared by operators.

``tracked_persist`` / ``release_tracked``: several operators persist an
intermediate on purpose (dsir_select's slim projection, bm25's tf
aggregate, the prefix-scan input) because their plans consume it from
two branches or two phases — the persist is load-bearing, measured, and
documented at each site. But a long-lived session composing MANY such
calls would accumulate cached tables until eviction pressure if nothing
ever unpersists them (the operator itself cannot: its OUTPUT DataFrame
still reads the cache lazily, so unpersisting before the caller
materializes would silently re-run the lineage the cache exists to
avoid). The contract is therefore: operators register every internal
persist here, and batch drivers (bench.py, jobs/run_curation_job.py, or
any user loop) call ``release_tracked()`` once the outputs of a step are
materialized. One handle, no reliance on ``spark.catalog.clearCache()``
nuking caches the USER owns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_TRACKED: list[DataFrame] = []


def tracked_persist(df: DataFrame) -> DataFrame:
    """persist() the frame (default MEMORY_AND_DISK) and register it for
    a later bulk ``release_tracked()``.

    Also lets AQE re-plan the CACHED plan's output partitioning
    (``canChangeCachedPlanOutputPartitioning``, off by default): without
    it a cached aggregate materializes with the full static shuffle
    partition count, and every later pass over the cache pays one task
    per (mostly empty) partition — the operator persists registered here
    are bounded stats/model tables (score counts, value counts, bucket
    totals) for which AQE's byte-based coalescing is the scale-adaptive
    partitioning: a KB-sized table caches as 1-2 partitions locally
    while a corpus-scale cache keeps its width (round 7, measured:
    mad_outliers 4.7 -> 2.9 s, exact_percentiles 2.4 -> 1.3 s at sf0.1;
    neutral on the join-heavy queries)."""
    try:
        df.sparkSession.conf.set(
            "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
            "true",
        )
    except Exception:
        pass  # conf removed/renamed: persist still works, just wider
    df.persist()
    _TRACKED.append(df)
    return df


def release_tracked() -> int:
    """Unpersist every operator-internal cache registered since the last
    call; returns how many were released. Safe to call at any time —
    outputs not yet materialized simply recompute their lineage."""
    n = 0
    while _TRACKED:
        df = _TRACKED.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:  # session already stopped — nothing to free
            pass
    return n
