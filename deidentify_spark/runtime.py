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


def ensure_cached_plan_aqe(spark) -> None:
    """Enable AQE re-planning of CACHED plan output partitioning for
    this session (``canChangeCachedPlanOutputPartitioning``, off by
    default) — idempotent, safe to call per query.

    Round-7: this must be set DETERMINISTICALLY, not only lazily inside
    ``tracked_persist`` — operator-internal ``.persist()`` sites (the
    logreg/nb feature cache, the words exchange they cache) now leave
    their partition count to AQE's byte-based coalescing, and a cached
    plan only gets AQE when this conf is on. Setting it lazily made a
    query's partitioning depend on whether some EARLIER query in the
    session had called tracked_persist (measured: solo
    logreg_classifier ran its per-iteration passes at the static
    64-partition width — ~0.4 s of fixed per-task cost each — while
    the same query after any tracked_persist user ran them on 1-2
    AQE-sized partitions, 3x faster). Neutrality on the explicit-width
    caches was A/B-measured (75 jobs / equal wall both ways)."""
    try:
        spark.conf.set(
            "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
            "true",
        )
    except Exception:
        pass  # conf removed/renamed: caches still work, just wider


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
    ensure_cached_plan_aqe(df.sparkSession)
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
