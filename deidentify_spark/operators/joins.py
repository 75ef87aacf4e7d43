"""Temporal join operators Spark lacks as built-ins: as-of join and
interval (range) join, each expressed as compositions of shuffles Spark
already does well — no cross join, no per-row Python.

Neither operator exists in the reference (aliengiraffe/deidentify is a
PII scrubber, deidentify.go:218-234); they are part of the §2.G
training-data-pipeline surface: as-of joins align crawl snapshots /
label events to the latest prior state per key, interval joins attribute
events to overlapping campaign/maintenance windows.

Scale posture
-------------
``asof_join``: the textbook formulation is a per-row correlated
``ORDER BY ts DESC LIMIT 1`` — O(n·m) per key and unimplementable as a
Spark equi-join.  Here it is ONE shuffle: union the probe and reference
rows (tagged), hash-partition by key, sort each partition by
``(ts, ref-first, tie)``, and fill the reference payload forward with
``last(..., ignorenulls=True)`` over an unbounded-preceding row frame.
Window sort+scan is linear per partition, so cost is the same shuffle a
plain groupBy(key) would pay; skewed keys are bounded by the same AQE
skew-split that covers every other key shuffle in this repo (SCALE.md).

``bucketed_interval_join``: a raw ``ON e.ts BETWEEN i.start AND i.end``
forces BroadcastNestedLoopJoin (fine only while intervals broadcast) or
a cartesian.  Instead each interval is exploded to the fixed-width time
buckets it covers and each event mapped to its single bucket; the join
becomes an EQUI-join on bucket_id with the range predicate as a cheap
residual filter.  Each (event, interval) pair meets in exactly one
bucket (the event's), so no dedup pass is needed.  With B-bucket
granularity ~ median interval length, blow-up is O(len/B) rows per
interval — bounded and tunable — and the plan is a plain shuffled (or
broadcast, if intervals are small) hash join that survives both sides
being huge.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join", "bucketed_interval_join"]


def asof_join(
    probe: DataFrame,
    reference: DataFrame,
    keys: list[str],
    ts_col: str,
    payload_cols: list[str],
    tie_col: str,
    payload_prefix: str = "ref_",
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """For every probe row, attach the payload of the latest reference
    row with the same ``keys`` and ``reference.ts <= probe.ts``
    (backward as-of, inclusive).  Probe rows with no prior reference get
    NULL payloads (left as-of semantics).

    ``tie_col`` makes equal-timestamp reference rows deterministic: the
    one with the greatest ``tie_col`` wins, matching
    ``ORDER BY ts DESC, tie DESC LIMIT 1``.

    ``tolerance_seconds`` (pandas ``merge_asof(tolerance=...)``): a
    match older than the tolerance is discarded (NULL payload).  Applied
    as a post-window filter, so it adds no plan nodes beyond one
    conditional projection.

    Returns all probe columns plus ``{payload_prefix}{c}`` for each
    payload column.  Single hash shuffle on ``keys``; linear window scan.
    """
    # carry the reference ts inside the payload so the tolerance check
    # can compare it against the probe ts after the fill-forward
    payload = F.struct(
        F.col(ts_col).alias("_asof_ref_ts"), *[F.col(c) for c in payload_cols]
    ).alias("_asof_payload")
    ref = reference.select(
        *keys, ts_col, tie_col, payload, F.lit(1).alias("_asof_is_ref")
    )
    payload_type = ref.schema["_asof_payload"].dataType

    prb = probe.withColumn(
        "_asof_payload", F.lit(None).cast(payload_type)
    ).withColumn("_asof_is_ref", F.lit(0))

    u = prb.unionByName(ref, allowMissingColumns=True)

    # refs sort BEFORE probes at equal ts (desc on the 1/0 tag) so the
    # inclusive <= bound holds; among equal-ts refs the largest tie_col
    # is the frame's last() and wins.
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(ts_col).asc(), F.col("_asof_is_ref").desc(), F.col(tie_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = u.withColumn(
        "_asof_match", F.last("_asof_payload", ignorenulls=True).over(w)
    ).where(F.col("_asof_is_ref") == 0)

    if tolerance_seconds is not None:
        # NTZ-safe: both casts shift by the same session offset, so the
        # microsecond difference is the exact lag
        lag_us = F.unix_micros(F.col(ts_col).cast("timestamp")) - F.unix_micros(
            F.col("_asof_match._asof_ref_ts").cast("timestamp")
        )
        matched = matched.withColumn(
            "_asof_match",
            F.when(
                lag_us <= F.lit(int(tolerance_seconds * 1_000_000)),
                F.col("_asof_match"),
            ),
        )

    out_cols: list[Column] = [F.col(c) for c in probe.columns]
    out_cols += [
        F.col(f"_asof_match.{c}").alias(f"{payload_prefix}{c}")
        for c in payload_cols
    ]
    return matched.select(*out_cols)


def bucketed_interval_join(
    events: DataFrame,
    intervals: DataFrame,
    ts_col: str,
    start_col: str,
    end_col: str,
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Inner-join ``events`` to every interval with
    ``start <= ts < end`` (half-open), as an equi-join on fixed-width
    time buckets plus a residual range filter.

    ``intervals`` may overlap arbitrarily — this is a genuine range
    join, not a partitioning.  Pick ``bucket_seconds`` near the median
    interval length: each interval explodes to ``ceil(len/bucket)+1``
    rows, each event to exactly one, and the pair meets in exactly one
    bucket so the output needs no distinct().

    Returns events columns + intervals columns.
    """
    b = F.lit(bucket_seconds).cast("long")
    ev = events.withColumn(
        "_rj_bucket", (F.unix_timestamp(F.col(ts_col)) / b).cast("long")
    )
    iv = intervals.withColumn(
        "_rj_bucket",
        F.explode(
            F.sequence(
                (F.unix_timestamp(F.col(start_col)) / b).cast("long"),
                # end is exclusive, but a bucket straddling end still
                # holds in-range events: include the end's bucket.
                (F.unix_timestamp(F.col(end_col)) / b).cast("long"),
            )
        ),
    )
    joined = ev.join(iv, on="_rj_bucket", how="inner").where(
        (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) < F.col(end_col))
    )
    return joined.drop("_rj_bucket")
