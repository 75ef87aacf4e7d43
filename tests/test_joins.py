"""Temporal join operators (operators/joins.py): as-of join and
bucketed interval join — semantics edge cases the sf0.01 oracle sweep
may not exercise, plus plan-shape pins for the scale posture."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from deidentify_spark.operators.joins import asof_join, bucketed_interval_join


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def asof_frames(spark):
    probe = spark.createDataFrame(
        [
            (1, 10, _ts("2024-01-01 10:00:00")),  # exact-tie with ref 102
            (2, 10, _ts("2024-01-01 11:00:00")),  # between refs -> 102
            (3, 10, _ts("2024-01-01 09:00:00")),  # before all refs -> NULL
            (4, 20, _ts("2024-01-01 10:30:00")),  # other key -> 201
            (5, 30, _ts("2024-01-01 10:00:00")),  # key with no refs -> NULL
        ],
        "event_id long, user_id long, ts timestamp",
    )
    ref = spark.createDataFrame(
        [
            (101, 10, _ts("2024-01-01 10:00:00"), 1.0),  # tie loser (id<102)
            (102, 10, _ts("2024-01-01 10:00:00"), 2.0),  # tie winner
            (103, 10, _ts("2024-01-01 12:00:00"), 3.0),  # after probe 2
            (201, 20, _ts("2024-01-01 10:00:00"), 4.0),
        ],
        "event_id long, user_id long, ts timestamp, value double",
    )
    return probe, ref


def test_asof_backward_inclusive_tie_and_nulls(spark, asof_frames):
    probe, ref = asof_frames
    out = asof_join(
        probe,
        ref,
        keys=["user_id"],
        ts_col="ts",
        payload_cols=["event_id", "value"],
        tie_col="event_id",
        payload_prefix="m_",
    )
    rows = {r.event_id: (r.m_event_id, r.m_value) for r in out.collect()}
    assert rows == {
        1: (102, 2.0),  # ts-equal ref visible (inclusive), max tie wins
        2: (102, 2.0),  # latest ref at-or-before, not the later one
        3: (None, None),  # no prior ref in key
        4: (201, 4.0),
        5: (None, None),  # key absent from reference side
    }
    # left as-of: every probe row exactly once
    assert out.count() == probe.count()


def test_asof_forward_direction(spark, asof_frames):
    """forward: earliest reference at-or-after each probe; equal-ts ties
    resolve to the SMALLEST tie_col (mirror of backward)."""
    probe, ref = asof_frames
    out = asof_join(
        probe, ref, ["user_id"], "ts", ["event_id"], "event_id",
        payload_prefix="m_", direction="forward",
    )
    rows = {r.event_id: r.m_event_id for r in out.collect()}
    assert rows == {
        1: 101,   # ts-equal ref visible (inclusive), min tie wins
        2: 103,   # next ref after 11:00
        3: 101,   # earliest at-or-after 09:00
        4: None,  # u20's only ref is before the probe
        5: None,
    }


def test_asof_nearest_direction(spark, asof_frames):
    """nearest: smaller absolute lag wins; exact lag tie -> backward."""
    probe, ref = asof_frames
    out = asof_join(
        probe, ref, ["user_id"], "ts", ["event_id"], "event_id",
        payload_prefix="m_", direction="nearest",
    )
    rows = {r.event_id: r.m_event_id for r in out.collect()}
    assert rows == {
        1: 102,   # 0-lag tie both sides -> backward winner (max tie 102)
        2: 102,   # 1h back vs 1h forward -> tie -> backward
        3: 101,   # only a forward candidate exists
        4: 201,   # only a backward candidate exists
        5: None,
    }


def test_asof_nearest_with_tolerance(spark, asof_frames):
    probe, ref = asof_frames
    out = asof_join(
        probe, ref, ["user_id"], "ts", ["event_id"], "event_id",
        payload_prefix="m_", direction="nearest", tolerance_seconds=1800,
    )
    rows = {r.event_id: r.m_event_id for r in out.collect()}
    assert rows == {
        1: 102,
        2: None,  # both candidates 1h away > 30 min tolerance
        3: None,  # forward candidate 1h away
        4: 201,   # 30 min, inclusive boundary
        5: None,
    }


def test_asof_tolerance_discards_stale_matches(spark, asof_frames):
    """merge_asof-style tolerance: a match older than the window is
    dropped to NULL, an at-or-under-tolerance match survives."""
    probe, ref = asof_frames
    out = asof_join(
        probe,
        ref,
        keys=["user_id"],
        ts_col="ts",
        payload_cols=["event_id"],
        tie_col="event_id",
        payload_prefix="m_",
        tolerance_seconds=1800,
    )
    rows = {r.event_id: r.m_event_id for r in out.collect()}
    assert rows == {
        1: 102,   # lag 0 <= 30 min
        2: None,  # best match is 1h old -> discarded
        3: None,
        4: 201,   # lag 30 min, inclusive boundary survives
        5: None,
    }


def test_asof_ntz_lag_is_wall_clock_across_dst(spark):
    """TIMESTAMP_NTZ probe/ref straddling a DST transition under a
    non-UTC session timezone: the lag must be the pure wall-clock
    difference, independent of session tz.  The pre-fix formulation cast
    both sides to session-local TIMESTAMP, shifting 01:30 (EST, -5) and
    03:30 (EDT, -4) by different offsets so a 2h wall-clock lag measured
    as 1h and wrongly survived a 1.5h tolerance."""
    prev_tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        probe = spark.createDataFrame(
            [(1, 10, _ts("2024-03-10 03:30:00"))],
            "event_id long, user_id long, ts timestamp_ntz",
        )
        ref = spark.createDataFrame(
            [(101, 10, _ts("2024-03-10 01:30:00"), 1.0)],
            "event_id long, user_id long, ts timestamp_ntz, value double",
        )
        kw = dict(
            keys=["user_id"], ts_col="ts", payload_cols=["event_id"],
            tie_col="event_id", payload_prefix="m_",
        )
        # 2h wall-clock lag > 1.5h tolerance: discarded
        out = asof_join(probe, ref, tolerance_seconds=5400, **kw)
        assert out.collect()[0].m_event_id is None
        # 2h wall-clock lag <= 2h tolerance: kept (boundary exact)
        out = asof_join(probe, ref, tolerance_seconds=7200, **kw)
        assert out.collect()[0].m_event_id == 101
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev_tz)


def test_asof_plan_has_no_join_node(spark, asof_frames):
    probe, ref = asof_frames
    out = asof_join(
        probe, ref, ["user_id"], "ts", ["event_id"], "event_id"
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    for node in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin",
                 "CartesianProduct", "BroadcastNestedLoopJoin"):
        assert node not in plan, node
    assert "Window" in plan  # single shuffle + linear window scan


def test_asof_nearest_single_exchange(spark, asof_frames):
    """nearest computes both direction candidates over ONE hash
    exchange (two sorts/windows reuse the same partitioning) — the
    scale posture documented in operators/joins.py."""
    probe, ref = asof_frames
    out = asof_join(
        probe, ref, ["user_id"], "ts", ["event_id"], "event_id",
        direction="nearest",
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert plan.count("Window") == 2


@pytest.fixture(scope="module")
def interval_frames(spark):
    events = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 00:00:00")),  # == start of A (inclusive)
            (2, _ts("2024-01-01 02:59:59")),  # inside A and B (overlap)
            (3, _ts("2024-01-01 03:00:00")),  # == end of A (exclusive), in B
            (4, _ts("2024-01-01 02:30:00")),  # A + B
            (5, _ts("2024-01-01 07:00:00")),  # outside everything
        ],
        "event_id long, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [
            ("A", _ts("2024-01-01 00:00:00"), _ts("2024-01-01 03:00:00")),
            ("B", _ts("2024-01-01 02:00:00"), _ts("2024-01-01 05:00:00")),
        ],
        "interval_id string, start_ts timestamp, end_ts timestamp",
    )
    return events, intervals


def test_interval_join_boundaries_and_overlap(spark, interval_frames):
    events, intervals = interval_frames
    out = bucketed_interval_join(
        events, intervals, "ts", "start_ts", "end_ts", bucket_seconds=3600
    )
    pairs = sorted((r.event_id, r.interval_id) for r in out.collect())
    assert pairs == [
        (1, "A"),
        (2, "A"), (2, "B"),
        (3, "B"),  # half-open: not in A at its end bound
        (4, "A"), (4, "B"),
    ]


def test_interval_join_no_dup_with_coarse_buckets(spark, interval_frames):
    """bucket >> interval length: the whole interval lives in one or two
    buckets; each (event, interval) pair must still appear exactly once."""
    events, intervals = interval_frames
    out = bucketed_interval_join(
        events, intervals, "ts", "start_ts", "end_ts", bucket_seconds=86400
    )
    pairs = [(r.event_id, r.interval_id) for r in out.collect()]
    assert len(pairs) == len(set(pairs)) == 6


def test_interval_join_auto_width_matches_explicit(spark, interval_frames):
    """Auto-sized bucket width (default) must return exactly the pairs
    the explicit-width form returns."""
    events, intervals = interval_frames
    auto = bucketed_interval_join(events, intervals, "ts", "start_ts", "end_ts")
    pairs = sorted((r.event_id, r.interval_id) for r in auto.collect())
    assert pairs == [
        (1, "A"), (2, "A"), (2, "B"), (3, "B"), (4, "A"), (4, "B"),
    ]


def test_interval_join_auto_width_bounds_explode_both_regimes(spark):
    """The auto width tracks the median interval length, so the
    per-interval explode factor stays O(1) at BOTH a short-interval
    (minutes) and a long-interval (days) regime — the bound a fixed
    default cannot give. Verified by reconstructing the explode with
    the same width aggregate: <= 3 bucket rows per interval (uniform
    lengths => ceil(len/median)+1 = 2, +1 slack for the seconds
    rounding), and join results equal a brute-force theta join."""
    from pyspark.sql import functions as F

    from deidentify_spark.operators.joins import _median_interval_width

    for n_iv, length_s, step_s in ((40, 300, 120), (40, 3 * 86400, 86400)):
        base = F.to_timestamp(F.lit("2024-01-01 00:00:00"))
        iv = spark.range(n_iv).select(
            F.col("id").alias("interval_id"),
            (base + F.make_interval(secs=(F.col("id") * step_s).cast("double"))).alias("start_ts"),
            (base + F.make_interval(secs=(F.col("id") * step_s + length_s).cast("double"))).alias("end_ts"),
        )
        ev = spark.range(200).select(
            F.col("id").alias("event_id"),
            (base + F.make_interval(secs=(F.col("id") * (step_s // 2) + 7).cast("double"))).alias("ts"),
        )
        width = int(
            _median_interval_width(iv, "start_ts", "end_ts").collect()[0][0]
        )
        assert abs(width - length_s) <= 1, (width, length_s)
        n_bucket_rows = iv.select(
            F.explode(
                F.sequence(
                    (F.unix_timestamp("start_ts") / width).cast("long"),
                    (F.unix_timestamp("end_ts") / width).cast("long"),
                )
            )
        ).count()
        assert n_bucket_rows <= 3 * n_iv, (n_bucket_rows, n_iv)
        got = sorted(
            (r.event_id, r.interval_id)
            for r in bucketed_interval_join(
                ev, iv, "ts", "start_ts", "end_ts"
            ).collect()
        )
        want = sorted(
            (r.event_id, r.interval_id)
            for r in ev.join(
                iv,
                (F.col("ts") >= F.col("start_ts"))
                & (F.col("ts") < F.col("end_ts")),
            ).collect()
        )
        assert got == want and got


def test_interval_join_plan_is_equi_join(spark, interval_frames):
    events, intervals = interval_frames
    out = bucketed_interval_join(
        events, intervals, "ts", "start_ts", "end_ts", bucket_seconds=3600
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert any(
        j in plan
        for j in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin")
    ), plan


def test_interval_join_ntz_buckets_across_dst_gap(spark):
    """TIMESTAMP_NTZ interval join under a non-UTC session timezone,
    with intervals/events inside the 2024-03-10 02:00-03:00
    America/New_York spring-forward gap (naive times that never existed
    locally): bucket derivation must be tz-independent wall-clock
    arithmetic. The pre-fix unix_timestamp form mapped naive->epoch
    through the session tz — non-monotonic in the gap — so an interval
    starting in the gap could compute a bucket range excluding an event
    the residual theta filter keeps, silently dropping the row."""
    prev_tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        # NTZ values built IN Spark from strings: feeding Python
        # datetimes through createDataFrame converts via the session tz,
        # which already mangles gap times before the operator runs
        events = spark.createDataFrame(
            [
                (1, "2024-03-10 02:15:00"),  # inside the gap
                (2, "2024-03-10 02:45:00"),  # inside the gap
                (3, "2024-03-10 03:10:00"),  # after the gap
                (4, "2024-03-10 01:50:00"),  # before the gap
            ],
            "event_id long, s string",
        ).select("event_id", F.to_timestamp_ntz("s").alias("ts"))
        intervals = spark.createDataFrame(
            [
                (100, "2024-03-10 02:10:00", "2024-03-10 02:50:00"),
                (200, "2024-03-10 01:40:00", "2024-03-10 03:20:00"),
            ],
            "iv_id long, s1 string, s2 string",
        ).select(
            "iv_id",
            F.to_timestamp_ntz("s1").alias("start_ts"),
            F.to_timestamp_ntz("s2").alias("end_ts"),
        )
        for bucket_seconds in (None, 600, 3600):
            got = sorted(
                (r.event_id, r.iv_id)
                for r in bucketed_interval_join(
                    events, intervals, "ts", "start_ts", "end_ts",
                    bucket_seconds=bucket_seconds,
                ).collect()
            )
            assert got == [
                (1, 100), (1, 200), (2, 100), (2, 200), (3, 200), (4, 200),
            ], (bucket_seconds, got)
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev_tz)
