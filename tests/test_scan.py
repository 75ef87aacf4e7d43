"""Distributed prefix scan + exact ROC-AUC (operators/scan.py)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from deidentify_spark.operators.scan import bucketed_prefix_sum, rank_auc


def _ref_auc(pairs):
    """Reference tie-corrected AUC: mean over all (pos, neg) pairs of
    1 if s_pos > s_neg, 0.5 if equal, else 0 — the definition."""
    pos = [s for y, s in pairs if y]
    neg = [s for y, s in pairs if not y]
    if not pos or not neg:
        return None
    total = 0.0
    for p in pos:
        for n in neg:
            total += 1.0 if p > n else (0.5 if p == n else 0.0)
    return total / (len(pos) * len(neg))


def test_prefix_sum_matches_naive_running_total(spark):
    rng = random.Random(7)
    rows = [(float(i) + rng.random(), rng.randint(0, 9)) for i in range(500)]
    df = spark.createDataFrame(rows, "k double, v int").repartition(8)
    out = {
        r.k: r.cum_v
        for r in bucketed_prefix_sum(df, "k", ["v"], n_buckets=16).collect()
    }
    running = 0
    for k, v in sorted(rows):
        running += v
        assert out[k] == running, k


def test_prefix_sum_no_single_partition_exchange(spark):
    """The whole point: the plan must contain NO SinglePartition
    exchange — that is the Window.orderBy trap this operator replaces."""
    df = spark.range(1000).select(
        F.col("id").cast("double").alias("k"), F.lit(1).alias("v")
    )
    plan = (
        bucketed_prefix_sum(df, "k", ["v"], n_buckets=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SinglePartition" not in plan, "global-sort window snuck back in"


def test_prefix_sum_multiple_value_cols(spark):
    df = spark.createDataFrame(
        [(1.0, 1, 10), (2.0, 2, 20), (3.0, 3, 30)], "k double, a int, b int"
    )
    r = {
        x.k: (x.cum_a, x.cum_b)
        for x in bucketed_prefix_sum(df, "k", ["a", "b"], n_buckets=4).collect()
    }
    assert r == {1.0: (1, 10), 2.0: (3, 30), 3.0: (6, 60)}


@pytest.mark.parametrize("seed", [1, 2])
def test_rank_auc_matches_pairwise_definition(spark, seed):
    rng = random.Random(seed)
    # coarse scores force plenty of ties, exercising the 0.5 term
    pairs = [
        (rng.random() < 0.4, round(rng.random(), 1)) for _ in range(300)
    ]
    df = spark.createDataFrame(pairs, "y boolean, s double")
    got = rank_auc(df, "y", "s", n_buckets=8).first().auc
    assert got == pytest.approx(_ref_auc(pairs), abs=1e-9)


def test_rank_auc_single_class_is_null(spark):
    df = spark.createDataFrame(
        [(True, 0.1), (True, 0.9)], "y boolean, s double"
    )
    assert rank_auc(df, "y", "s").first().auc is None


def test_rank_auc_perfect_and_inverted(spark):
    df = spark.createDataFrame(
        [(True, 0.9), (True, 0.8), (False, 0.2), (False, 0.1)],
        "y boolean, s double",
    )
    assert rank_auc(df, "y", "s").first().auc == pytest.approx(1.0)
    inv = df.withColumn("s", -F.col("s"))
    assert rank_auc(inv, "y", "s").first().auc == pytest.approx(0.0)


def test_score_calibration_matches_python_reference(spark):
    from deidentify_spark.operators.scan import score_calibration

    rng = random.Random(3)
    rows = [
        (rng.random() < (i / 100.0), round(i / 100.0 + rng.gauss(0, 0.05), 4))
        for i in range(101)
    ]
    df = spark.createDataFrame(rows, "y boolean, s double")
    got = {r.bin: r for r in score_calibration(df, "y", "s", n_bins=5).collect()}
    lo = min(s for _, s in rows)
    hi = max(s for _, s in rows)
    ref: dict[int, list] = {}
    for y, s in rows:
        b = min(int((s - lo) / ((hi - lo) / 5)), 4)
        ref.setdefault(b, []).append((y, s))
    assert set(got) == set(ref)
    for b, members in ref.items():
        r = got[b]
        assert r.n_docs == len(members)
        assert r.n_pos == sum(1 for y, _ in members if y)
        assert r.pos_rate == pytest.approx(r.n_pos / r.n_docs, abs=1e-6)
        assert r.lo_score == pytest.approx(min(s for _, s in members), abs=1e-4)
        assert r.hi_score == pytest.approx(max(s for _, s in members), abs=1e-4)
    # bit-stable across partitionings (order-independent aggregates only)
    again = {
        r.bin: (r.n_docs, r.n_pos, r.pos_rate, r.lo_score, r.hi_score)
        for r in score_calibration(
            df.repartition(7), "y", "s", n_bins=5
        ).collect()
    }
    assert again == {
        b: (r.n_docs, r.n_pos, r.pos_rate, r.lo_score, r.hi_score)
        for b, r in got.items()
    }


def test_score_calibration_constant_score_degenerate(spark):
    from deidentify_spark.operators.scan import score_calibration

    df = spark.createDataFrame(
        [(True, 0.5), (False, 0.5), (True, 0.5)], "y boolean, s double"
    )
    out = score_calibration(df, "y", "s", n_bins=10).collect()
    assert len(out) == 1 and out[0].bin == 0
    assert out[0].n_docs == 3 and out[0].n_pos == 2


def test_exact_percentiles_matches_sorted_reference(spark):
    from deidentify_spark.operators.scan import exact_percentiles

    rng = random.Random(11)
    rows = [(f"s{i % 3}", rng.randint(0, 50)) for i in range(400)]
    df = spark.createDataFrame(rows, "source string, v long")
    got = {r.source: r for r in
           exact_percentiles(df, "v", qs=(0.25, 0.5, 0.95),
                             group_cols=["source"]).collect()}

    import math

    for s in ("s0", "s1", "s2"):
        vals = sorted(v for src, v in rows if src == s)
        n = len(vals)
        for q, name in ((0.25, "p25"), (0.5, "p50"), (0.95, "p95")):
            # definition: smallest value whose cumulative count reaches
            # ceil(q*N) == the ceil(q*N)-th order statistic
            ref = vals[math.ceil(q * n) - 1]
            assert got[s][name] == ref, (s, name, got[s][name], ref)


def test_exact_percentiles_ungrouped_and_extremes(spark):
    from deidentify_spark.operators.scan import exact_percentiles

    df = spark.createDataFrame([(v,) for v in range(1, 101)], "v long")
    r = exact_percentiles(df, "v", qs=(0.01, 0.5, 1.0)).collect()
    assert len(r) == 1
    assert r[0].p1 == 1 and r[0].p50 == 50 and r[0].p100 == 100


def test_mad_outliers_matches_python_reference(spark):
    from deidentify_spark.operators.scan import mad_outliers

    import math

    rng = random.Random(5)
    rows = [(i, f"g{i % 3}", rng.randint(10, 60)) for i in range(300)]
    # plant obvious outliers in every group
    rows += [(1000, "g0", 5000), (1001, "g1", -999), (1002, "g2", 9999)]
    df = spark.createDataFrame(rows, "id long, g string, v long")
    got = {r.id: r for r in
           mad_outliers(df, "v", group_cols=["g"], k=3.0).collect()}

    def disc_p50(vals):
        vals = sorted(vals)
        return vals[math.ceil(0.5 * len(vals)) - 1]

    for g in ("g0", "g1", "g2"):
        vals = [v for _, gg, v in rows if gg == g]
        med = disc_p50(vals)
        mad = disc_p50([abs(v - med) for v in vals])
        for i, gg, v in rows:
            if gg != g:
                continue
            r = got[i]
            assert r.group_median == med and r.group_mad == mad
            assert r.is_outlier == (abs(v - med) > 3.0 * mad), (i, v, med, mad)
    assert got[1000].is_outlier and got[1001].is_outlier and got[1002].is_outlier


def test_mad_outliers_degenerate_zero_mad(spark):
    from deidentify_spark.operators.scan import mad_outliers

    # >half the group at one value -> MAD=0 -> every off-median row
    # flags (Hampel behavior; strict > keeps the median rows clean)
    df = spark.createDataFrame(
        [(i, 7) for i in range(10)] + [(10, 8), (11, 7)], "id long, v long"
    )
    out = {r.id: r for r in mad_outliers(df, "v").collect()}
    assert all(r.group_mad == 0 for r in out.values())
    assert out[10].is_outlier and not out[11].is_outlier


def test_mad_outliers_no_single_partition_window(spark):
    from deidentify_spark.operators.scan import mad_outliers

    df = spark.createDataFrame([(i, "g", i) for i in range(50)],
                               "id long, g string, v long")
    plan = (mad_outliers(df, "v", group_cols=["g"])
            ._jdf.queryExecution().executedPlan().toString())
    assert "SinglePartition" not in plan
