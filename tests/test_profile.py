"""Data-card profiling (operators/profile.py)."""

from __future__ import annotations

from deidentify_spark.operators.profile import profile_table


def test_profile_table_values(spark):
    df = spark.createDataFrame(
        [
            (1, "ab", 2.5),
            (2, None, -1.0),
            (3, "wxyz", None),
            (3, "ab", 4.0),
        ],
        "id long, s string, v double",
    )
    out = {r.column: r for r in profile_table(df).collect()}
    assert set(out) == {"id", "s", "v"}
    assert all(r.n_rows == 4 for r in out.values())
    assert out["id"].n_null == 0 and out["id"].n_distinct == 3
    assert out["id"].min_num == 1.0 and out["id"].max_num == 3.0
    assert out["id"].avg_len is None
    assert out["s"].n_null == 1 and out["s"].n_distinct == 2
    assert out["s"].avg_len == 2.6667  # lengths 2,4,2 over 3 non-null, round 4
    assert out["s"].min_num is None and out["s"].max_num is None
    assert out["v"].n_null == 1
    assert out["v"].min_num == -1.0 and out["v"].max_num == 4.0


def test_profile_table_one_pass_plan(spark):
    """The whole profile must come from ONE aggregate over ONE scan —
    no self-join / per-column re-scan."""
    df = spark.range(100).selectExpr("id", "CAST(id AS STRING) AS s")
    plan = profile_table(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Range (0, 100") == 1, plan  # source appears once
    assert "Join" not in plan, plan


def test_profile_table_column_subset(spark):
    df = spark.createDataFrame([(1, "x")], "a long, b string")
    out = profile_table(df, cols=["b"]).collect()
    assert len(out) == 1 and out[0].column == "b"
