"""Z-order layout (operators/layout.py): closed-form Morton codes, NULL
policy, DuckDB-twin parity, and the data-skipping property the layout
exists to provide."""

import glob

import pytest
from pyspark.sql import functions as F

from deidentify_spark.operators.layout import (
    with_zvalue,
    zorder_repartition,
    zvalue_oracle_sql,
)


def _morton2(a: int, b: int, bits: int) -> int:
    z = 0
    for j in range(bits):
        z |= ((a >> j) & 1) << (2 * j) | ((b >> j) & 1) << (2 * j + 1)
    return z


def test_closed_form_morton_grid(spark):
    """With x,y already spanning [0, 2^bits - 1], the bucket index IS the
    value, so zval must equal the textbook Morton code."""
    bits = 2
    rows = [(x, y) for x in range(4) for y in range(4)]
    df = spark.createDataFrame(rows, ["x", "y"])
    got = {
        (r["x"], r["y"]): r["zval"]
        for r in with_zvalue(df, ["x", "y"], bits=bits).collect()
    }
    for x in range(4):
        for y in range(4):
            assert got[(x, y)] == _morton2(x, y, bits), (x, y)


def test_z_locality_beats_concatenation(spark):
    """The defining property: sorting by zval keeps BOTH columns locally
    bounded, while sorting by (x, y) lets y span its whole range inside
    one x run. Check z-adjacent rows stay close in each dimension."""
    n = 16
    rows = [(x, y) for x in range(n) for y in range(n)]
    df = spark.createDataFrame(rows, ["x", "y"])
    out = (
        with_zvalue(df, ["x", "y"], bits=4)
        .orderBy("zval")
        .collect()
    )
    # split the z-sorted order into 16 equal chunks = "files"
    chunk = len(out) // 16
    for i in range(16):
        block = out[i * chunk : (i + 1) * chunk]
        xs = [r["x"] for r in block]
        ys = [r["y"] for r in block]
        # each 16-cell z block is a 4x4 quadrant: range 3 in both dims
        assert max(xs) - min(xs) <= 3 and max(ys) - min(ys) <= 3


def test_nulls_bucket_zero(spark):
    df = spark.createDataFrame(
        [(None, 5.0), (0.0, 5.0), (10.0, 5.0)], ["x", "y"]
    )
    rows = {r["x"]: r["zval"] for r in with_zvalue(df, ["x", "y"], bits=4).collect()}
    assert rows[None] == rows[0.0]  # NULL == min bucket


def test_constant_column_degrades_gracefully(spark):
    """max == min: span guard keeps every row in bucket 0 instead of a
    divide-by-zero NULL cascade."""
    df = spark.createDataFrame([(1.0, i * 1.0) for i in range(8)], ["c", "y"])
    out = with_zvalue(df, ["c", "y"], bits=3).collect()
    assert all(r["zval"] is not None for r in out)
    # c contributes identical bits; ordering by zval must equal y order
    z_sorted = [r["y"] for r in sorted(out, key=lambda r: r["zval"])]
    assert z_sorted == sorted(z_sorted)


def test_duckdb_twin_matches(spark):
    import duckdb
    import pandas as pd

    rows = [((i * 37) % 101 * 1.0, (i * 53) % 89 * 1.0) for i in range(500)]
    df = spark.createDataFrame(rows, ["x", "y"]).withColumn(
        "rid", F.monotonically_increasing_id()
    )
    got = (
        with_zvalue(df, ["x", "y"], bits=8)
        .select("x", "y", "zval")
        .toPandas()
        .sort_values(["x", "y"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("t", pd.DataFrame(rows, columns=["x", "y"]))
    zexpr = zvalue_oracle_sql("t", ["x", "y"], bits=8)
    want = (
        con.execute(f"SELECT x, y, ({zexpr}) AS zval FROM t ORDER BY x, y")
        .df()
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_data_skipping_envelopes(spark, tmp_path):
    """Write the same table (a) z-ordered on (a, b), (b) sorted on a
    only. The z layout's per-file min/max envelope on column b must be
    dramatically tighter — that envelope IS what parquet footer pruning
    uses, so tighter == more files skipped for predicates on b."""
    n = 64
    rows = [(i // n, i % n) for i in range(n * n)]
    df = spark.createDataFrame(rows, ["a", "b"])

    zpath = str(tmp_path / "z")
    zorder_repartition(df, ["a", "b"], n_files=16, bits=6).drop("zval").write.parquet(zpath)
    spath = str(tmp_path / "s")
    df.repartitionByRange(16, "a").sortWithinPartitions("a").write.parquet(spath)

    def avg_b_range(path):
        spans = []
        for f in glob.glob(f"{path}/part-*.parquet"):
            pdf = spark.read.parquet(f).agg(
                F.min("b").alias("mn"), F.max("b").alias("mx")
            ).collect()[0]
            spans.append(pdf["mx"] - pdf["mn"])
        return sum(spans) / len(spans)

    z_span, s_span = avg_b_range(zpath), avg_b_range(spath)
    # a-sorted files each contain ~every b value (span ~63); the z
    # layout bounds each file to a z-cell (span <= ~31 at 16 files)
    assert s_span > 0.9 * (n - 1)
    assert z_span <= 0.55 * s_span, (z_span, s_span)
