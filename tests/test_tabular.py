"""Tabular API parity with the oracle (reference Table/Slices semantics)
and salted-aggregation correctness."""

from pyspark.sql import functions as F

from deidentify_spark.operators.tabular import (
    deidentify_table,
    infer_column_types,
    salted_group_count,
)
from deidentify_spark.oracle import Deidentifier

KEY = "test-secret-key"


def test_table_scrub_matches_oracle(spark):
    rows = [
        (1, "John Doe", "john.doe@example.com", "555-123-4567", "active"),
        (2, "Jane Smith", "jane.smith@company.org", "(555) 987-6543", "inactive"),
        (3, None, "", "555.111.2222", "active"),
    ]
    df = spark.createDataFrame(
        rows, "id long, name string, email string, phone string, status string"
    )
    types = {"name": "name", "email": "email", "phone": "phone"}
    out = {r.id: r for r in deidentify_table(df, KEY, types).collect()}

    d = Deidentifier(KEY)
    assert out[1].name == d.deidentify_value("John Doe", "name", "name")
    assert out[1].email == d.deidentify_value("john.doe@example.com", "email", "email")
    assert out[2].phone == d.deidentify_value("(555) 987-6543", "phone", "phone")
    # null stays null, '' stays '', generic/untyped untouched
    assert out[3].name is None
    assert out[3].email == ""
    assert out[1].status == "active" and out[1].id == 1


def test_inference_on_dataframe(spark):
    rows = [
        ("john@example.com", "John Doe", "(555) 123-4567", "x1"),
        ("jane@company.org", "Jane Smith", "555-987-6543", "x2"),
    ]
    df = spark.createDataFrame(rows, "a string, b string, c string, d string")
    types = infer_column_types(df, order_by="a")
    assert types == {"a": "email", "b": "name", "c": "phone", "d": "generic"}
    # end-to-end: inferred scrub changes PII columns, keeps generic
    out = deidentify_table(df, KEY, types).collect()
    assert out[0].d in ("x1", "x2")
    assert "@" in out[0].a and out[0].a not in ("john@example.com", "jane@company.org")


def test_salted_group_count_equals_plain(spark):
    df = spark.range(0, 5000).select(
        (F.col("id") % 7).alias("k"), (F.col("id") % 100).cast("double").alias("v")
    )
    salted = {
        (r.k): (r.n_rows, r.sum_v)
        for r in salted_group_count(df, "k", n_salts=8, agg_col="v")
        .withColumnRenamed("sum_v", "sum_v")
        .collect()
    }
    plain = {
        r.k: (r.n, round(r.s, 2))
        for r in df.groupBy("k")
        .agg(F.count("*").alias("n"), F.sum("v").alias("s"))
        .collect()
    }
    assert salted == plain


def test_examples_run(spark):
    """Every examples/ script must at least execute (library demos)."""
    import pathlib
    import subprocess
    import sys as _sys

    root = pathlib.Path(__file__).resolve().parent.parent
    # non-Spark ones (fast); slices.py self-asserts the reference demo
    # behaviors including the same-key column-name caveat (SURVEY §0.2)
    for script in ["basic.py", "international.py", "slices.py"]:
        r = subprocess.run(
            [_sys.executable, str(root / "examples" / script)],
            capture_output=True,
            text=True,
            timeout=120,
        )
        assert r.returncode == 0, r.stderr[-500:]
        assert r.stdout.strip()


def test_group_quality_profile_matches_sql_semantics(spark):
    import numpy as np

    from deidentify_spark.operators.tabular import group_quality_profile

    df = spark.createDataFrame(
        [("a", float(v)) for v in range(1, 11)] + [("b", 5.0), ("b", 7.0)],
        "g string, v double",
    )
    out = {r.g: r for r in group_quality_profile(df, "g", "v").collect()}
    assert out["a"].n_rows == 10
    assert out["a"].p50 == round(float(np.percentile(np.arange(1, 11), 50)), 4)
    assert out["b"].p25 == 5.5  # linear interpolation between 5 and 7


def test_tabular_fixture_files(spark):
    """FIXTURES.md F3: the committed tabular fixtures drive both the
    scalar oracle and the Spark per-column path."""
    import json
    import pathlib

    from deidentify_spark.oracle import Deidentifier

    fixtures = pathlib.Path(__file__).resolve().parent.parent / "fixtures"
    tf = json.loads((fixtures / "table_fixture.json").read_text())
    d = Deidentifier(tf["secret_key"])
    result = d.table(tf["columns"])
    for col, orig in zip(result, tf["columns"]):
        for v, o in zip(col["values"], orig["values"]):
            if o is None:
                assert v is None
            elif o == "":
                assert v == ""
            else:
                assert v != o

    sf = json.loads((fixtures / "slices_fixture.json").read_text())
    out = d.slices(sf["rows"], sf["column_types"], sf["column_names"])
    assert len(out) == len(sf["rows"]) and out[3] == ["", "", "", ""]
    for ds in sf["inference_datasets"]:
        assert d.infer_column_types(ds["rows"]) == ds["expected_types"], ds["name"]

    # same fixture through the Spark tabular path matches the oracle
    from deidentify_spark.operators.tabular import deidentify_table

    rows = [tuple(r) for r in sf["rows"]]
    df = spark.createDataFrame(rows, "name string, email string, phone string, ssn string")
    types = dict(zip(sf["column_names"], sf["column_types"]))
    got = {r.email for r in deidentify_table(df, tf["secret_key"], types).collect()}
    want = {r[1] for r in out}
    assert got == want


def test_go_format_float_parity():
    """Go strconv.FormatFloat(f,'g',-1,64) forms. The shortest-'g'
    scientific switch is exp < -4 or exp >= 6 (ftoa.go eprec=6), so
    1e6 -> '1e+06' and 1e20 -> '1e+20' (NOT the ES6/json [-4,21)
    window). No Go toolchain in-sandbox; derived from strconv source
    semantics — re-pin against fmt.Sprintf("%v") if one appears."""
    from deidentify_spark.functions.coerce import go_format_float, go_format_value

    cases = {
        1.5: "1.5",
        100000.0: "100000",
        -2.0: "-2",
        0.0: "0",
        1e21: "1e+21",
        1.5e21: "1.5e+21",
        1e20: "1e+20",
        2e20: "2e+20",
        1e6: "1e+06",
        1048576.0: "1.048576e+06",
        0.0001: "0.0001",
        0.00001: "1e-05",
        -0.25: "-0.25",
        3.141592653589793: "3.141592653589793",
        123456.789: "123456.789",
    }
    for f, want in cases.items():
        assert go_format_float(f) == want, (f, go_format_float(f), want)
    assert go_format_value(True) == "true"
    assert go_format_value(False) == "false"
    assert go_format_value(42) == "42"
    assert go_format_value("x") == "x"


def test_table_mixed_types_spark_oracle_parity(spark):
    """Bool/double/long PII-typed cells: the Spark path and the scalar
    oracle must produce the SAME replacement (reference coerces with Go
    %v: 'true', '100000', not Python 'True'/'100000.0')."""
    rows = [
        (1, True, 100000.0, 5551234567),
        (2, False, 1.5, 5559876543),
        (3, None, None, None),
    ]
    df = spark.createDataFrame(
        rows, "id long, flag boolean, amount double, phone long"
    )
    types = {"flag": "name", "amount": "name", "phone": "phone"}
    got = {r.id: r for r in deidentify_table(df, KEY, types).collect()}

    d = Deidentifier(KEY)
    assert got[1].flag == d.deidentify_value("true", "name", "flag")
    assert got[2].flag == d.deidentify_value("false", "name", "flag")
    assert got[1].amount == d.deidentify_value("100000", "name", "amount")
    assert got[2].amount == d.deidentify_value("1.5", "name", "amount")
    assert got[1].phone == d.deidentify_value("5551234567", "phone", "phone")
    assert got[3].flag is None and got[3].amount is None and got[3].phone is None
    # oracle table() agrees end-to-end on raw Python values
    tbl = d.table(
        [{"name": "flag", "data_type": "name", "values": [True, False, None]}]
    )
    assert tbl[0]["values"][0] == got[1].flag
    assert tbl[0]["values"][1] == got[2].flag


def test_salted_group_count_deterministic_and_double(spark):
    """Salt derives from a stable row key: identical layout across runs;
    the summed aggregate is DOUBLE (DuckDB ROUND(SUM(BIGINT),2) parity)."""
    df = spark.range(0, 2000).select(
        F.col("id"), (F.col("id") % 5).alias("k"), (F.col("id") % 13).alias("v")
    )
    out1 = salted_group_count(df, "k", n_salts=4, agg_col="v", salt_key_col="id")
    assert dict(out1.dtypes)["sum_v"] == "double"
    r1 = sorted((r.k, r.n_rows, r.sum_v) for r in out1.collect())
    r2 = sorted(
        (r.k, r.n_rows, r.sum_v)
        for r in salted_group_count(
            df.repartition(7), "k", n_salts=4, agg_col="v", salt_key_col="id"
        ).collect()
    )
    assert r1 == r2
    plain = sorted(
        (r.k, r.n, float(r.s))
        for r in df.groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))
        .collect()
    )
    assert [(k, n, s) for k, n, s in r1] == plain


def test_go_format_float32_and_specials():
    from deidentify_spark.functions.coerce import go_format_float

    assert go_format_float(0.10000000149011612, bits=32) == "0.1"
    assert go_format_float(1.5, bits=32) == "1.5"
    assert go_format_float(float("nan")) == "NaN"
    assert go_format_float(float("inf")) == "+Inf"
    assert go_format_float(float("-inf")) == "-Inf"


def test_table_nan_and_float32_parity(spark):
    """NaN VALUES scrub as the Go %v string 'NaN' (not NULL) on BOTH
    engines — the JVM string cast keeps SQL NULL and NaN apart where an
    Arrow float series could not — and float32 cells hash their
    32-bit-shortest form ('0.1'), not the float64 widening
    ('0.10000000149011612')."""
    rows = [(1, float("nan"), 0.1), (2, None, None), (3, 2.5, 1.5)]
    df = spark.createDataFrame(rows, "id long, d double, f float")
    types = {"d": "name", "f": "name"}
    got = {r.id: r for r in deidentify_table(df, KEY, types).collect()}
    d = Deidentifier(KEY)
    assert got[1].d == d.deidentify_value("NaN", "name", "d")
    assert got[1].f == d.deidentify_value("0.1", "name", "f")
    assert got[2].d is None and got[2].f is None
    assert got[3].d == d.deidentify_value("2.5", "name", "d")
    assert got[3].f == d.deidentify_value("1.5", "name", "f")
    # oracle table() on the raw Python values agrees for the double col
    tbl = d.table([{"name": "d", "data_type": "name",
                    "values": [float("nan"), None, 2.5]}])
    assert tbl[0]["values"] == [got[1].d, None, got[3].d]


def test_infer_float32_column_stays_generic(spark):
    """FloatType columns stringify with 32-bit Go formatting during
    inference — the 64-bit widening ('0.10000000149011612') carried digit
    runs long enough to mis-infer ordinary numeric columns as phone/ssn,
    which the scrub would then destroy."""
    df = spark.createDataFrame(
        [(1, 0.1), (2, 0.2), (3, 0.3)], "id long, amount float"
    )
    types = infer_column_types(df, order_by="id")
    assert types["amount"] == "generic"


def test_group_profile_ignores_nulls(spark):
    """SQL aggregates ignore NULLs; the grouped-map profile must too
    (NaN would otherwise poison every statistic of the group)."""
    from deidentify_spark.operators.tabular import group_quality_profile

    df = spark.createDataFrame(
        [("a", 1.0), ("a", None), ("a", 3.0), ("b", None)],
        "g string, v double",
    )
    out = {r.g: r for r in group_quality_profile(df, "g", "v").collect()}
    assert out["a"].n_rows == 3 and out["a"].mean_value == 2.0
    assert out["a"].p50 == 2.0
    assert out["b"].n_rows == 1 and out["b"].mean_value is None
