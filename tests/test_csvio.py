"""CSV round-trip of the Slices surface (sources/csvio.py): byte parity
with the scalar oracle's slices() on the reference fixture data."""

import csv
import json
import pathlib

from deidentify_spark.sources.csvio import deidentify_csv, read_slices_csv

FIXTURES = pathlib.Path(__file__).resolve().parent.parent / "fixtures"


def _fixture():
    return json.loads((FIXTURES / "slices_fixture.json").read_text())


def _write_csv(path, header, rows):
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(header)
        w.writerows(rows)


def test_deidentify_csv_matches_scalar_slices_oracle(spark, tmp_path):
    from deidentify_spark.oracle import Deidentifier

    fx = _fixture()
    inp = tmp_path / "in.csv"
    _write_csv(inp, fx["column_names"], fx["rows"])

    types = dict(zip(fx["column_names"], fx["column_types"]))
    out_dir = tmp_path / "out"
    deidentify_csv(
        spark, str(inp), str(out_dir), fx["secret_key"], column_types=types
    )

    # scalar oracle over the same [][]string (header + rows)
    d = Deidentifier(fx["secret_key"])
    expected = d.slices(
        [fx["column_names"], *fx["rows"]], fx["column_types"]
    )[1:]

    got_rows = []
    for p in sorted(out_dir.glob("*.csv")):
        with open(p, newline="") as f:
            r = csv.reader(f)
            header = next(r)
            assert header == fx["column_names"]
            got_rows += [row for row in r]
    # order-independent: CSV part files come back in partition order
    assert sorted(got_rows) == sorted(expected)


def test_read_slices_csv_preserves_empty_cells(spark, tmp_path):
    inp = tmp_path / "e.csv"
    _write_csv(inp, ["a", "b"], [["", "x"], ["y", ""]])
    df = read_slices_csv(spark, str(inp))
    rows = {tuple(r) for r in df.collect()}
    assert rows == {("", "x"), ("y", "")}
    assert [f.dataType.simpleString() for f in df.schema.fields] == [
        "string",
        "string",
    ]


def test_deidentify_csv_infers_types_when_absent(spark, tmp_path):
    fx = _fixture()
    inp = tmp_path / "in.csv"
    _write_csv(inp, fx["column_names"], fx["rows"])
    types = deidentify_csv(
        spark,
        str(inp),
        str(tmp_path / "out"),
        fx["secret_key"],
        order_by=fx["column_names"][0],
    )
    # the fixture columns are named after their content; inference must
    # recover the PII types for the unambiguous ones (email/phone/ssn)
    assert types["email"] == "email"
    assert types["phone"] == "phone"
    assert types["ssn"] == "ssn"
