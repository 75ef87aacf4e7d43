"""Unicode normalization (functions/normalize.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from deidentify_spark.functions.normalize import (
    nfc_py,
    normalize_text_column,
    normalize_text_sql,
)


def test_nfc_scalar():
    assert nfc_py("café") == "café"
    assert nfc_py("café") == "café"  # idempotent
    assert nfc_py(None) is None
    # NFC is not NFKC: compatibility forms stay distinct
    assert nfc_py("ﬁ") == "ﬁ"


def test_spark_normalize_and_control_strip(spark):
    rows = [
        (0, "café x"),
        (1, "tab\tand\nnewline\rkept"),
        (2, "ctrl\x08\x00gone\x7f"),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "i long, t string")
    got = {
        r.i: r.n
        for r in df.select(
            "i", normalize_text_column("t").alias("n")
        ).collect()
    }
    assert got[0] == "café x"
    assert got[1] == "tab\tand\nnewline\rkept"
    assert got[2] == "ctrlgone"
    assert got[3] is None


def test_duckdb_twin_parity(spark):
    """CPython unicodedata and DuckDB utf8proc agree on NFC + strip."""
    import duckdb

    samples = [
        "café ctrl\x08!",
        "already café",
        "mixed Å ring and Å angstrom",  # NFC maps U+212B -> Å
        "plain ascii",
    ]
    df = spark.createDataFrame([(i, s) for i, s in enumerate(samples)], "i long, t string")
    got = {
        r.i: r.n
        for r in df.select("i", normalize_text_column("t").alias("n")).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t (i BIGINT, t VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", list(enumerate(samples)))
    want = dict(
        con.execute(
            f"SELECT i, {normalize_text_sql('t')} FROM t ORDER BY i"
        ).fetchall()
    )
    assert got == want
