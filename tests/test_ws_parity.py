"""Exotic-whitespace parity: the three engines disagree about '\\s'
(RE2 = [\\t\\n\\f\\r ], Java adds \\x0B, Python str.split() adds all
unicode whitespace), so every operator with a DuckDB oracle twin pins its
tokenization on docs with leading tabs, trailing newlines, NBSP, vertical
tabs, and whitespace-only text — the corpus the sf* fixtures never
exercise but real web text does."""

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as e

EVIL_DOCS = [
    (0, "plain words here for a baseline document"),
    (1, "\tleading tab then words follow here now"),
    (2, "trailing newline after these words here\n"),
    (3, "non breaking spaces between these words here"),
    (4, "vertical\x0btab inside these words here today"),
    (5, "   "),
    (6, ""),
    (7, "\tleading tab then words follow here now"),  # dup of 1
    (8, "plain words here for a baseline document"),  # dup of 0
    (9, "plain words here for a baseline document extra"),
]


@pytest.fixture(scope="module")
def evil_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("evil")
    spark.createDataFrame(EVIL_DOCS, "doc_id long, text string").coalesce(
        1
    ).write.parquet(str(d / "documents.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def con(evil_dir):
    c = duckdb.connect()
    c.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{evil_dir}/documents.parquet/*.parquet')"
    )
    return c


def _compare(spark, con, name, sf_dir):
    sdf = e.queries()[name](spark, sf_dir).toPandas()
    odf = con.execute(e.oracle_sql()[name]).df()
    cols = sorted(sdf.columns)
    assert cols == sorted(odf.columns)
    s = sdf[cols].sort_values(cols).reset_index(drop=True)
    o = odf[cols].sort_values(cols).reset_index(drop=True)
    assert len(s) == len(o), (name, len(s), len(o))
    pd.testing.assert_frame_equal(s, o, check_dtype=False)


@pytest.mark.parametrize(
    "name",
    [
        "token_counts_documents",
        "winnowing_fingerprints_documents",
        "simhash_near_dups_documents",
        "minhash_lsh_candidates_documents",
        "ngram_jaccard_near_dups",
        "dedup_exact_documents",
    ],
)
def test_whitespace_parity(spark, con, evil_dir, name):
    _compare(spark, con, name, evil_dir)
