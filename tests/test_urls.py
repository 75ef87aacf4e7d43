"""URL/domain filtering (functions/urls.py)."""

from pyspark.sql import functions as F

from deidentify_spark.functions.urls import (
    domain_filter,
    host_doc_counts,
    url_host,
)


def _urls(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, url string")


def test_url_host_extraction(spark):
    df = _urls(spark, [
        (0, "https://Host0042.Example/page/1"),
        (1, "http://sub.spam.example/x?q=1"),
        (2, "not a url"),
    ])
    got = {r.doc_id: r.h for r in df.select(
        "doc_id", url_host(F.col("url")).alias("h")).collect()}
    assert got[0] == "host0042.example"
    assert got[1] == "sub.spam.example"
    assert got[2] is None


def test_domain_filter_suffix_semantics(spark):
    df = _urls(spark, [
        (0, "https://spam.example/a"),        # exact match -> blocked
        (1, "https://ads.spam.example/b"),    # subdomain -> blocked
        (2, "https://notspam.example/c"),     # suffix of name only -> kept
        (3, "https://clean.example/d"),
        (4, "garbage"),                       # unparseable -> not kept
    ])
    out = {r.doc_id: r.url_keep for r in
           domain_filter(df, ["spam.example"]).collect()}
    assert out == {0: False, 1: False, 2: True, 3: True, 4: False}


def test_host_doc_counts_and_map_only_filter(spark):
    rows = [(i, f"https://host{i % 3}.example/p/{i}") for i in range(30)]
    counts = {r.host: (r.n_docs, r.n_kept) for r in
              host_doc_counts(_urls(spark, rows), ["host1.example"]).collect()}
    assert counts["host0.example"] == (10, 10)
    assert counts["host1.example"] == (10, 0)
    # the gate itself is pure map-side column work: no exchange
    plan = (domain_filter(_urls(spark, rows), ["host1.example"])
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan, plan
