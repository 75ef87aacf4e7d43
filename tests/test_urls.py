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


def test_canonicalize_url_cases(spark):
    from deidentify_spark.functions.urls import canonicalize_url

    cases = [
        # (input, expected default, expected strip_www)
        ("HTTP://Example.COM:80//a//b/?utm_source=x&b=2&a=1#frag",
         "http://example.com/a/b?a=1&b=2",
         "http://example.com/a/b?a=1&b=2"),
        ("https://WWW.Example.com:443/", "https://www.example.com/",
         "https://example.com/"),
        ("https://example.com", "https://example.com/", "https://example.com/"),
        ("https://example.com:8443/x/", "https://example.com:8443/x",
         "https://example.com:8443/x"),  # non-default port kept
        ("http://example.com/?utm_campaign=a&fbclid=b", "http://example.com/",
         "http://example.com/"),  # all-tracking query vanishes
        ("ftp://Files.example/Pub/", "ftp://files.example/Pub",
         "ftp://files.example/Pub"),  # path case preserved, scheme/host lowered
        ("not a url", None, None),
        ("", None, None),
    ]
    df = spark.createDataFrame(
        [(i, c[0]) for i, c in enumerate(cases)], "i long, u string"
    )
    got_plain = {r.i: r.c for r in df.select(
        "i", canonicalize_url(F.col("u")).alias("c")).collect()}
    got_www = {r.i: r.c for r in df.select(
        "i", canonicalize_url(F.col("u"), strip_www=True).alias("c")).collect()}
    for i, (_, want_plain, want_www) in enumerate(cases):
        assert got_plain[i] == want_plain, (i, got_plain[i])
        assert got_www[i] == want_www, (i, got_www[i])


def test_canonicalize_sql_twin_parity(spark):
    """The DuckDB fragment and the Spark expression agree on a grid of
    messy URLs (the full-branch construction the driver query uses)."""
    import duckdb

    from deidentify_spark.functions.urls import canonicalize_url, canonicalize_url_sql

    urls = [
        "HTTP://A.B:80//p//q/?z=1&utm_term=t#f",
        "https://WWW.x.Y:443/?a=2&a=1",
        "HtTpS://Host/",
        "weird",
        "s3://bucket/key?x=1",
    ]
    df = spark.createDataFrame([(i, u) for i, u in enumerate(urls)], "i long, u string")
    got = {r.i: r.c for r in df.select(
        "i", canonicalize_url(F.col("u"), strip_www=True).alias("c")).collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE t (i BIGINT, u VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", list(enumerate(urls)))
    frag = canonicalize_url_sql("u", strip_www=True)
    want = dict(con.execute(f"SELECT i, {frag} FROM t ORDER BY i").fetchall())
    assert got == want, (got, want)
