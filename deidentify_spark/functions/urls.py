"""URL / domain operations for web-text curation.

C4 and RefinedWeb both gate on the URL before ever reading the body:
a domain blocklist (adult/spam hosts) plus per-host statistics used to
spot skew (a handful of hosts dominating a crawl is the #1 shuffle-skew
source — the pipeline already salts on url-hash; this module provides
the observability side).

Host extraction is Spark's built-in ``parse_url`` (JVM, codegen); the
DuckDB oracle twin uses a scheme-authority regexp — identical for
well-formed http(s) URLs without userinfo/port (the crawl normal form).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def url_host(url: Column) -> Column:
    """Lower-cased host of a URL; NULL for unparseable input
    (try_parse_url — plain parse_url RAISES under Spark 4's ANSI mode,
    and a crawl always contains malformed URLs)."""
    return F.lower(F.try_parse_url(url, F.lit("HOST")))


def host_blocked(host: Column, blocked_domains: "tuple[str, ...] | list[str]") -> Column:
    """True when the host IS a blocked registrable domain or any
    subdomain of one (suffix match on '.'+domain) — the standard
    blocklist semantics (blocking example.com blocks ads.example.com
    but not notexample.com)."""
    if not blocked_domains:
        return F.lit(False)
    conds = None
    for d in blocked_domains:
        d = d.lower()
        c = (host == d) | host.endswith("." + d)
        conds = c if conds is None else (conds | c)
    return conds


def domain_filter(
    df: DataFrame,
    blocked_domains: "tuple[str, ...] | list[str]",
    url_col: str = "url",
) -> DataFrame:
    """Adds ``host`` and ``url_keep`` (False for blocked domains or
    unparseable URLs). Pure map-side column work — no shuffle; at
    100 TB this gate runs inside the scan's codegen stage and drops
    rows before any downstream exchange sees them."""
    host = url_host(F.col(url_col))
    return df.withColumn("host", host).withColumn(
        "url_keep",
        F.when(host.isNull(), F.lit(False)).otherwise(
            ~host_blocked(host, blocked_domains)
        ),
    )


def host_doc_counts(
    df: DataFrame,
    blocked_domains: "tuple[str, ...] | list[str]" = (),
    url_col: str = "url",
) -> DataFrame:
    """Per-host doc counts and keep counts — the skew observability
    view (one hash aggregate; map-side combine makes the shuffle
    O(distinct hosts))."""
    flt = domain_filter(df, blocked_domains, url_col)
    return flt.groupBy("host").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("url_keep").cast("bigint")).alias("n_kept"),
    )
