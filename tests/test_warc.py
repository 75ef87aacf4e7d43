"""WARC source/sink (sources/warc.py): record rendering, member-gzip
layout, distributed round trip, and the full WARC -> html-extraction ->
pipeline ingestion chain."""

from __future__ import annotations

import gzip
from datetime import datetime

import pytest

from deidentify_spark.sources.warc import (
    iter_warc_records,
    parse_response_payload,
    render_response_record,
    read_warc,
    write_warc,
)

TS = datetime(2024, 3, 1, 12, 0, 0)


def test_record_render_parse_scalar():
    rec = render_response_record("https://x.example/a", TS, b"<p>hi</p>")
    [(off, headers, payload)] = list(iter_warc_records(rec))
    assert off == 0
    assert headers["warc-type"] == "response"
    assert headers["warc-target-uri"] == "https://x.example/a"
    assert headers["warc-date"] == "2024-03-01T12:00:00Z"
    assert parse_response_payload(payload) == b"<p>hi</p>"


def test_record_render_is_deterministic():
    a = render_response_record("https://x.example/a", TS, b"<p>hi</p>")
    b = render_response_record("https://x.example/a", TS, b"<p>hi</p>")
    assert a == b  # uuid5 record id, no wall clock anywhere


def test_multi_member_gzip_and_record_skip():
    """Real CC layout: one gzip member per record, request/metadata
    records interleaved with responses — only responses surface."""
    import io

    def member(b: bytes) -> bytes:
        buf = io.BytesIO()
        with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
            gz.write(b)
        return buf.getvalue()

    resp = render_response_record("https://x.example/r", TS, b"<p>r</p>")
    req = (
        b"WARC/1.0\r\nWARC-Type: request\r\nWARC-Target-URI: https://x.example/r\r\n"
        b"WARC-Date: 2024-03-01T12:00:00Z\r\nContent-Length: 5\r\n\r\nGET /\r\n\r\n"
    )
    info = (
        b"WARC/1.0\r\nWARC-Type: warcinfo\r\nWARC-Date: 2024-03-01T12:00:00Z\r\n"
        b"Content-Length: 9\r\n\r\nrobots: x\r\n\r\n"
    )
    blob = member(info) + member(req) + member(resp)
    got = [
        h["warc-type"] for _, h, _ in iter_warc_records(blob)
    ]
    assert got == ["warcinfo", "request", "response"]


def test_binary_safe_payload():
    """Payload bytes that look like record separators must not split the
    record (Content-Length framing, not delimiter scanning)."""
    evil = b"abc\r\n\r\nWARC/1.0\r\n\r\nxyz" + bytes(range(256))
    rec = render_response_record("https://x.example/b", TS, evil)
    [(_, h, payload)] = list(iter_warc_records(rec))
    assert parse_response_payload(payload) == evil


@pytest.mark.usefixtures("spark")
def test_distributed_round_trip(spark, tmp_path):
    from deidentify_spark.sources.pages import PAGE_COLUMNS, generate_pages

    pages = generate_pages(spark, 300, seed=23, partitions=4).select(*PAGE_COLUMNS)
    out = str(tmp_path / "warc")
    manifest = write_warc(pages, out)
    m = manifest.collect()
    assert len(m) == 4 and sum(r.n_records for r in m) == 300

    back = read_warc(spark, out + "/*.warc.gz")
    joined = (
        pages.select("url", "warc_ts", "html")
        .join(back.select("url", "warc_ts", "html"), ["url", "warc_ts", "html"])
    )
    assert joined.count() == 300  # url+ts+html all byte/value-identical
    assert back.count() == 300

    # the object-store fallback (contents through Arrow) reads the same
    via = read_warc(spark, out + "/*.warc.gz", via_content=True)
    assert via.select("url", "warc_ts", "html").exceptAll(
        back.select("url", "warc_ts", "html")
    ).count() == 0


@pytest.mark.usefixtures("spark")
def test_warc_to_pipeline_chain(spark, tmp_path):
    """Full ingestion posture: WARC files -> read_warc -> extract html ->
    run_pipeline(extract_from_html) matches the direct text path."""
    from pyspark.sql import functions as F

    from deidentify_spark.pipeline.stages import PipelineConfig, run_pipeline
    from deidentify_spark.sources.pages import PAGE_COLUMNS, generate_pages

    pages = generate_pages(spark, 150, seed=29, partitions=3).select(*PAGE_COLUMNS)
    out = str(tmp_path / "warc")
    write_warc(pages, out).collect()

    ingested = read_warc(spark, out + "/*.warc.gz").select(
        "url", "warc_ts", "html",
        F.lit(None).cast("string").alias("text"),
        F.lit("en").alias("lang"),
    )
    got = run_pipeline(ingested, PipelineConfig(secret_key="k", extract_from_html=True))
    want = run_pipeline(pages, PipelineConfig(secret_key="k"))
    cols = ["url", "lang_pred", "drop_reason", "keep", "scrubbed_text"]
    assert want.select(cols).exceptAll(got.select(cols)).count() == 0
    assert got.select(cols).exceptAll(want.select(cols)).count() == 0
