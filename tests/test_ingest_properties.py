"""Property-based tests (hypothesis) for the ingestion codecs.

The generator-corpus tests pin the invariants on realistic pages; these
drive the same invariants over adversarial inputs — arbitrary unicode
lines for the HTML round trip, arbitrary bytes for WARC framing.
"""

from __future__ import annotations

from datetime import datetime

from hypothesis import given, settings
from hypothesis import strategies as st

from deidentify_spark.functions.htmlx import extract_html_text
from deidentify_spark.sources.pages import _html_escape
from deidentify_spark.sources.warc import (
    iter_warc_records,
    parse_response_payload,
    render_response_record,
)


def _normal_line(s: str) -> str:
    """Whitespace-normal form: what the extractor guarantees per line.
    Uses the python str.split() whitespace model the extractor's
    ' '.join(x.split()) produces."""
    return " ".join(s.split())


# printable-ish unicode without the chars whose entity forms we don't
# re-escape in the minimal renderer below
line_st = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)),
    min_size=0,
    max_size=120,
)


@settings(max_examples=300, deadline=None)
@given(st.lists(line_st, min_size=0, max_size=8))
def test_html_round_trip_on_normalized_lines(lines):
    """For ANY text in whitespace-normal form (per-line stripped +
    single spaces, no empty lines), render-as-<p>-per-line then extract
    is the identity."""
    norm = [_normal_line(ln) for ln in lines]
    norm = [ln for ln in norm if ln]
    html = "<html><body>" + "".join(
        f"<p>{_html_escape(ln)}</p>" for ln in norm
    ) + "</body></html>"
    assert extract_html_text(html) == "\n".join(norm)


@settings(max_examples=300, deadline=None)
@given(st.binary(min_size=0, max_size=2048))
def test_warc_framing_is_binary_safe(payload):
    """Content-Length framing must round-trip ANY body bytes, including
    ones embedding record separators and WARC headers."""
    rec = render_response_record(
        "https://x.example/p", datetime(2024, 1, 2, 3, 4, 5), payload
    )
    [(off, headers, got)] = list(iter_warc_records(rec))
    assert headers["warc-type"] == "response"
    assert parse_response_payload(got) == payload


@settings(max_examples=100, deadline=None)
@given(st.lists(st.binary(min_size=0, max_size=512), min_size=1, max_size=6))
def test_warc_concatenated_records_all_recovered(payloads):
    blob = b"".join(
        render_response_record(
            f"https://x.example/{i}", datetime(2024, 1, 2, 3, 4, 5), p
        )
        for i, p in enumerate(payloads)
    )
    got = [
        parse_response_payload(p)
        for _, h, p in iter_warc_records(blob)
        if h["warc-type"] == "response"
    ]
    assert got == payloads


@settings(max_examples=150, deadline=None)
@given(st.lists(st.binary(min_size=0, max_size=4096), min_size=1, max_size=20))
def test_member_gunzip_equals_stdlib(chunks):
    """The bounded-chunk zlib member loop is byte-equivalent to
    gzip.decompress on any concatenated-member stream (including
    members larger than the chunk size when scaled down)."""
    import gzip

    from deidentify_spark.sources.warc import _gunzip_members, _gzip_member

    blob = b"".join(_gzip_member(c) for c in chunks)
    assert _gunzip_members(blob) == gzip.decompress(blob)
    # tiny chunk forces the multi-slice-per-member path
    assert _gunzip_members(blob, chunk=7) == gzip.decompress(blob)
