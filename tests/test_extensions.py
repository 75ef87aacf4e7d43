"""Opt-in IP detector extension (beyond reference parity — north_star
lists IPs; the reference library has none)."""

import pytest
import regex

from deidentify_spark.oracle import Deidentifier
from deidentify_spark.oracle.extensions import (
    ExtendedDeidentifier,
    is_valid_ipv4,
)


@pytest.fixture(scope="module")
def d():
    return ExtendedDeidentifier("test-secret-key")


def test_ip_detection_and_format(d):
    out = d.text("Server at 192.168.1.100 responded; peer was 8.8.8.8.")
    assert "192.168.1.100" not in out and "8.8.8.8" not in out
    ips = regex.findall(r"10\.\d{1,3}\.\d{1,3}\.\d{1,3}", out)
    assert len(ips) == 2
    for ip in ips:
        assert is_valid_ipv4(ip)


def test_invalid_octets_not_replaced(d):
    # shape matches but 999 > 255 — validation must reject
    out = d._process_ips("bad addr 999.1.1.1 stays")
    assert "999.1.1.1" in out
    # version strings / longer runs are not IPs
    assert d._process_ips("v1.2.3.4.5 unchanged") == "v1.2.3.4.5 unchanged"


def test_ip_determinism_and_key_sensitivity(d):
    a = d.generate_ip("192.168.1.100")
    b = ExtendedDeidentifier("test-secret-key").generate_ip("192.168.1.100")
    c = ExtendedDeidentifier("other-key").generate_ip("192.168.1.100")
    assert a == b != c
    assert a.startswith("10.")


def test_reference_parity_preserved_when_off(d):
    """The extension must not disturb the default engine's output."""
    base = Deidentifier("test-secret-key")
    text = "John Smith (john@x.com) called (555) 123-4567 from 192.168.1.1."
    # base engine: IP untouched (reference has no detector)...
    base_out = base.text(text)
    # ...except where the reference's own passes intersect digit runs.
    ext_out = d.text(text)
    assert "192.168.1.1" not in ext_out
    # the non-IP scrubbing is identical between engines
    assert base_out.split("from")[0] == ext_out.split("from")[0]


def test_pipeline_flag_smoke(spark):
    from pyspark.sql import functions as F

    from deidentify_spark.pipeline.stages import PipelineConfig, run_pipeline

    rows = [
        (
            "https://x.example/ip",
            None,
            " ".join(
                ["The server logged a request from 192.168.1.100 yesterday evening."]
                + [
                    "The committee approved the new budget after a long debate over infrastructure spending.",
                ]
                * 8
            ),
            "en",
        )
    ]
    df = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, text string, lang string"
    ).withColumn("html", F.lit(b""))
    out_on = run_pipeline(df, PipelineConfig(secret_key="k", detect_ips=True)).head()
    out_off = run_pipeline(df, PipelineConfig(secret_key="k")).head()
    assert out_on.keep and out_off.keep
    assert "192.168.1.100" not in out_on.scrubbed_text
    assert out_on.pii_hits.get("ip", 0) == 1
    assert "ip" not in (out_off.pii_hits or {})


def test_ip_pass_runs_after_email_pass():
    """A dotted quad inside an email hostname belongs to the EMAIL
    replacement: text() must produce the same fake as the scalar .email()
    API for the identical value (the old IP-first order rewrote the quad
    inside the email and broke same-(key,value)->same-fake)."""
    from deidentify_spark.oracle.extensions import ExtendedDeidentifier

    d = ExtendedDeidentifier("k")
    addr = "user@123.231.12.98.example.com"
    out = d.text(f"contact {addr} now")
    d2 = ExtendedDeidentifier("k")
    assert d2.email(addr) in out
    # standalone quads still get the IP treatment, before the phone pass
    d3 = ExtendedDeidentifier("k")
    out2 = d3.text("server at 192.168.7.13 responded")
    assert "192.168.7.13" not in out2 and "10." in out2


def test_unknown_data_type_raises():
    import pytest as _pytest

    from deidentify_spark.oracle import Deidentifier

    d = Deidentifier("k")
    with _pytest.raises(ValueError, match="unknown data_type"):
        d.deidentify_value("x@y.com", "emial", "email")
    # extension types reach the extended engine's table
    from deidentify_spark.oracle.extensions import ExtendedDeidentifier

    assert ExtendedDeidentifier("k").deidentify_value(
        "1.2.3.4", "ip", "ip"
    ).startswith("10.")
