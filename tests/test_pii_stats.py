"""JVM-side PII triage counters vs the Python oracle patterns."""

import regex

from deidentify_spark.functions.pii_stats import PII_VALUE_PATTERNS, pii_hit_counts

SAMPLES = [
    "reach me at jane@corp.com or bob.smith+x@mail.co.uk thanks",
    "call (555) 123-4567 or +1 555 987 6543 today",
    "ssn 123-45-6789 and card 4111 1111 1111 1111",
    "no pii here at all",
    "",
    "edge email a@b.cd digits 1234567890123456",
]


def test_counts_match_python_regex_oracle(spark):
    """Java regexp_extract_all and the Python `regex` oracle must agree
    on these lookaround-free RE2 patterns (the module's entire parity
    claim)."""
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(SAMPLES)], "doc_id long, text string"
    )
    got = {r.doc_id: r for r in pii_hit_counts(df).collect()}
    for i, t in enumerate(SAMPLES):
        for name, pat in PII_VALUE_PATTERNS.items():
            want = len(regex.findall(pat, t))
            assert got[i][f"n_{name}"] == want, (i, name, t)


def test_known_counts(spark):
    df = spark.createDataFrame([(0, SAMPLES[0]), (1, SAMPLES[1]), (2, SAMPLES[2])],
                               "doc_id long, text string")
    out = {r.doc_id: r for r in pii_hit_counts(df).collect()}
    assert out[0].n_emails == 2 and out[0].n_phones == 0
    assert out[1].n_phones == 2
    assert out[2].n_ssns >= 1 and out[2].n_cards == 1
