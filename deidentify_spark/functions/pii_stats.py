"""JVM-side PII hit counting — the cheap triage pass.

The full scrub (oracle/core.py via the fused Arrow stage) is the
authoritative detector: ordered passes, Luhn validation, context
gates, suppressors. But at 100 TB you often want a SURVEY first —
"how much PII of which class is in this crawl slice?" — without paying
the Python scrub on every byte. These counters run the reference's
VALUE patterns (patterns.go:6-22, transcribed in oracle/patterns.py)
as plain ``regexp_extract_all`` Column expressions: whole-stage
codegen, no Arrow, no Python, and DuckDB-oracle expressible because
exactly these four patterns are lookaround-free RE2 (the name/address
passes need lookarounds + context and stay oracle-only).

Counts are RAW pattern hits (no Luhn/context validation), so they
upper-bound the scrub's hit counts — the right semantics for triage
and for routing slices to the expensive pass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from deidentify_spark.oracle.patterns import (
    CREDIT_CARD_PATTERN,
    EMAIL_PATTERN,
    PHONE_PATTERN,
    SSN_PATTERN,
)

# The four value patterns are pure ASCII RE2 (classes + quantifiers +
# one optional group) — identical semantics in Java regex and DuckDB
# RE2; non-overlapping leftmost scanning on both engines.
PII_VALUE_PATTERNS: dict[str, str] = {
    "emails": EMAIL_PATTERN,
    "phones": PHONE_PATTERN,
    "ssns": SSN_PATTERN,
    "cards": CREDIT_CARD_PATTERN,
}


def _count(text: Column, pattern: str) -> Column:
    return F.size(F.regexp_extract_all(text, F.lit(pattern), F.lit(0)))


def pii_hit_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds ``n_emails / n_phones / n_ssns / n_cards`` — raw value-
    pattern hit counts per document. Map-side only; at scale this runs
    inside the scan stage and its per-class sums feed the same lineage
    table the scrub writes."""
    out = df
    for name, pat in PII_VALUE_PATTERNS.items():
        out = out.withColumn(f"n_{name}", _count(F.col(text_col), pat))
    return out
