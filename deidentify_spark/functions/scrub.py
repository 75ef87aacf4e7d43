"""Vectorized scrub stage: the oracle's 8-pass PII rewrite as an Arrow
pandas UDF, plus per-detector hit counts for the lineage/metrics table.

The replacement function is pure in (secret_key, type, value) — see
SURVEY.md §0 / deidentify.go:291-335 — so the UDF is stateless across
batches and tasks; the per-batch ``Deidentifier`` instance only carries
the memoization cache, which (like the reference's mapping table) never
changes output, only skips repeated HMAC work within a batch.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

from deidentify_spark.oracle import Deidentifier
from deidentify_spark.oracle.extensions import ExtendedDeidentifier

SCRUB_SCHEMA = StructType(
    [
        StructField("scrubbed_text", StringType()),
        StructField("pii_hits", MapType(StringType(), LongType())),
    ]
)


class _CountingMixin:
    """Tallies replacements by PII type (every detector hit, including
    memoized repeats) for the ``pii_hits`` metrics map, without touching
    replacement semantics."""

    def __init__(self, secret_key: str) -> None:
        super().__init__(secret_key)
        self.hits: dict[str, int] = {}

    def reset_hits(self) -> None:
        self.hits = {}

    def deidentify_value(self, value: str, data_type: str, column_name: str) -> str:
        if value != "" and data_type != "generic":
            self.hits[data_type] = self.hits.get(data_type, 0) + 1
        return super().deidentify_value(value, data_type, column_name)


class CountingDeidentifier(_CountingMixin, Deidentifier):
    """Reference-parity counting engine."""


class CountingExtendedDeidentifier(_CountingMixin, ExtendedDeidentifier):
    """Counting engine with the opt-in IP detector extension."""


def scrub_udf(secret_key: str):
    """Arrow pandas UDF: (text, mask) -> struct(scrubbed_text, pii_hits).

    Masked rows (filter-dropped docs) pass through with null scrubbed_text
    and null hit map — scrubbing work is spent only on kept documents.
    """

    @F.pandas_udf(SCRUB_SCHEMA)
    def scrub(text: pd.Series, mask: pd.Series) -> pd.DataFrame:
        d = CountingDeidentifier(secret_key)
        scrubbed: list[str | None] = []
        hits: list[dict[str, int] | None] = []
        do = mask.fillna(False).astype(bool)
        for t, m in zip(text.tolist(), do.tolist()):
            if not m or t is None:
                scrubbed.append(None)
                hits.append(None)
                continue
            d.reset_hits()
            scrubbed.append(d.text(t))
            hits.append(dict(d.hits))
        return pd.DataFrame({"scrubbed_text": scrubbed, "pii_hits": hits})

    return scrub


def scrub_text_udf(secret_key: str):
    """Plain text-in/text-out scrub (no hit counts, no mask) — the
    Table/Slices per-column path and simple callers."""

    @F.pandas_udf(StringType())
    def scrub(text: pd.Series) -> pd.Series:
        d = Deidentifier(secret_key)
        return text.map(lambda t: d.text(t) if t is not None else None)

    return scrub


def scrub_column_udf(secret_key: str, data_type: str, column_name: str):
    """Per-column typed scrub (the reference's Table/Slices semantics):
    every non-null cell is deidentified as ``data_type``, nulls pass
    through, '' stays '' (deidentify.go:185-215, 685-704)."""

    @F.pandas_udf(StringType())
    def scrub(col: pd.Series) -> pd.Series:
        d = Deidentifier(secret_key)
        return col.map(
            lambda v: None
            if v is None
            else d.deidentify_value(str(v), data_type, column_name)
        )

    return scrub
