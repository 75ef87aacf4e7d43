"""Text-analysis columns: token counting, fingerprinting.

Everything except winnowing is a JVM-side Column expression (DuckDB can
replicate them for the driver oracle); winnowing needs a rolling-hash
window minimum and is a vectorized pandas UDF.
"""

from __future__ import annotations

from zlib import crc32

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType

# GPT2-ish pretokenizer, ASCII classes only so Java (Spark) and RE2
# (DuckDB) agree byte-for-byte: a token is an optional leading space +
# letters | digits | other-non-space run.
BPE_ISH_TOKEN_PATTERN = r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 \t\n\r]+"


def whitespace_token_count(text: Column) -> Column:
    return F.when(F.trim(text) == "", F.lit(0)).otherwise(
        F.size(F.split(F.trim(text), r"\s+"))
    )


def bpe_ish_token_count(text: Column) -> Column:
    return F.size(F.regexp_extract_all(text, F.lit(BPE_ISH_TOKEN_PATTERN), F.lit(0)))


def normalized_fingerprint(text: Column) -> Column:
    """md5 of casefolded, whitespace-collapsed text — cheap near-exact
    dup key (survives reflow/case edits)."""
    return F.md5(F.trim(F.regexp_replace(F.lower(text), r"\s+", " ")))


def winnowing_fingerprints_udf(k: int = 5, window: int = 4):
    """Winnowing document fingerprints (Schleimer et al. 2003): rolling
    hash over k-grams of words, minimum per sliding window, deduplicated.
    Returns array<long> (sorted) — the standard near-dup/overlap sketch.
    """

    @F.pandas_udf(ArrayType(LongType()))
    def winnow(text: pd.Series) -> pd.Series:
        out = []
        for t in text.fillna(""):
            words = t.lower().split()
            if len(words) < k:
                out.append([])
                continue
            hs = np.array(
                [crc32(" ".join(words[i : i + k]).encode()) for i in range(len(words) - k + 1)],
                dtype=np.int64,
            )
            if len(hs) <= window:
                mins = {int(hs.min())}
            else:
                sw = np.lib.stride_tricks.sliding_window_view(hs, window)
                mins = set(int(x) for x in sw.min(axis=1))
            out.append(sorted(mins))
        return pd.Series(out)

    return winnow
