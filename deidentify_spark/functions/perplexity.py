"""Hash-based word-bigram perplexity scorer.

A public-knowledge stand-in for a KenLM-style LM (none is installable
here): word unigram/bigram counts from the authored English training text
are hashed into fixed-size numpy count tables at first use; a document's
perplexity is exp(mean over bigrams of -log P(w2|w1)) with add-alpha
smoothing. Deterministic (crc32 word hashing), vectorized per document,
no per-row Python on the Spark side beyond the per-doc numpy loop inside
the Arrow batch.

Clean English scores low (single digits to tens); gibberish scores
hundreds+ — the pipeline threshold sits between with a wide margin
(calibrated in tests/test_functions.py).
"""

from __future__ import annotations

from zlib import crc32

import numpy as np
import re

_DIM = 1 << 18
_MASK = _DIM - 1
_ALPHA = 0.001
_VOCAB = 50_000.0  # smoothing denominator constant (alpha*V = 50)
# stdlib re, not the regex module: the pattern is plain ASCII (identical
# match semantics in both engines — pinned by test_perplexity_word_re_
# engines_agree) and stdlib findall scans ~2x faster.
_WORD_RE = re.compile(r"[a-z']+")

_TABLES: tuple[np.ndarray, np.ndarray] | None = None


def _word_hashes(text: str) -> np.ndarray:
    words = _WORD_RE.findall(text.lower())
    return np.array([crc32(w.encode()) for w in words], dtype=np.uint64)


def _get_tables() -> tuple[np.ndarray, np.ndarray]:
    global _TABLES
    if _TABLES is None:
        from deidentify_spark.sources.textpools import (
            GEN_SENTENCES,
            LANGID_TRAINING,
            PERPLEXITY_TRAINING,
        )

        uni = np.zeros(_DIM, dtype=np.float64)
        bi = np.zeros(_DIM, dtype=np.float64)
        # The background corpus must cover the clean-English domain (a
        # production KenLM is trained on a web-scale corpus); here that
        # means the authored English pools including the generator's.
        corpus = " ".join(
            [LANGID_TRAINING["en"], PERPLEXITY_TRAINING, *GEN_SENTENCES["en"]]
        )
        h = _word_hashes(corpus)
        np.add.at(uni, (h & _MASK).astype(np.int64), 1.0)
        if h.size >= 2:
            hb = ((h[:-1] * np.uint64(1000003)) ^ h[1:]) & _MASK
            np.add.at(bi, hb.astype(np.int64), 1.0)
        _TABLES = (uni, bi)
    return _TABLES


def perplexity(text: str) -> float:
    """Perplexity of one document under the bigram LM."""
    uni, bi = _get_tables()
    h = _word_hashes(text)
    if h.size < 2:
        return float("inf")
    hb = ((h[:-1] * np.uint64(1000003)) ^ h[1:]) & _MASK
    c_bi = bi[hb.astype(np.int64)]
    c_uni = uni[(h[:-1] & _MASK).astype(np.int64)]
    logp = np.log((c_bi + _ALPHA) / (c_uni + _ALPHA * _VOCAB))
    return float(np.exp(-logp.mean()))

