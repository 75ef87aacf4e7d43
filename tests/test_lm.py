"""Kneser-Ney bigram LM (operators/lm.py): hand-computed values,
backoff semantics, and calibration direction."""

from __future__ import annotations

import pytest

from deidentify_spark.operators.lm import doc_bigrams, kn_perplexity


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_doc_bigrams_stream(spark):
    out = sorted(
        (r.doc_id, r.w1, r.w2)
        for r in doc_bigrams(_docs(spark, [(1, "A b c"), (2, "x"), (3, "")])).collect()
    )
    assert out == [(1, "a", "b"), (1, "b", "c")]


def test_kn_hand_computed_values(spark):
    """Train on 'a b a b a c': c12 = {ab:2, ba:2, ac:1}, c(a)=3, c(b)=2,
    N1+(a,.)=2, N1+(b,.)=1, N1+(.,a)=N1+(.,b)=N1+(.,c)=1, B=3, V=3.

    Pcont(any seen) = 2/7, Pcont(OOV) = 1/7.
    P(b|a) = (max(2-.75,0) + .75*2*(2/7)) / 3 = 0.5595238...
      -> ppl('a b') = 1/P = 1.7872
    P(a|z) = Pcont(a) = 2/7 -> ppl('z a') = 3.5  (OOV-context backoff)
    """
    train = _docs(spark, [(0, "a b a b a c")])
    score = _docs(spark, [(1, "a b"), (2, "z a")])
    out = {r.doc_id: r for r in kn_perplexity(score, train).collect()}
    assert out[1].n_bigrams == 1 and out[1].kn_ppl == pytest.approx(1.7872)
    assert out[2].n_bigrams == 1 and out[2].kn_ppl == pytest.approx(3.5)


def test_kn_sub_two_token_docs_omitted(spark):
    train = _docs(spark, [(0, "a b c d")])
    score = _docs(spark, [(1, "one"), (2, ""), (3, None), (4, "a b")])
    ids = {r.doc_id for r in kn_perplexity(score, train).collect()}
    assert ids == {4}


def test_kn_calibration_direction(spark):
    """In-domain text must score (much) lower than OOV gibberish under
    a model trained on the English pool."""
    from deidentify_spark.sources.textpools import GEN_SENTENCES

    sents = GEN_SENTENCES["en"]
    train = _docs(spark, [(i, s) for i, s in enumerate(sents[:40])])
    score = _docs(
        spark,
        [
            (100, " ".join(sents[:3])),
            (101, "zqx vbn kjh wrt plm qaz xsw cde vfr bgt nhy mju"),
        ],
    )
    out = {r.doc_id: r.kn_ppl for r in kn_perplexity(score, train).collect()}
    assert out[100] * 5 < out[101], out
