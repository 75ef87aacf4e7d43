"""LangID accuracy on text the generator family never produced.

The F1=1.000 reported against sources/pages.py labels is a closed loop
(the classifier's training pools and the test corpus come from the same
authored families). This fixture (fixtures/langid_stress.json) was
hand-written in DIFFERENT domains/registers (recipes, support tickets,
sports reports, reviews, legal boilerplate, weather bulletins) with
labels fixed by hand at authoring time — an out-of-distribution check.

Measured at round 3 (frozen expectations, see BASELINE.md "LangID on
out-of-generator text"): after widening LANGID_TRAINING with
register-diverse supplements (LANGID_TRAINING_EXTRA: news, software,
legal, conversational, recipes, privacy boilerplate, code-flavored
English), clean 54/54 and hard 9/10 — the one remaining miss is de->nl
on a 7-word sentence, an honest close-pair limit of char-n-gram
centroids. The gates below leave one-miss headroom so an unrelated
change doesn't flake, but a real regression fails fast.
"""

import json
from pathlib import Path

FIXTURES = Path(__file__).resolve().parent.parent / "fixtures"


def _score(split: str):
    from deidentify_spark.functions.langid import predict_batch

    cases = json.loads((FIXTURES / "langid_stress.json").read_text())[split]
    preds, confs = predict_batch([c["text"] for c in cases])
    misses = [
        (c["lang"], p, c["text"][:50])
        for p, c in zip(preds, cases)
        if p != c["lang"]
    ]
    return len(cases) - len(misses), len(cases), misses


def test_langid_clean_out_of_generator_accuracy():
    # measured 54/54 post-widening; 53/54 ~= 0.98 leaves exactly
    # one-miss headroom for future pool churn
    ok, n, misses = _score("clean")
    assert ok / n >= 0.98, misses


def test_langid_hard_cases_accuracy():
    """Code-mixed, very short, and close-pair (es/pt, nl/de) texts: the
    centroid model legitimately struggles here; gate at 0.8 and keep the
    specific confusions documented in BASELINE.md."""
    # measured 10/10 after the round-4 close-pair tie-break; 0.8 leaves
    # two-miss headroom
    ok, n, misses = _score("hard")
    assert ok / n >= 0.8, misses


def test_langid_out_of_set_rejected_or_below_gate():
    """Languages OUTSIDE the supported set (fi/tr/vi/sv/pl) must come
    back as 'und' (unknown) or with lang_conf below the 0.35 pipeline
    gate — never as a confident in-set label (pre-fix worst case:
    Vietnamese scored en at 0.556). Most cases should reject outright."""
    from deidentify_spark.functions.langid import predict_batch

    cases = json.loads((FIXTURES / "langid_stress.json").read_text())[
        "out_of_set"
    ]
    preds, confs = predict_batch([c["text"] for c in cases])
    bad = [
        (c["lang"], p, round(cf, 3), c["text"][:40])
        for p, cf, c in zip(preds, confs, cases)
        if p != "und" and cf >= 0.35
    ]
    assert not bad, bad
    # the rejection itself must fire on the measured majority (7/8) —
    # a regression to conf-only leniency fails here
    assert sum(p == "und" for p in preds) >= 6, preds


def test_langid_in_set_never_rejected():
    """The out-of-set rule must not reject ANY in-set stress case —
    clean and hard predictions stay non-'und'."""
    from deidentify_spark.functions.langid import predict_batch

    fx = json.loads((FIXTURES / "langid_stress.json").read_text())
    cases = fx["clean"] + fx["hard"]
    preds, _ = predict_batch([c["text"] for c in cases])
    rejected = [
        (c["lang"], c["text"][:40]) for p, c in zip(preds, cases) if p == "und"
    ]
    assert not rejected, rejected


def test_langid_fixture_is_not_in_training_pools():
    """The stress fixture must stay disjoint from every training /
    generator pool, or the check silently re-closes the loop."""
    import deidentify_spark.sources.textpools as tp

    pool_blobs = []
    for name in dir(tp):
        v = getattr(tp, name)
        if isinstance(v, dict):
            pool_blobs += [x for x in v.values() if isinstance(x, str)]
            for vv in v.values():
                if isinstance(vv, (list, tuple)):
                    pool_blobs += [x for x in vv if isinstance(x, str)]
        elif isinstance(v, (list, tuple)):
            pool_blobs += [x for x in v if isinstance(x, str)]
    blob = "\n".join(pool_blobs).lower()
    fx = json.loads((FIXTURES / "langid_stress.json").read_text())
    for c in fx["clean"] + fx["hard"]:
        # any 40-char window of a fixture text appearing verbatim in a
        # pool means overlap
        t = c["text"].lower()
        probe = t[: min(40, len(t))]
        assert probe not in blob, c["text"][:60]
