"""Toxicity blocklist scoring / filtering / masking."""

import time

from pyspark.sql import functions as F

from deidentify_spark.functions.toxicity import (
    toxicity_annotate,
    toxicity_filter,
    toxicity_mask_expr,
    toxicity_scrub,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_annotate_counts_repeats_and_strips_punct(spark):
    df = _docs(spark, [
        (0, "Damn! damn, the damn thing"),
        (1, "clean text here"),
        (2, ""),
        (3, "hellcat shellfish"),  # no word-boundary hits for "hell"
    ])
    out = {r.doc_id: r for r in toxicity_annotate(df, ("damn", "hell")).collect()}
    assert out[0].toxic_hits == 3
    assert abs(out[0].toxic_frac - 3 / 5) < 1e-9
    assert out[1].toxic_hits == 0
    assert out[2].toxic_hits == 0 and out[2].toxic_frac == 0.0
    assert out[3].toxic_hits == 0  # substring != token


def test_filter_c4_policy_any_hit_drops(spark):
    df = _docs(spark, [(0, "one damn word"), (1, "all clean")])
    out = {
        r.doc_id: r.toxic_keep
        for r in toxicity_filter(
            df, ("damn",), max_frac=0.0, max_hits=0
        ).collect()
    }
    assert out == {0: False, 1: True}


def test_mask_preserves_bytes_and_case_insensitive(spark):
    df = _docs(spark, [(0, "Damn  it\tall, dAmN it — hellcat stays")])
    got = df.select(
        toxicity_mask_expr(F.col("text"), ("damn", "hell")).alias("m")
    ).head().m
    # only the flagged tokens change; every other byte (double space,
    # tab, dash) survives
    assert got == "***  it\tall, *** it — hellcat stays"


def test_scrub_nulls_dropped_and_masks_kept(spark):
    df = _docs(spark, [
        (0, "damn damn damn damn"),          # frac 1.0 -> dropped
        (1, "a single damn in long enough text to keep around here ok"),
    ])
    out = {r.doc_id: r for r in toxicity_scrub(
        df, ("damn",), max_frac=0.5, max_hits=10
    ).collect()}
    assert out[0].toxic_keep is False and out[0].scrubbed_text is None
    assert out[1].toxic_keep is True
    assert "***" in out[1].scrubbed_text and "damn" not in out[1].scrubbed_text


def test_mask_linear_on_pathological_inputs(spark):
    """Regex-edit gate (repo rule, see tests/test_oracle_perf.py): the alternation is
    literal words + \\b — must stay linear on a long digit blob and a
    200-word letter chain, not backtrack."""
    blob = "1" * 1_000_000
    chain = " ".join("a" * 30 for _ in range(200))
    df = _docs(spark, [(0, blob), (1, chain)])
    t0 = time.time()
    df.select(toxicity_mask_expr(F.col("text")).alias("m")).collect()
    assert time.time() - t0 < 10.0
