"""Distributed BPE merge learning (operators/bpe.py): classic-corpus
hand values, pure-Python reference parity on the real documents table,
early stop, and the frozen golden's independence (regenerated live from
the sf0.01 parquet by the reference implementation, no Spark)."""

import json
import os

import pytest

from deidentify_spark.operators.bpe import bpe_merges
from scripts.make_bpe_golden import (
    ref_bpe_merges,
    word_counts_from_parquet,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _rows(df):
    return [
        (r["rank"], r["lhs"], r["rhs"], r["merged"], r["pair_count"])
        for r in df.orderBy("rank").collect()
    ]


def _ref_rows(merges):
    return [
        (m["rank"], m["lhs"], m["rhs"], m["merged"], m["pair_count"])
        for m in merges
    ]


def test_bpe_classic_corpus(spark):
    """Sennrich's worked example shape: 'low lower newest widest'-style
    corpus — first merges capture the shared suffixes."""
    text = " ".join(
        ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    )
    docs = spark.createDataFrame([(0, text)], ["doc_id", "text"])
    got = _rows(bpe_merges(docs, num_merges=4))
    wc = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    exp = _ref_rows(ref_bpe_merges(wc, num_merges=4))
    assert got == exp
    # first merge must be (e,s) or (s,t) etc. with count 9 (newest+widest)
    assert got[0][4] == 9


def test_bpe_greedy_overlap_apply(spark):
    """'aaa' under merge (a,a) yields [aa, a, </w>]: the second 'aa'
    overlap is NOT merged (left-to-right greedy, resume at i+2)."""
    docs = spark.createDataFrame(
        [(0, "aaa aaa aaa")], ["doc_id", "text"]
    )
    got = _rows(bpe_merges(docs, num_merges=2, min_count=1))
    exp = _ref_rows(ref_bpe_merges({"aaa": 3}, num_merges=2, min_count=1))
    assert got == exp
    # rank1 = (a,a) count 6 (two adjacent pairs per word; the overlap
    # pair is consumed). rank2: (aa,a) and (a,</w>) tie at 3 — the
    # (lhs asc, rhs asc) tie-break picks (a,</w>)
    assert got[0][:3] == (1, "a", "a") and got[0][4] == 6
    assert got[1][1:3] == ("a", "</w>") and got[1][4] == 3


def test_bpe_early_stop_on_min_count(spark):
    docs = spark.createDataFrame(
        [(0, "ab cd ef")], ["doc_id", "text"]
    )  # every pair occurs exactly once
    got = _rows(bpe_merges(docs, num_merges=5, min_count=2))
    assert got == []


def test_bpe_matches_reference_on_documents(spark):
    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    got = _rows(bpe_merges(docs, num_merges=12))
    wc = word_counts_from_parquet(f"{sf}/documents.parquet")
    exp = _ref_rows(ref_bpe_merges(wc, num_merges=12))
    assert got == exp
    assert len(got) == 12  # real text: 12 merges all clear min_count


def test_bpe_golden_fixture_is_reference_derived():
    """The committed fixture must equal a LIVE re-derivation by the
    pure-Python reference from the sf0.01 parquet (DuckDB word counts,
    no Spark) — the golden can never drift from the algorithm."""
    with open(os.path.join(REPO, "fixtures", "bpe_merges_golden.json")) as f:
        frozen = json.load(f)
    wc = word_counts_from_parquet(
        "/root/testdata/sf0.01/documents.parquet"
    )
    live = ref_bpe_merges(wc, num_merges=20, min_count=2)
    assert frozen == live


def test_bpe_encode_roundtrip_and_nulls(spark):
    """Encoding with the merges learned FROM the same corpus reproduces
    the training end-state word segmentations; null/empty texts
    propagate; joining subwords (minus </w>) reconstructs the text."""
    from deidentify_spark.operators.bpe import END_OF_WORD, bpe_encode

    text = " ".join(["low"] * 5 + ["lower"] * 2 + ["newest"] * 6)
    docs = spark.createDataFrame(
        [(0, text), (1, ""), (2, None)], "doc_id long, text string"
    )
    merges = bpe_merges(docs, num_merges=5)
    out = {
        r["doc_id"]: r["bpe_tokens"]
        for r in bpe_encode(docs, merges).collect()
    }
    assert out[1] == [] and out[2] is None
    # lossless: concatenating subwords per word recovers the input
    rebuilt = (
        "".join(out[0]).replace(END_OF_WORD, " ").rstrip()
    )
    assert rebuilt == text
    # the top merge sequences actually fused: far fewer symbols than chars
    assert len(out[0]) < sum(len(w) + 1 for w in text.split(" "))


def test_bpe_encode_matches_reference_apply(spark):
    """The Arrow UDF and the shared pure apply agree token-for-token on
    real corpus text with an independently learned merge list."""
    from deidentify_spark.operators.bpe import (
        apply_merges_to_word,
        bpe_encode,
    )

    sf = "/root/testdata/sf0.001"
    wc = word_counts_from_parquet(f"{sf}/documents.parquet")
    ranked = [
        (m["lhs"], m["rhs"]) for m in ref_bpe_merges(wc, num_merges=10)
    ]
    docs = spark.read.parquet(f"{sf}/documents.parquet").limit(50)
    got = {
        r["doc_id"]: r["bpe_tokens"]
        for r in bpe_encode(docs, ranked).collect()
    }
    for r in docs.collect():
        exp = []
        for w in r["text"].split(" "):
            if w:
                exp.extend(apply_merges_to_word(w, ranked))
        assert got[r["doc_id"]] == exp


def test_bpe_subword_golden_is_reference_derived():
    """fixtures/bpe_subwords_golden.json equals a live reference
    re-derivation (word counts -> ref merges -> shared apply -> top-20)."""
    from scripts.make_bpe_golden import ref_subword_topk

    with open(
        os.path.join(REPO, "fixtures", "bpe_subwords_golden.json")
    ) as f:
        frozen = json.load(f)
    wc = word_counts_from_parquet(
        "/root/testdata/sf0.01/documents.parquet"
    )
    live = ref_subword_topk(wc, ref_bpe_merges(wc, num_merges=20), k=20)
    assert frozen == live


def test_bpe_encode_is_map_only(spark):
    from deidentify_spark.operators.bpe import bpe_encode

    docs = spark.createDataFrame([(0, "ab ab")], ["doc_id", "text"])
    plan = (
        bpe_encode(docs, [("a", "b")])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan and "Join" not in plan


def test_bpe_pair_scan_is_jvm_side(spark):
    """The per-rank pair-count plan must contain no Python row UDF:
    adjacent pairs come from a JVM `transform` over the symbol array
    (the only Arrow stages are the initial char split and the merge
    apply)."""
    from pyspark.sql import functions as F

    from deidentify_spark.operators.bpe import _ADJ_PAIRS, _to_symbols

    docs = spark.createDataFrame([(0, "ab ab")], ["doc_id", "text"])
    words = (
        docs.select(F.explode(F.split("text", " ")).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("cnt"))
        .select("cnt", _to_symbols()(F.col("w")).alias("syms"))
    )
    pairs = (
        words.where(F.size("syms") >= 2)
        .select("cnt", F.explode(F.expr(_ADJ_PAIRS)).alias("p"))
        .groupBy(F.col("p.l"), F.col("p.r"))
        .agg(F.sum("cnt"))
    )
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan  # no per-row Python anywhere
