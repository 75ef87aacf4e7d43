"""Vocabulary / TF-IDF (operators/vocab.py): hand-computed fixtures and
DuckDB-twin parity."""

import math

import pandas as pd
import pytest

from deidentify_spark.operators.vocab import (
    TFIDF_TOP_TERMS_SQL,
    VOCAB_TOPK_SQL,
    tfidf_top_terms,
    vocab_topk,
)

DOCS = [
    (0, "the cat sat on the mat"),
    (1, "the dog sat"),
    (2, "cat  cat dog"),  # double space -> empty token must be dropped
    (3, ""),
]


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def test_vocab_counts_freq_rank(docs):
    rows = {r["term"]: r for r in vocab_topk(docs, k=10).collect()}
    # totals: the=3, cat=3, sat=2, dog=2, on=1, mat=1 -> 12 tokens
    assert rows["the"]["n"] == 3 and rows["cat"]["n"] == 3
    assert rows["sat"]["n"] == 2 and rows["dog"]["n"] == 2
    assert rows["cat"]["freq"] == pytest.approx(round(3 / 12, 6))
    # rank ties break on term asc: cat(1), the(2), dog(3), sat(4)
    assert rows["cat"]["rank"] == 1 and rows["the"]["rank"] == 2
    assert rows["dog"]["rank"] == 3 and rows["sat"]["rank"] == 4


def test_vocab_k_limit_is_deterministic(docs):
    top = vocab_topk(docs, k=3).collect()
    assert [r["term"] for r in sorted(top, key=lambda r: r["rank"])] == [
        "cat", "the", "dog",
    ]


def test_tfidf_hand_value(docs):
    out = tfidf_top_terms(docs, top_n=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 2: cat tf=2 df=2, dog tf=1 df=2; N=4 docs
    idf = math.log((4 + 1) / (2 + 1)) + 1
    d2 = {r["term"]: r for r in by_doc[2]}
    assert d2["cat"]["tfidf"] == pytest.approx(round(2 * idf, 6))
    assert d2["cat"]["rank"] == 1 and d2["dog"]["rank"] == 2
    # empty doc yields no rows; every doc emits at most top_n rows
    assert 3 not in by_doc
    assert all(len(v) <= 2 for v in by_doc.values())


def test_duckdb_twins_match(spark, docs):
    import duckdb

    pdf = pd.DataFrame(DOCS, columns=["doc_id", "text"])
    con = duckdb.connect()
    con.register("documents", pdf)
    for sdf, sql in (
        (vocab_topk(docs, k=10), VOCAB_TOPK_SQL.format(k=10)),
        (tfidf_top_terms(docs, top_n=3), TFIDF_TOP_TERMS_SQL.format(top_n=3)),
    ):
        s = sdf.toPandas()
        o = con.execute(sql).df()
        cols = sorted(s.columns)
        pd.testing.assert_frame_equal(
            s[cols].sort_values(cols).reset_index(drop=True),
            o[cols].sort_values(cols).reset_index(drop=True),
            check_dtype=False,
        )


def test_vocab_plan_rank_window_is_post_limit(spark, docs):
    """The single-partition rank window must sit ABOVE the k-row limit
    (TakeOrdered), so the unpartitioned window only ever sees k rows."""
    plan = (
        vocab_topk(docs, k=10)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan


def test_encode_token_ids_vocab_and_oov(spark):
    import hashlib

    from deidentify_spark.operators.vocab import encode_token_ids

    docs = spark.createDataFrame(
        [(1, "the cat sat on the mat"), (2, ""), (3, None)],
        "doc_id long, text string",
    )
    vocab = spark.createDataFrame(
        [("the", 0), ("cat", 1), ("on", 2)], "term string, token_id long"
    )
    out = {r.doc_id: r.token_ids for r in
           encode_token_ids(docs, vocab, n_oov_buckets=16).collect()}

    def oov(w):
        return 3 + int(hashlib.md5(w.encode()).hexdigest()[:8], 16) % 16

    assert out[1] == [0, 1, oov("sat"), 2, 0, oov("mat")]
    assert out[2] == []       # empty text -> empty sequence
    assert out[3] is None     # null propagates
    # OOV ids sit strictly above the vocab range
    assert all(i >= 3 for i in (out[1][2], out[1][5]))


def test_unigram_divergence_hand_value(spark):
    import math

    from deidentify_spark.operators.vocab import unigram_divergence

    docs = spark.createDataFrame(
        [(0, "x x y", "a"), (1, "x z", "b"), (2, "ignored", "c")],
        ["doc_id", "text", "source"],
    )
    row = unigram_divergence(docs, "a", "b").collect()[0]
    # union vocab {x,y,z} V=3; a: x=2,y=1 (ta=3); b: x=1,z=1 (tb=2)
    pa = {"x": 3 / 6, "y": 2 / 6, "z": 1 / 6}
    pb = {"x": 2 / 5, "y": 1 / 5, "z": 2 / 5}
    kl_ab = sum(pa[t] * math.log(pa[t] / pb[t]) for t in pa)
    kl_ba = sum(pb[t] * math.log(pb[t] / pa[t]) for t in pa)
    js = 0.5 * sum(
        pa[t] * math.log(pa[t] / ((pa[t] + pb[t]) / 2)) for t in pa
    ) + 0.5 * sum(pb[t] * math.log(pb[t] / ((pa[t] + pb[t]) / 2)) for t in pa)
    assert row["n_terms"] == 3
    assert row["kl_ab"] == pytest.approx(round(kl_ab, 6))
    assert row["kl_ba"] == pytest.approx(round(kl_ba, 6))
    assert row["js"] == pytest.approx(round(js, 6))
    assert row["group_a"] == "a" and row["group_b"] == "b"
    # divergences are positive for distinct distributions; JS <= ln 2
    assert 0 < row["js"] <= math.log(2)


def test_unigram_divergence_duckdb_twin(spark):
    import duckdb

    from deidentify_spark.operators.vocab import (
        UNIGRAM_DIVERGENCE_SQL,
        unigram_divergence,
    )

    rows = [
        (0, "the cat sat on the mat", "a"),
        (1, "the dog  sat", "a"),
        (2, "cat cat dog runs", "b"),
        (3, "", "b"),
        (4, "other corpus entirely", "c"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    s = unigram_divergence(docs, "a", "b").toPandas()
    con = duckdb.connect()
    con.register(
        "documents", pd.DataFrame(rows, columns=["doc_id", "text", "source"])
    )
    o = con.execute(
        UNIGRAM_DIVERGENCE_SQL.format(
            table="documents",
            group_col="source",
            text_col="text",
            group_a="a",
            group_b="b",
        )
    ).df()
    cols = sorted(s.columns)
    pd.testing.assert_frame_equal(
        s[cols].reset_index(drop=True),
        o[cols].reset_index(drop=True),
        check_dtype=False,
    )


def test_unigram_divergence_plan_has_no_window(spark):
    """Aggregate-only plan: no Window node anywhere (the op is two
    map-side-combined groupBys plus a single-row final aggregate)."""
    from deidentify_spark.operators.vocab import unigram_divergence

    docs = spark.createDataFrame(
        [(0, "x", "a"), (1, "y", "b")], ["doc_id", "text", "source"]
    )
    plan = (
        unigram_divergence(docs, "a", "b")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in plan


def test_encode_token_ids_is_map_side(spark):
    from deidentify_spark.operators.vocab import encode_token_ids

    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    vocab = spark.createDataFrame([("a", 0)], "term string, token_id long")
    plan = encode_token_ids(
        docs, vocab
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Join" not in plan
