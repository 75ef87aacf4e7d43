"""Corpus vocabulary statistics and TF-IDF term weighting — the
feature-extraction primitives a tokenizer-training / corpus-analysis
pass needs (vocabulary frequency tables feed BPE training and
Zipf-shape corpus QA; TF-IDF top terms are the classic per-document
keyword signal and the usual NB/quality-classifier feature weighting).

No reference counterpart (deidentify.go has no text-analytics surface);
these extend §2.G alongside `operators/search.py` (BM25 — which already
computes tf/df internally; this module exposes the corpus-level and
per-document views as first-class outputs).

Scale posture:
* word explode → groupBy(term) count is the canonical map-side-combined
  aggregation; the hot keys ("the") are absorbed by partial aggregation
  before the shuffle, so skew is a non-issue by construction;
* top-k vocabulary uses sort+limit (TakeOrdered — O(k) per partition,
  never a global sort); the rank column is a row_number over the
  ALREADY-LIMITED k rows, so the single-partition window holds k rows,
  not the vocabulary;
* TF-IDF joins the per-(doc,term) tf table to the vocabulary df table
  on term — an equi-join AQE broadcasts when the vocabulary is small
  and shuffle-joins (with skew splitting) when it is not; the top-terms
  window partitions by doc_id, bounded by document length;
* corpus size N enters as a 1-row aggregate broadcast-crossJoined into
  the plan — no driver action, the whole query stays lazy.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _words(docs: DataFrame, text_col: str, *cols: str) -> DataFrame:
    """Explode whitespace-split terms, dropping empties (consecutive
    separators)."""
    return (
        docs.select(*cols, F.explode(F.split(F.col(text_col), " ")).alias("term"))
        .where(F.col("term") != "")
    )


def vocab_topk(docs: DataFrame, *, text_col: str = "text", k: int = 50) -> DataFrame:
    """Top-k corpus vocabulary: (term, n, freq, rank).

    ``freq`` is the term's share of ALL tokens (denominator over the
    full vocabulary, not the top-k slice). rank is 1-based by
    (n desc, term asc) — the Zipf rank axis.
    """
    counts = _words(docs, text_col).groupBy("term").agg(F.count("*").alias("n"))
    total = counts.agg(F.sum("n").alias("total"))
    top = (
        counts.orderBy(F.col("n").desc(), F.col("term"))
        .limit(k)
        .crossJoin(F.broadcast(total))
    )
    w = Window.orderBy(F.col("n").desc(), F.col("term"))
    return top.select(
        "term",
        "n",
        F.round(F.col("n") / F.col("total"), 6).alias("freq"),
        F.row_number().over(w).alias("rank"),
    )


def tfidf_top_terms(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_n: int = 3,
) -> DataFrame:
    """Per-document top-n terms by smoothed TF-IDF:
    (doc_id, term, tf, tfidf, rank).

    idf = ln((N + 1) / (df + 1)) + 1 (sklearn's smooth-idf form, a
    published convention both engines can reproduce bit-for-bit from
    integer inputs). Ties break on term asc so output is deterministic.
    """
    tf = (
        _words(docs, text_col, id_col)
        .groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"))
    )
    df_t = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = docs.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(df_t, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            id_col,
            "term",
            "tf",
            (
                F.col("tf")
                * (F.log((F.col("n_docs") + 1) / (F.col("df") + 1)) + F.lit(1.0))
            ).alias("_tfidf"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.col("_tfidf").desc(), F.col("term"))
    return (
        scored.select(
            id_col, "term", "tf",
            F.round("_tfidf", 6).alias("tfidf"),
            F.row_number().over(w).alias("rank"),
        )
        .where(F.col("rank") <= top_n)
    )


VOCAB_TOPK_SQL = """
    WITH words AS (
        SELECT UNNEST(string_split(text, ' ')) AS term FROM documents
    ),
    counts AS (
        SELECT term, COUNT(*) AS n FROM words WHERE term <> '' GROUP BY term
    ),
    total AS (SELECT SUM(n) AS total FROM counts)
    SELECT term, n,
           ROUND(n / (SELECT total FROM total), 6) AS freq,
           CAST(ROW_NUMBER() OVER (ORDER BY n DESC, term) AS INT) AS rank
    FROM counts
    ORDER BY n DESC, term
    LIMIT {k}
"""

TFIDF_TOP_TERMS_SQL = """
    WITH words AS (
        SELECT doc_id, UNNEST(string_split(text, ' ')) AS term FROM documents
    ),
    tf AS (
        SELECT doc_id, term, COUNT(*) AS tf
        FROM words WHERE term <> '' GROUP BY doc_id, term
    ),
    df_t AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    nn AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
        SELECT tf.doc_id, tf.term, tf.tf,
               tf.tf * (LN((nn.n_docs + 1) / (df_t.df + 1.0)) + 1.0) AS _tfidf
        FROM tf JOIN df_t ON tf.term = df_t.term, nn
    ),
    ranked AS (
        SELECT doc_id, term, tf,
               ROUND(_tfidf, 6) AS tfidf,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY doc_id ORDER BY _tfidf DESC, term
               ) AS INT) AS rank
        FROM scored
    )
    SELECT doc_id, term, tf, tfidf, rank
    FROM ranked WHERE rank <= {top_n}
    ORDER BY doc_id, rank
"""


def unigram_divergence(
    docs: DataFrame,
    group_a: str,
    group_b: str,
    *,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Distribution drift between two corpus slices: smoothed unigram
    KL(A||B), KL(B||A), and Jensen-Shannon divergence — the standard
    corpus-QA / domain-shift signal a data-mixing pass reads before
    reweighting sources (DSIR itself is importance weighting between
    exactly such distributions; this is the diagnostic view).

    Add-one (Laplace) smoothing over the UNION vocabulary keeps both
    distributions strictly positive so every log is finite:
    p_a(t) = (n_a(t)+1) / (N_a+V). Output is ONE row:
    (group_a, group_b, n_terms, kl_ab, kl_ba, js) with divergences in
    nats rounded to 6 (the 1e-13-scale float-sum associativity noise
    between engines is ~7 decimal orders below the rounding step).

    Scale: token explode -> groupBy(group, term) count is map-side
    combined (hot terms like "the" collapse before the shuffle), then
    one groupBy(term) pivot-to-two-columns and a single-row final
    aggregate. No windows, no driver data actions, two shuffles total —
    both on term-sized tables, corpus size only enters the first
    map-combined pass.
    """
    both = docs.where(F.col(group_col).isin(group_a, group_b))
    counts = (
        _words(both, text_col, group_col)
        .groupBy(group_col, "term")
        .agg(F.count("*").alias("n"))
    )
    byterm = counts.groupBy("term").agg(
        F.sum(
            F.when(F.col(group_col) == group_a, F.col("n")).otherwise(0)
        ).alias("na"),
        F.sum(
            F.when(F.col(group_col) == group_b, F.col("n")).otherwise(0)
        ).alias("nb"),
    )
    tot = byterm.agg(
        F.sum("na").alias("ta"),
        F.sum("nb").alias("tb"),
        F.count("*").alias("v"),
    )
    pa = (F.col("na") + 1.0) / (F.col("ta") + F.col("v"))
    pb = (F.col("nb") + 1.0) / (F.col("tb") + F.col("v"))
    m = (pa + pb) / 2.0
    probs = byterm.crossJoin(F.broadcast(tot)).select(
        F.col("v"),
        (pa * F.log(pa / pb)).alias("_kab"),
        (pb * F.log(pb / pa)).alias("_kba"),
        (pa * F.log(pa / m)).alias("_jam"),
        (pb * F.log(pb / m)).alias("_jbm"),
    )
    return probs.agg(
        F.lit(group_a).alias("group_a"),
        F.lit(group_b).alias("group_b"),
        F.first("v").alias("n_terms"),
        F.round(F.sum("_kab"), 6).alias("kl_ab"),
        F.round(F.sum("_kba"), 6).alias("kl_ba"),
        F.round(0.5 * F.sum("_jam") + 0.5 * F.sum("_jbm"), 6).alias("js"),
    )


UNIGRAM_DIVERGENCE_SQL = """
    WITH words AS (
        SELECT {group_col} AS grp,
               UNNEST(string_split({text_col}, ' ')) AS term
        FROM {table}
        WHERE {group_col} IN ('{group_a}', '{group_b}')
    ),
    byterm AS (
        SELECT term,
               SUM(CASE WHEN grp = '{group_a}' THEN 1 ELSE 0 END) AS na,
               SUM(CASE WHEN grp = '{group_b}' THEN 1 ELSE 0 END) AS nb
        FROM words WHERE term <> '' GROUP BY term
    ),
    tot AS (SELECT SUM(na) AS ta, SUM(nb) AS tb, COUNT(*) AS v FROM byterm),
    probs AS (
        SELECT v,
               (na + 1.0) / (ta + v) AS pa,
               (nb + 1.0) / (tb + v) AS pb
        FROM byterm, tot
    )
    SELECT '{group_a}' AS group_a, '{group_b}' AS group_b,
           FIRST(v) AS n_terms,
           ROUND(SUM(pa * LN(pa / pb)), 6) AS kl_ab,
           ROUND(SUM(pb * LN(pb / pa)), 6) AS kl_ba,
           ROUND(0.5 * SUM(pa * LN(pa / ((pa + pb) / 2)))
                 + 0.5 * SUM(pb * LN(pb / ((pa + pb) / 2))), 6) AS js
    FROM probs
"""


def encode_token_ids(
    docs: DataFrame,
    vocab: DataFrame,
    *,
    n_oov_buckets: int = 1024,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Vocab-indexed numericalization — the terminal encoding step that
    turns curated text into the integer sequences a training loop
    consumes: every term maps to its ``vocab`` id, out-of-vocabulary
    terms to a deterministic md5 hash bucket ABOVE the vocab range
    (``base + u32(md5(term)[:8]) % n_oov_buckets`` with
    base = max(token_id)+1 — the fastText-style OOV bucket scheme, so
    unseen terms still carry a stable signal instead of one UNK id).
    Tokenization is this module's convention (split on ' ', drop
    empties). Adds ``token_ids: array<int>``.

    Scale shape: a tokenizer vocabulary is bounded (10^4-10^5 — BPE
    vocabularies are 32-128k by construction), so ``vocab`` is collected
    ONCE on the driver (same O(V) posture as the IVF centroid collect)
    and ships into a vectorized Arrow UDF as a plain dict — the document
    side is ONE map-side Arrow projection: no token explode, no
    per-token join, no positional re-sort. The explode → join(vocab) →
    string_agg-by-position alternative (the DuckDB twin's formulation)
    shuffles every token in the corpus and re-sorts each doc — correct,
    and exactly what this operator exists to avoid.
    """
    import hashlib

    from pyspark.sql.types import ArrayType, IntegerType

    rows = vocab.select("term", "token_id").collect()
    mapping = {r.term: int(r.token_id) for r in rows}
    base = (max(mapping.values()) + 1) if mapping else 0
    nb = int(n_oov_buckets)

    @F.pandas_udf(ArrayType(IntegerType()))
    def encode(texts: pd.Series) -> pd.Series:
        def one(t):
            if t is None:
                return None
            return [
                mapping.get(w)
                if w in mapping
                else base
                + int(hashlib.md5(w.encode()).hexdigest()[:8], 16) % nb
                for w in t.split(" ")
                if w
            ]

        return texts.map(one)

    return docs.withColumn("token_ids", encode(F.col(text_col)))


def pmi_collocations(
    docs: DataFrame,
    *,
    text_col: str = "text",
    min_count: int = 5,
    k: int = 50,
) -> DataFrame:
    """Top-k collocations by pointwise mutual information — phrase
    mining over the corpus (Church & Hanks 1990): the multiword-unit /
    boilerplate-phrase signal a tokenizer-vocab or corpus-QA pass reads
    (high-PMI pairs are candidate merge units; templated boilerplate
    shows up as implausibly high PMI at high count).

      pmi(w1,w2) = ln( (c12/B) / ((c1/U) * (c2/U)) )

    with c12 the adjacent-pair count (per-document bigrams, no
    cross-document pair), c the unigram counts, B/U the total bigram/
    unigram token counts. ``min_count`` suppresses the low-count PMI
    pathology (a hapax pair maxes the statistic). Output
    (w1, w2, n, pmi, rank), ordered by ROUNDED pmi desc then (w1, w2)
    so ranking ties are engine-stable.

    Scale shape: two map-side-combined groupBys over the exploded
    streams (hot pairs/terms collapse in the combiner), vocabulary-
    sized equi-joins for c1/c2 (AQE broadcasts when small), totals as
    1-row broadcast crossJoins, TakeOrdered top-k; the rank window runs
    over the already-limited k rows. The word array sits behind a
    Generate barrier so element_at gathers read an attribute (the
    no-CSE-in-HOF hazard lm_train_tables documents).
    """
    toks = F.filter(F.split(F.col(text_col), " "), lambda x: x != "")
    bar = docs.select(
        F.explode(F.array(F.struct(toks.alias("_w")))).alias("_s")
    ).select(F.col("_s._w").alias("_w"))
    n = F.size("_w")
    pairs = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(0), n - 2),
            lambda i: F.struct(
                F.element_at(F.col("_w"), i + 1).alias("w1"),
                F.element_at(F.col("_w"), i + 2).alias("w2"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    big = (
        bar.select(F.explode(pairs).alias("_p"))
        .select(F.col("_p.w1").alias("w1"), F.col("_p.w2").alias("w2"))
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("n"))
    )
    uni = (
        bar.select(F.explode("_w").alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("c"))
    )
    b_tot = big.agg(F.sum("n").alias("b_tot"))
    u_tot = uni.agg(F.sum("c").alias("u_tot"))
    ca = uni.select(F.col("term").alias("w1"), F.col("c").alias("c1"))
    cb = uni.select(F.col("term").alias("w2"), F.col("c").alias("c2"))
    pmi = F.log(
        (F.col("n") * 1.0 / F.col("b_tot"))
        / ((F.col("c1") * 1.0 / F.col("u_tot")) * (F.col("c2") * 1.0 / F.col("u_tot")))
    )
    top = (
        big.where(F.col("n") >= min_count)
        .join(ca, "w1")
        .join(cb, "w2")
        .crossJoin(F.broadcast(b_tot))
        .crossJoin(F.broadcast(u_tot))
        .select("w1", "w2", "n", F.round(pmi, 4).alias("pmi"))
        .orderBy(F.col("pmi").desc(), "w1", "w2")
        .limit(k)
    )
    w = Window.orderBy(F.col("pmi").desc(), "w1", "w2")
    return top.select(
        "w1", "w2", "n", "pmi", F.row_number().over(w).alias("rank")
    )


PMI_COLLOCATIONS_SQL = """
    WITH toks AS (
        SELECT list_filter(string_split({text_col}, ' '), x -> x <> '') AS w
        FROM {table}
    ),
    bigrams AS (
        SELECT unnest([w[i]||' '||w[i+1]
                       for i in generate_series(1, len(w)-1)]) AS bg
        FROM toks
    ),
    big AS (
        SELECT split_part(bg, ' ', 1) AS w1, split_part(bg, ' ', 2) AS w2,
               COUNT(*) AS n
        FROM bigrams GROUP BY 1, 2
    ),
    uc AS (
        SELECT term, COUNT(*) AS c
        FROM (SELECT unnest(w) AS term FROM toks) GROUP BY term
    ),
    tot AS (
        SELECT (SELECT SUM(n) FROM big) AS b_tot,
               (SELECT SUM(c) FROM uc) AS u_tot
    ),
    scored AS (
        SELECT big.w1, big.w2, big.n,
               ROUND(LN((big.n * 1.0 / tot.b_tot)
                        / ((a.c * 1.0 / tot.u_tot)
                           * (b.c * 1.0 / tot.u_tot))), 4) AS pmi
        FROM big
        JOIN uc a ON big.w1 = a.term
        JOIN uc b ON big.w2 = b.term
        CROSS JOIN tot
        WHERE big.n >= {min_count}
    )
    SELECT w1, w2, n, pmi,
           CAST(ROW_NUMBER() OVER (ORDER BY pmi DESC, w1, w2) AS INT) AS rank
    FROM scored
    ORDER BY pmi DESC, w1, w2
    LIMIT {k}
"""
