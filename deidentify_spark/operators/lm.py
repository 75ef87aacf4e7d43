"""Interpolated Kneser-Ney bigram language model — train AND score
fully inside the engine.

The hashed add-alpha LM (functions/perplexity.py) is the fast built-in
scorer; this module is the higher-fidelity trained path: the smoothing
that production web-corpus quality filters actually use (CCNet scores
Common Crawl with a KenLM n-gram model, whose standard estimator is
interpolated modified Kneser-Ney — Heafield 2011; we implement the
classic single-discount interpolated form, Kneser & Ney 1995 /
Chen & Goodman 1999, at bigram order).

Model, with D the absolute discount and training counts over PER-DOC
bigrams (no cross-document bigram, matching lm_train_tables):

  c(w1,w2)      bigram count
  c(w1)         = sum_w2 c(w1,w2)   (context total)
  N1+(w1, .)    distinct continuations of w1
  N1+(., w2)    distinct contexts preceding w2
  B             distinct bigram types,  V = distinct word types

  Pcont(w2)   = (N1+(., w2) + 1) / (B + V + 1)          -- add-one on
                continuation counts keeps every token (incl. OOV) > 0
  P(w2|w1)    = (max(c(w1,w2) - D, 0) + D * N1+(w1,.) * Pcont(w2))
                / c(w1)                                  if c(w1) > 0
              = Pcont(w2)                                otherwise (OOV
                context: back off to the continuation distribution)

  kn_ppl(doc) = exp(-mean over the doc's bigrams of ln P(w2|w1))

Tokenizer is the LM family's ``lower() + [a-z']+`` extraction —
identical JVM-side (regexp_extract_all) and in the DuckDB twin.

Scale shape (the reason this is join-based, not a numpy table):
- training is two map-side-combined groupBys over the exploded bigram
  stream (bigram counts, then context/continuation rollups OF the
  bigram-type table, which is vocabulary-sized, not corpus-sized);
- the two scalars (B, V) ride a broadcast single-row cross join — no
  driver literal, the plan stays lazy end-to-end;
- scoring joins the scored corpus's bigram stream against the three
  model tables with plain equi-joins: model tables are O(types), so
  AQE broadcasts them when small and shuffle-joins otherwise (no
  forced broadcast hint — the ADVICE r5 posture); the hot-context
  skew ("the" as w1) lands in a JOIN, which AQE skew-splits, never in
  a per-key window;
- document text never rides a shuffle: only (doc_id, w1, w2) triples
  leave the scan, and a production deployment would hash the words to
  8-byte keys first (kept as strings here so the DuckDB twin is exact).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["doc_bigrams", "kn_train", "kn_perplexity", "kn_oracle_sql"]

_WORD_PAT = "[a-z']+"


def doc_bigrams(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, w1, w2) per-document word-bigram stream.

    The word array is materialized behind a Generate barrier
    (explode(array(struct))) so the element_at gathers inside the
    transform lambda read an attribute instead of re-running the regex
    extraction per bigram — the no-CSE-in-HOF hazard lm_train_tables
    documents."""
    words = F.regexp_extract_all(
        F.lower(F.col(text_col)), F.lit(_WORD_PAT), F.lit(0)
    )
    bar = df.select(
        F.col(id_col),
        F.explode(F.array(F.struct(words.alias("_w")))).alias("_s"),
    ).select(id_col, F.col("_s._w").alias("_w"))
    n = F.size("_w")
    # Round-7: scalar explode of the position range with two
    # element_at gathers per OUTPUT row on the bound _w attribute —
    # the previous transform(sequence, lambda)-of-structs array build
    # evaluated interpreted (HOFs are CodegenFallback; see
    # classifier._features for the measured CPU delta). Same pairs in
    # the same order.
    idx = F.when(n >= 2, F.sequence(F.lit(0), n - 2)).otherwise(
        F.array().cast("array<int>")
    )
    return bar.select(
        F.col(id_col), "_w", F.explode(idx).alias("_i")
    ).select(
        id_col,
        F.element_at("_w", F.col("_i") + 1).alias("w1"),
        F.element_at("_w", F.col("_i") + 2).alias("w2"),
    )


def kn_train(
    train_df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame]:
    """Fit the KN count tables. Returns (bigrams, contexts,
    continuations, scalars):

      bigrams       (w1, w2, c12)
      contexts      (w1, c1, n1p_left)    -- rollup of the TYPE table
      continuations (w2, n1p_right)
      scalars       single row (b_types, v_types)

    Every aggregate is map-side combined; contexts/continuations
    aggregate the bigram-TYPE table (vocabulary-sized), so the hot
    "the"-context rows collapse before any shuffle of corpus volume.
    """
    big = (
        doc_bigrams(train_df, text_col, id_col)
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c12"))
        # lazy lineage cut: the bigram-TYPE table feeds FOUR consumers
        # (the scoring join, ctx, cont, vocab/scalars) whose pruned
        # subplans Catalyst does not share — without the cut the train
        # bigram explode+aggregate re-ran per branch. Stays distributed
        # (O(bigram types) rows, never collected).
        .localCheckpoint(eager=False)
    )
    ctx = big.groupBy("w1").agg(
        F.sum("c12").alias("c1"), F.count(F.lit(1)).alias("n1p_left")
    )
    cont = big.groupBy("w2").agg(F.count(F.lit(1)).alias("n1p_right"))
    vocab = big.select(F.col("w1").alias("w")).union(
        big.select(F.col("w2").alias("w"))
    )
    scalars = big.agg(F.count(F.lit(1)).alias("b_types")).crossJoin(
        vocab.agg(F.count_distinct("w").alias("v_types"))
    )
    return big, ctx, cont, scalars


def kn_perplexity(
    df: DataFrame,
    train_df: DataFrame,
    discount: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_to: int = 4,
) -> DataFrame:
    """Score ``df`` under the KN bigram model fit on ``train_df``.

    Returns (id, n_bigrams, kn_ppl) for every document with >= 1
    bigram (sub-2-token docs have no defined bigram perplexity and are
    omitted, the inner-semantics both engines share)."""
    big, ctx, cont, scalars = kn_train(train_df, text_col, id_col)
    sb = doc_bigrams(df, text_col, id_col)
    j = (
        sb.join(big, ["w1", "w2"], "left")
        .join(ctx, "w1", "left")
        .join(cont, "w2", "left")
        .crossJoin(F.broadcast(scalars))
    )
    d = F.lit(discount)
    pcont = (F.coalesce("n1p_right", F.lit(0)) + 1) / (
        F.col("b_types") + F.col("v_types") + 1
    )
    p = F.when(
        F.col("c1").isNotNull(),
        (
            F.greatest(F.coalesce("c12", F.lit(0)) - d, F.lit(0.0))
            + d * F.col("n1p_left") * pcont
        )
        / F.col("c1"),
    ).otherwise(pcont)
    return (
        j.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.exp(-F.avg(F.log(p))), round_to).alias("kn_ppl"),
        )
    )


def kn_oracle_sql(
    table: str,
    train_where: str,
    discount: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_to: int = 4,
) -> str:
    """DuckDB twin: identical tokenizer, counts, discounting,
    continuation smoothing and backoff. Words match ``[a-z']+`` so they
    cannot contain spaces — the bigram unnest round-trips through a
    single space-joined string."""
    bg = f"""
            SELECT {id_col},
                   split_part(bg, ' ', 1) AS w1,
                   split_part(bg, ' ', 2) AS w2
            FROM (
                SELECT {id_col},
                       unnest([w[i]||' '||w[i+1]
                               for i in generate_series(1, len(w)-1)]) AS bg
                FROM (
                    SELECT {id_col},
                           regexp_extract_all(lower({text_col}),
                                              '{_WORD_PAT.replace("'", "''")}') AS w
                    FROM {table}{{where}}
                ) t
            ) u
    """
    train_bg = bg.format(where=f" WHERE {train_where}")
    score_bg = bg.format(where="")
    return f"""
        WITH big AS (
            SELECT w1, w2, COUNT(*) AS c12
            FROM ({train_bg}) GROUP BY w1, w2
        ), ctx AS (
            SELECT w1, SUM(c12) AS c1, COUNT(*) AS n1p_left
            FROM big GROUP BY w1
        ), cont AS (
            SELECT w2, COUNT(*) AS n1p_right FROM big GROUP BY w2
        ), scal AS (
            SELECT (SELECT COUNT(*) FROM big) AS b_types,
                   (SELECT COUNT(DISTINCT w) FROM (
                        SELECT w1 AS w FROM big
                        UNION ALL SELECT w2 FROM big)) AS v_types
        ), sb AS ({score_bg}),
        p AS (
            SELECT sb.{id_col},
                   CASE WHEN ctx.c1 IS NOT NULL THEN
                       (greatest(COALESCE(big.c12, 0) - {discount}, 0.0)
                        + {discount} * ctx.n1p_left
                          * (COALESCE(cont.n1p_right, 0) + 1)
                          / (scal.b_types + scal.v_types + 1))
                       / ctx.c1
                   ELSE
                       (COALESCE(cont.n1p_right, 0) + 1.0)
                       / (scal.b_types + scal.v_types + 1)
                   END AS p
            FROM sb
            LEFT JOIN big ON sb.w1 = big.w1 AND sb.w2 = big.w2
            LEFT JOIN ctx ON sb.w1 = ctx.w1
            LEFT JOIN cont ON sb.w2 = cont.w2
            CROSS JOIN scal
        )
        SELECT {id_col}, COUNT(*) AS n_bigrams,
               ROUND(exp(-avg(ln(p))), {round_to}) AS kn_ppl
        FROM p GROUP BY {id_col}
        ORDER BY {id_col}
    """
