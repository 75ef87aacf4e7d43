"""Trained model-based quality classification — the fastText-supervised
analog (Joulin et al. 2016) used by DCLM/FineWeb-style pipelines to rank
web pages with a lightweight text classifier, built as distributed
multinomial Naive Bayes over hashed word uni+bigrams.

Why NB and not SGD: the closed form IS an aggregation — per-feature
class counts + log-likelihood-ratio weights — so training is two Spark
shuffles (feature explode -> groupBy(feature) count; plus one tiny
label count), fully deterministic (no RNG, no iteration order), linear
in corpus tokens, and byte-replicable in DuckDB for the driver oracle.
fastText's own supervised mode with a linear bag-of-ngrams model and
hashed bigram buckets is the public precedent for this feature space;
at equal features NB is the order-free member of the linear-model
family, which is what an oracle-checked distributed trainer needs.

Model = ONE dense DataFrame of ``n_buckets`` rows (feature, w) + a
scalar bias, so scoring is: explode doc features -> broadcast-join the
weight table -> groupBy(doc) sum.  Docs too short to emit any feature
score ``bias`` alone (mirrored in the oracle twin).

Scale: training counts are map-side combinable; the weights table is
O(n_buckets) regardless of corpus size (2^15 default = 256 KB
broadcast); scoring shuffles one (id, weight-sum) pair per doc via
partial aggregation. Nothing is driver-side.

Tokenization is the repo-pinned RE2 whitespace class; features are
md5-hex-prefix hashes (operators/dedup._hash60) mod n_buckets — both
identical in the generated DuckDB twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from deidentify_spark.operators.dedup import _hash60

DEFAULT_BUCKETS = 1 << 15


def _features(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n_buckets: int,
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(id[, extra...], feature) with multiplicity: hashed word unigrams
    + bigrams. ``extra_cols`` ride the explode (e.g. a per-doc label) so
    consumers aggregating over features never need a per-doc join —
    an O(n_docs) table can neither broadcast at corpus scale nor join
    without an extra feature-stream shuffle.

    Uni/bigram shingles are distinct strings ("foo" vs "foo bar"), so
    one hash space serves both, exactly as fastText buckets them.

    Both gram orders come from ONE ``_materialized_words`` base and ONE
    explode: the unigram array IS the words array, the bigram array is
    one transform over it, concatenated before the explode. The
    previous two-``word_shingles`` union evaluated
    ``_materialized_words`` twice — i.e. TWO full-text repartition
    shuffles and two split passes per _features evaluation (and
    _features itself is evaluated by both the counts and the scoring
    subplans, so 4 text shuffles per train+score). Measured at 50k
    pages / 8 cores (dsir): score-only 59.5-62.1s -> 32.7s, select
    52.3s -> 28.6s — 1.8-1.9x, 467k tokens/sec.
    """
    from deidentify_spark.operators.dedup import _materialized_words

    base = _materialized_words(df, text_col, id_col, extra_cols=extra_cols)
    bi = F.when(
        F.size("_words") >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size("_words") - 2),
            lambda i: F.concat_ws(" ", F.slice("_words", i + 1, 2)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    grams = F.concat(F.col("_words"), bi)
    extras = [F.col(c) for c in extra_cols]
    return base.select(
        F.col(id_col), *extras, F.explode(grams).alias("shingle")
    ).select(
        id_col,
        *extras,
        F.pmod(_hash60(F.col("shingle")), F.lit(n_buckets)).alias("feature"),
    )


def nb_train(
    df: DataFrame,
    label_col: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = DEFAULT_BUCKETS,
    alpha: float = 1.0,
) -> tuple[DataFrame, DataFrame]:
    """Train multinomial NB; ``label_col`` is boolean (True = positive).

    Returns ``(weights, bias)``: a dense (feature, w) table of exactly
    ``n_buckets`` rows — w = log-likelihood ratio with Laplace ``alpha``
    — and a one-row (bias) DataFrame carrying the class-prior log-odds.
    Dense on purpose: scoring then needs no unseen-feature special case
    (an unseen bucket's weight is the pure-smoothing ratio, a real
    number, not 0).
    """
    spark = df.sparkSession
    # the label rides the feature explode (_features extra_cols) — a
    # per-doc (id, label) join here would need an O(n_docs) broadcast
    # (over Spark's limit at corpus scale) or a feature-stream shuffle
    feats = _features(
        df.withColumn("_y", F.col(label_col).cast("boolean")),
        text_col,
        id_col,
        n_buckets,
        extra_cols=("_y",),
    )
    counts = feats.groupBy("feature").agg(
        F.sum(F.when(F.col("_y"), 1).otherwise(0)).alias("c1"),
        F.sum(F.when(F.col("_y"), 0).otherwise(1)).alias("c0"),
    )
    dense = (
        spark.range(n_buckets)
        .withColumnRenamed("id", "feature")
        .join(counts, "feature", "left")
        .select(
            "feature",
            F.coalesce("c1", F.lit(0)).alias("c1"),
            F.coalesce("c0", F.lit(0)).alias("c0"),
        )
    )
    # token totals per class (scalar subplans, broadcast via crossJoin)
    totals = dense.agg(
        F.sum("c1").alias("n1"), F.sum("c0").alias("n0")
    )
    weights = dense.crossJoin(F.broadcast(totals)).select(
        "feature",
        (
            F.log((F.col("c1") + alpha) / (F.col("n1") + alpha * n_buckets))
            - F.log((F.col("c0") + alpha) / (F.col("n0") + alpha * n_buckets))
        ).alias("w"),
    )
    # Prior log-odds, Laplace-smoothed like the feature weights: a
    # single-class training set yields a large-but-finite bias instead
    # of a ±Inf/NULL that would silently propagate NULL into every
    # nb_score downstream.
    bias = df.select(F.col(label_col).cast("boolean").alias("_y")).agg(
        F.log(
            (F.sum(F.when(F.col("_y"), 1).otherwise(0)) + F.lit(alpha))
            / (F.sum(F.when(F.col("_y"), 0).otherwise(1)) + F.lit(alpha))
        ).alias("bias")
    )
    return weights, bias


def nb_score(
    df: DataFrame,
    weights: DataFrame,
    bias: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = DEFAULT_BUCKETS,
    score_col: str = "nb_score",
) -> DataFrame:
    """Log-odds score + prediction per doc.

    Explode features -> broadcast-join the dense weight table -> one
    partial-aggregated groupBy(id) sum. Featureless docs (shorter than
    one word) fall back to the bias via the left join + coalesce.
    """
    feats = _features(df, text_col, id_col, n_buckets)
    sums = (
        feats.join(F.broadcast(weights), "feature")
        .groupBy(id_col)
        .agg(F.sum("w").alias("_wsum"))
    )
    return (
        df.join(sums, id_col, "left")
        .crossJoin(F.broadcast(bias))
        .withColumn(
            score_col, F.col("bias") + F.coalesce(F.col("_wsum"), F.lit(0.0))
        )
        .withColumn(score_col + "_pred", F.col(score_col) > 0)
        .drop("_wsum", "bias")
    )


def nb_oracle_sql(
    table: str,
    train_where: str,
    label_expr: str,
    n_buckets: int = DEFAULT_BUCKETS,
    alpha: float = 1.0,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_to: int = 4,
) -> str:
    """DuckDB twin of nb_train + nb_score over one table: train on the
    rows matching ``train_where`` with boolean ``label_expr``, score
    every row. Tokenization/hashing/weight math replicate the Spark
    side exactly; the score is rounded to absorb summation-order noise.
    """
    words = f"regexp_split_to_array(lower(trim({text_col}, ' ')), '[ \\t\\n\\f\\r]+')"
    shingle = {
        1: "w[i]",
        2: "w[i] || ' ' || w[i+1]",
    }
    # list-comprehension + unnest (DuckDB's generate_series cannot take a
    # lateral column bound as a table function — repo-wide oracle idiom)
    grams = "\nUNION ALL\n".join(
        f"""
        SELECT {id_col}, y,
               unnest([('0x'||substr(md5({shingle[n]}),1,15))::BIGINT % {n_buckets}
                       for i in generate_series(1, len(w) - {n - 1})]) AS feature
        FROM (SELECT {id_col}, ({label_expr}) AS y, {words} AS w FROM {table}) t
        """
        for n in (1, 2)
    )
    return f"""
        WITH feats AS ({grams}),
        train AS (SELECT * FROM feats WHERE {id_col} IN
                    (SELECT {id_col} FROM {table} WHERE {train_where})),
        counts AS (
            -- FILTER, not CASE: an unmatched bucket's NULL y must count
            -- as ZERO tokens in both classes, not as one class-0 token
            SELECT b.feature,
                   COUNT(*) FILTER (WHERE t.y) AS c1,
                   COUNT(*) FILTER (WHERE NOT t.y) AS c0
            FROM (SELECT i AS feature FROM generate_series(0, {n_buckets - 1}) g(i)) b
            LEFT JOIN train t USING (feature) GROUP BY b.feature
        ),
        tot AS (SELECT SUM(c1) AS n1, SUM(c0) AS n0 FROM counts),
        weights AS (
            SELECT feature,
                   ln((c1 + {alpha}) / (n1 + {alpha} * {n_buckets}))
                 - ln((c0 + {alpha}) / (n0 + {alpha} * {n_buckets})) AS w
            FROM counts, tot
        ),
        bias AS (
            -- prior smoothed with the same alpha as the weights (twin
            -- of nb_train's single-class-safe bias)
            SELECT ln((SUM(CASE WHEN ({label_expr}) THEN 1 ELSE 0 END) + {alpha})
                    / (SUM(CASE WHEN ({label_expr}) THEN 0 ELSE 1 END) + {alpha})) AS bias
            FROM {table} WHERE {train_where}
        ),
        sums AS (
            SELECT f.{id_col}, SUM(w.w) AS wsum
            FROM feats f JOIN weights w USING (feature)
            GROUP BY f.{id_col}
        )
        SELECT d.{id_col},
               ROUND(bias.bias + COALESCE(s.wsum, 0.0), {round_to}) AS nb_score,
               (bias.bias + COALESCE(s.wsum, 0.0)) > 0 AS nb_pred
        FROM {table} d LEFT JOIN sums s USING ({id_col}), bias
        ORDER BY d.{id_col}
    """
