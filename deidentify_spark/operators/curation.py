"""Corpus-curation operators a training-data pipeline runs between
dedup and tokenization: substring-level duplicate-span detection,
deterministic stratified sampling (data-mixing weights),
concat-and-chunk sequence packing, and benchmark decontamination
(n-gram overlap vs a held-out eval set).

All are pure DataFrame compositions (no Python UDFs):

* dup spans:  positional k-gram explode -> per-gram global occurrence
  count (one window shuffle on the gram hash) -> gaps-and-islands merge
  of overlapping [pos, pos+k) intervals per doc (one shuffle on doc_id).
  This is the DataFrame form of suffix-array substring dedup (Lee et
  al., "Deduplicating Training Data Makes Language Models Better"):
  instead of a corpus-wide suffix array, every length-k token window is
  hashed and any window occurring >= min_occ times anywhere in the
  corpus marks its span as duplicated; overlapping marked windows merge
  into maximal spans, exactly the byte-range output the suffix-array
  method emits (granularity k instead of exact longest-match).
* stratified sample:  ZERO-shuffle map-only filter. The keep decision is
  a pure function of (seed, doc_id) — first 8 md5 hex chars as a uniform
  u32 — compared against a per-stratum rate from a literal map, so the
  same doc survives the same way on every run, every retry, and every
  cluster size (resume-safe; no RNG state, no sampling shuffle).
* pack sequences:  GPT-style concat-and-chunk. Docs are laid end-to-end
  in (stratum, doc_id) order and cut into fixed token budgets; a doc's
  chunk is floor(start_offset / budget). One window shuffle per stratum.
  Chunk boundaries may split a doc (by design — this is how LM
  pretraining actually packs context windows); the alternative greedy
  "close the bin when the next doc doesn't fit" is inherently
  sequential and is NOT this operator.

Scale notes (100 TB): the dup-span gram window partitions by a 64-bit
gram hash, so a boilerplate gram repeated across the corpus lands on one
task — counting is linear and the window carries only (doc_id, pos),
but a truly degenerate gram (empty-page boilerplate at 10^8 occurrences)
should be removed by exact dedup first, same caveat as the n-gram
Jaccard chain (dedup.py). Packing windows partition per stratum; at
10^12 docs a stratum is a source/domain bucket, not the whole corpus —
re-stratify (e.g. by (source, date)) if one stratum dominates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _positional_kgrams(
    df: DataFrame, k: int, text_col: str, id_col: str
) -> DataFrame:
    """(id, pos, gram) for every length-k word window; 0-based pos.
    Tokenization matches word_shingles (lower/trim/RE2 whitespace) so
    span offsets line up with the shingle operators and the DuckDB twin.
    Docs with < k words yield no rows (sequence() would step downward —
    see word_shingles for the guard rationale)."""
    from deidentify_spark.functions.text_stats import RE2_WS_CLASS
    from deidentify_spark.operators.dedup import _fan_out

    words = F.split(F.lower(F.trim(F.col(text_col))), RE2_WS_CLASS + "+")
    # ONE slice per gram, not k element_at calls: Catalyst inlines the
    # outer `words` split into the transform lambda per reference, so k
    # element_ats re-split the text k times per position (measured 26s
    # -> 7.5s single-core at sf0.1 for k=10); _fan_out parallelizes the
    # remaining cost when the scan arrives as one partition.
    grams = F.when(
        F.size(words) >= k,
        F.transform(
            F.sequence(F.lit(0), F.size(words) - k),
            lambda i: F.concat_ws(" ", F.slice(words, i + 1, k)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return _fan_out(df, id_col).select(
        F.col(id_col), F.posexplode(grams).alias("pos", "gram")
    )


def dup_span_stats(
    df: DataFrame,
    k: int = 10,
    min_occ: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-doc duplicated-substring spans: every length-k token window
    occurring >= min_occ times corpus-wide (within-doc repeats count)
    marks [pos, pos+k); overlapping/adjacent marks merge into maximal
    spans. Returns (id, n_dup_spans, n_dup_tokens, max_span_tokens) for
    docs that have at least one duplicated span.

    Gram identity is xxhash64(gram), not the string — the window
    shuffles 8 bytes per position instead of ~60. A 64-bit collision
    merges two grams' occurrence counts (p ~ n^2/2^65 — at 10^9 distinct
    grams ~3% chance of ONE collision corpus-wide, which can only
    over-mark k tokens); the DuckDB twin groups the strings, identical
    modulo that negligible class.
    """
    grams = _positional_kgrams(df, k, text_col, id_col).select(
        id_col, "pos", F.xxhash64("gram").alias("gh")
    )
    occ = F.count(F.lit(1)).over(Window.partitionBy("gh"))
    marked = grams.withColumn("occ", occ).where(F.col("occ") >= min_occ)

    by_pos = Window.partitionBy(id_col).orderBy("pos")
    prev_end = F.max(F.col("pos") + k).over(
        by_pos.rowsBetween(Window.unboundedPreceding, -1)
    )
    islands = marked.select(
        id_col,
        "pos",
        F.sum(
            F.when(prev_end.isNull() | (F.col("pos") > prev_end), 1).otherwise(0)
        )
        .over(by_pos)
        .alias("island"),
    )
    spans = islands.groupBy(id_col, "island").agg(
        F.min("pos").alias("s"), (F.max("pos") + k).alias("e")
    )
    return spans.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_dup_spans"),
        F.sum(F.col("e") - F.col("s")).alias("n_dup_tokens"),
        F.max(F.col("e") - F.col("s")).alias("max_span_tokens"),
    )


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    default_rate: float,
    seed: int = 42,
    strata_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic per-stratum Bernoulli sample: keep a row iff
    u32(md5(f"{seed}:{id}")) / 2^32 < rate(stratum). Map-only (no
    shuffle, no RNG state); rates ship as a literal CASE, so the plan
    stays fully codegen'd and the filter pushes below later stages.
    This is the data-mixing primitive: up/down-weight sources to hit a
    target corpus composition, reproducibly across retries and reruns.
    """
    u = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string"))), 1, 8
        ),
        16,
        10,
    ).cast("bigint") / F.lit(float(2**32))
    rate = F.lit(float(default_rate))
    for stratum, r in sorted(rates.items()):
        rate = F.when(F.col(strata_col) == stratum, float(r)).otherwise(rate)
    return df.where(u < rate)


def pack_sequences(
    df: DataFrame,
    budget: int = 512,
    strata_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Concat-and-chunk packing: within each stratum, docs (ordered by
    id) are laid end-to-end and cut every ``budget`` whitespace tokens;
    a doc belongs to the chunk its first token falls in. Returns one row
    per (stratum, chunk_id): n_docs, n_tokens, first/last doc. Feeding
    chunks (not raw docs) downstream gives the tokenizer fixed-size work
    units and removes padding waste — the standard LM packing step.
    """
    from deidentify_spark.functions.text_stats import RE2_WS_CLASS

    n_tokens = F.size(
        F.split(F.lower(F.trim(F.col(text_col))), RE2_WS_CLASS + "+")
    ).cast("bigint")
    w = (
        Window.partitionBy(strata_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    off = df.select(
        F.col(id_col),
        F.col(strata_col),
        n_tokens.alias("n_tokens"),
    ).withColumn("start_off", F.sum("n_tokens").over(w) - F.col("n_tokens"))
    return off.groupBy(
        strata_col, (F.col("start_off") / budget).cast("bigint").alias("chunk_id")
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
        F.min(id_col).alias("first_doc"),
        F.max(id_col).alias("last_doc"),
    )


def decontaminate_flags(
    df: DataFrame,
    eval_df: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Benchmark decontamination: flag corpus docs sharing any word
    n-gram with an evaluation set (the GPT-3/PaLM 13-gram-overlap
    technique, n configurable). Returns (id, n_contaminated_grams,
    n_distinct_eval_grams_hit) per flagged doc — the remove/keep policy
    is the caller's (training pipelines usually drop or split).

    Scale shape: the eval set is tiny next to the corpus (benchmarks are
    thousands of docs, the corpus 10^12), so its distinct gram-hash set
    BROADCASTS — the corpus side is one narrow explode + broadcast
    semi-join-style aggregation, no shuffle of corpus grams at all
    (pinned in tests/test_plans.py: BroadcastHashJoin, zero exchanges on
    the corpus branch below the final per-doc groupBy). Gram identity is
    xxhash64, same collision math as dup_span_stats.
    """
    eval_grams = (
        _positional_kgrams(eval_df, n, text_col, id_col)
        .select(F.xxhash64("gram").alias("gh"))
        .distinct()
    )
    doc_grams = _positional_kgrams(df, n, text_col, id_col).select(
        id_col, F.xxhash64("gram").alias("gh")
    )
    hits = doc_grams.join(F.broadcast(eval_grams), "gh")
    return hits.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_contaminated_grams"),
        F.count_distinct("gh").alias("n_distinct_eval_grams_hit"),
    )
