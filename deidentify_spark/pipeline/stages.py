"""The staged DataFrame plan: langid gate -> heuristic rules -> perplexity
-> scrub, per BASELINE.json north_star ("staged DataFrame plan").

Stage ordering is encoded manually in the plan because pandas UDFs are
opaque to Catalyst — it cannot reorder a cheap gate before an expensive
UDF (SURVEY.md §4.1). Expensive stages take an explicit mask column and
skip already-dropped rows inside the Arrow batch, which keeps a
single-pass narrow plan (no filter/union split, no second scan) while
spending Python time only on surviving docs.

Scale posture (for the 1000-executor / 100 TB case):
* ``html`` is dropped immediately after scan -> parquet column pruning
  never materializes it.
* explicit ``repartition(n, xxhash64(url))`` distributes hot hosts before
  any Python stage (north_rule); AQE handles downstream shuffle sizing.
* every stage is a narrow map — the only shuffles in the whole pipeline
  are the explicit repartition and the metrics groupBy.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from deidentify_spark.functions.langid import langid_udf
from deidentify_spark.functions.perplexity import perplexity_udf
from deidentify_spark.functions.quality import (
    QualityConfig,
    quality_drop_reason,
    quality_metrics,
    top_ngram_frac_udf,
)
from deidentify_spark.functions.scrub import scrub_udf


@dataclass(frozen=True)
class PipelineConfig:
    secret_key: str
    target_lang: str = "en"
    # Conf gate sits below the observed clean-English minimum (~0.47) and
    # above ambiguous-garbage scores; no non-English doc scores as 'en' at
    # any confidence in calibration (tests/test_functions.py).
    min_lang_conf: float = 0.35
    max_perplexity: float = 1500.0
    quality: QualityConfig = field(default_factory=QualityConfig)
    n_buckets: int = 64  # url-hash lineage buckets (deterministic, not
    # spark_partition_id, so metrics are stable across cluster sizes)
    repartition: int | None = None  # explicit url-hash repartition width


def run_pipeline(pages: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """Annotate pages with the full filter + scrub decision surface.

    Returns one row per input doc with: bucket, lang_pred, lang_conf,
    perplexity, drop_reason (null = kept), keep, scrubbed_text, pii_hits.
    """
    df = pages.select(
        "url", "warc_ts", "text", "lang"
    )  # html pruned at scan — never read

    if cfg.repartition:
        df = df.repartition(cfg.repartition, F.xxhash64("url"))

    df = df.withColumn(
        "bucket", F.pmod(F.xxhash64("url"), F.lit(cfg.n_buckets)).cast("int")
    )

    # Stage 1: language ID (UDF on all docs — it is the first gate).
    lang_struct = langid_udf()(F.col("text"))
    df = df.withColumn("_lid", lang_struct).select(
        "*", F.col("_lid.lang_pred"), F.col("_lid.lang_conf")
    ).drop("_lid")
    # Wrong language is a hard gate; LOW CONFIDENCE alone is ambiguity,
    # not a verdict — it defers to the quality/perplexity stages and only
    # becomes the drop reason if nothing more specific fires.
    lang_ok = F.col("lang_pred") == cfg.target_lang

    # Stage 2: cheap heuristic rules — pure JVM expressions, codegen'd.
    m = quality_metrics(F.col("text"), cfg.quality)
    cheap_reason = quality_drop_reason(m, F.lit(None).cast("double"), cfg.quality)
    df = df.withColumn("_cheap_reason", cheap_reason)

    # Stage 2b: n-gram repetition (Python) only for cheap-rule survivors.
    rep_mask = lang_ok & F.col("_cheap_reason").isNull()
    df = df.withColumn("_top2", top_ngram_frac_udf()(F.col("text"), rep_mask))
    quality_reason = F.when(
        F.col("_cheap_reason").isNotNull(), F.col("_cheap_reason")
    ).when(
        F.col("_top2").isNotNull()
        & ~F.isnan("_top2")
        & (F.col("_top2") > cfg.quality.max_top_2gram_frac),
        F.lit("top_ngram_repetition"),
    )

    # Stage 3: perplexity only for quality survivors.
    ppl_mask = rep_mask & quality_reason.isNull()
    df = df.withColumn("perplexity", perplexity_udf()(F.col("text"), ppl_mask))

    drop_reason = (
        F.when(~lang_ok, "non_english")
        .when(quality_reason.isNotNull(), quality_reason)
        .when(
            F.col("perplexity").isNotNull()
            & ~F.isnan("perplexity")
            & (F.col("perplexity") > cfg.max_perplexity),
            "high_perplexity",
        )
        .when(F.col("lang_conf") < cfg.min_lang_conf, "low_lang_conf")
        .otherwise(F.lit(None).cast("string"))
    )
    df = df.withColumn("drop_reason", drop_reason).withColumn(
        "keep", F.col("drop_reason").isNull()
    )

    # Stage 4: scrub only kept docs.
    df = df.withColumn("_scrub", scrub_udf(cfg.secret_key)(F.col("text"), F.col("keep")))
    df = df.select(
        "url",
        "warc_ts",
        "text",
        "lang",
        "bucket",
        "lang_pred",
        "lang_conf",
        "perplexity",
        "drop_reason",
        "keep",
        F.col("_scrub.scrubbed_text").alias("scrubbed_text"),
        F.col("_scrub.pii_hits").alias("pii_hits"),
    )
    return df
