"""Checkpoint/resume semantics: crash mid-run, resume, byte-identical to
a single-shot run with no recomputation of completed buckets."""

import os

import pytest
from pyspark.sql import functions as F

from deidentify_spark.pipeline.checkpoint import (
    iceberg_available,
    read_manifest,
    remaining_buckets,
    run_checkpointed,
)
from deidentify_spark.pipeline.stages import PipelineConfig, run_pipeline
from deidentify_spark.sources.pages import generate_pages

N_DOCS = 600
KEY = "ckpt-key"


def _cfg():
    return PipelineConfig(secret_key=KEY, n_buckets=16)


def test_crash_resume_byte_identical(spark, tmp_path):
    out = str(tmp_path / "run")
    pages = generate_pages(spark, N_DOCS, seed=5, partitions=8)

    # crash after wave 1 (of 4)
    with pytest.raises(RuntimeError, match="injected failure"):
        run_checkpointed(pages, out, _cfg(), n_waves=4, fail_after_wave=1)
    m = read_manifest(out)
    assert 0 < len(m["done_buckets"]) < 16
    assert remaining_buckets(out, _cfg())

    # files written so far — resume must not rewrite them
    scrub_dir = os.path.join(out, "scrubbed")
    before = {
        os.path.join(r, f): os.path.getmtime(os.path.join(r, f))
        for r, _, fs in os.walk(scrub_dir)
        for f in fs
        if f.endswith(".parquet")
    }
    assert before

    run_checkpointed(pages, out, _cfg(), n_waves=4)
    assert remaining_buckets(out, _cfg()) == []

    after = {
        os.path.join(r, f): os.path.getmtime(os.path.join(r, f))
        for r, _, fs in os.walk(scrub_dir)
        for f in fs
        if f.endswith(".parquet")
    }
    for path, mtime in before.items():
        assert after[path] == mtime, f"completed output rewritten: {path}"

    # final output equals a single-shot run exactly
    resumed = spark.read.parquet(scrub_dir)
    oneshot = run_pipeline(pages, _cfg())
    a = {
        r.url: (r.keep, r.drop_reason, r.scrubbed_text) for r in resumed.collect()
    }
    b = {
        r.url: (r.keep, r.drop_reason, r.scrubbed_text) for r in oneshot.collect()
    }
    assert a == b

    # metrics cover all buckets, reconcile with doc count
    metrics = spark.read.parquet(os.path.join(out, "metrics"))
    assert metrics.agg(F.sum("docs_in")).head()[0] == N_DOCS


def test_config_change_rejected(spark, tmp_path):
    out = str(tmp_path / "run2")
    pages = generate_pages(spark, 100, seed=6, partitions=4)
    run_checkpointed(pages, out, _cfg(), n_waves=2)
    other = PipelineConfig(secret_key="different-key", n_buckets=16)
    with pytest.raises(ValueError, match="different pipeline config"):
        run_checkpointed(pages, out, other, n_waves=2)


def test_completed_run_is_noop(spark, tmp_path):
    out = str(tmp_path / "run3")
    pages = generate_pages(spark, 100, seed=6, partitions=4)
    run_checkpointed(pages, out, _cfg(), n_waves=2)
    m1 = read_manifest(out)
    run_checkpointed(pages, out, _cfg(), n_waves=2)  # all waves skipped
    assert read_manifest(out) == m1


def test_iceberg_detection_returns_bool(spark):
    # sandbox has no Iceberg jar; the probe must answer cleanly either way
    assert iceberg_available(spark) in (True, False)


def test_wave_filter_below_python_stage(spark):
    """The wave's bucket filter must execute BEFORE the fused Python
    stage (filtering the annotated output instead would re-run the whole
    pipeline once per wave)."""
    from pyspark.sql import functions as F

    from deidentify_spark.pipeline.stages import run_pipeline

    pages = generate_pages(spark, 50, seed=9, partitions=2)
    cfg = _cfg()
    bucket_of_url = F.pmod(F.xxhash64("url"), F.lit(cfg.n_buckets)).cast("int")
    wave = run_pipeline(pages.where(bucket_of_url.isin([0, 4, 8])), cfg)
    plan = wave._jdf.queryExecution().executedPlan().toString()
    i_udf = plan.index("ArrowEvalPython")
    i_filter = plan.index("Filter cast(pmod(xxhash64(url")
    # tree printing puts children (executed first) after parents
    assert i_filter > i_udf, "bucket filter did not land below the python stage"


def test_crash_before_manifest_no_duplicates(spark, tmp_path):
    """Crash in the window AFTER a wave's data write but BEFORE its
    manifest write: the resumed run must re-process that wave and
    OVERWRITE its bucket partitions (dynamic partition overwrite) — never
    append duplicates or double-count metrics."""
    out = str(tmp_path / "run4")
    pages = generate_pages(spark, N_DOCS, seed=5, partitions=8)

    with pytest.raises(RuntimeError, match="before manifest"):
        run_checkpointed(
            pages, out, _cfg(), n_waves=4, fail_before_manifest_wave=1
        )
    m = read_manifest(out)
    # wave 0 committed, wave 1 wrote data but did NOT commit
    assert len(m["done_buckets"]) == 4
    scrub_dir = os.path.join(out, "scrubbed")
    written_rows = spark.read.parquet(scrub_dir).count()
    assert written_rows > 0

    run_checkpointed(pages, out, _cfg(), n_waves=4)
    assert remaining_buckets(out, _cfg()) == []

    resumed = spark.read.parquet(scrub_dir)
    # no duplicate urls anywhere (append would duplicate wave 1)
    assert resumed.count() == resumed.select("url").distinct().count() == N_DOCS

    oneshot = run_pipeline(pages, _cfg())
    a = {r.url: (r.keep, r.drop_reason, r.scrubbed_text) for r in resumed.collect()}
    b = {r.url: (r.keep, r.drop_reason, r.scrubbed_text) for r in oneshot.collect()}
    assert a == b

    # metrics: exactly one row per bucket, totals reconcile (no double count)
    metrics = spark.read.parquet(os.path.join(out, "metrics"))
    assert metrics.count() == metrics.select("bucket").distinct().count()
    assert metrics.agg(F.sum("docs_in")).head()[0] == N_DOCS
