"""Corpus-curation operators (operators/curation.py): substring
duplicate-span detection, deterministic stratified sampling, and
concat-and-chunk sequence packing."""

import pytest
from pyspark.sql import functions as F

from deidentify_spark.operators.curation import (
    decontaminate_flags,
    dup_span_stats,
    pack_sequences,
    stratified_sample,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


# ---------------------------------------------------------------- dup spans

def _words(tag: str, n: int) -> str:
    return " ".join(f"{tag}{i}" for i in range(n))


def test_dup_span_merges_overlapping_windows(spark):
    # one shared 12-word run -> three overlapping 10-gram windows that
    # must merge into a single 12-token span in each doc
    shared = _words("dup", 12)
    rows = [
        (1, "s", _words("a", 5) + " " + shared + " " + _words("b", 5)),
        (2, "s", _words("c", 7) + " " + shared),
    ]
    out = {
        r["doc_id"]: r
        for r in dup_span_stats(_docs(spark, rows), k=10).collect()
    }
    assert set(out) == {1, 2}
    for d in (1, 2):
        assert out[d]["n_dup_spans"] == 1
        assert out[d]["n_dup_tokens"] == 12
        assert out[d]["max_span_tokens"] == 12


def test_dup_span_within_doc_repeat_counts(spark):
    # the duplicate occurs twice INSIDE one doc -> both spans flagged
    shared = _words("x", 10)
    rows = [(1, "s", shared + " " + _words("mid", 6) + " " + shared)]
    out = dup_span_stats(_docs(spark, rows), k=10).collect()
    assert len(out) == 1
    assert out[0]["n_dup_spans"] == 2
    assert out[0]["n_dup_tokens"] == 20


def test_dup_span_disjoint_spans_stay_separate(spark):
    s1, s2 = _words("p", 10), _words("q", 10)
    rows = [
        (1, "s", s1 + " " + _words("gap", 8) + " " + s2),
        (2, "s", s1),
        (3, "s", s2),
    ]
    out = {r["doc_id"]: r for r in dup_span_stats(_docs(spark, rows), k=10).collect()}
    assert out[1]["n_dup_spans"] == 2
    assert out[1]["n_dup_tokens"] == 20
    assert out[2]["n_dup_spans"] == 1


def test_dup_span_short_and_unique_docs_absent(spark):
    rows = [
        (1, "s", _words("short", 5)),          # < k words: no grams
        (2, "s", _words("uniq", 30)),          # no duplicated gram
        (3, "s", _words("z", 10)),
        (4, "s", _words("z", 10)),
    ]
    out = dup_span_stats(_docs(spark, rows), k=10).collect()
    assert {r["doc_id"] for r in out} == {3, 4}


# ---------------------------------------------------------------- sampling

def test_stratified_sample_deterministic_and_rate(spark):
    rows = [(i, "a" if i % 2 == 0 else "b", "t") for i in range(2000)]
    df = _docs(spark, rows)
    kept1 = stratified_sample(df, {"a": 0.5}, default_rate=0.1, seed=7)
    kept2 = stratified_sample(df, {"a": 0.5}, default_rate=0.1, seed=7)
    ids1 = sorted(r["doc_id"] for r in kept1.collect())
    assert ids1 == sorted(r["doc_id"] for r in kept2.collect())
    by_src = {
        r["source"]: r["n"]
        for r in kept1.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    # 1000 docs per stratum; binomial 3-sigma
    assert abs(by_src.get("a", 0) - 500) < 3 * (1000 * 0.25) ** 0.5
    assert abs(by_src.get("b", 0) - 100) < 3 * (1000 * 0.09) ** 0.5


def test_stratified_sample_different_seed_differs(spark):
    rows = [(i, "a", "t") for i in range(500)]
    df = _docs(spark, rows)
    a = {r["doc_id"] for r in stratified_sample(df, {}, 0.5, seed=1).collect()}
    b = {r["doc_id"] for r in stratified_sample(df, {}, 0.5, seed=2).collect()}
    assert a != b


def test_stratified_sample_is_map_only(spark):
    rows = [(i, "a", "t") for i in range(100)]
    plan = (
        stratified_sample(_docs(spark, rows), {"a": 0.5}, 0.1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan


# ---------------------------------------------------------------- packing

def test_pack_sequences_chunk_assignment(spark):
    # per-doc 4 tokens, budget 8 -> two docs per chunk, in doc_id order
    rows = [(i, "s", "w w w w") for i in range(6)]
    out = pack_sequences(_docs(spark, rows), budget=8).orderBy("chunk_id").collect()
    assert [(r["chunk_id"], r["n_docs"], r["n_tokens"]) for r in out] == [
        (0, 2, 8),
        (1, 2, 8),
        (2, 2, 8),
    ]
    assert out[0]["first_doc"] == 0 and out[0]["last_doc"] == 1
    assert out[2]["first_doc"] == 4 and out[2]["last_doc"] == 5


def test_pack_sequences_straddling_doc_belongs_to_start_chunk(spark):
    # doc1 starts at offset 5 (< 8) so it belongs to chunk 0 even though
    # it spills past the budget boundary — concat-and-chunk semantics
    rows = [(0, "s", _words("a", 5)), (1, "s", _words("b", 6)), (2, "s", _words("c", 4))]
    out = {r["chunk_id"]: r for r in pack_sequences(_docs(spark, rows), budget=8).collect()}
    assert out[0]["n_docs"] == 2 and out[0]["n_tokens"] == 11
    assert out[1]["n_docs"] == 1 and out[1]["first_doc"] == 2


def test_pack_sequences_strata_independent(spark):
    rows = [(i, f"s{i % 2}", "w w w") for i in range(4)]
    out = pack_sequences(_docs(spark, rows), budget=100).collect()
    assert len(out) == 2  # one chunk per stratum
    assert all(r["n_docs"] == 2 and r["n_tokens"] == 6 for r in out)


def test_pack_sequences_empty_doc_counts_zero_tokens(spark):
    """Empty / whitespace-only docs are 0 tokens (the convention
    token_counts uses) — F.split('') would otherwise count a phantom
    token and shift every later doc's start offset in the stratum."""
    rows = [(0, "s", "w w w w"), (1, "s", ""), (2, "s", "   "),
            (3, "s", "w w w w")]
    out = pack_sequences(_docs(spark, rows), budget=8).orderBy("chunk_id").collect()
    # 4 + 0 + 0 + 4 tokens -> exactly one full chunk holding all 4 docs
    # (empty here = SQL trim semantics, ASCII spaces only — tab-edged
    # text keeps its empty split tokens per the ws-parity convention)
    assert [(r["chunk_id"], r["n_docs"], r["n_tokens"]) for r in out] == [
        (0, 4, 8)
    ]


# ---------------------------------------------------------- decontamination

def test_decontaminate_flags_overlap(spark):
    shared = _words("bench", 8)
    corpus = _docs(spark, [
        (1, "s", _words("a", 6) + " " + shared),          # one 8-gram hit
        (2, "s", shared + " " + shared),                  # hits twice, same gram
        (3, "s", _words("c", 20)),                        # clean
    ])
    ev = _docs(spark, [(100, "e", _words("x", 4) + " " + shared)])
    out = {r["doc_id"]: r for r in decontaminate_flags(corpus, ev, n=8).collect()}
    assert set(out) == {1, 2}
    assert out[1]["n_contaminated_grams"] == 1
    assert out[1]["n_distinct_eval_grams_hit"] == 1
    # doc 2: "bench0..bench7 bench0..bench7" has 9 windows; which of them
    # appear in the eval doc? only the exact shared window (twice) plus
    # none of the wrap-around windows -> 2 occurrences of 1 distinct gram
    assert out[2]["n_contaminated_grams"] == 2
    assert out[2]["n_distinct_eval_grams_hit"] == 1


def test_decontaminate_no_overlap_empty(spark):
    corpus = _docs(spark, [(1, "s", _words("a", 30))])
    ev = _docs(spark, [(9, "e", _words("z", 30))])
    assert decontaminate_flags(corpus, ev, n=8).count() == 0


def test_decontaminate_eval_side_broadcasts(spark):
    corpus = _docs(spark, [(i, "s", _words(f"w{i}", 20)) for i in range(10)])
    ev = _docs(spark, [(99, "e", _words("w3", 20))])
    plan = (
        decontaminate_flags(corpus, ev, n=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_dup_span_survives_single_huge_doc(spark):
    # a 200k-word doc (pathological page) must stream through the gram
    # machinery without a per-row blowup: its grams are one array cell
    # (~1.6 MB of hashes), then explode to rows
    huge = " ".join(f"w{i % 5000}" for i in range(200_000))
    rows = [(1, "s", huge), (2, "s", _words("z", 10)), (3, "s", _words("z", 10))]
    out = {r["doc_id"]: r for r in dup_span_stats(_docs(spark, rows), k=10).collect()}
    # the huge doc repeats its 5000-word vocabulary cycle -> internal
    # duplicate spans are expected; the planted pair must still be found
    assert out[2]["n_dup_spans"] == 1 and out[3]["n_dup_spans"] == 1
    assert 1 in out  # cycle repeats mark the huge doc too


# ---------------------------------------------------------------- line dedup

def test_line_dedup_removes_corpus_duplicates(spark):
    from deidentify_spark.operators.curation import line_dedup

    boiler = "click here to subscribe"
    rows = [
        (0, "s", f"unique zero\n{boiler}\nreal content zero"),
        (1, "s", f"{boiler}\nunique one"),
        (2, "s", "all original\ncontent here"),
        (3, "s", f"repeated inside\nrepeated inside\n{boiler}"),
    ]
    out = {r.doc_id: r for r in line_dedup(_docs(spark, rows), min_dup=2).collect()}
    assert out[0].cleaned_text == "unique zero\nreal content zero"
    assert out[0].n_lines == 3 and out[0].n_lines_removed == 1
    assert out[1].cleaned_text == "unique one"
    # untouched doc: byte-identical pass-through
    assert out[2].cleaned_text == rows[2][2] and out[2].n_lines_removed == 0
    # within-doc repeats count toward the corpus threshold; remove-all
    assert out[3].cleaned_text == "" and out[3].n_lines_removed == 3


def test_line_dedup_threshold_and_empty(spark):
    from deidentify_spark.operators.curation import line_dedup

    rows = [(0, "s", "a\nb"), (1, "s", "a\nc"), (2, "s", "")]
    out3 = {r.doc_id: r for r in line_dedup(_docs(spark, rows), min_dup=3).collect()}
    assert all(r.n_lines_removed == 0 for r in out3.values())
    assert out3[0].cleaned_text == "a\nb"
    out2 = {r.doc_id: r for r in line_dedup(_docs(spark, rows), min_dup=2).collect()}
    assert out2[0].cleaned_text == "b" and out2[1].cleaned_text == "c"
    assert out2[2].cleaned_text == "" and out2[2].n_lines == 1


def test_remove_dup_spans_rewrite_and_passthrough(spark):
    """ExactSubstr removal: the shared 12-word block (k=10 grams
    duplicated across docs) is cut from BOTH docs (remove-all); the
    rebuilt text is the space-joined kept words in original case;
    untouched docs pass through byte-identical."""
    from deidentify_spark.operators.curation import remove_dup_spans

    shared = " ".join(f"w{i}" for i in range(12))
    rows = [
        (1, "s", f"Alpha beta {shared} gamma delta end one two three"),
        (2, "s", f"Start {shared} finish line now okay yes"),
        (3, "s", "totally unique content with no duplicated windows here ok"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {r.doc_id: r for r in remove_dup_spans(df, k=10, min_occ=2).collect()}
    assert out[1].cleaned_text == "Alpha beta gamma delta end one two three"
    assert (out[1].n_words, out[1].n_words_removed) == (20, 12)
    assert out[2].cleaned_text == "Start finish line now okay yes"
    assert out[3].cleaned_text == rows[2][2]  # byte-identical
    assert out[3].n_words_removed == 0
    # within-doc repetition alone also triggers (min_occ counts all
    # occurrences corpus-wide, including same-doc)
    rep = " ".join(f"x{i}" for i in range(10))
    df2 = spark.createDataFrame(
        [(1, "s", f"{rep} middle words here {rep}")],
        "doc_id long, source string, text string",
    )
    r = remove_dup_spans(df2, k=10, min_occ=2).collect()[0]
    assert r.cleaned_text == "middle words here"
    assert r.n_words_removed == 20


def test_remove_dup_spans_counts_match_stats(spark):
    """n_words_removed must equal dup_span_stats' n_dup_tokens doc by
    doc — the two operators share one span core."""
    from deidentify_spark.operators.curation import (
        dup_span_stats,
        remove_dup_spans,
    )

    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    stats = {
        r.doc_id: r.n_dup_tokens
        for r in dup_span_stats(df, k=10, min_occ=2).collect()
    }
    removed = {
        r.doc_id: r.n_words_removed
        for r in remove_dup_spans(df, k=10, min_occ=2)
        .where("n_words_removed > 0")
        .collect()
    }
    assert removed and removed == stats


def test_line_dedup_boilerplate_heavy_doc_bounded(spark):
    """The rewrite must be O(lines + dups) per doc, not O(lines x dups):
    a 20k-line doc with 10k corpus-duplicated lines rewrites in ~1s
    (measured 0.9s; the pre-fix per-line membership scan took 8.3s and
    a barrier-less gather 17.4s). Bounded at 30s for slow boxes — a
    complexity regression lands in minutes, not seconds."""
    import time

    from deidentify_spark.operators.curation import line_dedup

    dup = [f"boilerplate line {i}" for i in range(10_000)]
    uniq = [f"unique content line {i}" for i in range(10_000)]
    doc1 = "\n".join(x for pair in zip(dup, uniq) for x in pair)
    doc2 = "\n".join(dup)
    df = spark.createDataFrame(
        [(1, "s", doc1), (2, "s", doc2)], "doc_id long, source string, text string"
    )
    t0 = time.time()
    out = {
        r.doc_id: r
        for r in line_dedup(df)
        .select("doc_id", "n_lines", "n_lines_removed", "cleaned_text")
        .collect()
    }
    dt = time.time() - t0
    assert out[1].n_lines == 20_000 and out[1].n_lines_removed == 10_000
    assert out[1].cleaned_text == "\n".join(uniq)
    assert out[2].cleaned_text == "" and out[2].n_lines_removed == 10_000
    assert dt < 30, dt


def test_mixture_weights_math_and_composition(spark):
    """Weights normalize, alpha endpoints behave (1=proportional,
    0=uniform), rates cap at 1.0, and the rates actually drive
    stratified_sample to ~the target size."""
    import pyspark.sql.functions as F

    from deidentify_spark.operators.curation import mixture_weights, stratified_sample

    rows = [(i, "big" if i < 900 else ("mid" if i < 990 else "tiny"), f"doc {i}")
            for i in range(1000)]
    df = _docs(spark, rows)

    w = {r.source: r for r in mixture_weights(df, alpha=0.5, target_total=500).collect()}
    assert abs(sum(r.weight for r in w.values()) - 1.0) < 1e-9
    # sqrt scaling upweights the tail source relative to its share
    assert w["tiny"].weight / w["big"].weight > (10 / 900)
    # tiny source: target share exceeds its size -> rate capped at 1.0
    assert w["tiny"].rate == 1.0

    prop = {r.source: r.weight for r in mixture_weights(df, alpha=1.0).collect()}
    assert abs(prop["big"] - 0.9) < 1e-9
    unif = {r.source: r.weight for r in mixture_weights(df, alpha=0.0).collect()}
    assert all(abs(v - 1 / 3) < 1e-9 for v in unif.values())

    rates = {r.source: r.rate for r in
             mixture_weights(df, alpha=0.5, target_total=500).collect()}
    got = stratified_sample(df, rates, default_rate=0.0).count()
    expect = sum(min(1.0, rates[s]) * n for s, n in [("big", 900), ("mid", 90), ("tiny", 10)])
    assert abs(got - expect) / expect < 0.15  # Bernoulli tolerance


# ------------------------------------------- fuzzy decontamination


def test_fuzzy_decontaminate_flags_paraphrase(spark):
    """A corpus doc sharing most (not all) of its shingles with an eval
    doc must be flagged; an unrelated doc must not. Identical text hits
    in all 4 bands."""
    from deidentify_spark.operators.curation import fuzzy_decontaminate_flags

    eval_text = _words("bench", 30)
    # paraphrase: same 30 words with ONE word changed -> most shingles
    # (and with 8 hashes, very likely every minhash) survive
    para = eval_text.replace("bench7", "reworded")
    rows_corpus = [
        (10, "s", eval_text),          # verbatim contamination
        (11, "s", para),               # paraphrase contamination
        (12, "s", _words("clean", 30)),  # unrelated
    ]
    rows_eval = [(99, "s", eval_text)]
    out = {
        r["doc_id"]: r
        for r in fuzzy_decontaminate_flags(
            _docs(spark, rows_corpus), _docs(spark, rows_eval)
        ).collect()
    }
    assert 10 in out and out[10]["n_bands_hit"] == 4
    assert out[10]["n_eval_docs_hit"] == 1
    assert 11 in out and out[11]["n_bands_hit"] >= 1
    assert 12 not in out


def test_fuzzy_decontaminate_eval_side_broadcasts(spark):
    """The eval membership must ride a broadcast join — corpus band rows
    never shuffle for the probe."""
    from deidentify_spark.operators.curation import fuzzy_decontaminate_flags

    rows = [(1, "s", _words("a", 20))]
    plan = fuzzy_decontaminate_flags(
        _docs(spark, rows), _docs(spark, rows)
    )._jdf.queryExecution().sparkPlan().toString()
    assert "BroadcastHashJoin" in plan


# ------------------------------------------------ exact-k sample


def test_sample_exact_k_deterministic_and_exact(spark):
    from deidentify_spark.operators.curation import sample_exact_k

    rows = [(i, "s", f"doc {i}") for i in range(200)]
    df = _docs(spark, rows)
    a = [r.doc_id for r in sample_exact_k(df, k=25).collect()]
    b = [r.doc_id for r in sample_exact_k(df.repartition(7), k=25).collect()]
    assert len(a) == 25 and a == b  # exact count, partitioning-invariant
    # different seed -> different draw (overwhelming probability)
    c = [r.doc_id for r in sample_exact_k(df, k=25, seed=7).collect()]
    assert set(a) != set(c)
    # removing other rows only perturbs the boundary: survivors of a
    # subset draw are a superset-rank prefix — every kept id whose rank
    # was < k stays kept
    sub = df.where(F.col("doc_id") % 3 != 0)
    d = {r.doc_id for r in sample_exact_k(sub, k=25).collect()}
    kept_both = [x for x in a if x % 3 != 0]
    assert set(kept_both) <= d


def test_sample_exact_k_plan_is_take_ordered(spark):
    """orderBy+limit must compile to TakeOrderedAndProject (per-partition
    heaps), not a global Sort."""
    from deidentify_spark.operators.curation import sample_exact_k

    rows = [(i, "s", f"doc {i}") for i in range(50)]
    plan = sample_exact_k(
        _docs(spark, rows), k=5
    )._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Sort " not in plan


# --------------------------------------------------- domain cap


def test_domain_cap_exact_and_matches_single_window(spark):
    """The two-phase bucketed cap must keep EXACTLY the same docs a
    single global per-group ranking would (pigeonhole argument), capped
    at N per group, deterministic across partitionings."""
    from pyspark.sql import Window

    from deidentify_spark.operators.curation import domain_cap

    rows = [(i, f"src{i % 3}", f"doc {i}") for i in range(90)]
    df = _docs(spark, rows)
    out = domain_cap(df, max_per_group=7, group_col="source", n_buckets=4)
    got = {(r.source, r.doc_id): r.group_rank for r in out.collect()}
    # reference: plain single-window ranking
    pri = F.md5(F.concat(F.lit("42:"), F.col("doc_id").cast("string")))
    w = Window.partitionBy("source").orderBy(pri.asc(), F.col("doc_id"))
    ref = {
        (r.source, r.doc_id): r.rank
        for r in df.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 7)
        .collect()
    }
    assert got == ref
    per_group = {}
    for (s, _), rk in got.items():
        per_group.setdefault(s, []).append(rk)
    for s, rks in per_group.items():
        assert sorted(rks) == list(range(1, 8))
    # partitioning-invariant
    got2 = {
        (r.source, r.doc_id): r.group_rank
        for r in domain_cap(
            df.repartition(11), max_per_group=7, group_col="source", n_buckets=4
        ).collect()
    }
    assert got2 == got


def test_domain_cap_phase1_window_is_bucketed(spark):
    from deidentify_spark.operators.curation import domain_cap

    rows = [(i, f"src{i % 3}", f"doc {i}") for i in range(20)]
    plan = domain_cap(
        _docs(spark, rows), max_per_group=3, group_col="source"
    )._jdf.queryExecution().optimizedPlan().toString()
    assert "_b" in plan  # phase-1 partition key includes the id bucket
    assert plan.count("row_number") >= 2


# ------------------------------------------- within-doc line dedup


def test_within_doc_line_dedup_keep_first(spark):
    from deidentify_spark.operators.curation import within_doc_line_dedup

    rows = [
        (1, "s", "nav\nbody one\nnav\nbody two\nnav"),
        (2, "s", "a\nb\nc"),  # untouched -> byte-identical passthrough
        (3, "s", ""),
    ]
    out = {r.doc_id: r for r in within_doc_line_dedup(_docs(spark, rows)).collect()}
    assert out[1].cleaned_text == "nav\nbody one\nbody two"
    assert out[1].n_lines == 5 and out[1].n_lines_removed == 2
    assert out[2].cleaned_text == "a\nb\nc" and out[2].n_lines_removed == 0
    assert out[3].cleaned_text == "" and out[3].n_lines == 1


def test_within_doc_line_dedup_is_shuffle_free(spark):
    """The whole operator must stay one map-side projection: no
    exchange, no join, no window in the executed plan."""
    from deidentify_spark.operators.curation import within_doc_line_dedup

    rows = [(1, "s", "x\ny\nx")]
    plan = within_doc_line_dedup(
        _docs(spark, rows)
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Join" not in plan
    assert "Window" not in plan


# -------------------------------------------------- within-doc chunking


def test_chunk_text_windows_and_overlap(spark):
    from deidentify_spark.operators.curation import chunk_text

    words = [f"w{i}" for i in range(10)]
    rows = [(1, "s", " ".join(words)), (2, "s", ""), (3, "s", "solo")]
    out = {}
    for r in chunk_text(_docs(spark, rows), window=4, stride=3).collect():
        out.setdefault(r.doc_id, []).append(r)
    # doc 1: starts 0,3,6,9 -> 4 chunks, last is the 1-word tail
    got = sorted(out[1], key=lambda r: r.chunk_idx)
    assert [r.chunk_text for r in got] == [
        "w0 w1 w2 w3", "w3 w4 w5 w6", "w6 w7 w8 w9", "w9",
    ]
    assert [r.n_tokens for r in got] == [4, 4, 4, 1]
    assert 2 not in out                      # empty doc -> no chunks
    assert [r.chunk_text for r in out[3]] == ["solo"]
    # reconstruction invariant: stride-prefix of each non-final chunk
    # concatenated + final chunk == original words
    rebuilt = []
    for r in got[:-1]:
        rebuilt.extend(r.chunk_text.split(" ")[:3])
    rebuilt.extend(got[-1].chunk_text.split(" "))
    assert rebuilt == words


def test_chunk_text_is_shuffle_free(spark):
    from deidentify_spark.operators.curation import chunk_text

    rows = [(1, "s", "a b c d e")]
    plan = chunk_text(
        _docs(spark, rows), window=2, stride=2
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Join" not in plan


def test_chunk_text_giant_doc_linear(spark):
    """A single pathological giant doc must chunk with linear volume —
    the transform materializes one struct array ~window/stride x the
    text size, never an n^2 blow-up."""
    from deidentify_spark.operators.curation import chunk_text

    n = 200_000
    giant = " ".join(f"w{i}" for i in range(n))
    df = _docs(spark, [(1, "s", giant)])
    agg = chunk_text(df, window=128, stride=96).groupBy().agg(
        F.count(F.lit(1)).alias("chunks"), F.sum("n_tokens").alias("tok")
    ).collect()[0]
    expect_chunks = (n - 1) // 96 + 1
    assert agg.chunks == expect_chunks
    # total chunk tokens: full windows except the tail remainder
    expect_tok = sum(min(128, n - s) for s in range(0, n, 96))
    assert agg.tok == expect_tok


def test_sample_weighted_exact_k(spark):
    from deidentify_spark.operators.curation import sample_weighted_exact_k

    # 200 light rows (w=1) + 20 heavy rows (w=200): heavy rows should
    # dominate a k=20 draw; zero/NULL-weight rows must never appear.
    rows = [(i, 1.0) for i in range(200)]
    rows += [(1000 + i, 200.0) for i in range(20)]
    rows += [(2000, 0.0), (2001, None)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    out = sample_weighted_exact_k(df, k=20, weight_col="w", seed=3)
    got = [r.doc_id for r in out.collect()]
    assert len(got) == 20 and len(set(got)) == 20
    assert 2000 not in got and 2001 not in got
    heavy = sum(1 for d in got if d >= 1000)
    # heavy rows carry 200*20 = 4000 of 4200 total weight -> expect ~19
    assert heavy >= 15, got
    # deterministic replay
    again = [r.doc_id for r in sample_weighted_exact_k(df, k=20, weight_col="w", seed=3).collect()]
    assert set(again) == set(got)
    # a different seed draws a different set (overwhelmingly likely)
    other = [r.doc_id for r in sample_weighted_exact_k(df, k=20, weight_col="w", seed=4).collect()]
    assert set(other) != set(got)


def test_group_disjoint_split(spark):
    from deidentify_spark.operators.curation import group_disjoint_split

    rows = [(i, f"host{i % 20}") for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, host string")
    out = group_disjoint_split(df, "host", test_frac=0.3, seed=1)
    # disjoint: every host maps to exactly one split
    per_host = out.groupBy("host").agg(
        F.count_distinct("split").alias("k")
    ).collect()
    assert all(r.k == 1 for r in per_host)
    splits = {r.host: r.split for r in out.select("host", "split").distinct().collect()}
    assert set(splits.values()) == {"train", "test"}  # both sides non-empty
    # deterministic replay + incremental consistency: a new row of an
    # existing host joins that host's split
    one = group_disjoint_split(
        spark.createDataFrame([(999, "host3")], "doc_id long, host string"),
        "host", test_frac=0.3, seed=1,
    ).collect()[0]
    assert one.split == splits["host3"]
    # seed changes the draw
    other = {
        r.host: r.split
        for r in group_disjoint_split(df, "host", test_frac=0.3, seed=2)
        .select("host", "split").distinct().collect()
    }
    assert other != splits


# ------------------------------------------------------- rebalance_mixture

def _md5_u(seed: int, doc_id: int) -> float:
    import hashlib

    h = hashlib.md5(f"{seed}:{doc_id}".encode()).hexdigest()
    return int(h[:8], 16) / 2**32


def test_rebalance_mixture_matches_python_reference(spark):
    from deidentify_spark.operators.curation import rebalance_mixture

    import random

    rng = random.Random(3)
    rows = [(i, rng.choice(["en", "de", "fr"]), rng.randint(50, 500))
            for i in range(600)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, n_chars long")
    targets, budget = {"en": 0.5, "de": 0.5}, 40000
    got = sorted(r.doc_id for r in rebalance_mixture(
        df, targets, budget, strata_col="lang", weight_col="n_chars",
        id_col="doc_id", seed=7).collect())

    mass = {}
    for _, lang, n in rows:
        mass[lang] = mass.get(lang, 0.0) + float(n)
    want = sorted(
        i for i, lang, _ in rows
        if lang in targets
        and _md5_u(7, i) < min(1.0, budget * targets[lang] / mass[lang])
    )
    assert got == want
    assert all(lang != "fr" for i, lang, _ in rows if i in set(got))


def test_rebalance_mixture_rate_caps_at_one(spark):
    from deidentify_spark.operators.curation import rebalance_mixture

    # budget*target far exceeds the stratum mass -> rate 1 -> keep ALL
    df = spark.createDataFrame(
        [(i, "en", 100) for i in range(50)],
        "doc_id long, lang string, n_chars long",
    )
    kept = rebalance_mixture(df, {"en": 1.0}, budget=10**9)
    assert kept.count() == 50


def test_rebalance_mixture_expected_mass_near_target(spark):
    from deidentify_spark.operators.curation import rebalance_mixture

    df = spark.createDataFrame(
        [(i, "en" if i % 2 else "de", 100) for i in range(4000)],
        "doc_id long, lang string, n_chars long",
    )
    kept = rebalance_mixture(df, {"en": 0.6, "de": 0.4}, budget=100000)
    got = {r.lang: r.m for r in
           kept.groupBy("lang").agg(F.sum("n_chars").alias("m")).collect()}
    # Bernoulli at ~2000 trials: stay within 15% of expectation
    assert abs(got["en"] - 60000) < 9000 and abs(got["de"] - 40000) < 6000
