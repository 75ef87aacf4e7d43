"""Dataset-scale deduplication operators over a text corpus.

All operators are pure DataFrame compositions (no Python UDFs except
SimHash's bit-mixing, which is a vectorized pandas UDF) and scale as:

* exact:      one hash-groupBy shuffle on md5(text).
* minhash LSH: explode word shingles -> per-doc K minhashes (aggregate,
  map-side combinable) -> band -> groupBy band signature -> candidate
  pairs within buckets. No O(n^2) stage; the only joins are
  bucket-local. Hashing uses hex-prefix-of-md5 so DuckDB can replicate
  byte-for-byte (driver oracle).
* simhash:    64-bit signature per doc from hashed word features, banded
  into 16-bit quadrants for Hamming<=3-ish candidate buckets.
* ngram jaccard: shingle self-join (equi-join on shingle hash) ->
  common-shingle counts -> exact Jaccard filter. Quadratic only within
  identical-shingle groups; for web-scale use the minhash candidates as
  the left side instead of all pairs.
* embedding cosine: block the cartesian with sign-LSH buckets (see
  operators/similarity.py) or run exact for small dims/tables.
"""

from __future__ import annotations

from zlib import crc32

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the min-id canonical row per exact text group."""
    w = df.groupBy(F.md5(text_col).alias("text_hash")).agg(
        F.min(id_col).alias(id_col)
    )
    return df.join(w, id_col, "left_semi")


def _hash60(col: Column) -> Column:
    """First 15 hex chars of md5 as a bigint (60 bits, DuckDB-replicable:
    conv(substring(md5(x),1,15),16,10))."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def word_shingles(
    df: DataFrame, n: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Distinct word n-gram shingles per doc: (id, shingle)."""
    words = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(words) - n, F.lit(-1))),
        lambda i: F.concat_ws(" ", *[F.element_at(words, (i + j + 1).cast("int")) for j in range(n)]),
    )
    return (
        df.select(F.col(id_col), F.explode(grams).alias("shingle"))
        .distinct()
    )


def minhash_signatures(
    shingles: DataFrame, k: int = 8, id_col: str = "doc_id"
) -> DataFrame:
    """K minhash values per doc: min over shingles of hash60(shingle:i).

    One groupBy(id) with K min() aggregates — map-side combinable, one
    shuffle, no UDF.
    """
    aggs = [
        F.min(_hash60(F.concat(F.col("shingle"), F.lit(f":{i}")))).alias(f"mh{i}")
        for i in range(k)
    ]
    return shingles.groupBy(id_col).agg(*aggs)


def minhash_lsh_candidates(
    df: DataFrame,
    n: int = 3,
    k: int = 8,
    bands: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Candidate near-dup pairs (a < b) from banded minhash signatures.

    k/bands rows per band; docs sharing any full band signature become a
    candidate pair. Pair emission is bucket-local (self-join within
    groupBy buckets), never a global cross join.
    """
    rows = k // bands
    sigs = minhash_signatures(word_shingles(df, n, text_col, id_col), k, id_col)
    band_cols = []
    for b in range(bands):
        parts = [F.col(f"mh{b * rows + r}").cast("string") for r in range(rows)]
        band_cols.append(
            F.struct(F.lit(b).alias("band"), F.concat_ws("_", *parts).alias("sig"))
        )
    banded = sigs.select(
        F.col(id_col), F.explode(F.array(*band_cols)).alias("bs")
    ).select(id_col, F.col("bs.band").alias("band"), F.col("bs.sig").alias("sig"))
    left = banded.alias("l")
    right = banded.alias("r")
    pairs = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.sig") == F.col("r.sig"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("doc_a"), F.col(f"r.{id_col}").alias("doc_b")
        )
        .distinct()
    )
    return pairs


def ngram_jaccard_pairs(
    df: DataFrame,
    n: int = 3,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact Jaccard-similar pairs via shingle equi-join (no cross join).

    jaccard(a,b) = |A ∩ B| / (|A| + |B| - |A ∩ B|) over distinct word
    n-gram shingles.
    """
    sh = word_shingles(df, n, text_col, id_col)
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    common = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col(id_col).alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("doc_b"), F.col("n_sh").alias("n_b"))
    return (
        common.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
                4,
            ),
        )
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def simhash_udf(bits: int = 64):
    """Vectorized 64-bit SimHash over whitespace words."""

    @F.pandas_udf(LongType())
    def simhash(text: pd.Series) -> pd.Series:
        out = []
        for t in text.fillna(""):
            words = t.lower().split()
            if not words:
                out.append(0)
                continue
            hs = np.array(
                [crc32(w.encode()) * 0x9E3779B97F4A7C15 % (1 << 64) for w in words],
                dtype=np.uint64,
            )
            acc = np.zeros(bits, dtype=np.int64)
            for shift in range(bits):
                bitvals = (hs >> np.uint64(shift)) & np.uint64(1)
                acc[shift] += int(bitvals.sum() * 2) - len(hs)
            sig = 0
            for shift in range(bits):
                if acc[shift] > 0:
                    sig |= 1 << shift
            # store as signed 64-bit
            out.append(sig - (1 << 64) if sig >= (1 << 63) else sig)
        return pd.Series(out)

    return simhash


def simhash_near_dups(
    df: DataFrame,
    max_hamming: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Verified SimHash near-dups: candidate pairs from quadrant buckets
    (see simhash_candidates), then an exact Hamming-distance filter via
    bit_count(xor) — all JVM-side, no cross join. Complete for
    Hamming <= 3 by the pigeonhole guarantee."""
    sig = df.select(id_col, simhash_udf()(F.col(text_col)).alias("sig"))
    cands = simhash_candidates(df, text_col, id_col)
    sa = sig.select(F.col(id_col).alias("doc_a"), F.col("sig").alias("sig_a"))
    sb = sig.select(F.col(id_col).alias("doc_b"), F.col("sig").alias("sig_b"))
    return (
        cands.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "hamming", F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
        )
        .where(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


def simhash_candidates(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Near-dup candidates: equal 16-bit SimHash quadrant (Hamming<=3 docs
    must share at least one of 4 quadrants — pigeonhole)."""
    sig = df.select(id_col, simhash_udf()(F.col(text_col)).alias("sig"))
    quads = sig.select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(q).alias("quad"),
                        F.shiftright("sig", q * 16).bitwiseAND(F.lit(0xFFFF)).alias("val"),
                    )
                    for q in range(4)
                ]
            )
        ).alias("qv"),
    ).select(id_col, "qv.quad", "qv.val")
    l, r = quads.alias("l"), quads.alias("r")
    return (
        l.join(
            r,
            (F.col("l.quad") == F.col("r.quad"))
            & (F.col("l.val") == F.col("r.val"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(F.col(f"l.{id_col}").alias("doc_a"), F.col(f"r.{id_col}").alias("doc_b"))
        .distinct()
    )


def embedding_near_dup_pairs(
    emb: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine-similar pairs (a<b). Intended for small/blocked
    inputs; at scale feed LSH-bucketed candidates instead (see
    operators/similarity.py)."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    norm = F.sqrt(F.aggregate(v, F.lit(0.0), lambda a, x: a + x * x))
    base = emb.select(
        F.col(id_col), v.alias("v"), norm.alias("nrm")
    )
    a, b = base.alias("a"), base.alias("b")
    dot = F.aggregate(
        F.zip_with(F.col("a.v"), F.col("b.v"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        a.join(b, F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.round(dot / (F.col("a.nrm") * F.col("b.nrm")), 4).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )
