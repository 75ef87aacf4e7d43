"""Deterministic corpus shuffle + training-shard assignment — the
terminal step of a training-data pipeline: give every document a
pseudo-random but REPLAYABLE global order, bin it into a fixed number
of shards, and number it within its shard, so the corpus can be
written as `shard=NNN/part-*.parquet` files whose contents and order
are a pure function of (seed, doc ids) — identical across retries,
cluster sizes, and resubmissions (the property random() sampling can
never give a distributed writer).

No counterpart in the reference (aliengiraffe/deidentify is a PII
scrubber); §2.G training-data-pipeline surface. Same determinism
posture as curation.stratified_sample (md5-threshold) and
dsir.gumbel_key (hash-seeded draws).

Scale posture
-------------
shard = pmod(hash60(seed:id), n_shards) is map-only and uniform (no
skew by construction — md5 is uniform over ids regardless of id
distribution); the within-shard position is ONE hash shuffle on shard
+ a per-shard sort (row_number over (shard) ordered by (hash, id)).
Rows per shard ~ n/n_shards; pick n_shards so a shard fits an
executor's sort buffer (10^12 docs / 10^5 shards = 10^7 rows/shard —
fine), exactly how real shard writers size output files. The write
itself is `df.write.partitionBy("shard")` downstream; this operator
computes the assignment, which is the oracle-checkable part.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from deidentify_spark.operators.dedup import _hash60

__all__ = ["assign_shards", "shards_oracle_sql"]


def assign_shards(
    df: DataFrame,
    n_shards: int,
    seed: int = 0,
    id_col: str = "doc_id",
) -> DataFrame:
    """All input columns plus ``shard`` (0..n_shards-1) and
    ``shard_pos`` (1-based position within the shard, in the
    deterministic shuffled order). Order within a shard is by the
    shuffle hash with ``id_col`` as the total-order tie-break, so the
    assignment is a pure function of (seed, ids)."""
    h = _hash60(
        F.concat(F.lit(f"shard:{seed}:"), F.col(id_col).cast("string"))
    )
    w = Window.partitionBy("shard").orderBy("_shard_h", id_col)
    return (
        df.withColumn("_shard_h", h)
        .withColumn("shard", F.pmod(F.col("_shard_h"), F.lit(n_shards)).cast("int"))
        .withColumn("shard_pos", F.row_number().over(w))
        .drop("_shard_h")
    )


def shards_oracle_sql(
    table: str,
    n_shards: int,
    seed: int = 0,
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of assign_shards (hash, shard, and position are all
    integer-exact — no rounding needed)."""
    h = f"('0x'||substr(md5('shard:{seed}:'||{id_col}),1,15))::BIGINT"
    return f"""
        SELECT {id_col},
               CAST({h} % {n_shards} AS INTEGER) AS shard,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY {h} % {n_shards}
                   ORDER BY {h}, {id_col}
               ) AS INTEGER) AS shard_pos
        FROM {table}
        ORDER BY {id_col}
    """
