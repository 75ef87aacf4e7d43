"""Data-card table profiling: per-column statistics in ONE corpus pass.

A release/training run starts with a profile — null rates, exact
cardinalities, ranges, string-length shape — the "datasheet" row
block every curated-corpus report carries (cf. Datasheets for
Datasets, Gebru et al. 2021; Spark's own summary()/describe() cover
only numeric moments and sample-based stats, and are driver-formatted).

``profile_table`` returns ONE ROW PER COLUMN:

  column      name
  n_rows      table row count (repeated — keeps each row self-contained)
  n_null      NULLs in the column
  n_distinct  exact distinct count (NULL excluded, Spark/SQL semantics)
  min_num /   typed min/max for NUMERIC columns cast to double
  max_num     (NULL for everything else — no string formatting rides
              the comparison, so the DuckDB twin is bit-stable)
  avg_len     average string LENGTH for string columns (round 4;
              NULL elsewhere)

Scale shape: a single map-side-combined global aggregate computes every
per-column statistic in one pass over the scan (count/count_distinct/
min/max/avg all partial-aggregate; count_distinct under a global agg is
Spark's two-stage partial-distinct expand — no per-key skew possible
since there is no key), then the wide one-row result explodes to the
long form through an in-plan array-of-structs (O(n_cols) rows). No
join, no window, no driver collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import NumericType, StringType

__all__ = ["profile_table", "profile_oracle_sql"]


def profile_table(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    cols = cols if cols is not None else df.columns
    fields = {f.name: f.dataType for f in df.schema.fields}
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        aggs.append(
            F.sum(F.col(c).isNull().cast("long")).alias(f"_null_{c}")
        )
        aggs.append(F.count_distinct(F.col(c)).alias(f"_dist_{c}"))
        if isinstance(fields[c], NumericType):
            aggs.append(F.min(c).cast("double").alias(f"_min_{c}"))
            aggs.append(F.max(c).cast("double").alias(f"_max_{c}"))
        if isinstance(fields[c], StringType):
            aggs.append(
                F.round(F.avg(F.length(c)), 4).alias(f"_len_{c}")
            )
    wide = df.agg(*aggs)
    rows = []
    for c in cols:
        is_num = isinstance(fields[c], NumericType)
        is_str = isinstance(fields[c], StringType)
        rows.append(
            F.struct(
                F.lit(c).alias("column"),
                F.col("_n").alias("n_rows"),
                F.col(f"_null_{c}").alias("n_null"),
                F.col(f"_dist_{c}").alias("n_distinct"),
                (F.col(f"_min_{c}") if is_num else F.lit(None).cast("double")).alias("min_num"),
                (F.col(f"_max_{c}") if is_num else F.lit(None).cast("double")).alias("max_num"),
                (F.col(f"_len_{c}") if is_str else F.lit(None).cast("double")).alias("avg_len"),
            )
        )
    return wide.select(F.explode(F.array(*rows)).alias("_p")).select("_p.*")


def profile_oracle_sql(
    table: str, cols: list[tuple[str, str]]
) -> str:
    """DuckDB twin. ``cols`` is [(name, kind)] with kind in
    {'num', 'str', 'other'} — mirror of the Spark type dispatch."""
    parts = []
    for name, kind in cols:
        min_num = f"CAST(MIN({name}) AS DOUBLE)" if kind == "num" else "CAST(NULL AS DOUBLE)"
        max_num = f"CAST(MAX({name}) AS DOUBLE)" if kind == "num" else "CAST(NULL AS DOUBLE)"
        avg_len = (
            f"ROUND(AVG(length({name})), 4)" if kind == "str" else "CAST(NULL AS DOUBLE)"
        )
        parts.append(
            f"""
            SELECT '{name}' AS "column", COUNT(*) AS n_rows,
                   COUNT(*) - COUNT({name}) AS n_null,
                   COUNT(DISTINCT {name}) AS n_distinct,
                   {min_num} AS min_num, {max_num} AS max_num,
                   {avg_len} AS avg_len
            FROM {table}
            """
        )
    return " UNION ALL ".join(parts) + ' ORDER BY "column"'
