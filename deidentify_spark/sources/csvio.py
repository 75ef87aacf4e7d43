"""CSV round-trip for the reference's Slices surface.

The reference's `Slices` API is row-major `[][]string` — exactly a
parsed CSV with a header row (SURVEY.md §1.1: "row-oriented CSV-like";
/root/reference/deidentify.go:171-182). This module is the Spark-native
form of that workflow: read a headered CSV as an all-string DataFrame
(Slices carries no physical types — every cell is a string, `""` stays
`""`), infer semantic PII types from the first rows the way
`inferColumnTypes` does, scrub with the deterministic generators, and
write CSV back.

Scale notes: `spark.read.csv` splits large files on line boundaries
(parallel scan; gzip'd CSV is the non-splittable trap — use bgzip/zstd
-T or uncompressed at 100 TB), and the scrub itself is the same
embarrassingly-parallel map as every other surface. multiLine=False
(default) keeps the scan splittable; quoted embedded newlines need
multiLine=True, which forces one task per file — re-shard upstream
instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from deidentify_spark.operators.tabular import deidentify_table, infer_column_types


def read_slices_csv(spark: SparkSession, path: str) -> DataFrame:
    """Headered CSV -> all-string DataFrame (the Slices data model).

    No schema inference of PHYSICAL types on purpose: the reference's
    Slices are [][]string, and letting Spark type a column as int would
    change `%v` stringification (e.g. '007' -> '7') and thus every
    hashed replacement. Empty cells arrive as '' (parser nulls are
    coalesced back), matching deidentify.go:689-692's ''-passthrough
    semantics.
    """
    from pyspark.sql import functions as F

    df = spark.read.options(header=True, inferSchema=False).csv(path)
    # Spark's univocity parser yields NULL for empty cells no matter how
    # nullValue/emptyValue are tuned; Slices is [][]string and has no
    # null — '' must survive as '' (deidentify.go:689-692), so map the
    # parser's nulls back to ''.
    return df.select(
        [F.coalesce(F.col(c), F.lit("")).alias(c) for c in df.columns]
    )


def deidentify_csv(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    secret_key: str,
    column_types: dict[str, str] | None = None,
    order_by: str | None = None,
) -> dict[str, str]:
    """Read a headered CSV, scrub PII columns, write CSV back.

    Returns the (inferred or given) column->semantic-type map. One
    shuffle-free pass: read -> per-column scrub expressions -> write;
    the only non-map step is the 10-row inference sample (reference
    semantics, operators/tabular.py).
    """
    df = read_slices_csv(spark, in_path)
    if column_types is None:
        column_types = infer_column_types(df, order_by=order_by)
    out = deidentify_table(df, secret_key, column_types=column_types)
    out.write.mode("overwrite").options(header=True, emptyValue="").csv(out_path)
    return column_types
