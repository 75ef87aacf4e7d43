"""Z-order (Morton-curve) data layout — multi-column data-skipping for
the 100-TB write path.

A corpus partitioned/sorted on one key skips files only for predicates
on that key. Interleaving the bits of SEVERAL normalized keys into one
Morton value and range-partitioning on it keeps every file's min/max
envelope tight on ALL the interleaved columns at once — the same layout
optimization lakehouse engines ship as ``OPTIMIZE ... ZORDER BY`` — so
a scan with a predicate on any of them prunes most files from parquet
footer stats alone (no data read).

No reference counterpart (deidentify.go has no storage layer); §2.G
scale surface. Everything is JVM Column expressions:

* each column is normalized to a ``bits``-wide integer bucket via exact
  global min/max — two scalar aggregates broadcast-crossJoined into the
  plan (lazy, no driver action), the same shape the repo uses for
  corpus-size scalars;
* the Morton value is pure bit arithmetic (shift/mask/or) — map-side,
  codegen, shuffle-free;
* the layout itself is ``repartitionByRange(n_files, zval)`` — ONE
  range exchange (sampled boundaries), each output task writes one
  z-contiguous file.

Timestamps are normalized via ``timestampdiff`` from a fixed NTZ epoch
(tz-independent — the session-timezone ``unix_timestamp`` cast is a DST
hazard; see operators/joins.py for the same rule).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from deidentify_spark.operators.joins import _epoch_s


def _numeric(df: DataFrame, col: str) -> Column:
    """A tz-independent numeric view of the column. Timestamp/date
    columns go through joins._epoch_s — the repo's one blessed
    wall-clock epoch mapping (monotonic under NTZ + DST, matches the
    DuckDB twins)."""
    t = df.schema[col].dataType.simpleString()
    if t in ("timestamp", "timestamp_ntz", "date"):
        return _epoch_s(df, col).cast("double")
    return F.col(col).cast("double")


def with_zvalue(
    df: DataFrame,
    cols: list[str],
    *,
    bits: int = 8,
    out: str = "zval",
) -> DataFrame:
    """Append the Morton/Z value interleaving ``bits`` bucket bits per
    column (column i contributes bit j to output position
    ``j * len(cols) + i`` — the textbook interleave). NULLs map to
    bucket 0 (they sort first, clustering into the same files)."""
    n = len(cols)
    stats = df.agg(
        *[F.min(_numeric(df, c)).alias(f"_mn_{i}") for i, c in enumerate(cols)],
        *[F.max(_numeric(df, c)).alias(f"_mx_{i}") for i, c in enumerate(cols)],
    )
    staged = df.crossJoin(F.broadcast(stats))
    buckets = []
    hi = (1 << bits) - 1
    for i, c in enumerate(cols):
        x = _numeric(staged, c)
        mn, mx = F.col(f"_mn_{i}"), F.col(f"_mx_{i}")
        span = F.when(mx > mn, mx - mn).otherwise(F.lit(1.0))
        b = F.floor((x - mn) / span * (hi + 1)).cast("long")
        b = F.least(F.greatest(b, F.lit(0)), F.lit(hi))
        buckets.append(F.coalesce(b, F.lit(0)))
    z = F.lit(0).cast("long")
    for j in range(bits):
        for i in range(n):
            z = z.bitwiseOR(
                F.shiftleft(
                    F.shiftright(buckets[i], j).bitwiseAND(F.lit(1)),
                    j * n + i,
                )
            )
    return staged.withColumn(out, z).drop(
        *[f"_mn_{i}" for i in range(n)], *[f"_mx_{i}" for i in range(n)]
    )


def zorder_repartition(
    df: DataFrame,
    cols: list[str],
    *,
    n_files: int = 64,
    bits: int = 8,
) -> DataFrame:
    """Range-partition on the Morton value (one sampled-boundary range
    exchange) so each output file covers a z-contiguous cell — tight
    min/max envelopes on every interleaved column."""
    return (
        with_zvalue(df, cols, bits=bits)
        .repartitionByRange(n_files, "zval")
        .sortWithinPartitions("zval")
    )


def zvalue_oracle_sql(
    table: str,
    cols: list[str],
    *,
    bits: int = 8,
    numeric_exprs: dict[str, str] | None = None,
) -> str:
    """DuckDB twin of :func:`with_zvalue`'s zval expression: the SAME
    min/max bucketing and bit interleave, with global stats as scalar
    subqueries. ``numeric_exprs`` overrides the per-column numeric view
    (e.g. the fixed-epoch timestamp mapping)."""
    n = len(cols)
    hi = (1 << bits) - 1
    num = {c: (numeric_exprs or {}).get(c, c) for c in cols}
    parts = []
    for i, c in enumerate(cols):
        x = num[c]
        mn = f"(SELECT MIN({x}) FROM {table})"
        mx = f"(SELECT MAX({x}) FROM {table})"
        span = f"(CASE WHEN {mx} > {mn} THEN {mx} - {mn} ELSE 1.0 END)"
        b = (
            f"COALESCE(LEAST(GREATEST(CAST(FLOOR((({x}) - {mn}) / {span} "
            f"* {hi + 1}) AS BIGINT), 0), {hi}), 0)"
        )
        parts.append(b)
    terms = []
    for j in range(bits):
        for i in range(n):
            terms.append(f"((({parts[i]} >> {j}) & 1) << {j * n + i})")
    return " | ".join(terms)
