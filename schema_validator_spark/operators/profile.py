"""Per-column table profiling — the "column stats" half of the north rule.

One aggregate job over ALL columns (single scan, no per-column passes):
for every column compute row/null/distinct-ish counts plus type-aware
extremes, then unpivot JVM-side (``stack``) into one row per column:

    (column, n_rows, n_nulls, null_rate, approx_distinct, min, max)

min/max are rendered as strings so heterogeneous column types share one
output schema (the profile is a report, not an input to arithmetic).
``approx_distinct`` is HyperLogLog++ (mergeable, single-scan); exact
distincts per column would be one shuffle *per column* — wrong at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


_PROFILABLE = (
    T.StringType, T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType, T.BooleanType,
    T.TimestampType, T.DateType, T.BinaryType,
)


def profile(
    df: DataFrame,
    columns: list[str] | None = None,
    *,
    relative_sd: float = 0.05,
) -> DataFrame:
    """One-pass profile of (by default) every scalar column."""
    if columns is None:
        columns = [
            f.name for f in df.schema.fields if isinstance(f.dataType, _PROFILABLE)
        ]
    if not columns:
        raise ValueError("no profilable columns")

    aggs = [F.count(F.lit(1)).alias("_n")]
    for i, c in enumerate(columns):
        col = F.col(c)
        aggs += [
            F.sum(col.isNull().cast("long")).alias(f"_null_{i}"),
            F.approx_count_distinct(col, relative_sd).alias(f"_dist_{i}"),
            F.min(col).cast("string").alias(f"_min_{i}"),
            F.max(col).cast("string").alias(f"_max_{i}"),
        ]
    wide = df.agg(*aggs)

    stack_args = ", ".join(
        f"'{c}', _null_{i}, _dist_{i}, _min_{i}, _max_{i}"
        for i, c in enumerate(columns)
    )
    return wide.selectExpr(
        "_n as n_rows",
        f"stack({len(columns)}, {stack_args}) as "
        "(column, n_nulls, approx_distinct, min, max)",
    ).select(
        "column",
        "n_rows",
        "n_nulls",
        F.round(F.col("n_nulls") / F.col("n_rows"), 6).alias("null_rate"),
        "approx_distinct",
        "min",
        "max",
    )


def profile_exact(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Exact-distinct variant for small tables / oracle comparison.
    Still one job, but count_distinct per column expands the aggregate —
    use ``profile`` at scale."""
    if columns is None:
        columns = [
            f.name for f in df.schema.fields if isinstance(f.dataType, _PROFILABLE)
        ]
    aggs = [F.count(F.lit(1)).alias("_n")]
    for i, c in enumerate(columns):
        col = F.col(c)
        aggs += [
            F.sum(col.isNull().cast("long")).alias(f"_null_{i}"),
            F.countDistinct(col).alias(f"_dist_{i}"),
            F.min(col).cast("string").alias(f"_min_{i}"),
            F.max(col).cast("string").alias(f"_max_{i}"),
        ]
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', _null_{i}, _dist_{i}, _min_{i}, _max_{i}"
        for i, c in enumerate(columns)
    )
    return wide.selectExpr(
        "_n as n_rows",
        f"stack({len(columns)}, {stack_args}) as "
        "(column, n_nulls, n_distinct, min, max)",
    ).select("column", "n_rows", "n_nulls", "n_distinct", "min", "max")
