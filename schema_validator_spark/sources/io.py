"""Source/sink helpers: format-agnostic read + bucketed writes.

Bucketing is the co-located-join tool for repeated big-big joins (e.g.
the fact table vs a violations table keyed the same way): both sides
bucketed by the join key with the same bucket count join WITHOUT any
Exchange — the shuffle happened once at write time, amortized over every
subsequent join/agg on that key (SURVEY.md §2.0 partitioning note).

Iceberg gives the same via its bucket partition transform; the gate is
format-agnostic: ``read_table`` speaks parquet/orc/csv/iceberg/table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_table(spark: SparkSession, source: str, fmt: str = "parquet",
               **options) -> DataFrame:
    """Uniform reader: fmt='table' reads a catalog table (incl. Iceberg
    when its catalog is configured); file formats read paths."""
    if fmt == "table":
        return spark.read.table(source)
    return spark.read.format(fmt).options(**options).load(source)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    *,
    sort_cols: list[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Write as a bucketed (and optionally sorted) catalog table.

    Sorting within buckets additionally unlocks merge-join without the
    per-task sort.  ``path`` pins the storage location (external table).
    """
    w = df.write.mode(mode).format("parquet").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path:
        w = w.option("path", path)
    w.saveAsTable(table)
