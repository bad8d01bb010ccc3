"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame) -> DataFrame:
    """Small inputs (one parquet file) collapse CPU-heavy per-row compute
    (LSH signatures, SRP projections, HOF dot products) onto one core;
    round-robin them across the cluster.  No-op at scale — a real scan
    already has >= defaultParallelism/2 partitions — and the partition
    count check inspects the plan only (no job)."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < max(2, target // 2):
        return df.repartition(target)
    return df


def stack_findings(
    counted: DataFrame,
    keep_cols: list[str],
    labels: list[str],
    label_col: str,
    count_col: str = "n_spans",
) -> DataFrame:
    """Shared row-level-findings unpivot (secrets/unsafe scans): the
    input carries one ``_c{i}`` count column per label; emit
    ``(keep_cols..., label_col, count_col)`` via ONE stack (not a scan
    per label) and drop zero-count rows.  Labels are inlined as SQL
    string literals — they are trusted module constants, single-quote
    escaped defensively."""
    parts = ", ".join(
        "'{lbl}', _c{i}".format(lbl=lbl.replace("'", "''"), i=i)
        for i, lbl in enumerate(labels)
    )
    from pyspark.sql import functions as F

    return counted.selectExpr(
        *keep_cols,
        f"stack({len(labels)}, {parts}) as ({label_col}, {count_col})",
    ).filter(F.col(count_col) > 0)
