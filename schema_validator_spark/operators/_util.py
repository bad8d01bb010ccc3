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
