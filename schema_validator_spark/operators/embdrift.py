"""Embedding-space drift between two snapshots — ML-monitoring tier.

Numeric drift (PSI/KS/W1) and categorical drift (chi2/JSD/churn) watch
scalar columns; a model's INPUT REPRESENTATION drifts in embedding
space, and the standard production monitors there are: how far did the
population centroid move (cosine between mean vectors), and did the
scale change (mean L2 norm per side).  A centroid cosine well below 1
means the new crawl/encoder points somewhere else semantically even if
every scalar metric looks stable.

Scale shape: ``posexplode`` unrolls each side to (dim, value) rows and
ONE map-side-combinable groupBy per side reduces them to d-row mean
vectors (shuffle volume = #tasks x dims, never rows x dims); norms are
per-row codegen ``aggregate`` folds feeding the same pass.  Everything
after runs on two d-row frames.  No driver-side vectors, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _side_stats(df: DataFrame, vec_col: str, tag: str) -> tuple:
    """(per-dim mean frame, one-row (n, mean_norm) frame) for one side."""
    v = F.col(vec_col)
    norm = F.sqrt(
        F.aggregate(
            v, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )
    base = df.filter(v.isNotNull() & (F.size(v) > 0))
    means = (
        base.select(F.posexplode(v).alias("dim", "_x"))
        .groupBy("dim")
        .agg(F.avg(F.col("_x").cast("double")).alias(f"mean_{tag}"))
    )
    summary = base.agg(
        F.count(F.lit(1)).alias(f"n_{tag}"),
        F.avg(norm).alias(f"norm_{tag}"),
    )
    return means, summary


def embedding_drift(
    base: DataFrame, cur: DataFrame, vec_col: str
) -> DataFrame:
    """One-row embedding drift report:
    ``(n_base, n_cur, dims, centroid_cosine, centroid_shift,
    norm_base, norm_cur)`` — centroid_cosine is the cosine between the
    two mean vectors (1 = no directional drift), centroid_shift the L2
    distance between them; floats rounded 6dp.  Dimensions present on
    only one side (ragged inputs) count as 0 on the missing side via
    the full-outer dim join."""
    mb, sb = _side_stats(base, vec_col, "base")
    mc, sc = _side_stats(cur, vec_col, "cur")
    dims = (
        mb.join(mc, on="dim", how="full_outer")
        .select(
            F.coalesce(F.col("mean_base"), F.lit(0.0)).alias("a"),
            F.coalesce(F.col("mean_cur"), F.lit(0.0)).alias("b"),
        )
    )
    agg = dims.agg(
        F.count(F.lit(1)).alias("dims"),
        F.sum(F.col("a") * F.col("b")).alias("_dot"),
        F.sum(F.col("a") * F.col("a")).alias("_na"),
        F.sum(F.col("b") * F.col("b")).alias("_nb"),
        F.sum(
            (F.col("a") - F.col("b")) * (F.col("a") - F.col("b"))
        ).alias("_d2"),
    )
    return (
        agg.crossJoin(F.broadcast(sb))
        .crossJoin(F.broadcast(sc))
        .select(
            "n_base",
            "n_cur",
            "dims",
            F.round(
                F.try_divide(
                    F.col("_dot"), F.sqrt(F.col("_na")) * F.sqrt(F.col("_nb"))
                ),
                6,
            ).alias("centroid_cosine"),
            F.round(F.sqrt(F.col("_d2")), 6).alias("centroid_shift"),
            F.round(F.col("norm_base"), 6).alias("norm_base"),
            F.round(F.col("norm_cur"), 6).alias("norm_cur"),
        )
    )
