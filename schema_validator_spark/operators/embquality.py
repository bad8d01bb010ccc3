"""Embedding-column quality audit — the vector-typed counterpart of the
scalar column profile: before an embedding table feeds ANN / SemDeDup /
drift, verify every vector is well-formed (right dimensionality, no
NULL / NaN elements, no zero vectors) and that norms sit in a sane
band.  A single malformed vector poisons a cosine matmul batch (NaN
propagates through the whole result block), so this is the gate the
operators in ann.py / embdrift.py assume has already run.

Scale shape: ONE map-side-combinable aggregation pass; per-row work is
a handful of array expressions (size / exists / aggregate) — no
shuffle beyond the 1-row agg, no Python, output is one row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def embedding_quality(
    df: DataFrame,
    vec_col: str,
    *,
    expected_dim: int,
) -> DataFrame:
    """One summary row:

    - ``n_rows, n_null_vecs``        — total rows / NULL-vector rows
    - ``n_wrong_dim``                — non-NULL vectors whose size !=
                                       ``expected_dim``
    - ``n_with_null_elem, n_with_nan`` — vectors with a NULL / NaN
                                       element
    - ``n_zero_vecs``                — clean vectors with L2 norm 0
                                       (cosine-undefined)
    - ``n_valid``                    — right dim, no NULL/NaN elements
    - ``norm_min, norm_mean, norm_max`` — L2 norms over valid vectors,
                                       rounded 6dp (double arithmetic)
    """
    if expected_dim <= 0:
        raise ValueError("expected_dim must be positive")
    v = F.col("_v")
    has_null_elem = F.exists(v, lambda x: x.isNull())
    has_nan = F.exists(
        v, lambda x: F.isnan(x.cast("double")) & x.isNotNull()
    )
    clean = (
        v.isNotNull()
        & (F.size(v) == expected_dim)
        & ~has_null_elem
        & ~has_nan
    )
    sumsq = F.aggregate(
        v, F.lit(0.0),
        lambda acc, x: acc + x.cast("double") * x.cast("double"),
    )
    norm = F.when(clean, F.sqrt(sumsq))
    per_row = df.select(
        F.col(vec_col).alias("_v"),
    ).select(
        v.isNull().cast("long").alias("_null"),
        (v.isNotNull() & (F.size(v) != expected_dim))
        .cast("long").alias("_wrong"),
        (v.isNotNull() & has_null_elem).cast("long").alias("_nullel"),
        (v.isNotNull() & ~has_null_elem & has_nan)
        .cast("long").alias("_nan"),
        clean.cast("long").alias("_valid"),
        (clean & (norm == 0.0)).cast("long").alias("_zero"),
        norm.alias("_norm"),
    )
    return per_row.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("_null").alias("n_null_vecs"),
        F.sum("_wrong").alias("n_wrong_dim"),
        F.sum("_nullel").alias("n_with_null_elem"),
        F.sum("_nan").alias("n_with_nan"),
        F.sum("_valid").alias("n_valid"),
        F.sum("_zero").alias("n_zero_vecs"),
        F.round(F.min("_norm"), 6).alias("norm_min"),
        F.round(F.avg("_norm"), 6).alias("norm_mean"),
        F.round(F.max("_norm"), 6).alias("norm_max"),
    )
