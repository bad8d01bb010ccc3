"""Table-level uniqueness checks.

The reference's `unique` rule is an explicit no-op stub ("just pass",
rule/other.go:311-316) because a single-value validator cannot see the
table.  The north rule mandates the real thing:

* exact: one hash-aggregate (``groupBy(keys).count > 1``) — map-side
  partial agg, one shuffle on the keys; AQE splits skewed key groups.
* approx: ``approx_count_distinct`` (HyperLogLog++) vs ``count`` — a
  single scan with NO join and a tiny driver result; the right first
  pass at 10^12 rows before paying for the exact check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def duplicate_keys(df: DataFrame, keys: list[str]) -> DataFrame:
    """Key groups that occur more than once: (*keys, dup_count)."""
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("dup_count"))
        .filter(F.col("dup_count") > 1)
    )


def duplicate_rows(df: DataFrame, keys: list[str]) -> DataFrame:
    """Full rows participating in a duplicate key group.

    Broadcast-joins the (usually tiny) duplicate key set back; if the
    duplicate set is itself huge the optimizer falls back to a shuffled
    join under AQE.
    """
    dups = duplicate_keys(df, keys).select(*keys)
    return df.join(F.broadcast(dups), on=keys, how="left_semi")


def uniqueness_stats(
    df: DataFrame, keys: list[str], *, relative_sd: float = 0.05
) -> DataFrame:
    """Single-scan uniqueness summary: n_rows, approx distinct keys, and
    the implied duplication estimate.  Zero shuffles beyond the final
    single-row aggregate."""
    key = F.concat_ws("", *[F.col(k).cast("string") for k in keys])
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.approx_count_distinct(key, relative_sd).alias("approx_distinct_keys"),
    ).select(
        "n_rows",
        "approx_distinct_keys",
        (F.col("n_rows") - F.col("approx_distinct_keys")).alias("approx_duplicates"),
        F.round(F.col("approx_distinct_keys") / F.col("n_rows"), 6).alias(
            "approx_unique_ratio"
        ),
    )


def exact_uniqueness_stats(df: DataFrame, keys: list[str]) -> DataFrame:
    """Exact variant (one shuffle): distinct key count + duplicate rows."""
    per_key = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("c"))
    return per_key.agg(
        F.sum("c").alias("n_rows"),
        F.count(F.lit(1)).alias("n_distinct_keys"),
        F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(0)).alias(
            "n_rows_in_dup_groups"
        ),
        F.sum((F.col("c") > 1).cast("long")).alias("n_dup_keys"),
    )


def functional_dependency_violations(
    df: DataFrame, det_cols: list[str], dep_cols: list[str]
) -> DataFrame:
    """Functional-dependency check det_cols -> dep_cols: determinant
    values mapping to MORE than one distinct dependent tuple violate the
    dependency (e.g. custkey -> name must be 1:1).

    One groupBy on the determinant with a countDistinct over the
    dependent tuple — map-side partially aggregated; AQE splits skewed
    determinants.  Returns (det_cols..., n_rows, n_distinct_dep) for
    violating determinants only.
    """
    dep = F.struct(*[F.col(c) for c in dep_cols])
    return (
        df.groupBy(*det_cols)
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct(dep).alias("n_distinct_dep"),
        )
        .filter(F.col("n_distinct_dep") > 1)
    )


def functional_dependency_stats(
    df: DataFrame, det_cols: list[str], dep_cols: list[str]
) -> DataFrame:
    """One-row summary of an FD check: total determinants, violating
    determinants, violation rate."""
    per = df.groupBy(*det_cols).agg(
        F.countDistinct(F.struct(*[F.col(c) for c in dep_cols])).alias("_nd")
    )
    return per.agg(
        F.count(F.lit(1)).alias("n_determinants"),
        F.sum((F.col("_nd") > 1).cast("long")).alias("n_violating"),
    ).select(
        "n_determinants",
        "n_violating",
        F.round(F.col("n_violating") / F.col("n_determinants"), 6).alias("violation_rate"),
    )
