"""Privacy risk audits: k-anonymity and l-diversity.

Governance siblings of operators/pii.py — the PII scan finds columns
holding direct identifiers; these measure RE-IDENTIFICATION risk from
quasi-identifiers (Sweeney 2002; Machanavajjhala et al. 2007): a row is
k-anonymous when at least k rows share its full quasi-identifier (QI)
combination, and a QI group is l-diverse when its sensitive attribute
takes at least l distinct values (a k-anonymous group with ONE shared
diagnosis still leaks it).  The standard pre-release audit for any
dataset carrying user attributes.

Scale shape: both checks are ONE map-side-combinable groupBy on the QI
columns (reducer input bounded by #distinct QI combinations); summaries
aggregate the group frame.  NULL QI values form their own group, like
every groupBy in this engine — two rows with NULL zip code are
indistinguishable to an attacker too.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def k_anonymity_groups(
    df: DataFrame, qi_cols: list[str], *, k: int
) -> DataFrame:
    """Per-QI-combination group sizes with the risk flag:
    ``(qi..., group_size, at_risk)`` — ``at_risk`` when fewer than ``k``
    rows share the combination."""
    if k < 2:
        raise ValueError("k must be >= 2")
    return (
        df.groupBy(*qi_cols)
        .agg(F.count(F.lit(1)).alias("group_size"))
        .withColumn("at_risk", F.col("group_size") < k)
    )


def k_anonymity_report(
    df: DataFrame, qi_cols: list[str], *, k: int
) -> DataFrame:
    """One-row audit: ``(n_rows, n_groups, min_group_size, n_risky_groups,
    n_risky_rows, risky_row_rate)`` — the dataset is k-anonymous iff
    ``n_risky_groups == 0`` (equivalently ``min_group_size >= k``)."""
    g = k_anonymity_groups(df, qi_cols, k=k)
    return g.agg(
        F.sum("group_size").alias("n_rows"),
        F.count(F.lit(1)).alias("n_groups"),
        F.min("group_size").alias("min_group_size"),
        F.sum(F.col("at_risk").cast("long")).alias("n_risky_groups"),
        F.sum(F.when(F.col("at_risk"), F.col("group_size")).otherwise(0))
        .alias("n_risky_rows"),
    ).select(
        "n_rows", "n_groups", "min_group_size", "n_risky_groups",
        "n_risky_rows",
        F.round(F.col("n_risky_rows") / F.col("n_rows"), 6)
        .alias("risky_row_rate"),
    )


def l_diversity_report(
    df: DataFrame, qi_cols: list[str], sensitive_col: str, *, l: int
) -> DataFrame:
    """One-row audit of sensitive-value diversity within QI groups:
    ``(n_groups, min_diversity, n_low_diversity_groups, n_exposed_rows)``
    — a group with fewer than ``l`` distinct sensitive values exposes
    its members' attribute even if it is k-anonymous.  Distinct counts
    are exact per group (count_distinct inside the same single
    groupBy); NULL sensitive values do not count toward diversity."""
    if l < 2:
        raise ValueError("l must be >= 2")
    g = df.groupBy(*qi_cols).agg(
        F.count(F.lit(1)).alias("_n"),
        F.count_distinct(F.col(sensitive_col)).alias("_div"),
    )
    low = F.col("_div") < l
    return g.agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.min("_div").alias("min_diversity"),
        F.sum(low.cast("long")).alias("n_low_diversity_groups"),
        F.sum(F.when(low, F.col("_n")).otherwise(0)).alias("n_exposed_rows"),
    )
