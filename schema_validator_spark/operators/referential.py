"""Referential-integrity checks.

Generalizes the reference's cross-field lookup (ctx.Parent().GetValue,
rule/field.go:12) across tables: a fact table's foreign key must exist
in a dimension.  Violations are a ``left_anti`` join; a small dimension
is broadcast (hash join, no shuffle of the fact side), a large one goes
through AQE-planned sort-merge with skew splitting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def referential_violations(
    fact: DataFrame,
    fk_cols: list[str],
    dim: DataFrame,
    pk_cols: list[str] | None = None,
    *,
    broadcast: bool | None = None,
) -> DataFrame:
    """Fact rows whose FK has no match in the dimension.

    ``broadcast=None`` lets AQE decide (autoBroadcastJoinThreshold);
    True forces a broadcast of the dimension's key projection — at
    10^12 fact rows you always want the dim side shipped, never the
    fact side shuffled, as long as the key set fits in executor memory.
    NULL FKs do not match in Go semantics either — they surface as
    violations here (use a `required` rule to separate them).
    """
    pk_cols = pk_cols or fk_cols
    # No dropDuplicates: left_anti is set-semantics on the build side by
    # construction (a fact row is dropped if ANY match exists), so
    # deduping the dim keys would only add a dim-side shuffle for nothing
    # — this plan is zero-Exchange when the dim broadcasts.
    keys = dim.select(*[F.col(p).alias(f) for p, f in zip(pk_cols, fk_cols)])
    if broadcast is True:
        keys = F.broadcast(keys)
    return fact.join(keys, on=fk_cols, how="left_anti")


def orphan_stats(
    fact: DataFrame,
    fk_cols: list[str],
    dim: DataFrame,
    pk_cols: list[str] | None = None,
    *,
    broadcast: bool | None = None,
) -> DataFrame:
    """One-row summary: total fact rows, orphans, orphan_rate.

    Uses a left join + aggregate (single pass over the fact table)
    instead of two separate counts.
    """
    pk_cols = pk_cols or fk_cols
    keys = (
        dim.select(*[F.col(p).alias(f) for p, f in zip(pk_cols, fk_cols)])
        .dropDuplicates(fk_cols)
        .withColumn("_present", F.lit(1))
    )
    if broadcast is True:
        keys = F.broadcast(keys)
    joined = fact.select(*fk_cols).join(keys, on=fk_cols, how="left")
    return joined.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("_present").isNull(), 1).otherwise(0)).alias("n_orphans"),
    ).select(
        "n_rows",
        "n_orphans",
        F.round(F.col("n_orphans") / F.col("n_rows"), 6).alias("orphan_rate"),
    )
