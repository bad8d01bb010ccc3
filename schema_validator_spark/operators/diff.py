"""Row-level table diff — what changed between two versions of a table?

The row-granularity complement of the existing change-tracking tiers:
operators/schema_diff.py diffs SCHEMAS, sources/snapshots.py diffs
FILES, operators/anomaly.py diffs METRICS — this diffs ROWS: which keys
were added, removed, or changed, and WHICH columns changed.  The
pre-merge audit every pipeline wants before promoting a new snapshot
("this rebuild touches 0.3% of rows, all in `lang`" vs "this rebuild
silently rewrites half the corpus").

Scale shape: ONE full-outer join hashed on the key (both sides shuffle
once — unavoidable for row matching; bucket both tables on the key via
sources/io.write_bucketed to make it 0-Exchange); per-column compare is
null-safe codegen (`<=>`), and unchanged rows are dropped INSIDE the
join projection so the output is change-volume sized, not table sized.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def table_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    *,
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Changed rows between two versions:
    ``(key..., status, changed_cols)`` with status in
    ('added', 'removed', 'changed'); unchanged rows are not emitted.
    ``changed_cols`` lists the differing columns (null-safe compare —
    NULL -> value and value -> NULL both count as changes), empty for
    added/removed.  ``compare_cols`` defaults to every shared non-key
    column.  Keys must be unique per side (this is a keyed diff, not a
    multiset diff — run uniqueness first)."""
    if compare_cols is None:
        shared = [c for c in old.columns if c in set(new.columns)]
        compare_cols = [c for c in shared if c not in set(key_cols)]
    o = old.select(
        *[F.col(k).alias(f"_k_{k}") for k in key_cols],
        *[F.col(c).alias(f"_o_{c}") for c in compare_cols],
        F.lit(1).alias("_in_old"),
    )
    n = new.select(
        *[F.col(k).alias(f"_nk_{k}") for k in key_cols],
        *[F.col(c).alias(f"_n_{c}") for c in compare_cols],
        F.lit(1).alias("_in_new"),
    )
    cond = reduce(
        lambda a, b: a & b,
        [o[f"_k_{k}"].eqNullSafe(n[f"_nk_{k}"]) for k in key_cols],
    )
    j = o.join(n, cond, "full_outer")
    changed_cols = F.filter(
        F.array(
            *[
                F.when(
                    ~F.col(f"_o_{c}").eqNullSafe(F.col(f"_n_{c}")), F.lit(c)
                )
                for c in compare_cols
            ]
        ),
        lambda x: x.isNotNull(),
    )
    status = (
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("removed"))
        .when(F.size(changed_cols) > 0, F.lit("changed"))
    )
    keys = [
        F.coalesce(F.col(f"_k_{k}"), F.col(f"_nk_{k}")).alias(k)
        for k in key_cols
    ]
    return (
        j.select(
            *keys,
            status.alias("status"),
            F.when(
                F.col("_in_old").isNotNull() & F.col("_in_new").isNotNull(),
                changed_cols,
            )
            .otherwise(F.array().cast("array<string>"))
            .alias("changed_cols"),
        )
        .filter(F.col("status").isNotNull())
    )


def table_diff_summary(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    *,
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """One-row change audit: ``(n_old, n_new, n_added, n_removed,
    n_changed, n_unchanged, change_rate)`` — change_rate =
    (added + removed + changed) / n_new (rounded 6dp)."""
    d = table_diff(old, new, key_cols, compare_cols=compare_cols).groupBy(
        "status"
    ).agg(F.count(F.lit(1)).alias("c"))
    counts = d.groupBy().pivot("status", ["added", "removed", "changed"]).sum("c")
    totals = old.agg(F.count(F.lit(1)).alias("n_old")).crossJoin(
        new.agg(F.count(F.lit(1)).alias("n_new"))
    )
    out = totals.crossJoin(F.broadcast(counts))
    added = F.coalesce(F.col("added"), F.lit(0))
    removed = F.coalesce(F.col("removed"), F.lit(0))
    changed = F.coalesce(F.col("changed"), F.lit(0))
    return out.select(
        "n_old",
        "n_new",
        added.alias("n_added"),
        removed.alias("n_removed"),
        changed.alias("n_changed"),
        (F.col("n_new") - added - changed).alias("n_unchanged"),
        F.round((added + removed + changed) / F.col("n_new"), 6)
        .alias("change_rate"),
    )
