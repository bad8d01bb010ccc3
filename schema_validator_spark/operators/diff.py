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


def join_profile(
    left: DataFrame,
    right: DataFrame,
    left_keys: list[str],
    right_keys: list[str] | None = None,
) -> DataFrame:
    """Join-health audit BEFORE running the join: key overlap and
    multiplicity between two tables.  Answers the three questions that
    decide whether a join is safe: how many rows will actually match
    (coverage), is either side's key non-unique (fan-out), and what is
    the EXACT output row count (``sum over shared keys of
    count_l * count_r``) — a blown-up join is caught here for the cost
    of two word-count aggregations instead of discovered as an executor
    OOM three hours in.

    One row: ``(n_left, n_right, n_left_keys, n_right_keys,
    n_shared_keys, left_match_rate, right_match_rate, max_mult_left,
    max_mult_right, join_rows)`` — match rates are the fraction of ROWS
    whose key exists on the other side; NULL keys never match (SQL
    semantics) and are excluded from key counts.

    Scale shape: one map-side-combinable groupBy per side collapses to
    (key, count) frames (distinct-key scale), then a full-outer join of
    those frames and one aggregate — data rows are never joined.
    """
    right_keys = right_keys or left_keys
    lk = (
        left.select(*[F.col(k).alias(f"_k{i}") for i, k in enumerate(left_keys)])
        .filter(reduce(
            lambda a, b: a & b,
            [F.col(f"_k{i}").isNotNull() for i in range(len(left_keys))],
        ))
        .groupBy(*[f"_k{i}" for i in range(len(left_keys))])
        .agg(F.count(F.lit(1)).alias("_cl"))
    )
    rk = (
        right.select(*[F.col(k).alias(f"_k{i}") for i, k in enumerate(right_keys)])
        .filter(reduce(
            lambda a, b: a & b,
            [F.col(f"_k{i}").isNotNull() for i in range(len(right_keys))],
        ))
        .groupBy(*[f"_k{i}" for i in range(len(right_keys))])
        .agg(F.count(F.lit(1)).alias("_cr"))
    )
    j = lk.join(rk, on=[f"_k{i}" for i in range(len(left_keys))], how="full_outer")
    both = F.col("_cl").isNotNull() & F.col("_cr").isNotNull()
    agg = j.agg(
        F.sum("_cl").alias("n_left"),
        F.sum("_cr").alias("n_right"),
        F.count("_cl").alias("n_left_keys"),
        F.count("_cr").alias("n_right_keys"),
        F.sum(both.cast("long")).alias("n_shared_keys"),
        F.sum(F.when(both, F.col("_cl")).otherwise(0)).alias("_ml"),
        F.sum(F.when(both, F.col("_cr")).otherwise(0)).alias("_mr"),
        F.max("_cl").alias("max_mult_left"),
        F.max("_cr").alias("max_mult_right"),
        F.sum(F.when(both, F.col("_cl") * F.col("_cr")).otherwise(0))
        .alias("join_rows"),
    )
    return agg.select(
        "n_left", "n_right", "n_left_keys", "n_right_keys", "n_shared_keys",
        F.round(F.col("_ml") / F.col("n_left"), 6).alias("left_match_rate"),
        F.round(F.col("_mr") / F.col("n_right"), 6).alias("right_match_rate"),
        "max_mult_left", "max_mult_right", "join_rows",
    )


def reconcile_aggregates(
    left: DataFrame,
    right: DataFrame,
    left_keys: list[str],
    right_keys: list[str] | None = None,
    *,
    left_measure: str,
    right_measure: str,
    tolerance: float = 0.0,
) -> DataFrame:
    """Control-total reconciliation: per-key sums of a measure on both
    sides, discrepancies only — the "fact rows must add up to the
    ledger" audit (settlement vs transactions, rollup vs detail, sink
    vs source after a migration).

    Output rows only where the books DON'T balance:
    ``(key..., sum_left, sum_right, diff, kind)`` with kind in
    ('missing_left', 'missing_right', 'mismatch') and
    ``|diff| > tolerance`` required for 'mismatch' (float pipelines
    reconcile to a tolerance, not to the ulp).  NULL keys are excluded
    (they can never pair); NULL measures sum as 0 via the per-key agg.

    Scale shape: one map-side-combinable groupBy per side (reducer
    input = distinct keys, never rows), then a key-scale full-outer
    join — the same two-word-count shape as :func:`join_profile`.
    """
    right_keys = right_keys or left_keys
    kcols = [f"_k{i}" for i in range(len(left_keys))]
    ls = (
        left.select(
            *[F.col(k).alias(f"_k{i}") for i, k in enumerate(left_keys)],
            F.col(left_measure).alias("_m"),
        )
        .filter(reduce(lambda a, b: a & b, [F.col(c).isNotNull() for c in kcols]))
        .groupBy(*kcols)
        .agg(F.sum("_m").alias("sum_left"))
    )
    rs = (
        right.select(
            *[F.col(k).alias(f"_k{i}") for i, k in enumerate(right_keys)],
            F.col(right_measure).alias("_m"),
        )
        .filter(reduce(lambda a, b: a & b, [F.col(c).isNotNull() for c in kcols]))
        .groupBy(*kcols)
        .agg(F.sum("_m").alias("sum_right"))
    )
    j = ls.join(rs, on=kcols, how="full_outer")
    diff = F.col("sum_right") - F.col("sum_left")
    kind = (
        F.when(F.col("sum_left").isNull(), F.lit("missing_left"))
        .when(F.col("sum_right").isNull(), F.lit("missing_right"))
        .when(F.abs(diff) > F.lit(tolerance), F.lit("mismatch"))
    )
    out_keys = [F.col(f"_k{i}").alias(k) for i, k in enumerate(left_keys)]
    return (
        j.select(
            *out_keys,
            "sum_left",
            "sum_right",
            F.round(diff, 6).alias("diff"),
            kind.alias("kind"),
        )
        .filter(F.col("kind").isNotNull())
    )
