"""Order & sequence integrity checks — per-key windows, no self-joins.

The temporal-integrity family the row-level engine cannot express (every
check here compares a row against its per-key PREDECESSOR): sequence
gaps/duplicates, validity-interval overlaps (SCD2 invariant), and
monotonicity violations.  Classic warehouse audits: "invoice numbers
have holes", "two price records for the same part were valid at once",
"the odometer went backwards".

Scale shape: every check is ONE hash shuffle on the key plus a per-key
sort window (lag/lead) — the join-free formulation; a naive self-join
on `a.start < b.end AND b.start < a.end` is quadratic per key, while
sorted-neighbor comparison finds the same violations linearly.  For
interval overlap, comparing against the running MAX of previous ends
(not just the immediate predecessor) catches containment chains where a
long interval swallows several later ones.  Hyperactive keys serialize
their own window only — same caveat+mitigation story as
operators/sessions.py (chunked tier) if one key dominates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sequence_gaps(
    df: DataFrame, key_cols: list[str], seq_col: str
) -> DataFrame:
    """Holes and duplicates in a per-key integer sequence.

    One row per anomaly site: ``(key..., prev_seq, seq, kind, missing)``
    where ``kind`` is 'gap' (missing values between neighbors — count in
    ``missing``) or 'dup' (the same value seen again).  NULL sequence
    values are ignored (a `required` rule owns those).
    """
    s = F.col(seq_col)
    w = Window.partitionBy(*key_cols).orderBy(s.asc())
    prev = F.lag(s).over(w)
    out = (
        df.filter(s.isNotNull())
        .select(*key_cols, s.alias("seq"), prev.alias("prev_seq"))
        .withColumn(
            "kind",
            F.when(F.col("seq") == F.col("prev_seq"), F.lit("dup")).when(
                F.col("seq") > F.col("prev_seq") + 1, F.lit("gap")
            ),
        )
        .filter(F.col("kind").isNotNull())
        .withColumn(
            "missing",
            F.when(
                F.col("kind") == "gap",
                F.col("seq") - F.col("prev_seq") - 1,
            ).otherwise(F.lit(0)),
        )
    )
    return out.select(*key_cols, "prev_seq", "seq", "kind", "missing")


def interval_overlaps(
    df: DataFrame, key_cols: list[str], start_col: str, end_col: str
) -> DataFrame:
    """Rows whose [start, end) interval overlaps ANY earlier-starting
    interval of the same key — the SCD2 "one valid record at a time"
    invariant, join-free.

    The running max of previous ends (window ``max`` over
    ``unboundedPreceding, -1`` ordered by start, tie-broken by end so
    the comparison set is deterministic) catches overlaps with any
    predecessor, not just the adjacent one.  A row overlaps iff
    ``start < max(previous ends)`` (half-open semantics: touching
    intervals are fine).  Output: one row per violating interval with
    the latest conflicting end: ``(key..., start, end, prev_max_end)``.
    """
    s, e = F.col(start_col), F.col(end_col)
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(s.asc(), e.asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev_max_end = F.max(e).over(w)
    return (
        df.filter(s.isNotNull() & e.isNotNull())
        .select(
            *key_cols,
            s.alias("start"),
            e.alias("end"),
            prev_max_end.alias("prev_max_end"),
        )
        .filter(F.col("start") < F.col("prev_max_end"))
    )


def monotonic_violations(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    value_col: str,
    *,
    strict: bool = False,
) -> DataFrame:
    """Rows where ``value_col`` decreases (or fails to strictly
    increase) along ``order_col`` within each key — odometer/counter
    integrity.  Output: ``(key..., <order_col>, prev_value, value)``.
    Ties in ``order_col`` are broken by the value itself so the check is
    deterministic under reordering of equal keys."""
    v = F.col(value_col)
    w = Window.partitionBy(*key_cols).orderBy(
        F.col(order_col).asc(), v.asc()
    )
    prev = F.lag(v).over(w)
    out = df.filter(F.col(order_col).isNotNull() & v.isNotNull()).select(
        *key_cols,
        F.col(order_col),
        prev.alias("prev_value"),
        v.alias("value"),
    )
    bad = (
        F.col("value") <= F.col("prev_value")
        if strict
        else F.col("value") < F.col("prev_value")
    )
    return out.filter(F.col("prev_value").isNotNull() & bad)
