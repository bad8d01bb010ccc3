"""Sessionization — gap-based event sessions per user.

The classic event-pipeline operator: consecutive events of a user belong
to one session until a silence longer than ``gap`` splits them.  Pure
window algebra (lag → new-session flag → running sum), deterministic
(ties broken by an id column), engine-reproducible — the DuckDB oracle
re-derives sessions exactly.

Scale shape: both windows partition by the user column, so the only
shuffle is one hash partitioning by user; a hyperactive user serializes
within its partition (same caveat as any per-entity ordered walk — split
pathological entities upstream if one user owns a material share of all
events).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def sessionize(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    *,
    id_col: str | None = None,
    gap_seconds: int = 1800,
) -> DataFrame:
    """Adds ``session_idx`` (1-based per user) to each event row."""
    order = [F.col(ts_col).asc()]
    if id_col:
        order.append(F.col(id_col).asc())
    w = Window.partitionBy(user_col).orderBy(*order)
    prev_ts = F.lag(F.col(ts_col)).over(w)
    new_session = (
        prev_ts.isNull()
        | (F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(prev_ts) > gap_seconds)
    ).cast("long")
    return df.withColumn(
        "session_idx",
        F.sum(new_session).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )


def session_stats(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    *,
    id_col: str | None = None,
    gap_seconds: int = 1800,
) -> DataFrame:
    """Per-session rollup: (user, session_idx, n_events, duration_sec)."""
    s = sessionize(df, user_col, ts_col, id_col=id_col, gap_seconds=gap_seconds)
    return s.groupBy(user_col, "session_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.unix_timestamp(F.max(ts_col)) - F.unix_timestamp(F.min(ts_col)))
        .alias("duration_sec"),
    )
