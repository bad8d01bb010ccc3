"""Sessionization — gap-based event sessions per user.

The classic event-pipeline operator: consecutive events of a user belong
to one session until a silence longer than ``gap`` splits them.  Pure
window algebra (lag → new-session flag → running sum), deterministic
(ties broken by an id column), engine-reproducible — the DuckDB oracle
re-derives sessions exactly.

Scale shape: ``sessionize`` windows by the user column alone — simple,
but a hyperactive entity (a bot owning a material share of all events —
the common case in real event data) serializes inside one task.
``sessionize_chunked`` is the hot-entity-safe tier: it windows by
(user, coarse time chunk) so even a single user's events parallelize
across chunks, then stitches sessions across chunk boundaries with a
second pass over per-chunk SUMMARY rows (one row per active chunk per
user — ≤ time-range/chunk_seconds rows for even the hottest entity).
Row-identical to ``sessionize`` (equivalence test pins it).
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


def sessionize_chunked(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    *,
    id_col: str | None = None,
    gap_seconds: int = 1800,
    chunk_seconds: int | None = None,
) -> DataFrame:
    """Hot-entity-safe ``sessionize``: identical output, bounded tasks.

    ``chunk_seconds`` defaults to ``max(1 day, 4 * gap_seconds)`` so any
    gap is valid out of the box (the invariant chunk > gap is what makes
    single-lag stitching sufficient).

    Events window by (user, chunk) where chunk = floor(epoch /
    chunk_seconds).  Because ``chunk_seconds > gap_seconds``, two events
    in NON-adjacent chunks are always more than ``gap`` apart (the empty
    chunk between them spans ≥ chunk_seconds), so only adjacent chunks
    can ever share a session — the stitch pass needs one lag over the
    per-(user, chunk) summary.  Global index of an event with
    within-chunk index i: offset + i - stitch, where offset is the
    running sum of prior chunks' net new sessions (n_sessions - stitch).

    Shuffle budget: one hash partitioning by (user, chunk) for the
    per-chunk window (reused by the summary groupBy and the join's big
    side), one tiny shuffle of summary rows.  A bot user with 10^9
    events over a year is 365 summary rows at day chunks, never one
    task.
    """
    if chunk_seconds is None:
        chunk_seconds = max(86400, 4 * gap_seconds)
    if chunk_seconds <= gap_seconds:
        raise ValueError(
            f"chunk_seconds ({chunk_seconds}) must exceed gap_seconds "
            f"({gap_seconds}): the stitch pass only inspects adjacent chunks"
        )
    order = [F.col(ts_col).asc()]
    if id_col:
        order.append(F.col(id_col).asc())

    ev = df.withColumn("_ts_sec", F.unix_timestamp(F.col(ts_col))).withColumn(
        "_chunk", F.floor(F.col("_ts_sec") / F.lit(chunk_seconds))
    )
    w = Window.partitionBy(user_col, "_chunk").orderBy(*order)
    prev_ts = F.lag("_ts_sec").over(w)
    new_session = (
        prev_ts.isNull() | (F.col("_ts_sec") - prev_ts > gap_seconds)
    ).cast("long")
    ev = ev.withColumn(
        "_sidx",
        F.sum(new_session).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )

    summ = ev.groupBy(user_col, "_chunk").agg(
        F.min("_ts_sec").alias("_first_ts"),
        F.max("_ts_sec").alias("_last_ts"),
        F.max("_sidx").alias("_n_sessions"),
    )
    ws = Window.partitionBy(user_col).orderBy(F.col("_chunk").asc())
    stitch = (
        (F.lag("_chunk").over(ws) == F.col("_chunk") - 1)
        & (F.col("_first_ts") - F.lag("_last_ts").over(ws) <= gap_seconds)
    ).cast("long")
    offsets = (
        summ.withColumn("_stitch", F.coalesce(stitch, F.lit(0)))
        .withColumn(
            "_off",
            F.coalesce(
                F.sum(F.col("_n_sessions") - F.col("_stitch")).over(
                    ws.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .select(user_col, "_chunk", "_off", "_stitch")
    )

    return (
        ev.join(offsets, [user_col, "_chunk"])
        .withColumn("session_idx", F.col("_off") + F.col("_sidx") - F.col("_stitch"))
        .drop("_ts_sec", "_chunk", "_sidx", "_off", "_stitch")
    )


def session_stats(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    *,
    id_col: str | None = None,
    gap_seconds: int = 1800,
    chunked: bool = True,
    chunk_seconds: int | None = None,
) -> DataFrame:
    """Per-session rollup: (user, session_idx, n_events, duration_sec).

    Uses the hot-entity-safe chunked sessionizer by default with an
    auto-sized chunk (``max(1 day, 4 * gap)`` — always valid for any
    gap); pass ``chunked=False`` for the single-window variant or
    ``chunk_seconds`` to pin the chunk size."""
    if chunked:
        s = sessionize_chunked(
            df, user_col, ts_col, id_col=id_col,
            gap_seconds=gap_seconds, chunk_seconds=chunk_seconds,
        )
    else:
        s = sessionize(df, user_col, ts_col, id_col=id_col, gap_seconds=gap_seconds)
    return s.groupBy(user_col, "session_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.unix_timestamp(F.max(ts_col)) - F.unix_timestamp(F.min(ts_col)))
        .alias("duration_sec"),
    )
