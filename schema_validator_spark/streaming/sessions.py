"""Streaming sessionization — Spark's native ``session_window`` with a
watermark, the declarative Structured Streaming counterpart of
``operators/sessions.py``.

Spark-first by design: ``session_window(ts, gap)`` IS the gap-based
session definition (each event extends its window by ``gap``;
overlapping windows merge), evaluated by the built-in streaming
state-store operator — no custom ``applyInPandasWithState`` needed, the
watermark bounds state, and late events within the delay still merge
into their session.  The same expression runs in batch mode, which is
how the equivalence test pins it row-identical to the batch
``sessionize`` window algebra.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def session_stats_stream(
    stream: DataFrame,
    user_col: str,
    ts_col: str,
    *,
    gap: str = "30 minutes",
    watermark_delay: str = "1 hour",
) -> DataFrame:
    """Per-session rollup over a stream: (user, session_start,
    session_end, n_events, duration_us).  A session closes — and its single final
    row becomes emittable in append mode — once the watermark passes
    its end + gap; state is therefore bounded by (live sessions), not
    stream length.

    On a BATCH DataFrame the same call works with the watermark skipped
    (batch ignores it), computing identical sessions in one pass.
    """
    src = stream
    if stream.isStreaming:
        src = stream.withWatermark(ts_col, watermark_delay)
    return (
        src.groupBy(
            F.col(user_col),
            F.session_window(F.col(ts_col), gap).alias("session"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (
                F.unix_micros(F.max(ts_col).cast("timestamp"))
                - F.unix_micros(F.min(ts_col).cast("timestamp"))
            ).alias("duration_us"),
        )
        .select(
            user_col,
            F.col("session.start").alias("session_start"),
            F.col("session.end").alias("session_end"),
            "n_events",
            "duration_us",
        )
    )
