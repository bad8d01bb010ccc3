"""Structured Streaming validation — the same compiled plan over streams.

The reference is strictly batch (one in-memory value per Validate call,
validator.go:32-49); this is our engine-level generalization: because the
compiled constraint plan is one stateless wide projection, it applies to a
streaming DataFrame unchanged.  Three surfaces:

* ``annotate_stream``   — stream + ``_fails`` column (stateless select);
* ``violations_stream`` — exploded violation rows (append-mode safe);
* ``summary_stream``    — windowed per-partition pass/fail rollup with a
  watermark, so late rows beyond the lateness bound are dropped and state
  is bounded (the streaming analog of the per-partition summary).

Scale notes: the row-level path adds no state at all; only the windowed
summary keeps state, sized by (watermark / window) x partition-col
cardinality.  Checkpointing is Spark's own streaming checkpoint — pass
``checkpointLocation`` at sink time, orthogonal to the batch engine's
per-partition lineage table (checkpoint.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..engine import FAILS_COL, ValidationEngine


def annotate_stream(engine: ValidationEngine, stream: DataFrame) -> DataFrame:
    """Stateless: stream + ``_fails`` (works because the compiled plan is a
    pure projection; compile uses only the static schema)."""
    return engine.annotate(stream)


def violations_stream(engine: ValidationEngine, stream: DataFrame) -> DataFrame:
    """Exploded violations as an append-mode stream."""
    ann = annotate_stream(engine, stream)
    v = ann.select(*engine.key_cols, F.explode(F.col(FAILS_COL)).alias("_v"))
    return v.select(
        *engine.key_cols,
        F.col("_v.field").alias("field"),
        F.col("_v.code").alias("code"),
        F.col("_v.params").alias("params"),
    )


def summary_stream(
    engine: ValidationEngine,
    stream: DataFrame,
    *,
    event_time_col: str,
    window_duration: str = "1 minute",
    watermark_delay: str = "2 minutes",
) -> DataFrame:
    """Watermarked windowed pass/fail summary.

    Output schema: window struct + engine.partition_cols +
    (n_rows, n_rows_failed, n_violations) — matching the batch summary so
    batch and streaming rollups union cleanly.
    """
    ann = annotate_stream(engine, stream).withWatermark(
        event_time_col, watermark_delay
    )
    n_fails = F.size(F.col(FAILS_COL))
    keys = [F.window(F.col(event_time_col), window_duration).alias("window")]
    keys += [F.col(c) for c in engine.partition_cols]
    return ann.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum((n_fails > 0).cast("long")).alias("n_rows_failed"),
        F.sum(n_fails.cast("long")).alias("n_violations"),
    )


def dedup_stream(
    stream: DataFrame,
    key_cols: list[str],
    *,
    event_time_col: str | None = None,
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Streaming exact dedup on key columns.

    With an event-time column: ``dropDuplicatesWithinWatermark`` — state
    for a key is dropped once the watermark passes it, so state stays
    bounded by (arrival rate x watermark delay) no matter how long the
    stream runs; a duplicate arriving inside the lateness bound is
    removed even if its event time differs from the first occurrence.
    Without one: plain ``dropDuplicates`` (state grows with distinct
    keys — only for short-lived/finite streams).
    """
    if event_time_col is not None:
        return stream.withWatermark(
            event_time_col, watermark_delay
        ).dropDuplicatesWithinWatermark(key_cols)
    return stream.dropDuplicates(key_cols)


def run_to_memory(
    query_df: DataFrame,
    name: str,
    *,
    output_mode: str = "append",
) -> None:
    """Test helper: drain all available input into an in-memory table
    (trigger=availableNow, blocking)."""
    q = (
        query_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def dedup_stream_against_corpus(
    stream: DataFrame,
    corpus: DataFrame,
    text_col: str,
) -> DataFrame:
    """Streaming exact dedup against a STATIC corpus: drop every stream
    row whose content hash already exists in the corpus — the streaming
    ingest filter for "don't re-admit documents we already own".

    Uses a stream-static LEFT ANTI join (static side on the right, the
    supported shape): the corpus reduces to a distinct sha256 index once
    per micro-batch plan, the stream side never buffers state (unlike
    dropDuplicates, nothing accumulates — the dedup authority IS the
    static index).  Pair with ``dedup_stream`` when within-stream
    duplicates must also collapse.
    """
    idx = corpus.select(
        F.sha2(F.coalesce(F.col(text_col), F.lit("")), 256).alias("_h")
    ).distinct()
    hashed = stream.withColumn(
        "_h", F.sha2(F.coalesce(F.col(text_col), F.lit("")), 256)
    )
    return hashed.join(idx, "_h", "left_anti").drop("_h")
