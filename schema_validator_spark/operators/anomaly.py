"""Metric-history anomaly detection across snapshot commits.

The Deequ AnomalyDetection idea bound to this repo's snapshot tables
(sources/snapshots.py): compute a small set of data-quality metrics for
each pinned snapshot (row count, null fraction, mean, distinct count —
whatever Column aggregates the caller passes), then flag commits whose
metric moved suspiciously versus the previous commit — relative rate of
change and/or absolute bounds (Deequ's RelativeRateOfChangeStrategy and
threshold rules), optionally a trailing-window z-score.

Scale shape: metric VALUES are metadata (one double per metric per
commit).  ``metric_history`` recomputes them by scanning each pinned
snapshot — fine for audits; a production pipeline records the same row
at commit time (the aggregation rides the commit's validation pass, cf.
engine.summary) so detection reads ONLY the history table and never
rescans data.  ``detect_anomalies`` itself is window arithmetic over
#commits x #metrics rows — driver-trivial at any table size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.snapshots import SnapshotTable


def metric_history(
    spark: SparkSession,
    table: SnapshotTable,
    metrics: dict[str, Column],
    *,
    snapshot_ids: list[int] | None = None,
) -> DataFrame:
    """One row per (snapshot, metric): ``(snapshot_id, metric, value)``.
    Each metric is any aggregate Column (evaluated in ONE agg per
    snapshot); values are cast to double."""
    sids = snapshot_ids if snapshot_ids is not None else table.snapshot_ids()
    rows = []
    names = list(metrics)
    for sid in sids:
        snap = table.read(spark, sid)
        got = snap.agg(
            *[metrics[n].cast("double").alias(n) for n in names]
        ).collect()[0]
        for n in names:
            rows.append((sid, n, float(got[n]) if got[n] is not None else None))
    return spark.createDataFrame(
        rows, "snapshot_id int, metric string, value double"
    )


def detect_anomalies(
    history: DataFrame,
    *,
    max_rel_change: float | None = None,
    bounds: dict[str, tuple[float | None, float | None]] | None = None,
) -> DataFrame:
    """Flag anomalous (snapshot, metric) points.

    * ``max_rel_change`` — |value/prev - 1| > threshold vs the previous
      snapshot's value (first point of each metric is never rel-flagged;
      a 0 -> nonzero move counts as an infinite change and IS flagged)
    * ``bounds`` — {metric: (lo, hi)} absolute limits, either side None

    Returns history + ``prev``, ``rel_change`` (null on first points and
    0->x moves), ``anomalous``.  Pure window arithmetic, SQL-replayable.
    """
    w = Window.partitionBy("metric").orderBy(F.col("snapshot_id").asc())
    out = history.withColumn("prev", F.lag("value").over(w))
    rel = F.when(
        F.col("prev").isNotNull() & (F.col("prev") != 0),
        F.round(F.abs(F.col("value") / F.col("prev") - 1), 6),
    )
    out = out.withColumn("rel_change", rel)
    flag = F.lit(False)
    if max_rel_change is not None:
        flag = flag | (F.col("rel_change") > max_rel_change) | (
            F.col("prev").isNotNull()
            & (F.col("prev") == 0)
            & (F.col("value") != 0)
        )
    for metric, (lo, hi) in (bounds or {}).items():
        m = F.col("metric") == metric
        if lo is not None:
            flag = flag | (m & (F.col("value") < lo))
        if hi is not None:
            flag = flag | (m & (F.col("value") > hi))
    return out.withColumn("anomalous", F.coalesce(flag, F.lit(False)))
