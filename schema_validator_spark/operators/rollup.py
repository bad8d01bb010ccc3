"""Hypertable-style time-series rollup — multi-granularity continuous
aggregates (the TimescaleDB continuous-aggregate / druid rollup shape).

The scale trick: only the FINEST grain aggregates raw events; every
coarser grain re-aggregates the previous grain's partial rows, because
the carried state is MERGEABLE.  At 10^12 events, the hourly pass is
the one event-scale shuffle; daily then aggregates O(hours) rows and
monthly O(days) — effectively free.  Three tiers by what merges:

* ``rollup_timeseries`` — (count, sum, min, max); avg/stddev derive
  from (sum, count) downstream.
* ``rollup_quantiles`` — the mergeable quantile sketch from
  operators/sketch.py (exact n/vmin/vmax ride along losslessly).
* ``rollup_distinct`` — Spark's built-in Datasketches HLL
  (count-distinct doesn't decompose across buckets; its sketch does).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: truncation units that form a merge hierarchy (each is an exact
#: coarsening of the previous — date_trunc(coarse, trunc(fine, ts)) ==
#: date_trunc(coarse, ts))
GRAIN_HIERARCHY = ["minute", "hour", "day", "month", "year"]


def _check_grains(grains: tuple[str, ...]) -> None:
    order = [g for g in GRAIN_HIERARCHY if g in grains]
    if list(grains) != order or len(set(grains)) != len(grains):
        raise ValueError(
            f"grains must be distinct and fine-to-coarse from "
            f"{GRAIN_HIERARCHY}, got {list(grains)}"
        )


def rollup_timeseries(
    df: DataFrame,
    ts_col: str,
    entity_cols: list[str],
    value_col: str,
    *,
    grains: tuple[str, ...] = ("hour", "day", "month"),
) -> DataFrame:
    """Per-(entity, time-bucket) aggregates at every requested grain, as
    one unioned frame with a ``grain`` discriminator column.

    Output: grain, *entity_cols, bucket_start (truncated timestamp),
    n (rows), vsum, vmin, vmax.  NULL values contribute to n but not to
    sum/min/max (standard SQL aggregate semantics on both engines).
    Grains must appear in fine-to-coarse hierarchy order so partials
    merge exactly.
    """
    _check_grains(grains)
    finest = grains[0]
    cur = (
        df.groupBy(
            *entity_cols,
            F.date_trunc(finest, F.col(ts_col)).alias("bucket_start"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(value_col).alias("vsum"),
            F.min(value_col).alias("vmin"),
            F.max(value_col).alias("vmax"),
        )
    )
    levels = [cur.withColumn("grain", F.lit(finest))]
    for g in grains[1:]:
        cur = (
            cur.groupBy(
                *entity_cols,
                F.date_trunc(g, F.col("bucket_start")).alias("bucket_start"),
            )
            .agg(
                F.sum("n").alias("n"),
                F.sum("vsum").alias("vsum"),
                F.min("vmin").alias("vmin"),
                F.max("vmax").alias("vmax"),
            )
        )
        levels.append(cur.withColumn("grain", F.lit(g)))
    out = levels[0]
    for lv in levels[1:]:
        out = out.unionByName(lv)
    return out.select("grain", *entity_cols, "bucket_start", "n", "vsum", "vmin", "vmax")


def rollup_quantiles(
    df: DataFrame,
    ts_col: str,
    entity_cols: list[str],
    value_col: str,
    *,
    grains: tuple[str, ...] = ("hour", "day", "month"),
    qs: tuple[float, ...] = (0.5, 0.95),
    compression: int = 128,
) -> DataFrame:
    """Percentile-grade continuous aggregate: the mergeable quantile
    sketch (operators/sketch.py) carried up the grain hierarchy.

    The finest grain sketches raw values once (mapInPandas partials +
    one sketch-row shuffle); each coarser grain re-MERGES the previous
    grain's sketch rows under the truncated bucket — O(buckets) KB-sized
    rows, the exact reason mergeable sketches exist.  Output per
    (grain, entity, bucket): exact n/vmin/vmax bookkeeping plus
    approximate quantiles ``q_<pct>`` reconstructed from the merged
    centroids.  n/vmin/vmax are exact at every grain (they merge
    losslessly); quantile error is the sketch's equal-weight compression
    error, uniform across quantiles.

    NULL/NaN values: ``n`` here counts SKETCHABLE (non-null numeric)
    values — the sketch stage drops them before centroiding.  This
    intentionally differs from ``rollup_timeseries``, whose ``n`` is raw
    row count; pre-filter or reconcile explicitly when mixing the two.
    """
    from . import sketch as SK

    _check_grains(grains)
    finest = grains[0]
    base = df.withColumn(
        "bucket_start", F.date_trunc(finest, F.col(ts_col))
    )
    cur = SK.sketch(
        base, value_col, [*entity_cols, "bucket_start"], compression=compression
    )
    levels = [(finest, cur)]
    for g in grains[1:]:
        regrouped = cur.withColumn(
            "bucket_start", F.date_trunc(g, F.col("bucket_start"))
        )
        cur = SK.merge_sketches(
            regrouped, [*entity_cols, "bucket_start"], compression=compression
        )
        levels.append((g, cur))

    qcols = [f"q_{int(round(q * 100))}" for q in qs]

    def add_quantiles(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            vals = [
                SK.quantiles_py(r["means"], r["counts"], list(qs),
                                r["vmin"], r["vmax"])
                for _, r in pdf.iterrows()
            ]
            out = pdf.drop(columns=["means", "counts"])
            for i, qc in enumerate(qcols):
                out[qc] = [v[i] for v in vals]
            yield out

    out = None
    for g, lv in levels:
        tagged = lv.withColumn("grain", F.lit(g))
        out = tagged if out is None else out.unionByName(tagged)
    schema = ", ".join(
        [f"`{c}` {out.schema[c].dataType.simpleString()}"
         for c in [*entity_cols, "bucket_start", "n", "vmin", "vmax"]]
        + [f"{qc} double" for qc in qcols] + ["grain string"]
    )
    return out.mapInPandas(add_quantiles, schema).select(
        "grain", *entity_cols, "bucket_start", "n", "vmin", "vmax", *qcols
    )


def rollup_distinct(
    df: DataFrame,
    ts_col: str,
    entity_cols: list[str],
    key_col: str,
    *,
    grains: tuple[str, ...] = ("hour", "day", "month"),
    lg_config_k: int = 12,
) -> DataFrame:
    """Distinct-count continuous aggregate via Spark's BUILT-IN
    Datasketches HLL (``hll_sketch_agg`` / ``hll_union_agg`` — all JVM,
    zero Python): the finest grain sketches raw keys once; every coarser
    grain unions the previous grain's KB-sized sketches.  This is the
    canonical mergeable-sketch use case — count(distinct) does NOT
    decompose across buckets, but its sketch does.

    Returns (grain, *entity_cols, bucket_start, n_distinct) where
    n_distinct is the HLL estimate (EXACT while a bucket's cardinality
    stays in the sketch's coupon-list range — thousands at lgK=12 —
    which is how the driver query can hold it to an exact oracle at the
    gate SFs; at 10^12-row scale the estimate carries the usual ~1.6%
    HLL error).
    """
    _check_grains(grains)
    finest = grains[0]
    cur = (
        df.groupBy(
            *entity_cols,
            F.date_trunc(finest, F.col(ts_col)).alias("bucket_start"),
        )
        .agg(F.hll_sketch_agg(F.col(key_col), F.lit(lg_config_k)).alias("_sk"))
    )
    levels = [(finest, cur)]
    for g in grains[1:]:
        cur = (
            cur.groupBy(
                *entity_cols,
                F.date_trunc(g, F.col("bucket_start")).alias("bucket_start"),
            )
            .agg(F.hll_union_agg("_sk").alias("_sk"))
        )
        levels.append((g, cur))
    out = None
    for g, lv in levels:
        tagged = lv.withColumn("grain", F.lit(g))
        out = tagged if out is None else out.unionByName(tagged)
    return out.select(
        "grain", *entity_cols, "bucket_start",
        F.hll_sketch_estimate("_sk").alias("n_distinct"),
    )
