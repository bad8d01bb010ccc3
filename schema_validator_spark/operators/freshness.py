"""Partition freshness / completeness: is every time bucket present,
and how stale is the newest one?

The "did yesterday's load happen" check that row-level rules cannot
express — a MISSING day produces no rows to validate, so only a
grid-vs-observed comparison can see it.  Classic warehouse audit
alongside the sequence-integrity family (operators/sequence.py), but
over TIME buckets rather than per-key sequences.

Scale shape: ONE map-side-combinable groupBy collapses the table to
per-bucket counts (reducer input = #buckets, never rows); the expected
grid is generated from the observed [min, max] span with ``sequence``
(#buckets rows, metadata scale) and left-joined broadcast.  At 10^12
rows the only row-scale work is the bucketed count — everything after
runs on a frame the size of the calendar.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_GRAIN_INTERVAL = {
    "hour": "interval 1 hour",
    "day": "interval 1 day",
    "week": "interval 1 week",
    "month": "interval 1 month",
}


def partition_freshness(
    df: DataFrame, ts_col: str, *, grain: str = "day"
) -> DataFrame:
    """Complete bucket grid over the observed span:
    ``(bucket, n_rows, is_missing)`` — one row per expected ``grain``
    bucket between the table's min and max timestamp, ``n_rows = 0`` /
    ``is_missing = true`` for buckets with no data.  NULL timestamps are
    excluded (a `required` rule owns those)."""
    if grain not in _GRAIN_INTERVAL:
        raise ValueError(f"grain must be one of {sorted(_GRAIN_INTERVAL)}")
    b = F.date_trunc(grain, F.col(ts_col))
    obs = (
        df.filter(F.col(ts_col).isNotNull())
        .groupBy(b.alias("_b"))
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    span = obs.agg(F.min("_b").alias("_lo"), F.max("_b").alias("_hi"))
    grid = span.select(
        F.explode(
            F.sequence(
                F.col("_lo"), F.col("_hi"), F.expr(_GRAIN_INTERVAL[grain])
            )
        ).alias("bucket")
    )
    return (
        grid.join(F.broadcast(obs), grid["bucket"] == obs["_b"], "left")
        .select(
            "bucket",
            F.coalesce(F.col("_c"), F.lit(0)).alias("n_rows"),
            F.col("_c").isNull().alias("is_missing"),
        )
    )


def freshness_summary(
    df: DataFrame, ts_col: str, *, grain: str = "day", as_of=None
) -> DataFrame:
    """One-row completeness verdict over the grid:
    ``(n_buckets, n_missing, max_gap, newest_us, staleness_buckets)`` —
    ``max_gap`` is the longest run of consecutive missing buckets and
    ``staleness_buckets`` how many whole buckets lie between the newest
    data and ``as_of`` (NULL when ``as_of`` is not given; pass it
    explicitly — an implicit now() would make runs unreproducible)."""
    g = partition_freshness(df, ts_col, grain=grain)

    w = Window.orderBy("bucket")
    runs = (
        g.withColumn(
            "_grp",
            F.sum(F.when(F.col("is_missing"), 0).otherwise(1)).over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .filter(F.col("is_missing"))
        .groupBy("_grp")
        .agg(F.count(F.lit(1)).alias("_run"))
    )
    base = g.agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.sum(F.col("is_missing").cast("long")).alias("n_missing"),
        F.unix_micros(F.max("bucket")).alias("newest_us"),
    )
    gaps = runs.agg(F.coalesce(F.max("_run"), F.lit(0)).alias("max_gap"))
    out = base.crossJoin(F.broadcast(gaps))
    if as_of is None:
        stale = F.lit(None).cast("long")
    else:
        stale = (
            F.unix_micros(F.date_trunc(grain, F.lit(as_of).cast("timestamp")))
            - F.col("newest_us")
        )
    return out.select(
        "n_buckets", "n_missing", "max_gap", "newest_us",
        stale.alias("staleness_us"),
    )


def volume_anomalies(
    df: DataFrame,
    ts_col: str,
    *,
    grain: str = "day",
    n_mads: float = 3.0,
) -> DataFrame:
    """Robust per-bucket volume check: flag buckets whose row count sits
    more than ``n_mads`` scaled MADs from the median — "today's load is
    half of normal" caught without assuming normality (median/MAD shrug
    off the very outliers being hunted, unlike mean/stddev).

    Grid from :func:`partition_freshness`, so silently MISSING buckets
    participate as zero counts — a vanished day is the most anomalous
    volume of all.  Median and MAD are exact ``percentile`` over the
    calendar-scale grid (#buckets rows, metadata scale; the row-scale
    work remains the one bucketed count).  MAD is scaled by 1.4826
    (consistency constant for the normal case, the standard convention);
    a zero MAD (over half the buckets identical) falls back to flagging
    only counts different from the median.

    Returns the full grid: ``(bucket, n_rows, deviation, anomalous)``
    with deviation = |n - median| / (1.4826 * MAD) rounded 6dp (NULL
    when MAD = 0).
    """
    g = partition_freshness(df, ts_col, grain=grain)
    med = g.agg(
        F.percentile(F.col("n_rows"), F.lit(0.5)).alias("_med")
    )
    dev = g.crossJoin(F.broadcast(med)).withColumn(
        "_absdev", F.abs(F.col("n_rows") - F.col("_med"))
    )
    mad = dev.agg(
        F.percentile(F.col("_absdev"), F.lit(0.5)).alias("_mad")
    )
    scaled = F.lit(1.4826) * F.col("_mad")
    score = F.col("_absdev") / scaled
    return (
        dev.crossJoin(F.broadcast(mad))
        .select(
            "bucket",
            "n_rows",
            F.round(F.when(F.col("_mad") > 0, score), 6).alias("deviation"),
            F.when(F.col("_mad") > 0, score > F.lit(n_mads))
            .otherwise(F.col("_absdev") > 0)
            .alias("anomalous"),
        )
    )


def cusum_changepoints(
    df: DataFrame,
    ts_col: str,
    *,
    grain: str = "day",
    slack_mads: float = 0.5,
    threshold_mads: float = 5.0,
) -> DataFrame:
    """CUSUM level-shift detection over per-bucket volumes — the
    complement of :func:`volume_anomalies`: MAD flags POINT outliers,
    CUSUM accumulates small persistent drifts ("volume has been 10%
    low for two weeks") that never individually cross a point band.

    Two one-sided CUSUMs (upward / downward) against the median with
    slack ``k = slack_mads * scaled_MAD`` and alarm threshold
    ``h = threshold_mads * scaled_MAD``.  The reset-at-zero recursion
    ``S_t = max(0, S_{t-1} + y_t)`` is NOT a plain window aggregate, but
    it equals ``P_t - min(P_0..P_t)`` over the prefix sums ``P`` — so
    the whole detector is cumsum + running-min windows over the
    calendar-scale grid (the row-scale work stays the one bucketed
    count from the freshness grid, which also makes MISSING buckets
    count as zero volume — a sustained outage trips the downward arm).

    Returns the grid: ``(bucket, n_rows, cusum_up, cusum_down, alarm)``
    with cusum columns in scaled-MAD units (6dp; NULL when MAD = 0,
    where no scale exists and no alarm fires).
    """
    g = partition_freshness(df, ts_col, grain=grain)
    stats = g.agg(
        F.percentile(F.col("n_rows"), F.lit(0.5)).alias("_med")
    )
    dev = g.crossJoin(F.broadcast(stats))
    mad = dev.agg(
        F.percentile(
            F.abs(F.col("n_rows") - F.col("_med")), F.lit(0.5)
        ).alias("_mad")
    )
    w_cum = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, 0
    )
    scaled = F.lit(1.4826) * F.col("_mad")
    ks = F.lit(slack_mads) * scaled
    # prefix sums of (x - med - k) and (med - x - k); S = P - min(P, 0-anchored)
    # try_divide: a zero MAD must yield NULL terms, not an ANSI
    # DIVIDE_BY_ZERO — the when(_mad > 0) gates below null out the rest
    up_y = F.try_divide(F.col("n_rows") - F.col("_med") - ks, scaled)
    dn_y = F.try_divide(F.col("_med") - F.col("n_rows") - ks, scaled)
    out = (
        dev.crossJoin(F.broadcast(mad))
        .withColumn("_pu", F.sum(up_y).over(w_cum))
        .withColumn("_pd", F.sum(dn_y).over(w_cum))
        .withColumn("_mu", F.least(F.min("_pu").over(w_cum), F.lit(0.0)))
        .withColumn("_md2", F.least(F.min("_pd").over(w_cum), F.lit(0.0)))
    )
    su = F.col("_pu") - F.col("_mu")
    sd = F.col("_pd") - F.col("_md2")
    return out.select(
        "bucket",
        "n_rows",
        F.round(F.when(F.col("_mad") > 0, su), 6).alias("cusum_up"),
        F.round(F.when(F.col("_mad") > 0, sd), 6).alias("cusum_down"),
        F.when(
            F.col("_mad") > 0,
            (su > F.lit(threshold_mads)) | (sd > F.lit(threshold_mads)),
        )
        .otherwise(F.lit(False))
        .alias("alarm"),
    )
