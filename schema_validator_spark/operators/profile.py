"""Per-column table profiling — the "column stats" half of the north rule.

One aggregate job over ALL columns (single scan, no per-column passes):
for every column compute row/null/distinct-ish counts plus type-aware
extremes, then unpivot JVM-side (``stack``) into one row per column:

    (column, n_rows, n_nulls, null_rate, approx_distinct, min, max)

min/max are rendered as strings so heterogeneous column types share one
output schema (the profile is a report, not an input to arithmetic).
``approx_distinct`` is HyperLogLog++ (mergeable, single-scan); exact
distincts per column would be one shuffle *per column* — wrong at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


_PROFILABLE = (
    T.StringType, T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType, T.BooleanType,
    T.TimestampType, T.DateType, T.BinaryType,
)


def profile(
    df: DataFrame,
    columns: list[str] | None = None,
    *,
    relative_sd: float = 0.05,
) -> DataFrame:
    """One-pass profile of (by default) every scalar column."""
    if columns is None:
        columns = [
            f.name for f in df.schema.fields if isinstance(f.dataType, _PROFILABLE)
        ]
    if not columns:
        raise ValueError("no profilable columns")

    aggs = [F.count(F.lit(1)).alias("_n")]
    for i, c in enumerate(columns):
        col = F.col(c)
        aggs += [
            F.sum(col.isNull().cast("long")).alias(f"_null_{i}"),
            F.approx_count_distinct(col, relative_sd).alias(f"_dist_{i}"),
            F.min(col).cast("string").alias(f"_min_{i}"),
            F.max(col).cast("string").alias(f"_max_{i}"),
        ]
    wide = df.agg(*aggs)

    stack_args = ", ".join(
        f"'{c}', _null_{i}, _dist_{i}, _min_{i}, _max_{i}"
        for i, c in enumerate(columns)
    )
    return wide.selectExpr(
        "_n as n_rows",
        f"stack({len(columns)}, {stack_args}) as "
        "(column, n_nulls, approx_distinct, min, max)",
    ).select(
        "column",
        "n_rows",
        "n_nulls",
        F.round(F.col("n_nulls") / F.col("n_rows"), 6).alias("null_rate"),
        "approx_distinct",
        "min",
        "max",
    )


def profile_exact(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Exact-distinct variant for small tables / oracle comparison.
    Still one job, but count_distinct per column expands the aggregate —
    use ``profile`` at scale."""
    if columns is None:
        columns = [
            f.name for f in df.schema.fields if isinstance(f.dataType, _PROFILABLE)
        ]
    aggs = [F.count(F.lit(1)).alias("_n")]
    for i, c in enumerate(columns):
        col = F.col(c)
        aggs += [
            F.sum(col.isNull().cast("long")).alias(f"_null_{i}"),
            F.countDistinct(col).alias(f"_dist_{i}"),
            F.min(col).cast("string").alias(f"_min_{i}"),
            F.max(col).cast("string").alias(f"_max_{i}"),
        ]
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', _null_{i}, _dist_{i}, _min_{i}, _max_{i}"
        for i, c in enumerate(columns)
    )
    return wide.selectExpr(
        "_n as n_rows",
        f"stack({len(columns)}, {stack_args}) as "
        "(column, n_nulls, n_distinct, min, max)",
    ).select("column", "n_rows", "n_nulls", "n_distinct", "min", "max")


def _benford_digit_counts(df: DataFrame, col: str) -> DataFrame:
    """Observed first-significant-digit counts joined onto the full 1-9
    grid (absent digits = 0 — they still deviate from Benford).  The
    first digit of ``abs(v)`` is computed arithmetically
    (``floor(a * 10^-floor(log10 a))``) so any SQL engine reproduces it
    — never via string formatting, which differs across engines.
    NULLs and zeros are excluded.  ONE map-side-combinable groupBy on a
    9-value key; everything after runs over the 9-row frame."""
    a = F.abs(F.col(col).cast("double"))
    digit = F.floor(a * F.pow(F.lit(10.0), -F.floor(F.log10(a)))).cast("int")
    observed = (
        df.filter(F.col(col).isNotNull() & (a > 0))
        .groupBy(digit.alias("_d"))
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    grid = df.sparkSession.range(1, 10).select(F.col("id").cast("int").alias("digit"))
    return grid.join(
        F.broadcast(observed), grid["digit"] == observed["_d"], "left"
    ).select("digit", F.coalesce(F.col("_c"), F.lit(0)).alias("n_digit"))


def benford_report(df: DataFrame, col: str) -> DataFrame:
    """First-significant-digit distribution vs Benford's law — the
    classic audit-grade anomaly check for naturally-occurring numeric
    columns (amounts, populations, file sizes): fabricated or truncated
    data deviates from ``P(d) = log10(1 + 1/d)``.

    Always 9 rows: ``(digit, n_digit, obs_p, exp_p, abs_dev)``, floats
    rounded 6dp."""
    counts = _benford_digit_counts(df, col)
    w = Window.partitionBy()
    obs = F.col("n_digit") / F.sum("n_digit").over(w)
    exp = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit"))
    return counts.select(
        "digit",
        "n_digit",
        F.round(obs, 6).alias("obs_p"),
        F.round(exp, 6).alias("exp_p"),
        F.round(F.abs(obs - exp), 6).alias("abs_dev"),
    )


def benford_summary(df: DataFrame, col: str) -> DataFrame:
    """One-row Benford conformity verdict: ``(n, mad, chi2)``.
    MAD = mean absolute deviation over all 9 digits (Nigrini bands:
    <0.006 close, <0.012 acceptable, <0.015 marginal conformity for
    large n); chi2 = n * sum((obs - exp)^2 / exp).  Unrounded
    deviations feed the sums; only outputs are rounded 6dp."""
    counts = _benford_digit_counts(df, col)
    w = Window.partitionBy()
    n = F.sum("n_digit").over(w)
    obs = F.col("n_digit") / n
    exp = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit"))
    per = counts.select(
        n.alias("_n"),
        F.abs(obs - exp).alias("_dev"),
        ((obs - exp) * (obs - exp) / exp).alias("_chi"),
    )
    return per.agg(
        F.max("_n").alias("n"),
        F.round(F.sum("_dev") / 9, 6).alias("mad"),
        F.round(F.max("_n") * F.sum("_chi"), 6).alias("chi2"),
    )


def column_entropy(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Deequ-parity information analyzers for categorical columns —
    Entropy, Distinctness, UniqueValueRatio — for ALL requested columns
    in ONE unpivoted pass (two shuffles total, not per column):

    ``(column, n_rows, n_nonnull, n_distinct, entropy, norm_entropy,
    distinctness, unique_value_ratio)`` where entropy is Shannon (nats)
    over the non-null value distribution, norm_entropy = entropy /
    ln(n_distinct) (NULL when 0/1 distinct values), distinctness =
    n_distinct / n_nonnull, and unique_value_ratio = #values occurring
    exactly once / n_distinct (Deequ's definitions).

    Plan: stack-unpivot to (column, value) rows, ONE map-side-combined
    groupBy on the pair (bounded by total distinct values across
    columns), then per-column aggregation over the counts frame.  NULLs
    are excluded from the distribution (completeness is the n_nulls
    story in :func:`profile`); floats rounded 6dp.
    """
    if cols is None:
        cols = [
            f.name for f in df.schema.fields
            if isinstance(f.dataType, _PROFILABLE)
        ]
    n_rows = df.count()
    stack_expr = "stack({}, {}) as (col, val)".format(
        len(cols),
        ", ".join(f"'{c}', cast(`{c}` as string)" for c in cols),
    )
    counts = (
        df.selectExpr(stack_expr)
        .filter(F.col("val").isNotNull())
        .groupBy("col", "val")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    per_col = counts.groupBy("col").agg(
        F.sum("c").alias("_nn"),
        F.count(F.lit(1)).alias("_nd"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0)).alias("_uniq"),
        # H = ln(N) - sum(c * ln c)/N  (exact, map-side-combinable)
        F.sum(F.col("c") * F.log(F.col("c"))).alias("_clogc"),
    )
    h = F.log(F.col("_nn")) - F.col("_clogc") / F.col("_nn")
    return per_col.select(
        F.col("col").alias("column"),
        F.lit(n_rows).alias("n_rows"),
        F.col("_nn").alias("n_nonnull"),
        F.col("_nd").alias("n_distinct"),
        F.round(h, 6).alias("entropy"),
        F.round(
            F.when(F.col("_nd") > 1, h / F.log(F.col("_nd"))), 6
        ).alias("norm_entropy"),
        F.round(F.col("_nd") / F.col("_nn"), 6).alias("distinctness"),
        F.round(F.col("_uniq") / F.col("_nd"), 6).alias("unique_value_ratio"),
    )


def category_coverage(df: DataFrame, col: str, k: int = 10) -> DataFrame:
    """Top-``k`` category report: ``(rank, value, n, share, cum_share)``
    — "the top 10 domains cover 87% of the corpus", the concentration
    view that decides blocklists, stratification keys and skew
    mitigation.  Deterministic tie-break (count desc, value asc);
    NULL is its own category; shares are over ALL rows, so
    ``cum_share`` of the last row tells how much tail the top-k miss.

    ONE map-side-combinable groupBy on the value; ranking windows run
    over the distinct-value frame (never rows).  Floats rounded 6dp."""
    if k <= 0:
        raise ValueError("k must be positive")
    counts = df.groupBy(F.col(col).alias("value")).agg(
        F.count(F.lit(1)).alias("n")
    )
    w_all = Window.partitionBy()
    order = [F.col("n").desc(), F.col("value").asc_nulls_last()]
    w_rank = Window.orderBy(*order)
    w_cum = w_rank.rowsBetween(Window.unboundedPreceding, 0)
    return (
        counts.withColumn("_tot", F.sum("n").over(w_all))
        .withColumn("rank", F.row_number().over(w_rank))
        .withColumn("_cum", F.sum("n").over(w_cum))
        .filter(F.col("rank") <= k)
        .select(
            "rank",
            "value",
            "n",
            F.round(F.col("n") / F.col("_tot"), 6).alias("share"),
            F.round(F.col("_cum") / F.col("_tot"), 6).alias("cum_share"),
        )
    )


def completeness_by_group(
    df: DataFrame, group_cols: list[str], cols: list[str] | None = None
) -> DataFrame:
    """Per-segment completeness: null rates of every requested column
    WITHIN each group — Deequ's where-scoped Completeness, vectorized
    over all (group x column) cells at once.  The global profile hides
    exactly this failure mode: a field that stopped arriving from ONE
    source sits at 2% overall nulls while being 100% null in the broken
    segment.

    ``(group..., column, n_rows, n_nulls, null_rate)`` — one row per
    group per column; ONE map-side-combinable groupBy (all null counts
    ride the same pass), stack-unpivot after, so the shuffle is
    #groups-bounded regardless of column count.  Floats rounded 6dp.
    """
    if cols is None:
        cols = [
            f.name for f in df.schema.fields
            if isinstance(f.dataType, _PROFILABLE)
            and f.name not in set(group_cols)
        ]
    if not cols:
        raise ValueError("no columns to profile")
    aggs = [F.count(F.lit(1)).alias("_n")]
    for i, c in enumerate(cols):
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"_null_{i}"))
    wide = df.groupBy(*group_cols).agg(*aggs)
    stack_args = ", ".join(f"'{c}', _null_{i}" for i, c in enumerate(cols))
    return wide.selectExpr(
        *[f"`{g}`" for g in group_cols],
        "_n as n_rows",
        f"stack({len(cols)}, {stack_args}) as (column, n_nulls)",
    ).select(
        *group_cols,
        "column",
        "n_rows",
        "n_nulls",
        F.round(F.col("n_nulls") / F.col("n_rows"), 6).alias("null_rate"),
    )
