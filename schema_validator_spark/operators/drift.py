"""Distribution-drift checks across partitions (commits).

No reference analog (SURVEY.md §2.0); mandated by the north rule.  Two
tiers, both single-scan-per-side and shuffle-light:

* ``column_stats`` — per-group moments + approximate quantiles.  Spark's
  ``percentile_approx`` is a mergeable quantile sketch (Greenwald-Khanna
  family, cf. the KLL± line of work in repo:PAPERS.md): per-partition
  sketches merge in the agg, so the quantile never materializes the data.
* ``psi`` — Population Stability Index between a baseline group and a
  current group: quantile bucket edges from the baseline sketch, one
  bucketed groupBy per side, PSI = Σ (p_cur - p_base) · ln(p_cur/p_base).
  Rule of thumb: PSI < 0.1 stable, 0.1-0.25 moderate, > 0.25 drifted.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_QUANTILES = [0.01, 0.05, 0.25, 0.5, 0.75, 0.95, 0.99]


def column_stats(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    *,
    quantiles: list[float] | None = None,
    accuracy: int = 10000,
) -> DataFrame:
    """Per-group sketch summary of a numeric column (one shuffle)."""
    qs = quantiles or DEFAULT_QUANTILES
    v = F.col(value_col)
    return df.groupBy(*group_cols).agg(
        F.count(v).alias("n"),
        F.round(F.avg(v), 6).alias("mean"),
        F.round(F.stddev_samp(v), 6).alias("stddev"),
        F.min(v).alias("min"),
        F.max(v).alias("max"),
        F.percentile_approx(v, qs, accuracy).alias("quantiles"),
    )


def _bucketize(col: Column, edges: list[float]) -> Column:
    """Bucket index by baseline quantile edges (len(edges)+1 buckets)."""
    expr = F.lit(len(edges))
    for i in range(len(edges) - 1, -1, -1):
        expr = F.when(col <= F.lit(edges[i]), F.lit(i)).otherwise(expr)
    return expr


def psi(
    df: DataFrame,
    value_col: str,
    group_col: str,
    baseline: object,
    current: object,
    *,
    n_buckets: int = 10,
    accuracy: int = 10000,
) -> float:
    """PSI of ``value_col`` between two values of ``group_col``.

    Two jobs: (1) baseline quantile edges via the mergeable sketch,
    (2) one bucketed count per side (computed in a single groupBy over
    both groups).  Scales to any row count — only bucket histograms
    reach the driver.
    """
    base_rows = df.filter(F.col(group_col) == baseline)
    probs = [i / n_buckets for i in range(1, n_buckets)]
    edges_row = base_rows.agg(
        F.percentile_approx(F.col(value_col), probs, accuracy).alias("e")
    ).first()
    edges = [float(e) for e in (edges_row["e"] or [])]
    if not edges:
        raise ValueError(f"baseline group {baseline!r} has no rows")
    # collapse duplicate edges (degenerate distributions)
    uniq: list[float] = []
    for e in edges:
        if not uniq or e > uniq[-1]:
            uniq.append(e)

    both = df.filter(F.col(group_col).isin(baseline, current)).select(
        F.col(group_col).alias("_g"), _bucketize(F.col(value_col), uniq).alias("_b")
    )
    hist = both.groupBy("_g", "_b").agg(F.count(F.lit(1)).alias("c")).collect()

    n_b = len(uniq) + 1
    base_counts = [0.0] * n_b
    cur_counts = [0.0] * n_b
    for r in hist:
        tgt = base_counts if r["_g"] == baseline else cur_counts
        tgt[r["_b"]] += r["c"]
    tb, tc = sum(base_counts) or 1.0, sum(cur_counts) or 1.0
    eps = 1e-6
    score = 0.0
    for b, c in zip(base_counts, cur_counts):
        pb = max(b / tb, eps)
        pc = max(c / tc, eps)
        score += (pc - pb) * math.log(pc / pb)
    return score


def psi_df(
    df: DataFrame,
    value_col: str,
    group_col: str,
    baseline,
    current,
    *,
    n_buckets: int = 10,
) -> DataFrame:
    """Fully-distributed PSI: equal-width buckets over the baseline's
    [min, max], both histograms in one groupBy, PSI as an aggregate —
    zero driver-side computation (the quantile-edge variant ``psi``
    collects one edges row; this one collects nothing).

    Returns one row: (baseline, current, psi).  Out-of-range current
    values clamp into the edge buckets.
    """
    v = F.col(value_col)
    g = F.col(group_col)
    both = df.filter(g.isin(baseline, current) & v.isNotNull()).select(
        g.alias("_g"), v.alias("_v")
    )

    span = both.filter(F.col("_g") == baseline).agg(
        F.min("_v").alias("_lo"), F.max("_v").alias("_hi")
    )
    width = (F.col("_hi") - F.col("_lo")) / n_buckets
    bucket = F.when(F.col("_hi") == F.col("_lo"), F.lit(0)).otherwise(
        F.least(
            F.greatest(F.floor((F.col("_v") - F.col("_lo")) / width), F.lit(0)),
            F.lit(n_buckets - 1),
        )
    ).cast("int")

    hist = (
        both.crossJoin(F.broadcast(span))
        .groupBy(F.col("_g"), bucket.alias("_b"))
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    per_bucket = hist.groupBy("_b").agg(
        F.sum(F.when(F.col("_g") == baseline, F.col("_c")).otherwise(0)).alias("_cb"),
        F.sum(F.when(F.col("_g") == current, F.col("_c")).otherwise(0)).alias("_cc"),
    )
    totals = per_bucket.agg(
        F.sum("_cb").alias("_tb"), F.sum("_cc").alias("_tc")
    )
    eps = F.lit(1e-6)
    pb = F.greatest(F.col("_cb") / F.col("_tb"), eps)
    pc = F.greatest(F.col("_cc") / F.col("_tc"), eps)
    return (
        per_bucket.crossJoin(F.broadcast(totals))
        .agg(F.round(F.sum((pc - pb) * F.log(pc / pb)), 6).alias("psi"))
        .select(
            F.lit(str(baseline)).alias("baseline"),
            F.lit(str(current)).alias("current"),
            "psi",
        )
    )


def psi_quantile_df(
    df: DataFrame,
    value_col: str,
    group_col: str,
    baseline,
    current,
    *,
    n_buckets: int = 10,
) -> DataFrame:
    """Quantile-edge PSI, fully distributed AND engine-reproducible.

    Like :func:`psi` but (a) edges are EXACT percentiles of the baseline
    (``percentile`` — linear interpolation at rank p·(n-1), the same
    definition as ANSI ``quantile_cont``), rounded to 6dp so any engine
    derives identical buckets, and (b) the whole computation stays in the
    plan — edges broadcast, one bucketed groupBy for both sides, PSI as
    an aggregate; nothing but the one-row result reaches the driver.

    Exact percentiles shuffle the baseline's values per group; at 10^12
    rows prefer :func:`psi` (mergeable sketch edges).  This is the
    oracle-checked tier of the drift family.

    Returns one row: (baseline, current, psi).
    """
    v = F.col(value_col)
    g = F.col(group_col)
    both = df.filter(g.isin(baseline, current) & v.isNotNull()).select(
        g.alias("_g"), v.alias("_v")
    )
    probs = F.array(*[F.lit(i / n_buckets) for i in range(1, n_buckets)])
    edges = both.filter(F.col("_g") == baseline).agg(
        F.transform(
            F.percentile(F.col("_v"), probs), lambda e: F.round(e, 6)
        ).alias("_edges")
    )
    # bucket = number of edges strictly below the value — identical
    # arithmetic in any engine, no interpolation at compare time
    bucket = F.aggregate(
        F.col("_edges"),
        F.lit(0),
        lambda acc, e: acc + (F.col("_v") > e).cast("int"),
    )
    per_bucket = (
        both.crossJoin(F.broadcast(edges))
        .groupBy(bucket.alias("_b"))
        .agg(
            F.sum((F.col("_g") == baseline).cast("long")).alias("_cb"),
            F.sum((F.col("_g") == current).cast("long")).alias("_cc"),
        )
    )
    totals = per_bucket.agg(F.sum("_cb").alias("_tb"), F.sum("_cc").alias("_tc"))
    eps = F.lit(1e-6)
    pb = F.greatest(F.col("_cb") / F.col("_tb"), eps)
    pc = F.greatest(F.col("_cc") / F.col("_tc"), eps)
    return (
        per_bucket.crossJoin(F.broadcast(totals))
        .agg(F.round(F.sum((pc - pb) * F.log(pc / pb)), 6).alias("psi"))
        .select(
            F.lit(str(baseline)).alias("baseline"),
            F.lit(str(current)).alias("current"),
            "psi",
        )
    )


def psi_report_df(
    df: DataFrame,
    value_col: str,
    group_col: str,
    baseline,
    *,
    n_buckets: int = 10,
) -> DataFrame:
    """PSI of EVERY group against the baseline in ONE plan — the
    distributed form of :func:`drift_report`, which runs two driver-side
    jobs per group (2·G jobs for G groups; this is 1 job total).

    Exact decile edges of the baseline (rounded 6dp — engine
    reproducible) broadcast over a single bucketed groupBy of all rows;
    per-group PSI is a second small aggregate over (group, bucket)
    histogram rows.  Returns (current, psi) per non-baseline group.
    """
    v = F.col(value_col)
    g = F.col(group_col)
    rows = df.filter(v.isNotNull()).select(g.alias("_g"), v.alias("_v"))
    probs = F.array(*[F.lit(i / n_buckets) for i in range(1, n_buckets)])
    edges = rows.filter(F.col("_g") == baseline).agg(
        F.transform(
            F.percentile(F.col("_v"), probs), lambda e: F.round(e, 6)
        ).alias("_edges")
    )
    bucket = F.aggregate(
        F.col("_edges"), F.lit(0),
        lambda acc, e: acc + (F.col("_v") > e).cast("int"),
    )
    hist = (
        rows.crossJoin(F.broadcast(edges))
        .groupBy(F.col("_g"), bucket.alias("_b"))
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    base_hist = (
        hist.filter(F.col("_g") == baseline)
        .select(F.col("_b"), F.col("_c").alias("_cb"))
    )
    totals = hist.groupBy("_g").agg(F.sum("_c").alias("_tg"))
    base_total = F.broadcast(
        totals.filter(F.col("_g") == baseline).select(F.col("_tg").alias("_tb"))
    )
    # complete (group x bucket) grid so a bucket missing from EITHER side
    # still contributes its eps term — G x <=n_buckets rows, trivially small
    cur_hist = hist.filter(F.col("_g") != baseline)
    grid = cur_hist.select("_g").distinct().crossJoin(hist.select("_b").distinct())
    eps = F.lit(1e-6)
    joined = (
        grid.join(cur_hist, ["_g", "_b"], "left")
        .join(F.broadcast(base_hist), "_b", "left")
        .join(F.broadcast(totals), "_g")
        .crossJoin(base_total)
    )
    pb = F.greatest(F.coalesce(F.col("_cb"), F.lit(0)) / F.col("_tb"), eps)
    pc = F.greatest(F.coalesce(F.col("_c"), F.lit(0)) / F.col("_tg"), eps)
    return (
        joined.groupBy(F.col("_g").alias("current"))
        .agg(F.round(F.sum((pc - pb) * F.log(pc / pb)), 6).alias("psi"))
    )


def outlier_stats(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    *,
    z_threshold: float = 3.0,
    iqr_k: float = 1.5,
    round_stats: int | None = None,
) -> DataFrame:
    """Per-group numeric outlier counts — both the z-score and the
    Tukey-fence (IQR) definitions in one result:

      n_outliers_z   — |v - mean| > z_threshold · stddev_samp
      n_outliers_iqr — v outside [q1 - k·IQR, q3 + k·IQR] (exact quartiles)

    Two passes by construction (mean/quantiles need the full group before
    any row can be judged): a per-group stats aggregate (one row per
    group — broadcast back) and one counting scan.  Exact percentiles
    make the result engine-reproducible; ``round_stats`` additionally
    rounds the fence statistics to N decimals so a different engine's
    summation order cannot flip a borderline row (the oracle mode).  At
    extreme scale swap percentile → percentile_approx and accept sketch
    error.
    """
    v = F.col(value_col)
    g = [F.col(c) for c in group_cols]

    def _r(c):
        return F.round(c, round_stats) if round_stats is not None else c

    stats = df.filter(v.isNotNull()).groupBy(*g).agg(
        _r(F.avg(v)).alias("_mean"),
        _r(F.stddev_samp(v)).alias("_std"),
        _r(F.percentile(v, F.lit(0.25))).alias("_q1"),
        _r(F.percentile(v, F.lit(0.75))).alias("_q3"),
    )
    joined = df.filter(v.isNotNull()).join(F.broadcast(stats), group_cols)
    iqr = F.col("_q3") - F.col("_q1")
    z_out = (
        F.col("_std").isNotNull() & (F.col("_std") > 0)
        & (F.abs(v - F.col("_mean")) > z_threshold * F.col("_std"))
    )
    iqr_out = (v < F.col("_q1") - iqr_k * iqr) | (v > F.col("_q3") + iqr_k * iqr)
    return joined.groupBy(*g).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(z_out.cast("long")).alias("n_outliers_z"),
        F.sum(iqr_out.cast("long")).alias("n_outliers_iqr"),
    )


def ks_2sample_df(
    df: DataFrame,
    value_col: str,
    group_col: str,
    baseline: object,
    current: object,
    *,
    n_ranges: int = 64,
) -> DataFrame:
    """EXACT two-sample Kolmogorov-Smirnov statistic between two groups:
    ``D = max over x of |F_base(x) - F_curr(x)|`` over the empirical
    CDFs.  Complements PSI: bucket-free, sensitive to any distributional
    difference, and the classic drift test when no binning is wanted.

    Scale shape — distributed prefix sum, NO global sort:

    1. one map-side-combinable groupBy collapses the rows to per-distinct-
       value counts ``(v, c_base, c_curr)`` (reducer input bounded by
       #distinct values, never rows);
    2. ``n_ranges`` approximate-quantile edges split the value axis into
       ordered ranges (edge accuracy affects only balance, never the
       result — any value-ordered split yields the same CDF);
    3. per-range subtotal offsets come from a window over the tiny
       #ranges-row aggregate, then each range cumsums locally in
       parallel — the CDF prefix sum is ``n_ranges`` independent tasks,
       exactly the sample_token_budget prefix-sum shape;
    4. one max-aggregate over ``|cdf_base - cdf_curr|``.

    D is evaluated at every distinct observed value, which is where the
    step-function difference attains its max, so the result is exact
    (rounded 6dp for engine reproducibility).
    """
    v = F.col(value_col)
    g = F.col(group_col)
    src = df.filter(g.isin([baseline, current]) & v.isNotNull())
    per_val = src.groupBy(v.alias("_v")).agg(
        F.sum(F.when(g == F.lit(baseline), 1).otherwise(0)).alias("_cb"),
        F.sum(F.when(g == F.lit(current), 1).otherwise(0)).alias("_cc"),
    )

    qs = [i / n_ranges for i in range(1, n_ranges)]
    edge_row = per_val.select(
        F.percentile_approx(F.col("_v"), qs, 1000).alias("_e")
    ).first()
    edges = sorted(set(edge_row["_e"] or []))
    rng = _bucketize(F.col("_v"), [float(e) for e in edges]) if edges else F.lit(0)
    per_val = per_val.withColumn("_rng", rng)

    w_off = (
        Window.orderBy(F.col("_rng").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        per_val.groupBy("_rng")
        .agg(F.sum("_cb").alias("_sb"), F.sum("_cc").alias("_sc"))
        .select(
            "_rng",
            F.coalesce(F.sum("_sb").over(w_off), F.lit(0)).alias("_ob"),
            F.coalesce(F.sum("_sc").over(w_off), F.lit(0)).alias("_oc"),
        )
    )
    totals = per_val.agg(
        F.sum("_cb").alias("_nb"), F.sum("_cc").alias("_nc")
    )

    w_local = Window.partitionBy("_rng").orderBy(F.col("_v").asc())
    cum = w_local.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cdf = (
        per_val.join(F.broadcast(offsets.withColumnRenamed("_rng", "_orng")),
                     F.col("_rng") == F.col("_orng"))
        .crossJoin(F.broadcast(totals))
        .withColumn("_cumb", F.sum("_cb").over(cum) + F.col("_ob"))
        .withColumn("_cumc", F.sum("_cc").over(cum) + F.col("_oc"))
    )
    d = F.abs(
        F.col("_cumb") / F.col("_nb") - F.col("_cumc") / F.col("_nc")
    )
    return cdf.agg(
        F.round(F.max(d), 6).alias("ks"),
        F.first("_nb").alias("n_base"),
        F.first("_nc").alias("n_curr"),
    ).select(
        F.lit(str(baseline)).alias("baseline"),
        F.lit(str(current)).alias("curr"),
        "ks",
        "n_base",
        "n_curr",
    )


def drift_report(
    df: DataFrame,
    value_col: str,
    group_col: str,
    *,
    baseline: object = None,
    n_buckets: int = 10,
) -> list[dict]:
    """PSI of every group against the baseline (default: first group in
    sort order).  Returns a small driver-side list of dicts.

    Deprecated convenience wrapper: delegates to :func:`psi_report_df`
    (ONE plan for all groups, exact 6dp decile edges) and collects the
    tiny per-group result.  The old implementation ran 2 Spark jobs per
    group (sketch edges + histogram) — 2·G driver round-trips for G
    groups — and is gone so it cannot be reached by accident."""
    if baseline is None:
        first = df.select(group_col).distinct().orderBy(group_col).limit(1).collect()
        if not first:
            return []
        baseline = first[0][0]
    return [
        {"group": r["current"], "baseline": baseline, "psi": r["psi"]}
        for r in psi_report_df(
            df, value_col, group_col, baseline, n_buckets=n_buckets
        ).orderBy("current").collect()
    ]


def categorical_drift_df(
    base: DataFrame,
    cur: DataFrame,
    col: str,
) -> DataFrame:
    """Two-sample categorical drift in ONE data shuffle: chi-square
    homogeneity statistic, Jensen-Shannon divergence (natural log) and
    total variation distance between the category distributions of
    ``base`` and ``cur``.

    Complements the numeric drift family (PSI tiers, exact KS): PSI
    needs bucket edges and a baseline convention; for a *categorical*
    column the canonical tests are chi-square (significance), JSD
    (bounded symmetric divergence, <= ln 2) and TVD (L1/2).

    Plan shape: tag each side with a literal, union, ONE groupBy on the
    category (map-side combined — shuffle volume is bounded by
    #tasks x #categories, never rows), then totals + per-category terms
    over the tiny counts frame via an all-rows window (serial, but over
    #categories rows — metadata scale).  NULL is its own category, like
    every groupBy in this engine.

    Returns one row:
    ``(n_base, n_cur, n_categories, dof, chi2, jsd, tvd)`` — floats
    rounded 6dp.  Zero-count conventions: a category absent from one
    side contributes ``p*ln(2)`` to that side's JSD half (0*ln0 = 0
    terms dropped), and its expected counts stay > 0 because it is
    present in the other side.
    """
    tagged = base.select(
        F.col(col).alias("_v"), F.lit(1).alias("_b"), F.lit(0).alias("_c")
    ).unionByName(
        cur.select(
            F.col(col).alias("_v"), F.lit(0).alias("_b"), F.lit(1).alias("_c")
        )
    )
    counts = tagged.groupBy("_v").agg(
        F.sum("_b").alias("b"), F.sum("_c").alias("c")
    )
    w = Window.partitionBy()
    per = (
        counts.withColumn("n_b", F.sum("b").over(w))
        .withColumn("n_c", F.sum("c").over(w))
        .withColumn("p", F.col("b") / F.col("n_b"))
        .withColumn("q", F.col("c") / F.col("n_c"))
        .withColumn("m", (F.col("p") + F.col("q")) / 2)
        # divide BEFORE multiplying: n_b * (b + c) as long x long would
        # overflow ANSI arithmetic at 10^12-row scale; the double ratio
        # first keeps every term in range (oracle replays this order)
        .withColumn(
            "e_b",
            F.col("n_b") * ((F.col("b") + F.col("c")) / (F.col("n_b") + F.col("n_c"))),
        )
        .withColumn(
            "e_c",
            F.col("n_c") * ((F.col("b") + F.col("c")) / (F.col("n_b") + F.col("n_c"))),
        )
        .withColumn(
            "chi2_term",
            # explicit products, not pow(x, 2): keeps the float op
            # sequence replayable verbatim in the SQL oracle
            (F.col("b") - F.col("e_b")) * (F.col("b") - F.col("e_b")) / F.col("e_b")
            + (F.col("c") - F.col("e_c")) * (F.col("c") - F.col("e_c")) / F.col("e_c"),
        )
        .withColumn(
            "jsd_term",
            F.when(
                F.col("p") > 0,
                F.col("p") * F.log(F.col("p") / F.col("m")) / 2,
            ).otherwise(F.lit(0.0))
            + F.when(
                F.col("q") > 0,
                F.col("q") * F.log(F.col("q") / F.col("m")) / 2,
            ).otherwise(F.lit(0.0)),
        )
        .withColumn("tvd_term", F.abs(F.col("p") - F.col("q")) / 2)
    )
    return per.agg(
        F.max("n_b").alias("n_base"),
        F.max("n_c").alias("n_cur"),
        F.count(F.lit(1)).alias("n_categories"),
        (F.count(F.lit(1)) - 1).alias("dof"),
        F.round(F.sum("chi2_term"), 6).alias("chi2"),
        F.round(F.sum("jsd_term"), 6).alias("jsd"),
        F.round(F.sum("tvd_term"), 6).alias("tvd"),
    )


def emd_2sample_df(
    df: DataFrame,
    value_col: str,
    group_col: str,
    baseline: object,
    current: object,
    *,
    n_ranges: int = 64,
) -> DataFrame:
    """EXACT 1-D Wasserstein-1 (earth mover's) distance between two
    groups: ``W1 = integral of |F_base(x) - F_curr(x)| dx``, evaluated
    as ``sum over consecutive distinct values v_i of
    |F_base(v_i) - F_curr(v_i)| * (v_{i+1} - v_i)`` — the empirical
    CDFs are step functions, so the piecewise sum IS the integral.

    Completes the numeric drift triad: PSI (bucketed, baseline-relative),
    KS (worst-case CDF gap, unit-free), W1 (total transport cost in the
    COLUMN'S OWN UNITS — "the price distribution moved $4.20 of mass",
    which PSI/KS cannot express).

    Same distributed prefix-sum shape as :func:`ks_2sample_df` (one
    map-side-combinable per-distinct-value collapse, range-split local
    cumsums, NO global sort).  The extra piece W1 needs is each value's
    SUCCESSOR: ``lead`` inside each range, plus each range's first value
    shipped to the previous range via a lead over the tiny #ranges-row
    offsets frame — so the gap terms also never serialize.  The global
    maximum's term is 0 (both CDFs are 1 past it) and is dropped by the
    NULL successor.
    """
    v = F.col(value_col)
    g = F.col(group_col)
    src = df.filter(g.isin([baseline, current]) & v.isNotNull())
    per_val = src.groupBy(v.cast("double").alias("_v")).agg(
        F.sum(F.when(g == F.lit(baseline), 1).otherwise(0)).alias("_cb"),
        F.sum(F.when(g == F.lit(current), 1).otherwise(0)).alias("_cc"),
    )

    qs = [i / n_ranges for i in range(1, n_ranges)]
    edge_row = per_val.select(
        F.percentile_approx(F.col("_v"), qs, 1000).alias("_e")
    ).first()
    edges = sorted(set(edge_row["_e"] or []))
    rng = _bucketize(F.col("_v"), [float(e) for e in edges]) if edges else F.lit(0)
    per_val = per_val.withColumn("_rng", rng)

    w_off = (
        Window.orderBy(F.col("_rng").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_next = Window.orderBy(F.col("_rng").asc())
    offsets = (
        per_val.groupBy("_rng")
        .agg(
            F.sum("_cb").alias("_sb"),
            F.sum("_cc").alias("_sc"),
            F.min("_v").alias("_minv"),
        )
        .select(
            "_rng",
            F.coalesce(F.sum("_sb").over(w_off), F.lit(0)).alias("_ob"),
            F.coalesce(F.sum("_sc").over(w_off), F.lit(0)).alias("_oc"),
            F.lead("_minv").over(w_next).alias("_nextmin"),
        )
    )
    totals = per_val.agg(
        F.sum("_cb").alias("_nb"), F.sum("_cc").alias("_nc")
    )

    w_local = Window.partitionBy("_rng").orderBy(F.col("_v").asc())
    cum = w_local.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cdf = (
        per_val.join(F.broadcast(offsets.withColumnRenamed("_rng", "_orng")),
                     F.col("_rng") == F.col("_orng"))
        .crossJoin(F.broadcast(totals))
        .withColumn("_cumb", F.sum("_cb").over(cum) + F.col("_ob"))
        .withColumn("_cumc", F.sum("_cc").over(cum) + F.col("_oc"))
        .withColumn(
            "_nextv", F.coalesce(F.lead("_v").over(w_local), F.col("_nextmin"))
        )
    )
    term = (
        F.abs(F.col("_cumb") / F.col("_nb") - F.col("_cumc") / F.col("_nc"))
        * (F.col("_nextv") - F.col("_v"))
    )
    return cdf.agg(
        F.round(F.sum(term), 6).alias("w1"),
        F.first("_nb").alias("n_base"),
        F.first("_nc").alias("n_curr"),
    ).select(
        F.lit(str(baseline)).alias("baseline"),
        F.lit(str(current)).alias("curr"),
        "w1",
        "n_base",
        "n_curr",
    )


def category_churn_df(
    base: DataFrame, cur: DataFrame, col: str
) -> DataFrame:
    """Value-set drift for a categorical column: which categories are
    NEW in ``cur``, which DISAPPEARED since ``base``, which persist —
    the enum-membership complement of :func:`categorical_drift_df`
    (which scores distribution shift over the shared support, but a
    brand-new category is a schema event, not a frequency event).

    One row per category: ``(category, n_base, n_cur, kind)`` with kind
    in ('new', 'gone', 'common').  ONE data shuffle (tagged union,
    map-side-combined groupBy on the category); NULL is its own
    category, like every groupBy in this engine.
    """
    tagged = base.select(
        F.col(col).alias("category"), F.lit(1).alias("_b"), F.lit(0).alias("_c")
    ).unionByName(
        cur.select(
            F.col(col).alias("category"), F.lit(0).alias("_b"), F.lit(1).alias("_c")
        )
    )
    counts = tagged.groupBy("category").agg(
        F.sum("_b").alias("n_base"), F.sum("_c").alias("n_cur")
    )
    kind = (
        F.when(F.col("n_base") == 0, F.lit("new"))
        .when(F.col("n_cur") == 0, F.lit("gone"))
        .otherwise(F.lit("common"))
    )
    return counts.select("category", "n_base", "n_cur", kind.alias("kind"))
