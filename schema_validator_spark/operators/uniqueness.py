"""Table-level uniqueness checks.

The reference's `unique` rule is an explicit no-op stub ("just pass",
rule/other.go:311-316) because a single-value validator cannot see the
table.  The north rule mandates the real thing:

* exact: one hash-aggregate (``groupBy(keys).count > 1``) — map-side
  partial agg, one shuffle on the keys; AQE splits skewed key groups.
* approx: ``approx_count_distinct`` (HyperLogLog++) vs ``count`` — a
  single scan with NO join and a tiny driver result; the right first
  pass at 10^12 rows before paying for the exact check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def duplicate_keys(df: DataFrame, keys: list[str]) -> DataFrame:
    """Key groups that occur more than once: (*keys, dup_count)."""
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("dup_count"))
        .filter(F.col("dup_count") > 1)
    )


def duplicate_rows(df: DataFrame, keys: list[str]) -> DataFrame:
    """Full rows participating in a duplicate key group.

    Broadcast-joins the (usually tiny) duplicate key set back; if the
    duplicate set is itself huge the optimizer falls back to a shuffled
    join under AQE.
    """
    dups = duplicate_keys(df, keys).select(*keys)
    return df.join(F.broadcast(dups), on=keys, how="left_semi")


def uniqueness_stats(
    df: DataFrame, keys: list[str], *, relative_sd: float = 0.05
) -> DataFrame:
    """Single-scan uniqueness summary: n_rows, approx distinct keys, and
    the implied duplication estimate.  Zero shuffles beyond the final
    single-row aggregate."""
    key = F.concat_ws("", *[F.col(k).cast("string") for k in keys])
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.approx_count_distinct(key, relative_sd).alias("approx_distinct_keys"),
    ).select(
        "n_rows",
        "approx_distinct_keys",
        (F.col("n_rows") - F.col("approx_distinct_keys")).alias("approx_duplicates"),
        F.round(F.col("approx_distinct_keys") / F.col("n_rows"), 6).alias(
            "approx_unique_ratio"
        ),
    )


def exact_uniqueness_stats(df: DataFrame, keys: list[str]) -> DataFrame:
    """Exact variant (one shuffle): distinct key count + duplicate rows."""
    per_key = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("c"))
    return per_key.agg(
        F.sum("c").alias("n_rows"),
        F.count(F.lit(1)).alias("n_distinct_keys"),
        F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(0)).alias(
            "n_rows_in_dup_groups"
        ),
        F.sum((F.col("c") > 1).cast("long")).alias("n_dup_keys"),
    )


def functional_dependency_violations(
    df: DataFrame, det_cols: list[str], dep_cols: list[str]
) -> DataFrame:
    """Functional-dependency check det_cols -> dep_cols: determinant
    values mapping to MORE than one distinct dependent tuple violate the
    dependency (e.g. custkey -> name must be 1:1).

    One groupBy on the determinant with a countDistinct over the
    dependent tuple — map-side partially aggregated; AQE splits skewed
    determinants.  Returns (det_cols..., n_rows, n_distinct_dep) for
    violating determinants only.
    """
    dep = F.struct(*[F.col(c) for c in dep_cols])
    return (
        df.groupBy(*det_cols)
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct(dep).alias("n_distinct_dep"),
        )
        .filter(F.col("n_distinct_dep") > 1)
    )


def functional_dependency_stats(
    df: DataFrame, det_cols: list[str], dep_cols: list[str]
) -> DataFrame:
    """One-row summary of an FD check: total determinants, violating
    determinants, violation rate."""
    per = df.groupBy(*det_cols).agg(
        F.countDistinct(F.struct(*[F.col(c) for c in dep_cols])).alias("_nd")
    )
    return per.agg(
        F.count(F.lit(1)).alias("n_determinants"),
        F.sum((F.col("_nd") > 1).cast("long")).alias("n_violating"),
    ).select(
        "n_determinants",
        "n_violating",
        F.round(F.col("n_violating") / F.col("n_determinants"), 6).alias("violation_rate"),
    )


def discover_fds(
    df: DataFrame,
    cols: list[str],
    *,
    exact_verify: bool = True,
    relative_sd: float = 0.02,
) -> DataFrame:
    """Functional-dependency DISCOVERY over column pairs — which
    ``a -> b`` does the table already satisfy?  The mining complement of
    :func:`functional_dependency_violations` (which checks one KNOWN
    dependency), feeding constraint suggestion like the profile feeds
    value bounds.

    ``a -> b`` holds iff ``|distinct(a)| == |distinct(a, b)|``.  Two
    phases, the engine's standard candidate -> verify shape:

    1. candidates: ONE single-pass aggregation of approximate distinct
       counts (HLL++, mergeable — no EXPAND blow-up from k(k-1)+k exact
       countDistincts, no per-pair scans) marks pairs whose counts agree
       within the sketch error;
    2. verify (default on): ALL pairs get an exact check batched into
       ONE aggregation job (map-side combined), so ``holds`` is exact
       for every pair — a true FD whose sketches happen to disagree by
       >3·relative_sd is never misreported as False.  The ``candidate``
       column still records the sketch verdict: at scales where the
       exact k(k-1) countDistinct EXPAND is too hot, run with
       ``exact_verify=False`` and feed only ``candidate`` pairs to
       :func:`functional_dependency_stats` — that is the 10^12-row
       shape; the batched verify here is the exact-answer shape.

    NULL is a value on both sides (``struct`` wrapping — two rows with
    NULL region still agree on region), matching groupBy semantics.
    Returns one row per ordered pair: ``(determinant, dependent,
    n_det_approx, n_pair_approx, candidate, holds)`` — ``holds`` NULL
    when verification is off.
    """
    from itertools import permutations

    if len(cols) < 2:
        raise ValueError("discover_fds needs at least two columns")
    aggs = []
    for c in cols:
        aggs.append(
            F.approx_count_distinct(F.struct(F.col(c)), relative_sd)
            .alias(f"d\x00{c}")
        )
    for a, b in permutations(cols, 2):
        if a < b:  # |distinct(a,b)| is symmetric; compute once
            aggs.append(
                F.approx_count_distinct(
                    F.struct(F.col(a), F.col(b)), relative_sd
                ).alias(f"p\x00{a}\x00{b}")
            )
    row = df.agg(*aggs).collect()[0].asDict()

    margin = 1.0 + 3.0 * relative_sd
    cands = []
    pre = {}
    for a, b in permutations(cols, 2):
        key = f"p\x00{a}\x00{b}" if a < b else f"p\x00{b}\x00{a}"
        nd, np_ = row[f"d\x00{a}"], row[key]
        candidate = np_ <= nd * margin
        pre[(a, b)] = (nd, np_, candidate)
        if exact_verify:
            # verify EVERY pair, not just sketch candidates: sketch
            # pruning must never turn a true FD into a hard False
            cands.append((a, b))

    # verify in ONE exact aggregation: a -> b holds iff
    # |distinct(a)| == |distinct(a, b)| (struct-wrapped so NULL counts).
    # Exact count_distincts EXPAND the input map-side by #aggregates —
    # one batched job instead of one groupBy job per pair; at scales
    # where even that is too hot, use exact_verify=False + candidate
    # pruning (see docstring).
    verdicts: dict[tuple[str, str], bool] = {}
    if cands:
        vaggs = []
        need = sorted({a for a, _ in cands})
        for a in need:
            vaggs.append(
                F.countDistinct(F.struct(F.col(a))).alias(f"va\x00{a}")
            )
        for a, b in cands:
            vaggs.append(
                F.countDistinct(F.struct(F.col(a), F.col(b)))
                .alias(f"vp\x00{a}\x00{b}")
            )
        vrow = df.agg(*vaggs).collect()[0].asDict()
        for a, b in cands:
            verdicts[(a, b)] = (
                vrow[f"va\x00{a}"] == vrow[f"vp\x00{a}\x00{b}"]
            )

    out = []
    for a, b in permutations(cols, 2):
        nd, np_, candidate = pre[(a, b)]
        holds = verdicts[(a, b)] if exact_verify else None
        out.append((a, b, nd, np_, candidate, holds))
    return df.sparkSession.createDataFrame(
        out,
        "determinant string, dependent string, n_det_approx long, "
        "n_pair_approx long, candidate boolean, holds boolean",
    )
