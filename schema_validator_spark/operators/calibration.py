"""Classifier calibration — reliability bins and expected calibration
error (ECE) for the quality-classifier curation stage.

Threshold-based filtering (the FineWeb-Edu / CCNet shape: keep docs
with classifier score above t) silently assumes the score tracks the
true positive rate.  The standard check is the reliability diagram
(Guo et al. 2017, "On Calibration of Modern Neural Networks"):
equal-width score bins, each reporting observed positive rate vs mean
predicted score; ECE is the row-weighted absolute gap.  A curation
pipeline runs this over a labeled audit stripe before choosing t.

Reference analog: none — the reference validates one scalar at a time;
this is a table-level diagnostic over (prediction, label) pairs.

Scale shape: ONE map-side-combinable groupBy on the bin id (≤ n_bins+1
groups regardless of corpus size) — count/avg only, no windows, no
joins, no Python; the ECE rollup aggregates the ≤ n_bins+1 bin rows.
Determinism: mean_score and pos_rate are 6dp-rounded; the gap is the
exact difference OF THE ROUNDED values, so an oracle replaying the
same rounding reproduces every cell bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def calibration_report(
    df: DataFrame,
    score_col: str,
    label_col: str,
    *,
    n_bins: int = 10,
) -> DataFrame:
    """Per-bin reliability table: ``(bin, n, mean_score, pos_rate,
    gap)`` for each NON-EMPTY equal-width score bin.

    * ``bin`` — ``floor(score * n_bins)`` clamped so score 1.0 joins
      the top bin; a NULL score yields a NULL bin row (unscored rows
      are reported, never silently dropped).
    * ``mean_score`` / ``pos_rate`` — 6dp-rounded bin averages; NULL
      labels are excluded from ``pos_rate`` (avg ignores NULL) but
      still count in ``n``.
    * ``gap`` — ``pos_rate - mean_score`` over the ROUNDED values
      (exact at 6dp; positive = under-confident bin).
    """
    if n_bins < 1:
        raise ValueError("n_bins must be >= 1")
    score = F.col(score_col)
    bin_id = F.when(
        score.isNotNull(),
        F.least(
            F.floor(score * n_bins).cast("int"), F.lit(n_bins - 1)
        ),
    )
    out = (
        df.groupBy(bin_id.alias("bin"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg(score), 6).alias("mean_score"),
            F.round(
                F.avg(F.col(label_col).cast("double")), 6
            ).alias("pos_rate"),
        )
        .withColumn(
            "gap", F.round(F.col("pos_rate") - F.col("mean_score"), 6)
        )
    )
    return out


def expected_calibration_error(
    df: DataFrame,
    score_col: str,
    label_col: str,
    *,
    n_bins: int = 10,
) -> DataFrame:
    """One-row ECE summary: ``(n_bins_used, n_scored, ece)`` where
    ``ece = sum(n_b/N * |pos_rate_b - mean_score_b|)`` over non-NULL
    bins with at least one labeled row, 6dp-rounded.  Rides the
    ≤ n_bins+1-row report — the corpus is scanned once."""
    rep = calibration_report(
        df, score_col, label_col, n_bins=n_bins
    ).filter(F.col("bin").isNotNull() & F.col("gap").isNotNull())
    return rep.agg(
        F.count(F.lit(1)).alias("n_bins_used"),
        F.sum("n").alias("n_scored"),
        F.round(
            F.sum(F.abs(F.col("gap")) * F.col("n")) / F.sum("n"), 6
        ).alias("ece"),
    )


def threshold_sweep(
    df: DataFrame,
    score_col: str,
    label_col: str,
    *,
    thresholds: list[float] | None = None,
) -> DataFrame:
    """Per-cutoff curation outcomes — the numbers that actually choose
    the filter threshold t (keep docs with score >= t): one output row
    per candidate ``(threshold, n_kept, tp, fp, fn, precision, recall,
    f1)`` against a labeled audit stripe.

    * a NULL score is never kept (the comparison's NULL coalesces to
      false); NULL labels count toward ``n_kept`` but are excluded
      from tp/fp/fn (unlabeled rows can't witness either way);
    * precision/recall/f1 are 6dp-rounded; a zero denominator yields
      NULL (no kept rows / no positives), never a fake 0.

    Scale shape: the :func:`pack_sweep` pattern — ZERO row
    multiplication, |thresholds| x 4 conditional aggregates in ONE
    map-side-combined pass, then a constant-size stack unpivot of the
    single result row.
    """
    if thresholds is None:
        thresholds = [0.1, 0.3, 0.5, 0.7, 0.9]
    if not thresholds:
        raise ValueError("thresholds must be non-empty")
    if len(set(thresholds)) != len(thresholds):
        raise ValueError("duplicate thresholds")
    score = F.col(score_col)
    lab = F.col(label_col)
    aggs = []
    for i, t in enumerate(thresholds):
        kept = F.coalesce(score >= F.lit(float(t)), F.lit(False))
        aggs += [
            F.sum(kept.cast("long")).alias(f"_k_{i}"),
            F.sum((kept & (lab == True)).cast("long")).alias(f"_tp_{i}"),  # noqa: E712
            F.sum((kept & (lab == False)).cast("long")).alias(f"_fp_{i}"),  # noqa: E712
            F.sum((~kept & (lab == True)).cast("long")).alias(f"_fn_{i}"),  # noqa: E712
        ]
    row = df.agg(*aggs)
    stack = ", ".join(
        f"{float(t)}D, _k_{i}, _tp_{i}, _fp_{i}, _fn_{i}"
        for i, t in enumerate(thresholds)
    )
    un = row.selectExpr(
        f"stack({len(thresholds)}, {stack}) as "
        "(threshold, n_kept, tp, fp, fn)"
    )
    prec = F.when(
        F.col("tp") + F.col("fp") > 0,
        F.round(F.col("tp") / (F.col("tp") + F.col("fp")), 6),
    )
    rec = F.when(
        F.col("tp") + F.col("fn") > 0,
        F.round(F.col("tp") / (F.col("tp") + F.col("fn")), 6),
    )
    out = un.select(
        "threshold", "n_kept", "tp", "fp", "fn",
        prec.alias("precision"), rec.alias("recall"),
    )
    f1 = F.when(
        F.col("precision").isNotNull()
        & F.col("recall").isNotNull()
        & (F.col("precision") + F.col("recall") > 0),
        F.round(
            2 * F.col("precision") * F.col("recall")
            / (F.col("precision") + F.col("recall")), 6,
        ),
    )
    return out.withColumn("f1", f1)
