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
