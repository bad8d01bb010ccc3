"""Dedup-tier evaluation — precision/recall of a candidate-pair frame
against a ground-truth pair frame.  Every approximate tier in this
repo (MinHash, SimHash, SRP banding, image/audio hashes) ships with a
pinned exactness argument; this operator is the RUNTIME version of
that check for data the tests never saw: sample the corpus, compute
an exact ground truth on the sample, and score the production tier's
pairs against it — the audit a 100 TB shop runs before trusting a new
dedup configuration.

Pairs are canonicalized (unordered: (least, greatest)), de-duplicated,
and self-pairs/NULL ids dropped on BOTH sides, so the metrics are
insensitive to orientation and multiplicity.

Scale shape: two pair-grain distincts + one pair-grain full-outer
equi-join + a single 1-row aggregate — all at CANDIDATE volume (the
sampled audit sets), never corpus volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _canon(df: DataFrame, id_a: str, id_b: str) -> DataFrame:
    a, b = F.col(id_a), F.col(id_b)
    return (
        df.filter(a.isNotNull() & b.isNotNull() & (a != b))
        .select(
            F.least(a, b).alias("_pa"), F.greatest(a, b).alias("_pb")
        )
        .distinct()
    )


def pair_metrics(
    pred: DataFrame,
    truth: DataFrame,
    *,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """ONE row: ``(n_pred, n_true, n_hit, precision, recall, f1)``.

    ``precision = hit/pred``, ``recall = hit/true`` (0.0 when the
    denominator is empty), ``f1 = 2PR/(P+R)`` (0.0 when both are 0).
    Column names ``id_a``/``id_b`` apply to both frames.
    """
    p = _canon(pred, id_a, id_b).withColumn("_p", F.lit(1))
    t = _canon(truth, id_a, id_b).withColumn("_t", F.lit(1))
    j = p.join(t, on=["_pa", "_pb"], how="full_outer")
    # coalesce AFTER the sums too: over a fully-empty join F.sum
    # yields NULL, and the audit must report zeros (count() semantics)
    agg = j.agg(
        F.coalesce(F.sum(F.coalesce(F.col("_p"), F.lit(0))), F.lit(0))
        .cast("long").alias("n_pred"),
        F.coalesce(F.sum(F.coalesce(F.col("_t"), F.lit(0))), F.lit(0))
        .cast("long").alias("n_true"),
        F.coalesce(
            F.sum(
                (F.col("_p").isNotNull()
                 & F.col("_t").isNotNull()).cast("long")
            ),
            F.lit(0),
        ).cast("long").alias("n_hit"),
    )
    hit = F.col("n_hit").cast("double")
    prec = F.when(
        F.col("n_pred") > 0, hit / F.col("n_pred").cast("double")
    ).otherwise(F.lit(0.0))
    rec = F.when(
        F.col("n_true") > 0, hit / F.col("n_true").cast("double")
    ).otherwise(F.lit(0.0))
    out = agg.select(
        "n_pred", "n_true", "n_hit",
        prec.alias("precision"), rec.alias("recall"),
    )
    p_, r_ = F.col("precision"), F.col("recall")
    f1 = F.when(
        p_ + r_ > 0, 2.0 * p_ * r_ / (p_ + r_)
    ).otherwise(F.lit(0.0))
    return out.select(
        "n_pred", "n_true", "n_hit", "precision", "recall",
        f1.alias("f1"),
    )
