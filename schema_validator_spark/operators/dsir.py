"""DSIR — Data Selection with Importance Resampling (Xie et al.
2023): score every raw document by how target-like its hashed n-gram
features are, ``log p_target(doc) - log p_raw(doc)`` under two
bag-of-hashed-features unigram models, then keep/resample by weight.
The public recipe behind "select web data that looks like Wikipedia /
books" — the quality-classifier alternative that needs no labels,
only a target corpus sample.

Features: whitespace unigrams + adjacent bigrams, hashed into
``n_buckets`` via md5 (md5 on both engines — the oracle replays the
bucketing bit-exactly; never Spark's murmur ``hash()``, which DuckDB
cannot reproduce).  Bucket log-probability uses add-one smoothing:
``ln((count[b] + 1) / (total + n_buckets))``.

Scale shape — the corpus NEVER shuffles for scoring: the two models
are bucket-grain aggregates (map-side-combinable feature-count
groupBys whose shuffles carry <= n_buckets rows per partition), each
collected to the driver (bounded by n_buckets, a parameter — not
data), turned into ONE literal weight array of 6dp-scaled longs, and
scoring is a pure projection: ``aggregate(features, 0L, acc +
weights[bucket(f)])``.  Feature arrays are bound once (lambda-CSE
pitfall, CLAUDE.md).  Integer weight sums make the per-doc score an
EXACT integer any engine reproduces given the same weights; the
weights themselves round ln() at 6dp (driver libm vs oracle libm —
same box, same doubles; the repo-wide float-oracle convention).

Reference anchor: model-vs-model scoring generalizes the reference's
single-value rule gate to corpus-level selection (SURVEY §2.9
engine-extension surface).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import text as X


def _features(text_col: str) -> Column:
    """Unigrams + adjacent bigrams (with multiplicity), tokens bound
    once; empty/NULL text -> empty array."""
    toks = X.tokens(F.lower(F.coalesce(F.col(text_col), F.lit(""))))

    def build(t: Column) -> Column:
        # X.BIG_LEN, not INT_MAX: slice(start + INT_MAX) overflows
        # inside zip_with's bounds math and yields all-NULL pairs
        bigrams = F.filter(
            F.zip_with(
                t,
                F.slice(t, 2, X.BIG_LEN),
                lambda a, b: F.concat(a, F.lit(" "), b),
            ),
            lambda x: x.isNotNull(),
        )
        return F.concat(t, bigrams)

    return F.element_at(F.transform(F.array(toks), build), 1)


def _bucket(feat: Column, n_buckets: int, salt: str) -> Column:
    return (
        F.conv(F.substring(F.md5(F.concat(feat, F.lit(salt))), 1, 8),
               16, 10).cast("long") % n_buckets
    ).cast("int")


def _bucket_counts(
    df: DataFrame, text_col: str, n_buckets: int, salt: str
) -> dict[int, int]:
    """Bucket-grain feature counts, collected (bounded by n_buckets)."""
    rows = (
        df.select(F.explode(_features(text_col)).alias("f"))
        .select(_bucket(F.col("f"), n_buckets, salt).alias("b"))
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    return {r["b"]: r["c"] for r in rows}


def dsir_weights(
    df: DataFrame,
    id_cols: list[str],
    text_col: str,
    target_df: DataFrame,
    target_text_col: str,
    *,
    n_buckets: int = 10_000,
    salt: str = "v1",
) -> DataFrame:
    """Per-document importance scores: ``(ids..., n_features,
    score_e6)`` where ``score_e6 = Σ_f w_e6[bucket(f)]`` and
    ``w_e6[b] = round(1e6 * (ln p_target[b] - ln p_raw[b]))`` with
    add-one smoothing.  Positive = more target-like.  Documents with
    no features score 0.  Raw-model counts come from ``df`` itself
    (the standard DSIR setup: raw = the corpus being selected from).
    """
    if not 2 <= n_buckets <= 1_000_000:
        raise ValueError("n_buckets must be in [2, 1e6]")
    for c in ("_feats", "_score"):
        if c in df.columns:
            raise ValueError(f"reserved temp column {c!r} present in input")
    tc = _bucket_counts(target_df, target_text_col, n_buckets, salt)
    rc = _bucket_counts(df, text_col, n_buckets, salt)
    t_total = sum(tc.values()) + n_buckets
    r_total = sum(rc.values()) + n_buckets
    w = [
        int(round(1e6 * (
            math.log((tc.get(b, 0) + 1) / t_total)
            - math.log((rc.get(b, 0) + 1) / r_total)
        )))
        for b in range(n_buckets)
    ]
    warr = F.array(*[F.lit(x).cast("long") for x in w])

    feats = F.col("_feats")
    score = F.aggregate(
        feats,
        F.lit(0).cast("long"),
        lambda acc, f: acc
        + F.element_at(
            warr, _bucket(f, n_buckets, salt) + F.lit(1)
        ),
    )
    return (
        df.withColumn("_feats", _features(text_col))
        .select(
            *[F.col(c) for c in id_cols],
            F.size(feats).alias("n_features"),
            score.alias("score_e6"),
        )
    )
