"""fastText-style linear quality classifier — the standard post-heuristic
curation stage (Joulin et al. 2016 "Bag of Tricks"; the CCNet/LLaMA
wiki-vs-crawl filter shape).

Model: hashed bag-of-features (word unigrams + bigrams), a weight per
feature, score = sigmoid(bias + mean(weight(f))).  Everything is ONE
per-row Spark SQL expression — no explode, no join, no shuffle, no
Python — so the scoring stage is free at any corpus size (it rides the
same scan as the rest of the curation funnel and stays inside
whole-stage codegen).

Weights here are synthetic-deterministic, derived from md5 of the
feature string + seed (uniform in [-0.5, 0.5)).  A production deployment
would swap ``feature_weight`` for a lookup into a learned broadcast
vector; the feature extraction, normalization, and funnel plumbing are
identical.  md5 (not xxhash64) keeps the scorer engine-portable — the
DuckDB oracle in ``__spark_entry__.py`` replays it bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from . import text as X

#: Denominator turning the first 8 md5 hex digits into a uniform [0, 1).
_HASH_SPACE = float(1 << 32)


def hashed_features(col: Column, *, pre_tokenized: bool = False) -> Column:
    """array<string> of word unigrams + space-joined bigrams (the
    fastText feature set at wordNgrams=2).

    PERF: codegen CSE does not reach inside lambda scopes, so handing
    raw text here re-runs the regex tokenization per bigram element —
    O(tokens²) per row (the same pitfall CLAUDE.md records for gopher).
    Materialize the token array once (``withColumn`` + ``X.tokens``) and
    pass it with ``pre_tokenized=True``; ``classify_documents`` does
    exactly that, raw-text input stays correct but is the slow path."""
    if pre_tokenized:
        toks = F.coalesce(col, F.array().cast("array<string>"))
    else:
        toks = X.tokens(F.coalesce(col, F.lit("")))
    n = F.size(toks)
    bigrams = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.concat(
                F.element_at(toks, i), F.lit(" "), F.element_at(toks, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.concat(toks, bigrams)


def feature_weight(feat: Column, seed: str) -> Column:
    """Deterministic synthetic weight in [-0.5, 0.5): first 8 md5 hex
    digits of (feature || seed) as a uniform."""
    h = F.substring(F.md5(F.concat(feat, F.lit(seed))), 1, 8)
    return F.conv(h, 16, 10).cast("double") / F.lit(_HASH_SPACE) - F.lit(0.5)


def classifier_logit(
    col: Column, *, seed: str = "qc-v1", bias: float = 0.0,
    pre_tokenized: bool = False,
) -> Column:
    """Linear score before the sigmoid: bias + mean feature weight
    (mean, not sum — fastText normalizes by feature count so score is
    length-invariant).  Zero features -> logit = bias."""
    feats = hashed_features(col, pre_tokenized=pre_tokenized)
    total = F.aggregate(
        feats,
        F.lit(0.0),
        lambda acc, t: acc + feature_weight(t, seed),
    )
    return F.lit(bias) + total / F.greatest(F.size(feats), F.lit(1))


def classifier_score(
    col: Column, *, seed: str = "qc-v1", bias: float = 0.0,
    pre_tokenized: bool = False,
) -> Column:
    """Quality probability in (0, 1): sigmoid(classifier_logit)."""
    z = classifier_logit(col, seed=seed, bias=bias, pre_tokenized=pre_tokenized)
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def classify_documents(
    df: DataFrame,
    text_col: str,
    *,
    seed: str = "qc-v1",
    bias: float = 0.0,
    threshold: float | None = None,
    out_col: str = "qc_score",
) -> DataFrame:
    """Append the classifier score (and, given a threshold, a ``keep``
    flag).  Per-row expression only — composes into any plan without a
    shuffle."""
    toks_col = "_qc_toks"
    while toks_col in df.columns:  # collision-proof temp name
        toks_col += "_"
    out = (
        df.withColumn(toks_col, X.tokens(F.coalesce(F.col(text_col), F.lit(""))))
        .withColumn(
            out_col,
            classifier_score(
                F.col(toks_col), seed=seed, bias=bias, pre_tokenized=True
            ),
        )
        .drop(toks_col)
    )
    if threshold is not None:
        out = out.withColumn(out_col + "_keep", F.col(out_col) >= F.lit(threshold))
    return out
