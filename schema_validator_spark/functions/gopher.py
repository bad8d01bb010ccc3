"""Gopher/MassiveText-style document quality + repetition signals.

The standard pre-training quality gate (cf. the MassiveText filtering
rules in the Gopher paper): per-document token counts, word-shape and
symbol ratios, repetition fractions (duplicate lines / word n-grams),
and a stopword-presence check, combined into a keep/drop decision.

Everything is a pure Spark SQL expression over one row — whole-stage
codegen, no Python, no shuffle — so the gate composes with validation,
cleaning and dedup in a single scan.  All string ops are engine-portable
(the DuckDB oracle for ``gopher_quality`` re-derives every metric).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from . import text as X

# Gopher's stopword-presence rule: a natural-language document should
# contain at least STOPWORD_MIN of these common English function words.
STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]
STOPWORD_MIN = 2


def _occurrences(s: Column, sub: str) -> Column:
    """Occurrence count of a literal substring — portable arithmetic
    (length difference), no regex dialect involved."""
    return (
        (F.length(s) - F.length(F.replace(s, F.lit(sub), F.lit("")))) / len(sub)
    ).cast("long")


def _tokens_of(text: Column) -> Column:
    """Tokens of the NULL-coalesced text — every metric MUST go through
    this so NULL text yields 0-valued metrics (matching the DuckDB
    oracle), never NULL-propagated ones."""
    return X.tokens(F.coalesce(text, F.lit("")))


# Token-statistic metrics are computed straight off the TEXT with
# regexp_count/regexp_replace arithmetic — these stay inside whole-stage
# codegen.  The earlier array forms (filter/transform/aggregate over a
# token array) are higher-order functions, which NEVER codegen: each
# token cost an interpreted closure call, ~8 HOF passes x n_tokens per
# row (measured 41s for 50k x 90-token docs vs ~4s after this change).
# Values are IDENTICAL: token = \S+ run, exactly what tokens() splits.

def _n_tokens_cg(s: Column) -> Column:
    return F.regexp_count(s, F.lit(r"\S+"))


def _mean_word_len_cg(s: Column) -> Column:
    # sum(length(token)) == count of non-whitespace chars
    n = _n_tokens_cg(s)
    total = F.length(F.regexp_replace(s, r"\s+", ""))
    return F.when(n > 0, F.round(total / n, 6)).otherwise(F.lit(0.0))


def _alpha_words_cg(s: Column) -> Column:
    # one non-overlapping match per token that contains >= 1 letter: the
    # match must start at a token boundary and greedily consumes the
    # whole token, so no token is counted twice
    return F.regexp_count(s, F.lit(r"(?:^|(?<=\s))\S*[A-Za-z]\S*"))


def _alpha_word_frac_cg(s: Column) -> Column:
    n = _n_tokens_cg(s)
    return F.when(n > 0, F.round(_alpha_words_cg(s) / n, 6)).otherwise(F.lit(0.0))


def _stopword_hits_cg(s: Column) -> Column:
    # presence test per stopword == |distinct lowercased tokens ∩ list|
    hits = [
        F.when(s.rlike(rf"(?i)(^|\s){w}(\s|$)"), 1).otherwise(0)
        for w in STOPWORDS
    ]
    out = hits[0]
    for h in hits[1:]:
        out = out + h
    return out


def _dup_ngram_frac_from(toks: Column, n: int) -> Column:
    """Repeated-n-gram fraction over a MATERIALIZED token-array column.
    Built with the shifted-zip_with shape (see text.word_shingles): the
    index form paid an interpreted Slice allocation + concat_ws per
    gram; here each gram is one concat of two attribute lookups."""
    cnt = F.size(toks)
    out = F.slice(toks, 1, X.BIG_LEN)
    for j in range(1, n):
        out = F.zip_with(
            out,
            F.slice(toks, j + 1, X.BIG_LEN),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
    grams = F.filter(out, lambda x: x.isNotNull())
    total = F.size(grams)
    return F.when(
        cnt >= n,
        F.round((total - F.size(F.array_distinct(grams))) / total, 6),
    ).otherwise(F.lit(0.0))


def mean_word_length(text: Column) -> Column:
    return _mean_word_len_cg(F.coalesce(text, F.lit("")))


def symbol_word_ratio(text: Column) -> Column:
    """(# of '#' and '...' occurrences) per token — Gopher drops docs
    where this exceeds ~0.1 (boilerplate/markup tells)."""
    s = F.coalesce(text, F.lit(""))
    n = _n_tokens_cg(s)
    syms = _occurrences(s, "#") + _occurrences(s, "...")
    return F.when(n > 0, F.round(syms / n, 6)).otherwise(F.lit(0.0))


def alpha_word_fraction(text: Column) -> Column:
    """Fraction of tokens containing at least one alphabetic character."""
    return _alpha_word_frac_cg(F.coalesce(text, F.lit("")))


def duplicate_line_fraction(text: Column) -> Column:
    lines = F.split(F.coalesce(text, F.lit("")), "\n")
    n = F.size(lines)
    return F.when(
        n > 0, F.round((n - F.size(F.array_distinct(lines))) / n, 6)
    ).otherwise(F.lit(0.0))


def duplicate_ngram_fraction(text: Column, n: int = 2) -> Column:
    """Fraction of word n-grams that are repeats of an earlier n-gram."""
    return _dup_ngram_frac_from(_tokens_of(text), n)


def stopword_hits(text: Column) -> Column:
    return _stopword_hits_cg(F.coalesce(text, F.lit("")))


def gopher_metrics(df: DataFrame, text_col: str) -> DataFrame:
    """Adds the Gopher signal columns.

    The token-statistic metrics (n_tokens, mean_word_len, symbol_ratio,
    alpha_word_frac, stopword_hits) are regexp_count/replace arithmetic
    straight off the text — whole-stage codegen, no token array at all.
    Only the repetition metrics (dup 2/3-gram fractions) need the token
    ARRAY; it is materialized ONCE into a shared temp column and both
    read it (HOFs eval interpreted, so the array passes are the dear
    ones — keep them to the minimum two).  Still one narrow projection
    pipeline, no shuffle."""
    t = F.col(text_col)
    s = F.coalesce(t, F.lit(""))
    # collision-proof temp name: an input that already has `_toks` must
    # not be clobbered-and-dropped
    toks_col = "_toks"
    while toks_col in df.columns:
        toks_col += "_"
    with_toks = df.withColumn(toks_col, _tokens_of(t))
    toks = F.col(toks_col)
    n = _n_tokens_cg(s)
    syms = _occurrences(s, "#") + _occurrences(s, "...")
    return with_toks.withColumns({
        "n_tokens": n,
        "mean_word_len": _mean_word_len_cg(s),
        "symbol_ratio": F.when(n > 0, F.round(syms / n, 6)).otherwise(0.0),
        "alpha_word_frac": _alpha_word_frac_cg(s),
        "dup_line_frac": duplicate_line_fraction(t),
        "dup_2gram_frac": _dup_ngram_frac_from(toks, 2),
        "dup_3gram_frac": _dup_ngram_frac_from(toks, 3),
        "stopword_hits": _stopword_hits_cg(s),
    }).drop(toks_col)


def gopher_keep(
    *,
    min_tokens: int = 50,
    max_tokens: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    min_alpha_word_frac: float = 0.8,
    max_dup_line_frac: float = 0.3,
    max_dup_2gram_frac: float = 0.2,
    min_stopword_hits: int = STOPWORD_MIN,
) -> Column:
    """The combined keep decision over gopher_metrics columns (Gopher's
    published thresholds as defaults)."""
    return (
        F.col("n_tokens").between(min_tokens, max_tokens)
        & F.col("mean_word_len").between(min_mean_word_len, max_mean_word_len)
        & (F.col("symbol_ratio") <= max_symbol_ratio)
        & (F.col("alpha_word_frac") >= min_alpha_word_frac)
        & (F.col("dup_line_frac") <= max_dup_line_frac)
        & (F.col("dup_2gram_frac") <= max_dup_2gram_frac)
        & (F.col("stopword_hits") >= min_stopword_hits)
    )
