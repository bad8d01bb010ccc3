"""Word-list content gate — the C4 "bad words" curation stage
(Raffel et al. 2020 drop any page containing a term from a public
blocklist; Penedo et al. 2023 RefinedWeb keeps the same stage with
soft thresholds).  Given a caller-supplied blocklist, emit per-document
hit statistics and the keep verdict so the gate can run strict
(C4: any hit drops) or soft (rate-thresholded) without recomputing.

The blocklist is a REQUIRED argument: the widely-used public list
(LDNOOBW) ships separately under its own license and a shipped default
would silently pin one language's list — callers pass their own, tests
and the driver query plant synthetic terms.

Reference anchor: the reference gates single values per rule
(schema-validator rule/*.go); corpus-level content gating is part of
the engine-extension surface SURVEY §2.9 mandates for training-data
curation.

Scale shape: ZERO shuffles, zero Python — one codegen projection per
row.  Tokens are materialized once (lambda-CSE pitfall, CLAUDE.md);
the blocklist compiles to an ``isin`` probe (Catalyst turns >10-element
lists into a JVM hash-set ``InSet``), so even multi-thousand-term lists
are an O(1) hash probe per token, no join anywhere.  The single lambda
``filter`` that extracts hit occurrences runs ONCE over the
materialized array (its result is itself materialized before the four
consumers), so the interpreted-HOF cost is paid once per row.

The rate comparison is integer cross-multiplication IN LONGS —
``n_hit * 1_000_000 <= scaled_rate * n_tok`` with 32-bit operands
overflows at ~2·10⁹ (a half-MB document's token count times the
scaled rate), silently flipping verdicts; and the scaled rate is
``round()``ed, not truncated, so rates whose float repr sits just
below the decimal (0.3 -> 299999.99…) don't shift the boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import text as X


def _gate_parts(
    text_col: str, blocked_terms: list[str], max_hit_rate: float
):
    """Shared (toks_expr, hits_expr, keep_predicate) for both forms —
    keep_predicate reads the materialized ``_toks``/``_hits``."""
    if not blocked_terms:
        raise ValueError("empty blocklist")
    terms = sorted({t.lower() for t in blocked_terms})
    toks = X.tokens(F.lower(F.coalesce(F.col(text_col), F.lit(""))))
    hits = F.filter(F.col("_toks"), lambda t: t.isin(*terms))
    n_tok = F.size(F.col("_toks")).cast("long")
    n_hit = F.size(F.col("_hits")).cast("long")
    scaled = int(round(max_hit_rate * 1e6))
    ok = n_hit * F.lit(1000000).cast("long") <= F.lit(scaled).cast(
        "long"
    ) * n_tok
    return toks, hits, ok


def _check_reserved(df: DataFrame) -> None:
    for c in ("_toks", "_hits"):
        if c in df.columns:
            raise ValueError(f"reserved temp column {c!r} present in input")


def blocked_term_stats(
    df: DataFrame,
    id_cols: list[str],
    text_col: str,
    blocked_terms: list[str],
    *,
    max_hit_rate: float = 0.0,
) -> DataFrame:
    """Per-document blocklist audit: ``(ids..., n_tokens, n_blocked,
    n_blocked_distinct, blocked_found, keep)``.

    Matching is exact lowercase whitespace-token membership (the C4
    semantics: a blocked term inside a longer word does NOT match —
    "class" never trips a list containing "ass").  ``blocked_found``
    is the sorted distinct hit list joined with ``,`` so the row is
    hashable.  ``keep = 1`` iff the hit rate (occurrences / tokens) is
    <= ``max_hit_rate`` — the default 0.0 is C4's strict any-hit-drops
    rule; RefinedWeb-style soft gating passes e.g. 0.001.  Empty/NULL
    text has no tokens, no hits, and keeps.
    """
    _check_reserved(df)
    toks, hits, ok = _gate_parts(text_col, blocked_terms, max_hit_rate)
    keep = F.when(ok, F.lit(1)).otherwise(F.lit(0))
    return (
        df.withColumn("_toks", toks)
        .withColumn("_hits", hits)
        .select(
            *[F.col(c) for c in id_cols],
            F.size(F.col("_toks")).alias("n_tokens"),
            F.size(F.col("_hits")).alias("n_blocked"),
            F.size(F.array_distinct(F.col("_hits"))).alias(
                "n_blocked_distinct"
            ),
            F.array_join(
                F.array_sort(F.array_distinct(F.col("_hits"))), ","
            ).alias("blocked_found"),
            keep.alias("keep"),
        )
    )


def filter_blocked_terms(
    df: DataFrame,
    id_cols: list[str],
    text_col: str,
    blocked_terms: list[str],
    *,
    max_hit_rate: float = 0.0,
) -> DataFrame:
    """C4 gate form: the input rows whose documents pass the word-list
    gate (same semantics as ``blocked_term_stats().keep == 1`` — the
    predicate is literally the same shared expression), all original
    columns preserved."""
    _check_reserved(df)
    toks, hits, ok = _gate_parts(text_col, blocked_terms, max_hit_rate)
    return (
        df.withColumn("_toks", toks)
        .withColumn("_hits", hits)
        .filter(ok)
        .drop("_toks", "_hits")
    )


def vocab_coverage_stats(
    df: DataFrame,
    id_cols: list[str],
    text_col: str,
    vocab: list[str],
) -> DataFrame:
    """Per-document vocabulary coverage — the tokenizer-migration /
    UNK-rate audit (how much of the corpus falls outside a reference
    vocabulary): ``(ids..., n_tokens, n_oov, oov_rate)`` where
    matching is exact lowercase whitespace-token membership (the same
    InSet probe as the blocklist gate — O(1) per token for any vocab
    size that fits the closure).

    Zero shuffles, zero Python; NULL/empty text has no tokens and
    ``oov_rate = 0.0``.
    """
    _check_reserved(df)
    if not vocab:
        raise ValueError("empty vocab")
    clash = {"n_tokens", "n_oov", "oov_rate"} & set(id_cols)
    if clash:
        raise ValueError(f"id columns collide with output names: {clash}")
    terms = sorted({t.lower() for t in vocab})
    toks = X.tokens(F.lower(F.coalesce(F.col(text_col), F.lit(""))))
    oov = F.filter(F.col("_toks"), lambda t: ~t.isin(*terms))
    n_tok = F.size(F.col("_toks")).cast("long")
    n_oov = F.size(F.col("_hits")).cast("long")
    rate = F.when(
        n_tok > 0, n_oov.cast("double") / n_tok.cast("double")
    ).otherwise(F.lit(0.0))
    return (
        df.withColumn("_toks", toks)
        .withColumn("_hits", oov)
        .select(
            *[F.col(c) for c in id_cols],
            n_tok.alias("n_tokens"),
            n_oov.alias("n_oov"),
            rate.alias("oov_rate"),
        )
    )


def top_oov_terms(
    df: DataFrame,
    text_col: str,
    vocab: list[str],
    *,
    top_k: int = 20,
) -> DataFrame:
    """Corpus-grain OOV ranking: the ``top_k`` most frequent
    out-of-vocabulary tokens ``(token, n)`` — what a tokenizer
    retrain would add first.  One map-side-combinable groupBy over
    the exploded OOV tokens; deterministic ties (n desc, token asc)."""
    if not vocab:
        raise ValueError("empty vocab")
    if top_k < 1:
        raise ValueError("top_k must be >= 1")
    terms = sorted({t.lower() for t in vocab})
    toks = X.tokens(F.lower(F.coalesce(F.col(text_col), F.lit(""))))
    ex = df.select(F.explode(toks).alias("token")).filter(
        ~F.col("token").isin(*terms)
    )
    return (
        ex.groupBy("token")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy(F.col("n").desc(), F.col("token").asc())
        .limit(top_k)
    )
