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
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from . import text as X


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
    if not blocked_terms:
        raise ValueError("empty blocklist")
    for c in ("_toks", "_hits"):
        if c in df.columns:
            raise ValueError(f"reserved temp column {c!r} present in input")
    terms = sorted({t.lower() for t in blocked_terms})
    toks = X.tokens(F.lower(F.coalesce(F.col(text_col), F.lit(""))))
    hits = F.filter(F.col("_toks"), lambda t: t.isin(*terms))
    n_tok = F.size(F.col("_toks"))
    n_hit = F.size(F.col("_hits"))
    keep = F.when(
        n_hit * F.lit(1000000) <= F.lit(int(max_hit_rate * 1e6)) * n_tok,
        F.lit(1),
    ).otherwise(F.lit(0))
    return (
        df.withColumn("_toks", toks)
        .withColumn("_hits", hits)
        .select(
            *[F.col(c) for c in id_cols],
            n_tok.alias("n_tokens"),
            n_hit.alias("n_blocked"),
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
    gate (same semantics as ``blocked_term_stats().keep == 1``), all
    original columns preserved."""
    if not blocked_terms:
        raise ValueError("empty blocklist")
    for c in ("_toks", "_hits"):
        if c in df.columns:
            raise ValueError(f"reserved temp column {c!r} present in input")
    terms = sorted({t.lower() for t in blocked_terms})
    toks = X.tokens(F.lower(F.coalesce(F.col(text_col), F.lit(""))))
    hits = F.filter(F.col("_toks"), lambda t: t.isin(*terms))
    n_tok = F.size(F.col("_toks"))
    n_hit = F.size(F.col("_hits"))
    ok = n_hit * F.lit(1000000) <= F.lit(int(max_hit_rate * 1e6)) * n_tok
    return (
        df.withColumn("_toks", toks)
        .withColumn("_hits", hits)
        .filter(ok)
        .drop("_toks", "_hits")
    )
