"""Preference-pair lint — the DPO/RLHF data gate: a (prompt, chosen,
rejected) triple carries training signal only if all three parts are
present and the two completions actually DIFFER.  Pairs that are
byte-identical — or identical after whitespace/case folding, the
near-duplicates reward-model papers drop — produce a zero-gradient
(or noise-gradient) comparison and must be quarantined before
tokenization.

Reference anchor: the multi-field conditional shape mirrors the
reference's cross-field rules (schema-validator rule/field.go eqfield
/ nefield — `nefield` IS the pairwise not-equal rule, lifted here to
a priority chain with a fold); part of the engine-extension surface
SURVEY §2.9 mandates.

Scale shape: ZERO shuffles, zero Python, zero joins — one codegen
projection per row; the fold (trim + whitespace collapse + lower) is
computed once per side via shared expressions inside a single
projection (codegen CSE dedupes the identical subtrees).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: first_error codes in priority order
ERROR_PRIORITY = [
    "missing_prompt",
    "missing_chosen",
    "missing_rejected",
    "identical",
    "identical_folded",
]


def _fold(c: Column) -> Column:
    """Whitespace/case fold: trim, collapse runs, lowercase."""
    return F.lower(F.regexp_replace(F.trim(c), r"\s+", " "))


def preference_lint(
    df: DataFrame,
    id_cols: list[str],
    prompt_col: str,
    chosen_col: str,
    rejected_col: str,
) -> DataFrame:
    """Per-pair audit: ``(ids..., n_chars_prompt, n_chars_chosen,
    n_chars_rejected, first_error, keep)``.

    ``identical`` = byte-equal completions; ``identical_folded`` =
    equal after trim + whitespace-run collapse + lowercase (the pair
    differs only in formatting — no preference signal).  Lengths are
    raw character counts (0 for NULL).
    """
    p, c, r = (F.col(prompt_col), F.col(chosen_col), F.col(rejected_col))

    def blank(x: Column) -> Column:
        return x.isNull() | (F.trim(x) == "")

    first_error = (
        F.when(blank(p), F.lit("missing_prompt"))
        .when(blank(c), F.lit("missing_chosen"))
        .when(blank(r), F.lit("missing_rejected"))
        .when(c == r, F.lit("identical"))
        .when(_fold(c) == _fold(r), F.lit("identical_folded"))
        .otherwise(F.lit("ok"))
    )
    return df.select(
        *[F.col(x) for x in id_cols],
        F.coalesce(F.length(p), F.lit(0)).alias("n_chars_prompt"),
        F.coalesce(F.length(c), F.lit(0)).alias("n_chars_chosen"),
        F.coalesce(F.length(r), F.lit(0)).alias("n_chars_rejected"),
        first_error.alias("first_error"),
        (first_error == "ok").cast("int").alias("keep"),
    )
