"""Unsafe-API usage scan over code content — the security-audit
sibling of operators/secrets.py (secrets finds leaked CREDENTIALS;
this finds DANGEROUS CALL SITES — the Bandit / Semgrep rule classes a
code-corpus curator surfaces before training, so generated code
doesn't learn eval-on-input or strcpy as normal practice).

Patterns are per-lang lexical shapes of the classic audit classes
(code injection, unsafe deserialization, shell execution, unsafe
string functions, weak hashes).  All RE2-safe — no backreferences, no
lookaround — so the DuckDB oracle replays them verbatim.  Lexical
tier, documented: a match inside a comment or string literal counts
(same trade as operators/complexity.py); an unregistered lang yields
no findings (``eval(`` in Ruby is not claimed — mirrors
COMMENT_SYNTAX's contract).

Scale shape: ``unsafe_findings`` mirrors secret_findings — per-lang
counts chosen by a lazy conditional (only the row's lang branch
executes its regexes), ONE stack-unpivot, then a filter; zero joins,
zero Python.  ``unsafe_rollup`` adds one map-side-combinable groupBy
bounded by langs x classes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: lang -> ordered (api_class, RE2-safe pattern).  Class names are
#: output values — stable.  Single source of truth for the oracle.
UNSAFE_PATTERNS: dict[str, list[tuple[str, str]]] = {
    "py": [
        ("EVAL_EXEC", r"\b(eval|exec)\s*\("),
        ("PICKLE_LOAD", r"\bpickle\.loads?\s*\("),
        ("YAML_UNSAFE_LOAD", r"\byaml\.load\s*\("),
        ("SHELL_TRUE", r"\bshell\s*=\s*True\b"),
        ("OS_SYSTEM", r"\bos\.system\s*\("),
        ("WEAK_HASH", r"\bhashlib\.(md5|sha1)\s*\("),
    ],
    "js": [
        ("EVAL_EXEC", r"\beval\s*\("),
        ("NEW_FUNCTION", r"\bnew\s+Function\s*\("),
        ("INNER_HTML", r"\.innerHTML\s*="),
        ("CHILD_PROCESS_EXEC", r"\bexec(Sync)?\s*\("),
    ],
    "c": [
        ("UNSAFE_STRING_FN", r"\b(strcpy|strcat|sprintf|gets)\s*\("),
        ("SYSTEM_CALL", r"\bsystem\s*\("),
    ],
    "go": [
        ("UNSAFE_POINTER", r"\bunsafe\.Pointer\b"),
        ("EXEC_COMMAND", r"\bexec\.Command\s*\("),
    ],
}
UNSAFE_PATTERNS["ts"] = UNSAFE_PATTERNS["js"]


def _flat(
    patterns: dict[str, list[tuple[str, str]]],
) -> list[tuple[str, str, str]]:
    return [
        (lg, name, pat)
        for lg, lst in sorted(patterns.items())
        for name, pat in lst
    ]


def has_unsafe_api(
    content_col: str,
    lang_col: str,
    *,
    patterns: dict[str, list[tuple[str, str]]] | None = None,
) -> Column:
    """Boolean Column: any unsafe-API pattern for the row's lang
    matches — the quarantine predicate for a curation funnel (lazy
    per-lang CASE; only the matched lang's OR-chain runs)."""
    pats = patterns if patterns is not None else UNSAFE_PATTERNS
    if not pats:
        raise ValueError("empty pattern map")
    s = F.coalesce(F.col(content_col), F.lit(""))
    lang = F.lower(F.coalesce(F.col(lang_col), F.lit("")))
    chain = None
    for lg, lst in sorted(pats.items()):
        cond = s.rlike(lst[0][1])
        for _, p in lst[1:]:
            cond = cond | s.rlike(p)
        chain = (
            F.when(lang == lg, cond)
            if chain is None
            else chain.when(lang == lg, cond)
        )
    return chain.otherwise(F.lit(False))


def unsafe_findings(
    df: DataFrame,
    id_cols: list[str],
    content_col: str,
    lang_col: str,
    *,
    patterns: dict[str, list[tuple[str, str]]] | None = None,
) -> DataFrame:
    """Row-level findings: ``(id_cols..., lang, api_class, n_spans)``
    — one row per (file, audit class) actually present; ``lang`` is
    the case-folded declared lang (NULL -> '').  The actionable form:
    which files to quarantine or down-weight."""
    pats = patterns if patterns is not None else UNSAFE_PATTERNS
    if not pats:
        raise ValueError("empty pattern map")
    flat = _flat(pats)
    s = F.coalesce(F.col(content_col), F.lit(""))
    lang = F.lower(F.coalesce(F.col(lang_col), F.lit("")))
    counted = df.select(
        *id_cols,
        lang.alias("lang"),
        *[
            F.when(lang == lg, F.regexp_count(s, F.lit(p)))
            .otherwise(F.lit(0))
            .alias(f"_c{i}")
            for i, (lg, _, p) in enumerate(flat)
        ],
    )
    from ._util import stack_findings

    return stack_findings(
        counted, [*id_cols, "lang"],
        [name for _, name, _ in flat], "api_class",
    )


def unsafe_rollup(
    df: DataFrame,
    id_cols: list[str],
    content_col: str,
    lang_col: str,
    *,
    patterns: dict[str, list[tuple[str, str]]] | None = None,
) -> DataFrame:
    """Governance rollup ``(lang, api_class, n_files, n_spans)`` —
    one map-side-combinable groupBy over the findings frame, output
    bounded by langs x classes."""
    return (
        unsafe_findings(
            df, id_cols, content_col, lang_col, patterns=patterns
        )
        .groupBy("lang", "api_class")
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.sum("n_spans").alias("n_spans"),
        )
    )
