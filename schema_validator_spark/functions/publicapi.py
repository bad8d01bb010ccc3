"""Public-API symbol extraction — the exported surface of each file /
repo, per the lang's visibility convention.  The repo-fingerprint and
documentation-coverage signal beside functions/imports.py (imports =
what code consumes; this = what it offers): API-surface diffs across
commits flag breaking changes, and (repo, symbol) frames feed the same
join/diff operators as the import edges.

Visibility is encoded lexically per lang's published convention:
Python top-level ``def``/``class`` not underscore-prefixed; Go
capitalized ``func``/``type`` (incl. method receivers); JS/TS
``export`` declarations; Java top-level ``public``
class/interface/enum.  All RE2-safe, ``(?m)`` line-anchored; an
unregistered lang exports nothing (the COMMENT_SYNTAX contract).
Lexical tier, documented: a declaration inside a docstring or block
comment counts.

Scale shape: pattern choice is a lazy CASE on the lang column, one
``regexp_extract_all`` + explode riding the scan — zero shuffles;
``api_surface`` adds one map-side-combinable groupBy at (repo, lang)
scale with distinct-symbol counting the only two-phase term.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: lang -> exported-symbol pattern (group 1 = symbol name)
API_PATTERNS: dict[str, str] = {
    # top-level def/class whose name does NOT start with underscore
    "py": r"(?m)^(?:async[ \t]+)?(?:def|class)[ \t]+"
          r"([A-Za-z][A-Za-z0-9_]*)",
    # Go exports by capitalization; optional method receiver
    "go": r"(?m)^(?:func|type)[ \t]+(?:\([^)\n]*\)[ \t]*)?"
          r"([A-Z][A-Za-z0-9_]*)",
    # ES-module named export declarations
    "js": r"(?m)^export[ \t]+(?:default[ \t]+)?(?:async[ \t]+)?"
          r"(?:function|class|const|let|var)[ \t]+"
          r"([A-Za-z_$][A-Za-z0-9_$]*)",
    # top-level public types
    "java": r"(?m)^public[ \t]+(?:final[ \t]+|abstract[ \t]+)?"
            r"(?:class|interface|enum)[ \t]+([A-Za-z_][A-Za-z0-9_]*)",
}
API_PATTERNS["ts"] = API_PATTERNS["js"]


def extract_public_symbols(
    df: DataFrame,
    id_cols: list[str],
    content_col: str,
    lang_col: str,
    *,
    patterns: dict[str, str] | None = None,
) -> DataFrame:
    """``(id_cols..., lang, symbol)`` — one row per exported symbol
    occurrence, file order preserved within a row's array; files
    exporting nothing yield no rows."""
    pats = patterns if patterns is not None else API_PATTERNS
    if not pats:
        raise ValueError("empty API pattern map")
    s = F.coalesce(F.col(content_col), F.lit(""))
    lang = F.lower(F.coalesce(F.col(lang_col), F.lit("")))
    chain = None
    for lg, pat in sorted(pats.items()):
        arr = F.regexp_extract_all(s, F.lit(pat), 1)
        cond = lang == lg
        chain = F.when(cond, arr) if chain is None else chain.when(
            cond, arr
        )
    syms = chain.otherwise(F.array().cast("array<string>"))
    return df.select(
        *id_cols, lang.alias("lang"), F.explode(syms).alias("symbol")
    )


def api_surface(
    df: DataFrame,
    repo_col: str,
    content_col: str,
    lang_col: str,
    *,
    patterns: dict[str, str] | None = None,
) -> DataFrame:
    """Per-repo exported surface ``(repo, lang, n_symbols,
    n_occurrences)`` — distinct exported names and total declaration
    sites; one groupBy at (repo, lang) scale."""
    rows = extract_public_symbols(
        df, [repo_col], content_col, lang_col, patterns=patterns
    )
    return rows.groupBy(repo_col, "lang").agg(
        F.count_distinct(F.col("symbol")).alias("n_symbols"),
        F.count(F.lit(1)).alias("n_occurrences"),
    )


def api_diff(
    old_df: DataFrame,
    new_df: DataFrame,
    repo_col: str,
    content_col: str,
    lang_col: str,
    *,
    patterns: dict[str, str] | None = None,
) -> DataFrame:
    """Breaking-change audit between two snapshots of the code table —
    the API-surface analog of the schema-evolution compatibility gate:
    ``(repo, lang, symbol, change)`` with ``change = 'removed'``
    (breaking: the symbol left the repo's exported surface) or
    ``'added'`` (additive).  Symbol identity is the DISTINCT exported
    name per (repo, lang) — moving a declaration between files, or
    duplicating it, is not a surface change.

    Scale shape: extraction rides each snapshot's scan; both sides
    collapse to distinct (repo, lang, symbol) frames — surface scale,
    orders of magnitude below file grain — before ONE key-scale
    full-outer join; unchanged symbols drop inside the join filter so
    output is change-volume sized (the same shape as table_diff)."""
    keys = [repo_col, "lang", "symbol"]
    o = extract_public_symbols(
        old_df, [repo_col], content_col, lang_col, patterns=patterns
    ).distinct().withColumn("_old", F.lit(1))
    n = (
        extract_public_symbols(
            new_df, [repo_col], content_col, lang_col, patterns=patterns
        )
        .distinct()
        .withColumn("_new", F.lit(1))
        .select(*[F.col(k).alias(f"_n_{k}") for k in keys], "_new")
    )
    # null-safe keys: a NULL repo (missing metadata passed through the
    # id column) must match itself, or an unchanged symbol would be
    # reported as removed AND added
    cond = None
    for k in keys:
        c = F.col(k).eqNullSafe(F.col(f"_n_{k}"))
        cond = c if cond is None else cond & c
    j = o.join(n, cond, "full_outer")
    return j.filter(
        F.col("_old").isNull() | F.col("_new").isNull()
    ).select(
        *[
            F.coalesce(F.col(k), F.col(f"_n_{k}")).alias(out_name)
            for k, out_name in zip(keys, [repo_col, "lang", "symbol"])
        ],
        F.when(F.col("_new").isNull(), F.lit("removed"))
        .otherwise(F.lit("added"))
        .alias("change"),
    )
