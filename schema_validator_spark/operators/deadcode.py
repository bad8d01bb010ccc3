"""Dead exported symbols — public API a repo declares but never uses
across file boundaries.  The repo-grain dead-code audit beside
functions/imports.unused_imports (file-grain dead imports): a training
corpus full of never-referenced exports skews API-usage statistics and
is a strong abandoned/generated-code signal; a refactoring gate reads
the same list as "safe to drop from the surface".

A symbol is DEAD when every file of the repo that mentions its
identifier is one of the files DEFINING it (mentions ∖ def-files = ∅) —
"never referenced outside its defining file(s)".  Mentions are the
syntactic identifier scan (imports.IDENT_SCAN), so a name cited in a
comment, string, or ANY other lang's file of the repo counts as used —
the scanner under-reports dead symbols, never invents them (same
conservative contract as unused_imports).  Lang-scoped caveat: symbol
identity is (repo, name) across langs, so a same-named symbol in two
langs shields both.

Reference anchor: the reference validates single values
(schema-validator rule/*.go); cross-file reachability is engine-
extension surface (SURVEY §2.9), composing the public-API extractor
(functions/publicapi.py) with the identifier scan.

Scale shape (PLANS.md): the identifier explode is the heavy frame —
per-file DISTINCT identifiers (array_distinct before the explode), the
same scale class as identifier_vocab's lexing pass.  It is immediately
semi-joined on (repo, ident) against the symbol dimension (symbol
scale: distinct exported names), so everything after the first join is
surface-sized.  Def-site exclusion and the final dead filter are
left_anti joins at (repo, path, symbol) / (repo, symbol) scale.  No
window, no Python, no collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.imports import IDENT_SCAN
from ..functions.publicapi import extract_public_symbols


def dead_symbols(
    df: DataFrame,
    repo_col: str,
    path_col: str,
    content_col: str,
    lang_col: str,
    *,
    patterns: dict[str, str] | None = None,
) -> DataFrame:
    """``(repo, lang, symbol, n_def_files)`` — exported symbols (per
    functions/publicapi.API_PATTERNS) whose identifier never appears
    in any file of the repo other than the file(s) declaring them.

    ``n_def_files`` counts the distinct declaring files (a symbol
    defined in several files is dead only if NO other file mentions
    it).  Unregistered langs export nothing and so report nothing.
    """
    clash = sorted(
        {"lang", "symbol", "ident", "n_def_files"}
        & {repo_col, path_col}
    )
    if clash:
        raise ValueError(f"dead_symbols reserves column names: {clash}")
    defs = extract_public_symbols(
        df, [repo_col, path_col], content_col, lang_col,
        patterns=patterns,
    ).distinct()  # (repo, path, lang, symbol)
    sym_dim = defs.select(repo_col, "symbol").distinct()

    s = F.coalesce(F.col(content_col), F.lit(""))
    mentions = df.select(
        F.col(repo_col),
        F.col(path_col),
        F.explode(
            F.array_distinct(F.regexp_extract_all(s, F.lit(IDENT_SCAN), 0))
        ).alias("symbol"),
    ).join(sym_dim, [repo_col, "symbol"], "left_semi")

    # mentions at non-defining files = external uses
    external = mentions.join(
        defs.select(repo_col, path_col, "symbol"),
        [repo_col, path_col, "symbol"],
        "left_anti",
    ).select(repo_col, "symbol").distinct()

    return (
        defs.groupBy(repo_col, "lang", "symbol")
        .agg(F.count_distinct(F.col(path_col)).alias("n_def_files"))
        .join(external, [repo_col, "symbol"], "left_anti")
        .select(repo_col, "lang", "symbol", "n_def_files")
    )
