"""Intra-repo call graph at FUNCTION grain — which files call which
repo-defined functions, and each function's fan-in.  The code-structure
signal between operators/depgraph.py (module-grain import edges) and
operators/deadcode.py (exported-symbol liveness): repo-context ordering,
dead-code triage, and API-popularity weighting all read these edges.

Semantics (lexical tier, documented like every code op here):

- **definitions** — per-lang line-anchored declaration patterns
  (``def``/``func``/``function``; group 1 = name).  Unlike
  functions/publicapi.API_PATTERNS these keep private names (a call
  graph needs ``_helper`` too); an unregistered lang defines nothing.
- **call sites** — every identifier immediately followed by ``(``
  (optional space/tab).  No keyword stop-list is needed: call tokens
  only survive a semi-join against the repo's definition dimension, so
  ``if (x)`` dies unless the repo literally defines a function named
  ``if`` (which no definition pattern can produce).
- a definition line itself matches the call shape (``def foo(``), so
  per ``(repo, path, symbol)`` the edge weight is ``n_call_tokens -
  n_def_tokens``; rows <= 0 (pure declarations) drop.  Recursive and
  same-file calls therefore count — they are real edges.

Scale shape (the PLANS.md inventory pattern): the call-token explode is
the heavy frame; it is immediately semi-joined on ``(repo, symbol)``
against the definition dimension (distinct defined names — symbol
scale), so the counting groupBy and everything after run at
edge/surface scale.  Both aggs are map-side combinable; no window, no
Python, no collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: lang -> function-definition pattern (group 1 = name); RE2-safe,
#: (?m) line-anchored.  Single source of truth for the oracle.
DEF_PATTERNS: dict[str, str] = {
    # indentation allowed: methods and nested defs are functions too
    "py": r"(?m)^[ \t]*(?:async[ \t]+)?def[ \t]+"
          r"([A-Za-z_][A-Za-z0-9_]*)",
    # optional method receiver
    "go": r"(?m)^func[ \t]+(?:\([^)\n]*\)[ \t]*)?"
          r"([A-Za-z_][A-Za-z0-9_]*)",
    # function declarations (arrow-const bindings are assignments, not
    # declarations — documented out of the lexical tier)
    "js": r"(?m)^[ \t]*(?:export[ \t]+)?(?:default[ \t]+)?"
          r"(?:async[ \t]+)?function[ \t]*\*?[ \t]+"
          r"([A-Za-z_$][A-Za-z0-9_$]*)",
}
DEF_PATTERNS["ts"] = DEF_PATTERNS["js"]

#: identifier followed by an open paren = call-shaped token (group 1)
CALL_SITE_RE = r"([A-Za-z_][A-Za-z0-9_]*)[ \t]*\("


def call_edges(
    df: DataFrame,
    repo_col: str,
    path_col: str,
    content_col: str,
    lang_col: str,
    *,
    patterns: dict[str, str] | None = None,
) -> DataFrame:
    """``(repo, caller_path, symbol, n_calls)`` — one row per (file,
    repo-defined function) pair with at least one non-declaration
    call-shaped occurrence."""
    pats = patterns if patterns is not None else DEF_PATTERNS
    if not pats:
        raise ValueError("empty definition pattern map")
    clash = sorted({"symbol", "n_calls", "caller_path"} & {repo_col, path_col})
    if clash:
        raise ValueError(f"call_edges reserves column names: {clash}")
    s = F.coalesce(F.col(content_col), F.lit(""))
    lang = F.lower(F.coalesce(F.col(lang_col), F.lit("")))

    chain = None
    for lg, pat in sorted(pats.items()):
        arr = F.regexp_extract_all(s, F.lit(pat), 1)
        cond = lang == lg
        chain = F.when(cond, arr) if chain is None else chain.when(cond, arr)
    defs_arr = chain.otherwise(F.array().cast("array<string>"))

    base = df.select(
        F.col(repo_col),
        F.col(path_col),
        defs_arr.alias("_defs"),
        F.regexp_extract_all(s, F.lit(CALL_SITE_RE), 1).alias("_callish"),
    )
    defs = base.select(
        repo_col, path_col, F.explode("_defs").alias("symbol")
    )
    def_dim = defs.select(repo_col, "symbol").distinct()
    def_counts = defs.groupBy(repo_col, path_col, "symbol").agg(
        F.count(F.lit(1)).alias("_n_defs")
    )
    calls = (
        base.select(
            repo_col, path_col, F.explode("_callish").alias("symbol")
        )
        .join(def_dim, [repo_col, "symbol"], "left_semi")
        .groupBy(repo_col, path_col, "symbol")
        .agg(F.count(F.lit(1)).alias("_n_tokens"))
    )
    return (
        calls.join(def_counts, [repo_col, path_col, "symbol"], "left")
        .select(
            F.col(repo_col),
            F.col(path_col).alias("caller_path"),
            F.col("symbol"),
            (
                F.col("_n_tokens") - F.coalesce(F.col("_n_defs"), F.lit(0))
            ).alias("n_calls"),
        )
        .filter(F.col("n_calls") > 0)
    )


def function_fanin(
    df: DataFrame,
    repo_col: str,
    path_col: str,
    content_col: str,
    lang_col: str,
    *,
    patterns: dict[str, str] | None = None,
) -> DataFrame:
    """Per defined function: ``(repo, symbol, n_def_files,
    fan_in_files, n_calls)`` — distinct calling files and total call
    tokens (0 for never-called functions, the function-grain dead-code
    shortlist).  Both inputs are edge/surface scale after call_edges'
    semi-join."""
    pats = patterns if patterns is not None else DEF_PATTERNS
    s = F.coalesce(F.col(content_col), F.lit(""))
    lang = F.lower(F.coalesce(F.col(lang_col), F.lit("")))
    chain = None
    for lg, pat in sorted(pats.items()):
        arr = F.regexp_extract_all(s, F.lit(pat), 1)
        cond = lang == lg
        chain = F.when(cond, arr) if chain is None else chain.when(cond, arr)
    defs_arr = chain.otherwise(F.array().cast("array<string>"))
    defs = (
        df.select(F.col(repo_col), F.col(path_col), defs_arr.alias("_d"))
        .select(repo_col, path_col, F.explode("_d").alias("symbol"))
        .groupBy(repo_col, "symbol")
        .agg(F.count_distinct(F.col(path_col)).alias("n_def_files"))
    )
    edges = call_edges(
        df, repo_col, path_col, content_col, lang_col, patterns=pats
    )
    agg = edges.groupBy(repo_col, "symbol").agg(
        F.count_distinct("caller_path").alias("fan_in_files"),
        F.sum("n_calls").alias("n_calls"),
    )
    return defs.join(agg, [repo_col, "symbol"], "left").select(
        repo_col,
        "symbol",
        "n_def_files",
        F.coalesce("fan_in_files", F.lit(0)).alias("fan_in_files"),
        F.coalesce("n_calls", F.lit(0)).alias("n_calls"),
    )
