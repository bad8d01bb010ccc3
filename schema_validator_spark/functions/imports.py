"""Import / dependency extraction from source code — the edge
generator for repo-level dependency analysis (feed the edges to
operators/graph.pagerank to rank internal libraries, or to
operators/diff.join_profile to audit cross-repo coupling).

Per-language regexes over the published import syntaxes (Python
import/from, Go quoted imports, JS/TS require+from, Java import
statements).  All RE2-safe — no lookaround, no backreferences — so the
DuckDB oracle replays them identically.  ``(?m)`` anchors ``^`` at
line starts; matching is syntactic (a commented-out import counts — a
parser-fidelity caveat shared by every regex-tier scanner, and the
documented trade for zero-dependency distributed extraction).

Scale shape: pattern choice is a CASE over the lang column (only the
matched branch's regex runs per row — Catalyst evaluates CaseWhen
branches lazily), extraction is ``regexp_extract_all`` + one explode,
all riding the scan: zero shuffles, zero Python.  The deduped edge
list adds one map-side-combinable DISTINCT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: lang -> (pattern, capture-group index) for regexp_extract_all.
#: Group 1 is the module/path token in every pattern.
IMPORT_PATTERNS: dict[str, tuple[str, int]] = {
    # `import a.b` / `from a.b import c` at line start
    "py": (r"(?m)^\s*(?:from|import)\s+([A-Za-z_][A-Za-z0-9_.]*)", 1),
    # single-line `import "x/y"` and block-import lines `\t"x/y"`
    "go": (r"(?m)^\s*(?:import\s+)?\"([A-Za-z0-9_./-]+)\"", 1),
    # `require('x')` / `from 'x'` / `import 'x'`
    "js": (
        r"(?:require\(|from\s+|import\s+)['\"]([A-Za-z0-9_@./-]+)['\"]",
        1,
    ),
    # `import a.b.C;` (static imports included via optional keyword)
    "java": (r"(?m)^import\s+(?:static\s+)?([A-Za-z_][A-Za-z0-9_.]*)", 1),
}
#: aliases sharing a syntax family
IMPORT_PATTERNS["ts"] = IMPORT_PATTERNS["js"]


def extract_imports(
    df: DataFrame,
    id_cols: list[str],
    content_col: str,
    lang_col: str,
    *,
    patterns: dict[str, tuple[str, int]] | None = None,
) -> DataFrame:
    """``(id_cols..., module)`` — one row per import statement found
    (duplicates preserved: multiplicity is signal for coupling
    strength).  Rows whose lang has no registered pattern yield no
    rows.  Zero shuffles; explode rides the scan."""
    pats = patterns if patterns is not None else IMPORT_PATTERNS
    if not pats:
        raise ValueError("empty pattern map")
    s = F.coalesce(F.col(content_col), F.lit(""))
    lang = F.lower(F.coalesce(F.col(lang_col), F.lit("")))
    chain = None
    for lg, (pat, grp) in sorted(pats.items()):
        arr = F.regexp_extract_all(s, F.lit(pat), grp)
        cond = lang == lg
        chain = F.when(cond, arr) if chain is None else chain.when(cond, arr)
    mods = chain.otherwise(F.array().cast("array<string>"))
    return df.select(
        *id_cols, F.explode(mods).alias("module")
    )


def import_edges(
    df: DataFrame,
    repo_col: str,
    file_id_cols: list[str],
    content_col: str,
    lang_col: str,
    *,
    patterns: dict[str, tuple[str, int]] | None = None,
) -> DataFrame:
    """Distinct ``(src_repo, module, n_files)`` dependency edges with
    file-multiplicity (``file_id_cols`` identifies a file, e.g.
    ``["path"]``) — the input shape for pagerank over the module graph
    or a reverse-dependency audit.  One map-side-combinable DISTINCT +
    one groupBy on top of the zero-shuffle extraction."""
    ex = extract_imports(
        df.withColumn("src_repo", F.col(repo_col)),
        ["src_repo", *file_id_cols],
        content_col,
        lang_col,
        patterns=patterns,
    )
    return (
        ex.distinct()
        .groupBy("src_repo", "module")
        .agg(F.count(F.lit(1)).alias("n_files"))
    )
