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


#: unused-import detection: per-lang BINDING extraction (the local name
#: an import introduces — not the module path extract_imports returns).
#: All RE2-safe.  Syntactic tier, conservative by construction: a
#: binding mentioned anywhere outside the import lines (even in a
#: comment or string) counts as used, and anything that fails to parse
#: as an identifier (wildcards, parenthesized py continuation lines,
#: js multi-line import statements, go '-' path segments) is excluded
#: from consideration — so the scanner under-reports, never invents.
PY_FROM_RE = r"(?m)^[ \t]*from[ \t]+[A-Za-z_][A-Za-z0-9_.]*[ \t]+import[ \t]+([^\n#]+)"
PY_IMPORT_RE = r"(?m)^[ \t]*import[ \t]+([^\n#]+)"
#: py triple-quoted strings are MASKED before binding extraction so a
#: docstring usage example (`import mypkg` inside \"\"\"...\"\"\") can't
#: invent a phantom binding; an unterminated triple quote leaves the
#: tail unmasked (syntactic-tier caveat)
PY_TRIPLE_RE = r"(?s)\"\"\".*?\"\"\"|'''.*?'''"
#: go bindings come ONLY from real import syntax: a `import (...)`
#: block body or a single-line `import [alias] "path"` — never a bare
#: `ident "string"` line (`return "v1"`, `case "alpha":` must not
#: invent bindings).  A `)` inside an import path would end the block
#: early; Go paths cannot contain one.
GO_BLOCK_RE = r"(?ms)^import[ \t]*\(([^)]*)\)"
GO_SINGLE_RE = (
    r"(?m)^[ \t]*import[ \t]+"
    r"(?:([._A-Za-z][A-Za-z0-9_]*)[ \t]+)?\"([A-Za-z0-9_./\-]+)\""
)
#: per-line alias/path shape, applied ONLY to extracted block bodies
GO_LINE_RE = (
    r"(?m)^[ \t]*(?:([._A-Za-z][A-Za-z0-9_]*)[ \t]+)?"
    r"\"([A-Za-z0-9_./\-]+)\""
)
JAVA_BIND_RE = r"(?m)^import[ \t]+(?:static[ \t]+)?([A-Za-z_][A-Za-z0-9_.]*)[ \t]*;"
JS_DEFAULT_RE = r"import[ \t]+([A-Za-z_$][A-Za-z0-9_$]*)[ \t]*(?:,|from)"
JS_NS_RE = r"import[ \t]+\*[ \t]+as[ \t]+([A-Za-z_$][A-Za-z0-9_$]*)"
JS_BRACES_RE = r"import[^\n;]*?\{([^}\n]*)\}"
JS_REQUIRE_RE = (
    r"(?m)^[ \t]*(?:const|let|var)[ \t]+"
    r"([A-Za-z_$][A-Za-z0-9_$]*)[ \t]*=[ \t]*require[ \t]*\("
)
#: full-match validity gate for a reportable binding
IDENT_FULL = r"^[A-Za-z_$][A-Za-z0-9_$]*$"
#: identifier shape for the "used anywhere else" scan
IDENT_SCAN = r"[A-Za-z_$][A-Za-z0-9_$]*"
#: lang -> patterns whose matches are STRIPPED before the usage scan
STRIP_RES: dict[str, tuple[str, ...]] = {
    "py": (r"(?m)^[ \t]*(?:from|import)[ \t][^\n]*",),
    "go": (
        r"(?ms)^import[ \t]*\([^)]*\)",
        r"(?m)^[ \t]*import[ \t]+"
        r"(?:[._A-Za-z][A-Za-z0-9_]*[ \t]+)?\"[A-Za-z0-9_./\-]+\"",
    ),
    "java": (r"(?m)^import[ \t][^\n]*",),
    "js": (
        r"(?m)^[ \t]*import[ \t{*][^\n]*",
        r"(?m)^[ \t]*(?:const|let|var)[ \t]+[^\n]*?require[ \t]*\([^\n]*",
    ),
}
STRIP_RES["ts"] = STRIP_RES["js"]


def _after_as(item):
    """Last `' as '`-separated token of a trimmed list item: `y as z`
    -> z, plain `y` -> y (split of a non-matching string is itself)."""
    return F.trim(
        F.element_at(F.split(F.trim(item), r"[ \t]+as[ \t]+"), -1)
    )


def _split_items(lists_col):
    return F.flatten(F.transform(lists_col, lambda x: F.split(x, ",")))


def _valid(arr):
    return F.filter(arr, lambda b: b.rlike(IDENT_FULL))


def _py_bindings(s):
    # mask docstrings/triple-quoted strings: an import-shaped line
    # inside one is prose, not a binding (usage residue stays UNmasked
    # — a mention inside any string still counts as used)
    s = F.regexp_replace(s, PY_TRIPLE_RE, "")
    frm = F.transform(
        _split_items(F.regexp_extract_all(s, F.lit(PY_FROM_RE), 1)),
        _after_as,
    )
    plain = F.transform(
        _split_items(F.regexp_extract_all(s, F.lit(PY_IMPORT_RE), 1)),
        lambda it: F.regexp_extract(
            _after_as(it), r"^([A-Za-z_][A-Za-z0-9_]*)", 1
        ),
    )
    return _valid(F.concat(frm, plain))


def _go_bindings(s):
    blocks = F.array_join(
        F.regexp_extract_all(s, F.lit(GO_BLOCK_RE), 1), "\n"
    )
    aliases = F.concat(
        F.regexp_extract_all(s, F.lit(GO_SINGLE_RE), 1),
        F.regexp_extract_all(blocks, F.lit(GO_LINE_RE), 1),
    )
    paths = F.concat(
        F.regexp_extract_all(s, F.lit(GO_SINGLE_RE), 2),
        F.regexp_extract_all(blocks, F.lit(GO_LINE_RE), 2),
    )
    bound = F.zip_with(
        aliases,
        paths,
        lambda a, p: F.when(
            F.coalesce(a, F.lit("")) == "",
            F.element_at(F.split(p, "/"), -1),
        ).otherwise(a),
    )
    # '_' (side-effect import) and '.' (dot import) bind nothing a
    # usage scan could see; '-' path segments fail the identifier gate
    return F.filter(
        _valid(bound), lambda b: (b != "_")
    )


def _java_bindings(s):
    return _valid(
        F.transform(
            F.regexp_extract_all(s, F.lit(JAVA_BIND_RE), 1),
            lambda p: F.element_at(F.split(p, r"\."), -1),
        )
    )


def _js_bindings(s):
    singles = F.concat(
        F.regexp_extract_all(s, F.lit(JS_DEFAULT_RE), 1),
        F.regexp_extract_all(s, F.lit(JS_NS_RE), 1),
        F.regexp_extract_all(s, F.lit(JS_REQUIRE_RE), 1),
    )
    braced = F.transform(
        _split_items(F.regexp_extract_all(s, F.lit(JS_BRACES_RE), 1)),
        _after_as,
    )
    return _valid(F.concat(singles, braced))


def unused_imports(
    df: DataFrame,
    id_cols: list[str],
    content_col: str,
    lang_col: str,
) -> DataFrame:
    """Declared-but-never-referenced import bindings, exploded:
    ``(id_cols..., lang, binding)`` — the dead-dependency hygiene scan
    (flake8 F401 / goimports / eslint no-unused-vars tier) a corpus
    gate runs before trusting manifest_deps or import_edges as a
    coupling signal.

    A binding is "unused" when the identifier never appears in the
    file after every import line is stripped.  Member access counts
    (``import a.b`` is used by ``a.b.c()`` — the scan sees ``a``); so
    do mentions in strings/comments — both err toward NOT reporting.
    Langs: py (import / from-import / as-aliases, comma lists;
    triple-quoted strings masked so docstring examples bind nothing),
    go (single-line and block import forms ONLY — a bare
    ``ident "string"`` line such as ``return "v1"`` is never an
    import; '_'/'.' imports excluded), js/ts
    (default / namespace / single-line braces / simple require), java
    (last dotted segment; wildcard imports never match).

    Scale shape: per-lang extraction behind a lazy CASE (only the
    matched branch's regexes run), binding parse + usage diff are
    array HOFs over per-file lists, explode rides the scan — zero
    shuffles, zero Python."""
    if not id_cols:
        raise ValueError("unused_imports needs id columns")
    s = F.coalesce(F.col(content_col), F.lit(""))
    lang = F.lower(F.coalesce(F.col(lang_col), F.lit("")))
    binders = {
        "py": _py_bindings,
        "go": _go_bindings,
        "js": _js_bindings,
        "ts": _js_bindings,
        "java": _java_bindings,
    }
    chain = None
    for lg in sorted(binders):
        rest = s
        for pat in STRIP_RES[lg]:
            rest = F.regexp_replace(rest, pat, "")
        used = F.array_distinct(
            F.regexp_extract_all(rest, F.lit(IDENT_SCAN), 0)
        )
        unused = F.array_except(binders[lg](s), used)
        cond = lang == lg
        chain = (
            F.when(cond, unused) if chain is None else chain.when(cond, unused)
        )
    arr = chain.otherwise(F.array().cast("array<string>"))
    return df.select(
        *id_cols,
        F.col(lang_col).alias("lang"),
        F.explode(arr).alias("binding"),
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
