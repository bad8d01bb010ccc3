"""Dependency-manifest extraction — declared dependencies per repo
from the three dominant manifest formats (pip requirements.txt, Go
go.mod, npm package.json).  The compliance-side complement of
functions/imports.py: imports are what the code USES, manifests are
what the repo DECLARES — license/vulnerability audits and dependency-
graph ranking want both, and their diff (used-but-undeclared /
declared-but-unused) is a classic repo-health signal via
operators/diff.py.

Files are classified by PATH (basename regex), not lang; extraction is
per-format:

- ``pip_requirements``: one package name per line; comment (``#``) and
  option (``-r``/``--hash``) lines can't match (names must start
  alphanumeric), and the name must be followed by end-of-line or a
  PEP-508 continuation (extras ``[``, version operators, ``;`` marker,
  ``#`` comment, ``@`` direct reference) — so URL and VCS lines
  (``git+https://...``, bare ``https://...``) never yield phantom
  ``git``/``https`` deps.  Extras brackets and version specs are not
  part of the captured name.
- ``go_mod``: module paths followed by a ``v<digit>`` version — both
  single-line ``require x vN`` and indented require-block lines; the
  repo's own ``module`` line has no version so it never matches, and
  ``replace``/``exclude`` blocks are stripped before extraction (their
  single-line forms can't match: the keyword is not a require prefix),
  so replaced-away or excluded modules are never claimed as declared.
- ``npm_package``: JSON-parsed (``from_json`` on Spark, ``json_keys``
  in the DuckDB oracle) — ``dependencies`` + ``devDependencies`` keys
  with a ``kind`` tag; malformed JSON yields zero deps on both sides
  (never an error).

All regexes RE2-safe.  Scale shape: classification + extraction ride
the scan (lazy CASE per type — only the matched branch runs), one
explode; ZERO shuffles; ``dependency_edges`` adds one map-side-
combinable DISTINCT at (repo, dep) scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: ordered (manifest_type, path regex) — first match wins
MANIFEST_RULES: list[tuple[str, str]] = [
    ("pip_requirements", r"(^|/)requirements[^/]*\.txt$"),
    ("go_mod", r"(^|/)go\.mod$"),
    ("npm_package", r"(^|/)package\.json$"),
]

#: per-format extraction regex (group 1 = dependency name).  The pip
#: name must be followed by a PEP-508 continuation or end-of-line
#: (``\r`` consumed explicitly: RE2's (?m)$ matches only before \n,
#: Java's also before \r\n — the explicit class keeps both engines
#: identical on CRLF files).  RE2-safe: no lookaround.
PIP_DEP_RE = (
    r"(?m)^[ \t]*([A-Za-z0-9][A-Za-z0-9._-]*)[ \t\r]*"
    r"(?:$|[=<>!~;#@\[])"
)
GO_DEP_RE = (
    r"(?m)^[ \t]*(?:require[ \t]+)?([A-Za-z0-9][A-Za-z0-9_./-]*)"
    r"[ \t]+v[0-9]"
)
#: replace/exclude blocks are stripped from go.mod before extraction —
#: their indented module lines would otherwise match GO_DEP_RE
GO_BLOCK_STRIP_RE = r"(?ms)^(?:replace|exclude)[ \t]*\(.*?\n\)"

#: npm JSON schema for from_json (null-safe on malformed input)
_NPM_SCHEMA = (
    "dependencies map<string,string>, devDependencies map<string,string>"
)


def manifest_deps(
    df: DataFrame,
    id_cols: list[str],
    path_col: str,
    content_col: str,
) -> DataFrame:
    """``(id_cols..., manifest_type, dep, kind)`` — one row per
    declared dependency; non-manifest files yield no rows.  ``kind``
    is ``runtime`` except npm devDependencies (``dev``)."""
    path = F.coalesce(F.col(path_col), F.lit(""))
    s = F.coalesce(F.col(content_col), F.lit(""))

    def _tag(arr, kind):
        return F.transform(
            arr,
            lambda d: F.struct(
                d.alias("dep"), F.lit(kind).alias("kind")
            ),
        )

    pip = _tag(F.regexp_extract_all(s, F.lit(PIP_DEP_RE), 1), "runtime")
    go_src = F.regexp_replace(s, GO_BLOCK_STRIP_RE, "")
    go = _tag(
        F.regexp_extract_all(go_src, F.lit(GO_DEP_RE), 1), "runtime"
    )
    parsed = F.from_json(s, _NPM_SCHEMA)
    empty_map = F.create_map().cast("map<string,string>")
    npm = F.concat(
        _tag(F.map_keys(F.coalesce(parsed["dependencies"], empty_map)),
             "runtime"),
        _tag(
            F.map_keys(
                F.coalesce(parsed["devDependencies"], empty_map)
            ),
            "dev",
        ),
    )
    by_type = {"pip_requirements": pip, "go_mod": go, "npm_package": npm}

    mtype = None
    deps = None
    for name, pat in MANIFEST_RULES:
        cond = path.rlike(pat)
        t = F.lit(name)
        mtype = F.when(cond, t) if mtype is None else mtype.when(cond, t)
        d = by_type[name]
        deps = F.when(cond, d) if deps is None else deps.when(cond, d)

    tmp = df.select(
        *id_cols, mtype.alias("manifest_type"), deps.alias("_deps")
    ).filter(F.col("manifest_type").isNotNull())
    return tmp.select(
        *id_cols,
        "manifest_type",
        F.explode("_deps").alias("_d"),
    ).select(
        *id_cols,
        "manifest_type",
        F.col("_d.dep").alias("dep"),
        F.col("_d.kind").alias("kind"),
    )


def dependency_edges(
    df: DataFrame,
    repo_col: str,
    path_col: str,
    content_col: str,
) -> DataFrame:
    """Deduped declared-dependency edge list ``(repo, manifest_type,
    dep)`` — feed to operators/graph.pagerank (rank ecosystem
    packages) or diff against functions/imports.import_edges (declared
    vs used).  One map-side-combinable DISTINCT."""
    return (
        manifest_deps(df, [repo_col], path_col, content_col)
        .select(repo_col, "manifest_type", "dep")
        .distinct()
    )
