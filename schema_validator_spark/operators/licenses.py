"""License detection over code content — the corpus-governance scan a
code-data pipeline runs before training (The Stack keys its entire
corpus on detected permissive licenses; Kocetkov et al. 2022 §3).

Detection is marker-phrase based: every mainstream license text has a
canonical sentence that identifies it uniquely (the approach of
licensee/go-license-detector at their fast tier).  Markers are checked
in specificity order — LGPL/AGPL before GPL, since the GPL marker
phrase is a substring-family cousin — and matched case-insensitively
against the file content.

Scale shape: ``lower(content)`` is materialized ONCE per row and the
marker chain is a fixed CASE expression riding the scan — pure
codegen, zero shuffles for detection; the per-repo summary is one
map-side-combinable groupBy on (repo, license), output bounded by
repos x licenses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: (license_id, lowercase marker phrase) in match-priority order —
#: first containing marker wins; single source of truth for the oracle
LICENSE_MARKERS: list[tuple[str, str]] = [
    ("Apache-2.0", "apache license, version 2.0"),
    ("Apache-2.0", "licensed under the apache license"),
    ("AGPL-3.0", "gnu affero general public license"),
    ("LGPL", "gnu lesser general public license"),
    ("GPL", "gnu general public license"),
    ("MPL-2.0", "mozilla public license"),
    ("MIT", "permission is hereby granted, free of charge"),
    ("BSD", "redistribution and use in source and binary forms"),
    ("Unlicense", "this is free and unencumbered software"),
]

#: verdict when no marker hits but a copyright line exists (all rights
#: reserved until proven otherwise) / when nothing at all hits
UNKNOWN = "UNKNOWN"
NONE = "NONE"


def detect_license(
    df: DataFrame,
    content_col: str,
    *,
    out_col: str = "license",
    markers: list[tuple[str, str]] | None = None,
) -> DataFrame:
    """Adds ``out_col``: the first marker (priority order) contained in
    ``lower(content)``; ``UNKNOWN`` when only a bare ``copyright`` line
    exists, ``NONE`` otherwise."""
    ms = markers if markers is not None else LICENSE_MARKERS
    if not ms:
        raise ValueError("empty marker list")
    low = df.withColumn("_low", F.lower(F.coalesce(content_col, F.lit(""))))
    expr = F.lit(NONE)
    fallback = F.when(F.col("_low").contains("copyright"), F.lit(UNKNOWN))
    chain = None
    for lic, marker in ms:
        cond = F.col("_low").contains(marker)
        chain = (
            F.when(cond, F.lit(lic))
            if chain is None
            else chain.when(cond, F.lit(lic))
        )
    expr = chain.otherwise(fallback.otherwise(expr))
    return low.withColumn(out_col, expr).drop("_low")


#: header-strip marker: a leading comment run is a license header iff
#: it contains one of these (case-insensitive substring; single source
#: of truth for the oracle)
HEADER_MARKER_RE = (
    r"(?i)(?:copyright|licen[cs]e|spdx-license-identifier"
    r"|all rights reserved)"
)
#: leading run of blank / line-comment lines, per comment prefix; each
#: iteration consumes a whole \n-terminated line, so the run also eats
#: the blank lines that pad a header
_LINE_RUN_HEAD = {
    "#": r"\A(?:[ \t]*(?:#[^\n]*)?\n)+",
    "//": r"\A(?:[ \t]*(?://[^\n]*)?\n)+",
}
#: leading block comment (optionally preceded by blank lines)
BLOCK_HEAD_RE = r"(?s)\A\s*/\*.*?\*/[ \t]*\n?"
#: the shebang line is never part of a header (node and python
#: scripts put it first; stripping it breaks the file)
SHEBANG_RE = r"\A#![^\n]*\n"
#: PEP 263 encoding declaration — stripping it corrupts any non-UTF-8
#: source, so like the shebang it is preserved even when it sits inside
#: a license comment run.  Anchored at \A of rest-after-shebang, i.e.
#: the conventional placements (file line 1, or line 2 after a
#: shebang); the rare legal variant BELOW a non-cookie comment line
#: would need hoisting to survive and is documented out of scope
CODING_RE = r"\A[ \t]*#[^\n]*coding[:=][ \t]*[-_.A-Za-z0-9]+[^\n]*\n?"
#: lang -> (line-comment prefix key, has block comments)
_HEADER_SYNTAX: dict[str, tuple[str, bool]] = {
    "py": ("#", False),
    "go": ("//", True),
    "js": ("//", True),
    "ts": ("//", True),
    "java": ("//", True),
    "c": ("//", True),
}


def strip_license_headers(
    df: DataFrame,
    id_cols: list[str],
    content_col: str,
    lang_col: str,
    *,
    marker_re: str = HEADER_MARKER_RE,
    out_col: str = "content_clean",
) -> DataFrame:
    """The Stack / StarCoder header-strip transform: remove the leading
    comment block (a ``/* ... */`` block or a run of blank and
    line-comment lines) IFF it contains a license/copyright marker —
    boilerplate the model would otherwise memorize verbatim.  Returns
    ``(id_cols..., out_col, header_removed, header_lines)``;
    ``header_lines`` counts removed newlines.

    A shebang first line is preserved (the header check starts after
    it), and so is a PEP 263 ``# -*- coding: ... -*-`` declaration on
    a py file's line 1/2 — both break the file if removed.  A module
    docstring is NOT a comment and is never stripped (documented
    scope: comment-style headers only).  Unregistered langs pass
    through unchanged.  Pure codegen projection — three anchored
    regexp_extracts per row, zero shuffles."""
    if not id_cols:
        raise ValueError("strip_license_headers needs id columns")
    s = F.coalesce(F.col(content_col), F.lit(""))
    lang = F.lower(F.coalesce(F.col(lang_col), F.lit("")))
    shebang = F.regexp_extract(s, SHEBANG_RE, 0)
    after_she = s.substr(F.length(shebang) + 1, F.length(s))
    coding = F.when(
        lang == "py", F.regexp_extract(after_she, CODING_RE, 0)
    ).otherwise(F.lit(""))
    pre = F.concat(shebang, coding)
    rest = s.substr(F.length(pre) + 1, F.length(s))

    chain = None
    for lg, (prefix, has_block) in sorted(_HEADER_SYNTAX.items()):
        run = F.regexp_extract(rest, _LINE_RUN_HEAD[prefix], 0)
        head = F.when(
            (run != "") & run.rlike(marker_re), run
        ).otherwise(F.lit(""))
        if has_block:
            blk = F.regexp_extract(rest, BLOCK_HEAD_RE, 0)
            head = F.when(
                (blk != "") & blk.rlike(marker_re), blk
            ).otherwise(head)
        cond = lang == lg
        chain = F.when(cond, head) if chain is None else chain.when(
            cond, head
        )
    head = chain.otherwise(F.lit("")) if chain is not None else F.lit("")

    base = df.select(
        *id_cols,
        pre.alias("_she"),
        rest.alias("_rest"),
        head.alias("_head"),
    )
    h = F.col("_head")
    clean = F.concat(
        F.col("_she"),
        F.col("_rest").substr(F.length(h) + 1, F.length("_rest")),
    )
    return base.select(
        *id_cols,
        clean.alias(out_col),
        (F.length(h) > 0).alias("header_removed"),
        (F.length(h) - F.length(F.replace(h, F.lit("\n")))).alias(
            "header_lines"
        ),
    )


#: path regex identifying a repo's license-bearing files (LICENSE,
#: LICENSE.md, LICENSE-MIT, LICENCE, COPYING, COPYING.LESSER, UNLICENSE
#: at any directory level) — The Stack detects the REPO license from
#: these files and propagates it to every file of the repo, rather than
#: trusting per-file headers (Kocetkov et al. 2022 §3).
LICENSE_FILE_RE = (
    r"(?i)(^|/)((un)?licen[cs]es?([-.][a-z0-9.]+)?"
    r"|copying([-.][a-z0-9.]+)?)$"
)

#: restrictiveness rank — the repo verdict is the MOST RESTRICTIVE
#: license found among its license files (conservative gate; a license
#: file whose text matches no marker counts as UNKNOWN).  Single source
#: of truth for the oracle.
LICENSE_RANK: dict[str, int] = {
    "Unlicense": 0,
    "MIT": 1,
    "BSD": 2,
    "Apache-2.0": 3,
    "MPL-2.0": 4,
    "LGPL": 5,
    "GPL": 6,
    "AGPL-3.0": 7,
    "UNKNOWN": 8,
}


def repo_license(
    df: DataFrame,
    repo_col: str,
    path_col: str,
    content_col: str,
    *,
    markers: list[tuple[str, str]] | None = None,
    license_file_re: str = LICENSE_FILE_RE,
) -> DataFrame:
    """Per-repo license dimension ``(repo, repo_license,
    n_license_files)`` derived ONLY from the repo's license-bearing
    files (path matches ``license_file_re``): detect each file's
    license by marker, map undetectable license files to ``UNKNOWN``,
    and keep the most restrictive verdict per ``LICENSE_RANK``.

    Scale shape: the path filter rides the scan (license files are
    ~1 per repo, so the groupBy shuffles ~n_repos rows, not n_files);
    the arg-max is a map-side-combinable ``max(struct(rank, name))``.
    Repos with no license file are absent — callers propagate with a
    left join defaulting to ``NONE``."""
    lic = df.filter(
        F.coalesce(F.col(path_col), F.lit("")).rlike(license_file_re)
    )
    d = detect_license(lic, content_col, out_col="_flic", markers=markers)
    v = F.when(F.col("_flic") == NONE, F.lit(UNKNOWN)).otherwise(
        F.col("_flic")
    )
    chain = None
    for name, r in LICENSE_RANK.items():
        cond = v == name
        chain = (
            F.when(cond, F.lit(r))
            if chain is None
            else chain.when(cond, F.lit(r))
        )
    rank = chain.otherwise(F.lit(LICENSE_RANK[UNKNOWN]))
    return (
        d.select(
            F.col(repo_col).alias("repo"),
            F.struct(rank.alias("_rank"), v.alias("_lic")).alias("_m"),
        )
        .groupBy("repo")
        .agg(
            F.max("_m").alias("_m"),
            F.count(F.lit(1)).alias("n_license_files"),
        )
        .select(
            "repo",
            F.col("_m._lic").alias("repo_license"),
            "n_license_files",
        )
    )


def propagate_repo_license(
    df: DataFrame,
    repo_col: str,
    path_col: str,
    content_col: str,
    *,
    out_col: str = "repo_license",
    markers: list[tuple[str, str]] | None = None,
    license_file_re: str = LICENSE_FILE_RE,
) -> DataFrame:
    """All input rows plus ``out_col``: the repo-level license verdict
    joined back onto every file (``NONE`` for repos with no license
    file).  The dimension is ~1 row per repo, so the join is an
    explicit broadcast — the file table never shuffles."""
    clash = sorted({out_col, "_rl_repo"} & set(df.columns))
    if clash:
        raise ValueError(
            "propagate_repo_license output/helper column names collide "
            f"with input columns (pass a different out_col): {clash}"
        )
    dim = repo_license(
        df,
        repo_col,
        path_col,
        content_col,
        markers=markers,
        license_file_re=license_file_re,
    ).select(F.col("repo").alias("_rl_repo"),
             F.col("repo_license").alias(out_col))
    joined = df.join(
        F.broadcast(dim),
        on=df[repo_col] == dim["_rl_repo"],
        how="left",
    ).drop("_rl_repo")
    return joined.withColumn(out_col, F.coalesce(out_col, F.lit(NONE)))


def license_summary(
    df: DataFrame,
    repo_col: str,
    content_col: str,
    *,
    markers: list[tuple[str, str]] | None = None,
) -> DataFrame:
    """Per-repo license mix: ``(repo, license, n_files, share)`` —
    share of the repo's files carrying that license verdict (6dp).
    The table a permissive-only corpus filter keys on."""
    d = detect_license(df, content_col, markers=markers)
    counts = d.groupBy(F.col(repo_col).alias("repo"), "license").agg(
        F.count(F.lit(1)).alias("n_files")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("repo")
    return counts.select(
        "repo",
        "license",
        "n_files",
        F.round(F.col("n_files") / F.sum("n_files").over(w), 6).alias(
            "share"
        ),
    )


def license_conflicts(
    df: DataFrame,
    repo_col: str,
    path_col: str,
    content_col: str,
    *,
    markers: list[tuple[str, str]] | None = None,
    license_file_re: str = LICENSE_FILE_RE,
) -> DataFrame:
    """Per-repo license-consistency audit: ``(repo, repo_license,
    n_files, n_header_files, strictest_header, n_conflicts,
    n_undeclared, has_conflict)`` — the compliance gate between
    ``repo_license`` (the repo-level verdict The Stack filters on) and
    per-file license HEADERS.  A vendored GPL file inside an
    MIT-licensed repo passes a repo-level allowlist filter while still
    being legally undistributable — exactly the row this audit
    surfaces.

    Semantics: a header "counts" only when a marker matches a KNOWN
    license (bare copyright lines -> UNKNOWN are ignored; the repo's
    own license files are excluded from the header side).  A header
    CONFLICTS when its ``LICENSE_RANK`` is strictly more restrictive
    than the repo verdict's; repos whose verdict is ``UNKNOWN`` (rank
    8, the most restrictive) can therefore never conflict —
    conservative by construction.  Headers inside repos with NO
    license file (verdict ``NONE``) are counted separately as
    ``n_undeclared`` (the repo grants nothing; any header is a flag).

    Scale shape: the verdict dim is ~1 row/repo (path-filtered BEFORE
    the groupBy) and broadcast back; header detection is the
    detect_license codegen chain riding the scan; everything then
    collapses in ONE map-side-combinable groupBy(repo).  Two tiny
    shuffles total, no windows, zero Python."""
    ms = markers if markers is not None else LICENSE_MARKERS
    dim = repo_license(
        df, repo_col, path_col, content_col,
        markers=ms, license_file_re=license_file_re,
    ).select(F.col("repo").alias("_lc_repo"),
             F.col("repo_license").alias("_verdict"))

    is_lic = F.coalesce(F.col(path_col), F.lit("")).rlike(license_file_re)
    d = detect_license(df, content_col, out_col="_hlic", markers=ms)
    d = d.withColumn("_hlic", F.when(~is_lic, F.col("_hlic")))

    joined = d.join(
        F.broadcast(dim), on=d[repo_col] == dim["_lc_repo"], how="left"
    ).withColumn("_verdict", F.coalesce("_verdict", F.lit(NONE)))

    def _rank(col):
        chain = None
        for name, r in LICENSE_RANK.items():
            cond = col == name
            chain = (
                F.when(cond, F.lit(r))
                if chain is None
                else chain.when(cond, F.lit(r))
            )
        return chain  # no otherwise: NONE / UNKNOWN-header -> NULL

    hreal = F.col("_hlic").isNotNull() & F.col("_hlic").isin(
        [x for x in LICENSE_RANK if x != UNKNOWN]
    )
    hrank = F.when(hreal, _rank(F.col("_hlic")))
    vrank = _rank(F.col("_verdict"))  # NONE -> NULL
    return (
        joined.groupBy(F.col(repo_col).alias("repo"))
        .agg(
            F.max("_verdict").alias("repo_license"),
            F.count(F.lit(1)).alias("n_files"),
            F.count(hrank).alias("n_header_files"),
            F.max(
                F.when(hreal, F.struct(hrank.alias("_r"),
                                       F.col("_hlic").alias("_l")))
            ).alias("_sm"),
            F.sum(
                F.when(
                    hreal & vrank.isNotNull() & (hrank > vrank), 1
                ).otherwise(0)
            ).alias("n_conflicts"),
            F.sum(
                F.when(hreal & (F.col("_verdict") == NONE), 1)
                .otherwise(0)
            ).alias("n_undeclared"),
        )
        .select(
            "repo",
            "repo_license",
            "n_files",
            "n_header_files",
            F.col("_sm._l").alias("strictest_header"),
            "n_conflicts",
            "n_undeclared",
            (F.col("n_conflicts") > 0).alias("has_conflict"),
        )
    )
