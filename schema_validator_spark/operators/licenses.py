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
