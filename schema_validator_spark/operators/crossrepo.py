"""Cross-repo shared-content detection — fork / vendored-code audit
over the north rule's (repo, path, commit, lang, content) table: which
repo PAIRS share how many identical files?  Vendored dependencies,
forks, and template boilerplate all surface as high shared-file counts;
the per-file signal is the same content sha256 the north rule pins as
the row invariant (BASELINE.json input_hint), so the audit composes
with sha256_invariant for free.

Scale shape: contents hash on the scan (sha256 — 64-bit hashes collide
~n²/2⁶⁵ ≈ tens of thousands of times at 10^12 files, silently merging
different files; 256-bit never); distinct (repo, hash) is ONE
map-side-combined shuffle at file scale; the hash self-join's bucket
size is "repos sharing this content" — empty files and LICENSE
boilerplate form the hot buckets, capped + logged exactly like the LSH
tiers (``max_repos_per_content``); pair aggregation is pair-scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import _cap_hot_buckets


def shared_content_pairs(
    df: DataFrame,
    repo_col: str,
    content_col: str,
    *,
    min_shared: int = 1,
    max_repos_per_content: int | None = None,
    log_dropped: bool = True,
) -> DataFrame:
    """``(repo_a, repo_b, shared_files)`` with ``repo_a < repo_b`` —
    the number of DISTINCT contents present in both repos (duplicates
    within a repo count once).  NULL / empty contents are excluded.
    ``max_repos_per_content`` drops contents shared by more than that
    many repos (boilerplate; drop count logged, never silent)."""
    if min_shared < 1:
        raise ValueError("min_shared must be >= 1")
    c = F.col(content_col)
    rc = (
        df.filter(c.isNotNull() & (F.length(c) > 0))
        .select(
            F.col(repo_col).alias("_repo"),
            F.sha2(c.cast("string"), 256).alias("_h"),
        )
        .distinct()
    )
    rc = _cap_hot_buckets(
        rc, ["_h"], max_repos_per_content,
        what="shared_content_pairs", log_dropped=log_dropped,
    )
    a, b = rc.alias("a"), rc.alias("b")
    return (
        a.join(b, on="_h")
        .filter(F.col("a._repo") < F.col("b._repo"))
        .groupBy(
            F.col("a._repo").alias("repo_a"),
            F.col("b._repo").alias("repo_b"),
        )
        .agg(F.count(F.lit(1)).alias("shared_files"))
        .filter(F.col("shared_files") >= min_shared)
    )
