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


def _repo_content_sets(
    df: DataFrame,
    repo_col: str,
    content_col: str,
    max_repos_per_content: int | None,
    log_dropped: bool,
    what: str,
) -> DataFrame:
    """Distinct ``(_repo, _h)`` frame (sha256 of non-empty contents),
    hot boilerplate hashes capped + logged."""
    c = F.col(content_col)
    rc = (
        df.filter(c.isNotNull() & (F.length(c) > 0))
        .select(
            F.col(repo_col).alias("_repo"),
            F.sha2(c.cast("string"), 256).alias("_h"),
        )
        .distinct()
    )
    return _cap_hot_buckets(
        rc, ["_h"], max_repos_per_content,
        what=what, log_dropped=log_dropped,
    )


def _pair_counts(rc: DataFrame) -> DataFrame:
    """``(repo_a, repo_b, shared_files)`` from a distinct (_repo, _h)
    frame — hash self-join, bucket size = repos sharing the content."""
    a, b = rc.alias("a"), rc.alias("b")
    return (
        a.join(b, on="_h")
        .filter(F.col("a._repo") < F.col("b._repo"))
        .groupBy(
            F.col("a._repo").alias("repo_a"),
            F.col("b._repo").alias("repo_b"),
        )
        .agg(F.count(F.lit(1)).alias("shared_files"))
    )


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
    rc = _repo_content_sets(
        df, repo_col, content_col, max_repos_per_content,
        log_dropped, "shared_content_pairs",
    )
    return _pair_counts(rc).filter(F.col("shared_files") >= min_shared)


def repo_similarity(
    df: DataFrame,
    repo_col: str,
    content_col: str,
    *,
    min_jaccard: float = 0.0,
    max_repos_per_content: int | None = None,
    log_dropped: bool = True,
) -> DataFrame:
    """Fork / vendored-tree detection: ``(repo_a, repo_b,
    shared_files, n_a, n_b, jaccard, containment)`` with
    ``repo_a < repo_b`` — set similarity between the repos' DISTINCT
    content-sha sets.  ``jaccard`` = shared / (n_a + n_b - shared);
    ``containment`` = shared / min(n_a, n_b), the fork signal (a fork
    that added files keeps containment ~1 while jaccard drifts down).
    Both rounded 6dp.

    Set sizes are computed on the SAME capped frame as the pair
    counts, so when ``max_repos_per_content`` drops boilerplate the
    similarity is the exact Jaccard over the capped universe
    (shared <= min(n_a, n_b) always holds — never a ratio > 1).

    Scale shape: everything in shared_content_pairs plus one
    repo-scale size agg joined onto the pair frame twice (repo-dim
    sized — broadcastable)."""
    if not 0.0 <= min_jaccard <= 1.0:
        raise ValueError("min_jaccard must be in [0, 1]")
    rc = _repo_content_sets(
        df, repo_col, content_col, max_repos_per_content,
        log_dropped, "repo_similarity",
    )
    sizes = rc.groupBy(F.col("_repo")).agg(
        F.count(F.lit(1)).alias("_n")
    )
    pairs = _pair_counts(rc)
    sa = sizes.select(
        F.col("_repo").alias("repo_a"), F.col("_n").alias("n_a")
    )
    sb = sizes.select(
        F.col("_repo").alias("repo_b"), F.col("_n").alias("n_b")
    )
    sh = F.col("shared_files")
    out = (
        pairs.join(F.broadcast(sa), "repo_a")
        .join(F.broadcast(sb), "repo_b")
        .select(
            "repo_a", "repo_b", "shared_files", "n_a", "n_b",
            F.round(
                sh / (F.col("n_a") + F.col("n_b") - sh), 6
            ).alias("jaccard"),
            F.round(
                sh / F.least(F.col("n_a"), F.col("n_b")), 6
            ).alias("containment"),
        )
    )
    if min_jaccard > 0.0:
        out = out.filter(F.col("jaccard") >= min_jaccard)
    return out


def fork_dedup(
    df: DataFrame,
    repo_col: str,
    content_col: str,
    *,
    min_jaccard: float = 0.8,
    max_repos_per_content: int | None = None,
    log_dropped: bool = True,
    max_iters: int = 20,
) -> DataFrame:
    """Repo-level dedup: cluster repos whose content-sha Jaccard
    reaches ``min_jaccard`` (transitively — a fork-of-a-fork joins the
    family through its parent even when far from the root) and pick
    ONE canonical repo per family: most distinct contents, ties to the
    lexicographically greatest name (deterministic, documented).
    Returns EVERY repo with a non-empty file:
    ``(repo, n_files, canonical_repo, is_canonical)`` — singletons are
    their own canonical.

    This is The Stack's repo-grain dedup step: train on the canonical,
    drop the forks.

    Scale shape: repo_similarity's plan + connected components at
    fork-pair scale (dedup.cluster_pairs: 1 job/iter, O(diameter)
    iterations — fork families are shallow) + a family-scale arg-max
    dim broadcast back onto the repo-dim-sized size frame."""
    from .dedup import cluster_pairs

    rc = _repo_content_sets(
        df, repo_col, content_col, max_repos_per_content,
        log_dropped, "fork_dedup",
    )
    sizes = rc.groupBy(F.col("_repo").alias("repo")).agg(
        F.count(F.lit(1)).alias("n_files")
    )
    pairs = repo_similarity(
        df, repo_col, content_col,
        min_jaccard=min_jaccard,
        max_repos_per_content=max_repos_per_content,
        log_dropped=False,
    )
    clusters = cluster_pairs(
        pairs.select("repo_a", "repo_b"), id_a="repo_a", id_b="repo_b",
        max_iters=max_iters,
    ).select(F.col("doc_id").alias("repo"), "cluster_id")
    labeled = sizes.join(clusters, "repo", "left").withColumn(
        "_family", F.coalesce(F.col("cluster_id"), F.col("repo"))
    )
    canon = labeled.groupBy("_family").agg(
        F.max(
            F.struct(
                F.col("n_files").alias("_n"),
                F.col("repo").alias("_r"),
            )
        )["_r"].alias("canonical_repo")
    )
    return (
        labeled.join(F.broadcast(canon), "_family")
        .select(
            "repo",
            "n_files",
            "canonical_repo",
            (F.col("repo") == F.col("canonical_repo"))
            .cast("int")
            .alias("is_canonical"),
        )
    )
