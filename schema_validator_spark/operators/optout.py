"""Opt-out filtering for a source-code corpus (The Stack's takedown gate).

Public code datasets honor removal requests at two grains: a whole
GitHub *owner* (user or org asks for everything out) and a single
*repository*.  The Stack re-applies the accumulated opt-out list on
every release; any corpus builder over the north rule's
``(repo, path, commit, lang, content)`` table needs the same gate, and
an auditable record of what the gate removed.

Reference anchor: the reference validates per-record fields only
(schema-validator rule/*.go); the opt-out gate belongs to the
engine-extension surface SURVEY §2.9 mandates for corpus governance
(same family as functions/url.py's domain blocklist for web text).

Scale shape: opt-out lists are human-request-scale (thousands at
most), so both match tiers compile to literal ``InSet`` predicates —
pure whole-stage codegen, ZERO joins and ZERO shuffles for the filter
itself.  The audit adds ONE map-side-combinable groupBy on the repo
key.  If a list ever outgrew literal form, the DataFrame tier is a
broadcast ``left_anti`` exactly like functions/url.py's
``filter_blocked_domains`` (0-Exchange, plan-pinned there).
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _owner(repo_col: str, sep: str):
    """Owner prefix of ``owner/name`` — everything before the first
    separator; a repo with no separator is its own owner."""
    return F.substring_index(F.col(repo_col), sep, 1)


def _reason(repo_col: str, owners, repos, sep: str):
    """Removal reason or NULL.  Exact-repo matches take priority over
    owner matches so the audit attributes the *narrowest* request."""
    reason = F.lit(None).cast("string")
    if owners:
        reason = F.when(
            _owner(repo_col, sep).isin(list(owners)), F.lit("owner")
        ).otherwise(reason)
    if repos:
        reason = F.when(
            F.col(repo_col).isin(list(repos)), F.lit("repo")
        ).otherwise(reason)
    return reason


def filter_optout(
    df: DataFrame,
    repo_col: str,
    *,
    owners: Iterable[str] = (),
    repos: Iterable[str] = (),
    sep: str = "/",
) -> DataFrame:
    """Rows whose repo survives the opt-out lists.

    ``owners`` removes every repo whose ``owner/...`` prefix matches;
    ``repos`` removes exact repo names.  NULL repos are kept (they are
    an ingest-integrity problem for the validation suite, not an
    opt-out request).  Both lists become ``InSet`` literals — the gate
    is a single codegen filter, no join, no shuffle.
    """
    owners, repos = list(owners), list(repos)
    if not owners and not repos:
        return df
    return df.where(_reason(repo_col, owners, repos, sep).isNull())


def optout_audit(
    df: DataFrame,
    repo_col: str,
    *,
    owners: Iterable[str] = (),
    repos: Iterable[str] = (),
    sep: str = "/",
) -> DataFrame:
    """Per-repo record of what :func:`filter_optout` removes:
    ``(repo, owner, reason, n_files)`` with ``reason`` in
    ``{'repo', 'owner'}`` (exact-repo wins when both match).

    One codegen scan + ONE map-side-combinable groupBy on the repo
    key — the output is removed-repo-scale, not corpus-scale.
    """
    owners, repos = list(owners), list(repos)
    reason = _reason(repo_col, owners, repos, sep)
    return (
        df.select(
            F.col(repo_col).alias("repo"),
            _owner(repo_col, sep).alias("owner"),
            reason.alias("reason"),
        )
        .where(F.col("reason").isNotNull())
        .groupBy("repo", "owner", "reason")
        .agg(F.count(F.lit(1)).alias("n_files"))
    )
