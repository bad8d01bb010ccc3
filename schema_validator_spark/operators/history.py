"""File-version history over the north rule's (repo, path, commit,
lang, content) source-code table — head-version selection and per-file
churn, the commit-grain axis of the code pack.

A repository table at corpus scale carries MANY versions of each file
(one row per (repo, path, commit)); every downstream stage — dedup,
quality, training-data export — wants exactly one: the head.  The Stack
and CodeParrot pipelines both start with this "keep latest visible
version" step.  Churn stats are the other side of the same groupBy:
how often a file is rewritten (versions vs distinct contents) is a
strong generated-file / lockfile signal and feeds freshness gates.

Reference analog: the reference validates one value at a time
(rule/compare.go's ordering rules); this is the table-level ordering
primitive those row rules can't express — arg-max per key across rows.

Scale shape (PLANS.md): ONE hash shuffle on the file key for either
function.  ``latest_files`` is a map-side-combinable ``max(struct(
version, tiebreak, payload...))`` arg-max — no window, no sort, no hot
reducer (a pathological file with 10^6 commits still combines
map-side).  ``churn_stats`` rides the same groupBy; its
count(distinct sha) is the only two-phase term and it shuffles
(key, sha) rows, bounded by distinct versions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _check_reserved(cols: list[str], key_cols: list[str]) -> None:
    # internal struct/agg field names: an input column named _v would
    # make `_head._v` ambiguous; _head/_s would shadow the agg aliases
    clash = sorted({"_v", "_s", "_head"} & set([*cols, *key_cols]))
    if clash:
        raise ValueError(
            "history operators reserve these column names; rename the "
            f"input columns: {clash}"
        )


def latest_files(
    df: DataFrame,
    key_cols: list[str],
    version_col: str,
    *,
    payload_cols: list[str] | None = None,
) -> DataFrame:
    """One row per key: the payload of the row with the greatest
    ``version_col`` (head version).  Returns ``(key_cols...,
    version_col, payload_cols...)``.

    Ties on the version are broken by the greatest payload tuple
    (struct comparison is field-order lexicographic) — deterministic,
    documented.  NULL versions sort first (Spark struct max treats
    NULL fields as smallest), so a key whose every version is NULL
    still emits one row.

    Plan: map-side-combinable ``max(struct(...))`` — one Exchange on
    the key, no window/sort.
    """
    if payload_cols is None:
        payload_cols = [
            c for c in df.columns
            if c not in key_cols and c != version_col
        ]
    _check_reserved(payload_cols, key_cols)
    packed = F.max(
        F.struct(
            F.col(version_col).alias("_v"),
            *[F.col(c).alias(c) for c in payload_cols],
        )
    ).alias("_head")
    out = df.groupBy(*[F.col(k) for k in key_cols]).agg(packed)
    return out.select(
        *key_cols,
        F.col("_head._v").alias(version_col),
        *[F.col(f"_head.{c}").alias(c) for c in payload_cols],
    )


def churn_stats(
    df: DataFrame,
    key_cols: list[str],
    version_col: str,
    content_col: str,
) -> DataFrame:
    """Per-key version churn: ``(key_cols..., n_versions,
    n_distinct_versions, first_version, last_version, head_sha,
    churn_ratio)``.

    ``n_distinct_versions`` counts distinct content sha256s (NULL
    content hashes as the empty string, so it still counts one
    version); ``head_sha`` is the content hash of the greatest
    version (ties -> greatest sha, same contract as latest_files);
    ``churn_ratio`` = 1 - distinct/versions, rounded 6dp: 0 means every
    commit produced a new content state (organic edits); values near 1
    mean the file keeps flipping between identical states — a
    generated-file / lockfile signal.

    Plan: ONE groupBy on the key; every term map-side combinable
    except the count(distinct sha) two-phase agg.
    """
    _check_reserved([version_col, content_col], key_cols)
    sha = F.sha2(F.coalesce(F.col(content_col), F.lit("")), 256)
    out = df.groupBy(*[F.col(k) for k in key_cols]).agg(
        F.count(F.lit(1)).alias("n_versions"),
        F.count_distinct(sha).alias("n_distinct_versions"),
        F.min(version_col).alias("first_version"),
        F.max(version_col).alias("last_version"),
        F.max(
            F.struct(F.col(version_col).alias("_v"), sha.alias("_s"))
        ).alias("_head"),
    )
    return out.select(
        *key_cols,
        "n_versions",
        "n_distinct_versions",
        "first_version",
        "last_version",
        F.col("_head._s").alias("head_sha"),
        F.round(
            1 - F.col("n_distinct_versions") / F.col("n_versions"), 6
        ).alias("churn_ratio"),
    )
