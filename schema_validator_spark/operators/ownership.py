"""Code ownership / bus-factor profiling over a commit-grain table.

Who actually maintains each file?  A curation run over a source-code
corpus wants this for two reasons: single-author files with no review
trail correlate with lower quality (the "bus factor 1" risk literature),
and author-concentration is a mixture-planning signal (bot-authored /
vendor-synced trees have degenerate ownership).

Reference anchor: the reference validates per-record fields only
(schema-validator rule/*.go); the ownership family is part of the
engine-extension surface SURVEY §2.9 mandates for the commit axis of
the north rule's (repo, path, commit, lang, content) table.

Scale shape: ONE map-side-combinable aggregation collapses the
commit-grain table to (key, author) rows — everything downstream is
author-scale, orders of magnitude smaller than the commit table.  The
ranking window partitions by the file key over that collapsed frame,
so the per-task buffer is bounded by the distinct-author count of one
file (human-scale; a pathological million-author key would need the
same salting treatment as operators/skew.py, documented here rather
than paid for everywhere).  The final per-key aggregation reuses the
window's hash partitioning — no third exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: Label that NULL / empty authors collapse to (still one real author —
#: dropping them would understate n_commits and overstate top_share).
UNKNOWN_AUTHOR = "<unknown>"


def ownership_stats(
    df: DataFrame,
    key_cols: list[str],
    author_col: str,
    *,
    majority: float = 0.5,
) -> DataFrame:
    """Per-key ownership profile: ``(key_cols..., n_commits, n_authors,
    top_author, top_share, bus_factor, hhi)``.

    - ``top_author`` — the author with the most commits on the key;
      ties break by the lexicographically smallest author name
      (deterministic).
    - ``top_share`` — top author's commit fraction, rounded 6dp.
    - ``bus_factor`` — the smallest number of authors whose combined
      commits STRICTLY exceed ``majority`` of the key's commits
      (two 50/50 authors at the default majority=0.5 → bus factor 2).
    - ``hhi`` — Herfindahl concentration ``Σ share²`` (1.0 = one
      author owns everything), rounded 6dp.

    NULL / empty author values count as one real ``<unknown>`` author.
    """
    if not 0.0 < majority < 1.0:
        raise ValueError(f"majority must be in (0, 1), got {majority}")
    for c in ("_n", "_rn", "_cum", "_total"):
        if c in df.columns:
            raise ValueError(f"ownership_stats reserves column {c!r}")

    author = F.when(
        F.coalesce(F.col(author_col), F.lit("")) == "",
        F.lit(UNKNOWN_AUTHOR),
    ).otherwise(F.col(author_col))

    per_author = df.groupBy(
        *[F.col(k) for k in key_cols], author.alias("author")
    ).agg(F.count(F.lit(1)).alias("_n"))

    w = Window.partitionBy(*key_cols).orderBy(
        F.col("_n").desc(), F.col("author").asc()
    )
    ranked = per_author.select(
        *key_cols,
        "author",
        "_n",
        F.row_number().over(w).alias("_rn"),
        F.sum("_n").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("_cum"),
        F.sum("_n").over(Window.partitionBy(*key_cols)).alias("_total"),
    )

    total = F.max("_total")
    return ranked.groupBy(*key_cols).agg(
        total.alias("n_commits"),
        F.count(F.lit(1)).alias("n_authors"),
        F.min(F.when(F.col("_rn") == 1, F.col("author"))).alias(
            "top_author"
        ),
        F.round(
            F.max(F.when(F.col("_rn") == 1, F.col("_n"))) / total, 6
        ).alias("top_share"),
        F.min(
            F.when(
                F.col("_cum") > F.lit(float(majority)) * F.col("_total"),
                F.col("_rn"),
            )
        ).alias("bus_factor"),
        F.round(
            F.sum(
                (F.col("_n") / F.col("_total"))
                * (F.col("_n") / F.col("_total"))
            ),
            6,
        ).alias("hhi"),
    )
