"""Per-group contribution caps — the FineWeb/RefinedWeb "no single
domain dominates the corpus" stage: cap every group (registered
domain, source, repo) at ``cap`` rows, keeping a DETERMINISTIC
pseudo-random subset (md5-rank) so reruns and replays agree, and
report what was dropped per group.

Scale shape — the hot-group-safe form:

1. group counts: one map-side-combinable agg (key grain).
2. rows of UNDER-cap groups pass through UNTOUCHED — no rank, no
   window, no shuffle beyond the count join.  At web scale this is
   almost every row (the whole point of the cap is that only a few
   groups are huge).
3. rows of OVER-cap groups go through a salted two-level bottom-N:
   level 1 ranks within (group, salt-of-id) and keeps ``cap`` per
   salt — the hottest domain fans out over ``n_salts`` reducers, not
   one; level 2 ranks the <= n_salts * cap survivors per group.  The
   global bottom-N is contained in the union of per-salt bottom-Ns,
   so the result is identical to a single-window rank.
4. the over/under routing join is group-grain against the count
   frame (AQE broadcasts it when it fits).

Rows whose group key is NULL pass through uncapped — "no domain" is
not a domain.  The keep order is ``(md5(id), id)`` ascending: a
content-independent uniform draw any SQL engine replays exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _rank_key(id_col: str):
    return F.md5(F.col(id_col).cast("string"))


def cap_per_group(
    df: DataFrame,
    group_col: str,
    id_col: str,
    *,
    cap: int,
    n_salts: int = 64,
) -> DataFrame:
    """Input rows minus the over-cap remainder of each group: every
    group contributes at most ``cap`` rows, chosen by ascending
    ``(md5(id), id)``.  NULL-group rows always pass through."""
    if cap < 1:
        raise ValueError("cap must be >= 1")
    for c in ("_gn", "_gc", "_rn"):
        if c in df.columns:
            raise ValueError(f"reserved temp column {c!r} present in input")
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("_gn"))
    routed = df.join(
        counts.withColumnRenamed(group_col, "_gc").select(
            F.col("_gc"), "_gn"
        ),
        F.col(group_col).eqNullSafe(F.col("_gc")),
    ).drop("_gc")
    under = routed.filter(
        F.col(group_col).isNull() | (F.col("_gn") <= cap)
    ).drop("_gn")
    over = routed.filter(
        F.col(group_col).isNotNull() & (F.col("_gn") > cap)
    ).drop("_gn")

    rk = _rank_key(id_col)
    w1 = Window.partitionBy(
        F.col(group_col), F.pmod(F.xxhash64(F.col(id_col)), n_salts)
    ).orderBy(rk.asc(), F.col(id_col).asc())
    w2 = Window.partitionBy(F.col(group_col)).orderBy(
        rk.asc(), F.col(id_col).asc()
    )
    kept_over = (
        over.withColumn("_rn", F.row_number().over(w1))
        .filter(F.col("_rn") <= cap)
        .withColumn("_rn", F.row_number().over(w2))
        .filter(F.col("_rn") <= cap)
        .drop("_rn")
    )
    return under.unionByName(kept_over)


def group_cap_report(
    df: DataFrame,
    group_col: str,
    *,
    cap: int,
) -> DataFrame:
    """Key-grain audit: ``(group_col, n_rows, n_kept, n_dropped)`` —
    what :func:`cap_per_group` keeps/drops per group (NULL groups are
    reported with n_kept = n_rows)."""
    if cap < 1:
        raise ValueError("cap must be >= 1")
    n = F.col("n_rows")
    kept = F.when(
        F.col(group_col).isNull() | (n <= cap), n
    ).otherwise(F.lit(cap).cast("long"))
    return (
        df.groupBy(group_col)
        .agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
        .select(
            group_col,
            "n_rows",
            kept.alias("n_kept"),
            (n - kept).alias("n_dropped"),
        )
    )
