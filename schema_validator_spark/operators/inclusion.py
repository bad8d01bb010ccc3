"""Inclusion-dependency discovery (FK discovery) — the profiling
counterpart of operators/referential.py: that operator VERIFIES a
foreign key you already know; this one FINDS the candidate keys, by
measuring, for every ordered column pair across tables, how much of
column A's value set lives inside column B's.  coverage == 1.0 is an
inclusion dependency (A ⊆ B, the classic FK signal); 0.99 is a dirty
FK worth a referential_violations run.  (Deequ has no analog; the
Metanome/SINDY profiling family does — same unary-IND semantics.)

Semantics: values compare as strings (cast once, so an int FK against
a bigint PK still matches — the Bloom-tier lesson); NULLs are excluded
(SQL FK semantics ignore NULL references); every requested column pair
is materialized — zero shared values shows as coverage 0, and an
all-NULL column shows with n_from = 0 and coverage/holds NULL
(vacuous), never silently absent.  ``holds`` at min_coverage=1.0 is
the INTEGER test ``n_common == n_from`` — a 6dp-rounded 0.9999997
cannot masquerade as an exact inclusion dependency.

Scale shape: ONE stack-unpivot per table rides its scan (the
profile.py pattern — not a scan per column); DISTINCT (column, value)
is a map-side-combined shuffle bounded by total distinct values; the
co-occurrence self-join groups per VALUE, whose bucket is at most the
number of profiled columns (a constant — no degenerate bucket
possible); the final frame is #columns² rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _unpivot(df: DataFrame, tname: str, cols: list[str]) -> DataFrame:
    parts = ", ".join(
        f"'{tname}.{c}', cast(`{c}` as string)" for c in cols
    )
    return df.selectExpr(
        f"stack({len(cols)}, {parts}) as (cid, v)"
    ).filter(F.col("v").isNotNull())


def discover_inclusions(
    tables: dict[str, DataFrame],
    columns: dict[str, list[str]],
    *,
    min_coverage: float = 1.0,
) -> DataFrame:
    """``(from_id, to_id, n_from, n_common, coverage, holds)`` for every
    ordered pair of profiled columns (ids are ``table.column``).
    ``coverage`` = |distinct(from) ∩ distinct(to)| / |distinct(from)|,
    rounded 6dp (NULL when the from-column is all NULL); ``holds`` is
    exact: ``n_common == n_from`` at min_coverage=1.0, else the
    UNROUNDED ratio >= ``min_coverage``."""
    if not 0 < min_coverage <= 1.0:
        raise ValueError("min_coverage must be in (0, 1]")
    frames, all_ids = [], []
    for tname, cols in columns.items():
        if tname not in tables:
            raise ValueError(f"no DataFrame given for table {tname!r}")
        all_ids.extend(f"{tname}.{c}" for c in cols)
        frames.append(_unpivot(tables[tname], tname, cols))
    if len(all_ids) < 2:
        raise ValueError("need at least two profiled columns")
    spark = next(iter(tables.values())).sparkSession
    d = frames[0]
    for f in frames[1:]:
        d = d.unionByName(f)
    d = d.distinct()

    # every requested column participates, even if all-NULL (n = 0)
    ids = spark.createDataFrame([(i,) for i in all_ids], "cid string")
    na = ids.join(
        d.groupBy("cid").agg(F.count(F.lit(1)).alias("n")),
        on="cid", how="left",
    ).select("cid", F.coalesce(F.col("n"), F.lit(0)).alias("n"))
    common = (
        d.alias("a")
        .join(d.alias("b"), on="v")
        .filter(F.col("a.cid") != F.col("b.cid"))
        .groupBy(
            F.col("a.cid").alias("from_id"), F.col("b.cid").alias("to_id")
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    pairs = (
        na.select(F.col("cid").alias("from_id"), F.col("n").alias("n_from"))
        .crossJoin(
            F.broadcast(na.select(F.col("cid").alias("to_id")))
        )
        .filter(F.col("from_id") != F.col("to_id"))
    )
    nc = F.coalesce(F.col("n_common"), F.lit(0)).cast("long")
    cov = F.when(
        F.col("n_from") > 0,
        F.round(nc.cast("double") / F.col("n_from"), 6),
    )
    if min_coverage == 1.0:
        ok = nc == F.col("n_from")
    else:
        ok = (nc.cast("double") / F.col("n_from")) >= F.lit(
            float(min_coverage)
        )
    return (
        pairs.join(F.broadcast(common), on=["from_id", "to_id"], how="left")
        .select(
            "from_id",
            "to_id",
            "n_from",
            nc.alias("n_common"),
            cov.alias("coverage"),
            F.when(F.col("n_from") > 0, ok).alias("holds"),
        )
    )
