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
(SQL FK semantics ignore NULL references); a column appears even when
it shares no values with anything (coverage 0 rows are materialized,
not silently absent).

Scale shape: one stack-unpivot per table rides its scan; DISTINCT
(column, value) is a map-side-combined shuffle bounded by total
distinct values; the co-occurrence self-join groups per VALUE, whose
bucket is at most the number of profiled columns (a constant — no
degenerate bucket possible); the final frame is #columns² rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def discover_inclusions(
    tables: dict[str, DataFrame],
    columns: dict[str, list[str]],
    *,
    min_coverage: float = 1.0,
) -> DataFrame:
    """``(from_id, to_id, n_from, n_common, coverage, holds)`` for every
    ordered pair of profiled columns (ids are ``table.column``).
    ``coverage`` = |distinct(from) ∩ distinct(to)| / |distinct(from)|,
    rounded 6dp; ``holds`` = coverage >= ``min_coverage``."""
    if not 0 < min_coverage <= 1.0:
        raise ValueError("min_coverage must be in (0, 1]")
    frames = []
    for tname, cols in columns.items():
        if tname not in tables:
            raise ValueError(f"no DataFrame given for table {tname!r}")
        df = tables[tname]
        for c in cols:
            frames.append(
                df.select(
                    F.lit(f"{tname}.{c}").alias("cid"),
                    F.col(c).cast("string").alias("v"),
                ).filter(F.col("v").isNotNull())
            )
    if len(frames) < 2:
        raise ValueError("need at least two profiled columns")
    d = frames[0]
    for f in frames[1:]:
        d = d.unionByName(f)
    d = d.distinct()

    na = d.groupBy("cid").agg(F.count(F.lit(1)).alias("n"))
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
    cov = F.round(
        F.coalesce(F.col("n_common"), F.lit(0)).cast("double")
        / F.col("n_from"),
        6,
    )
    return (
        pairs.join(F.broadcast(common), on=["from_id", "to_id"], how="left")
        .select(
            "from_id",
            "to_id",
            "n_from",
            F.coalesce(F.col("n_common"), F.lit(0))
            .cast("long").alias("n_common"),
            cov.alias("coverage"),
            (cov >= F.lit(float(min_coverage))).alias("holds"),
        )
    )
