"""Skew handling: salted two-level aggregation + skew diagnostics.

The synthetic corpus plants a mega-repo owning ~20% of all rows
(sources/datagen.py), the shape real source-code corpora have.  A plain
``groupBy(repo)`` sends that whole repo to one reducer; AQE's skew-join
splitting handles *joins* but not *aggregations*, so heavy per-key aggs
get an explicit salted form here:

    stage 1: groupBy(key, salt)  — skewed key splits across n_salts reducers
    stage 2: groupBy(key)        — merge the (tiny) per-salt partials

Worth it only for aggs with large per-key state (collect_list/set,
exact percentiles).  For algebraic aggs (count/sum/min/max/avg) Spark's
map-side partial aggregation already bounds reducer input by the number
of map tasks — the plain form is optimal; salting would just add a
shuffle.  ``salted_*`` here therefore targets the state-heavy cases.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salt(n_salts: int, *, seed: int = 42) -> Column:
    """Uniform salt in [0, n_salts) — rand-based (row-independent)."""
    return F.floor(F.rand(seed) * n_salts).cast("int")


def key_histogram(df: DataFrame, key_cols: list[str], top: int = 20) -> DataFrame:
    """Per-key row counts + share of total — the skew diagnostic that
    decides whether salting / AQE hints are needed."""
    counts = df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("n_rows"))
    total = counts.agg(F.sum("n_rows").alias("_total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .withColumn("share", F.round(F.col("n_rows") / F.col("_total"), 6))
        .drop("_total")
        .orderBy(F.col("n_rows").desc())
        .limit(top)
    )


def salted_collect_set(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    *,
    n_salts: int = 16,
) -> DataFrame:
    """collect_set per key without a single hot reducer: per-salt sets,
    then flatten+distinct at merge (state per reducer divided by n_salts)."""
    stage1 = (
        df.withColumn("_salt", salt(n_salts))
        .groupBy(*key_cols, "_salt")
        .agg(F.collect_set(value_col).alias("_part"))
    )
    return stage1.groupBy(*key_cols).agg(
        F.array_distinct(F.flatten(F.collect_list("_part"))).alias(f"{value_col}_set")
    )


def salted_count_distinct(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    *,
    n_salts: int = 16,
) -> DataFrame:
    """Exact distinct count per skewed key: dedup on (key, salt-by-value)
    first — the salt is the value hash, so duplicates land on the same
    reducer and the count is exact — then sum partial distincts."""
    stage1 = (
        df.select(*key_cols, F.col(value_col))
        # SQL count(distinct) ignores NULL; drop it here too (a NULL value
        # would survive dropDuplicates and inflate the count by one).
        .filter(F.col(value_col).isNotNull())
        .withColumn("_salt", F.pmod(F.xxhash64(F.col(value_col)), n_salts))
        .dropDuplicates([*key_cols, value_col])
        .groupBy(*key_cols, "_salt")
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    return stage1.groupBy(*key_cols).agg(
        F.sum("_n").alias(f"{value_col}_n_distinct")
    )


def repartition_salted(
    df: DataFrame, key_cols: list[str], *, n_salts: int = 8,
    num_partitions: int | None = None,
) -> DataFrame:
    """Spread a skewed key's rows across n_salts partitions while keeping
    co-residence *per salt* (downstream per-partition work balances even
    when one key dominates).  Use before per-partition heavy transforms
    (applyInPandas sketches), not before exact per-key aggs."""
    cols = [F.col(c) for c in key_cols] + [salt(n_salts)]
    if num_partitions:
        return df.repartition(num_partitions, *cols)
    return df.repartition(*cols)
