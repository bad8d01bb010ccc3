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


def detect_hot_keys(
    df: DataFrame,
    key_cols: list[str],
    *,
    min_share: float = 0.01,
    max_keys: int = 1000,
) -> list[tuple]:
    """Exact hot-key detection: keys owning >= ``min_share`` of all rows.

    One map-side-combinable count agg (reducer input is bounded by
    #distinct keys x #map tasks, never by rows), then a bounded collect —
    at most ``1/min_share`` keys can exceed the share, so the result is
    metadata-sized by construction (``max_keys`` is a belt-and-braces
    cap).  NULL keys are reported too (a NULL hot key is the single most
    common real-world skew bug).
    """
    n_total = df.count()
    if n_total == 0:
        return []
    thresh = max(1, int(n_total * min_share))
    rows = (
        df.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") >= thresh)
        .orderBy(F.col("_n").desc())
        .limit(max_keys)
        .collect()
    )
    return [tuple(r[c] for c in key_cols) for r in rows]


def frequent_items_exact(
    df: DataFrame,
    col: str,
    *,
    support: float = 0.01,
) -> DataFrame:
    """EXACT heavy hitters: every value owning >= ``support`` of the rows,
    with its exact count — without ever shuffling the full key space.

    Two single-pass scans:

    1. candidate generation via ``df.stat.freqItems`` — Spark's built-in
       one-pass frequent-items sketch (Karp-Shenker-Papadimitriou /
       Misra-Gries family): per-partition counter summaries merged in a
       treeAggregate, NO shuffle, result bounded by ``1/support`` items.
       The sketch admits false positives but NEVER false negatives, so
       the candidate set provably contains every true heavy hitter;
    2. one exact count over the candidate set only (an ``isin`` filter the
       scan pushes down), so the groupBy shuffles at most ``1/support``
       distinct keys instead of the full cardinality.

    Contrast :func:`detect_hot_keys`: that one groupBys ALL keys — fine
    when cardinality is modest, wasteful at 10^9+ distinct keys; this
    form's shuffle is bounded by the support threshold, independent of
    cardinality.  NULL is a legitimate heavy hitter and is counted.
    """
    cand_row = df.stat.freqItems([col], support).first()
    cand = list(cand_row[0]) if cand_row[0] is not None else []
    has_null = any(c is None for c in cand)
    non_null = [c for c in cand if c is not None]
    keep = F.col(col).isin(non_null) if non_null else F.lit(False)
    if has_null:
        keep = keep | F.col(col).isNull()
    tot = df.agg(F.count(F.lit(1)).alias("_n"))
    return (
        df.filter(keep)
        .groupBy(F.col(col).alias("item"))
        .agg(F.count(F.lit(1)).alias("n_item"))
        .crossJoin(F.broadcast(tot))
        .filter(F.col("n_item") >= F.lit(support) * F.col("_n"))
        .drop("_n")
    )


def skew_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    *,
    how: str = "inner",
    hot_keys: list | None = None,
    min_share: float = 0.01,
) -> DataFrame:
    """Differentiated equi-join for a skewed fact key: hot keys take a
    broadcast hash join (their dim rows are at most ``len(hot_keys)``
    rows — always broadcastable), cold keys take the normal shuffle
    join; the union is row-identical to ``fact.join(dim, ...)``.

    Why not just AQE: AQE's skew-join split handles sort-merge joins
    whose skew shows up at shuffle time, but (a) it never converts the
    hot portion to a broadcast (the dim side is still shuffled), and
    (b) it can't help when the downstream op re-uses the fact's hash
    partitioning.  The explicit split removes the hot keys from the
    shuffle ENTIRELY: at 10^12 rows a mega-repo owning 20% of the fact
    table contributes zero bytes to the exchange.

    NULL fact keys never match in an equi-join; they are routed to the
    cold side unchanged so outer-join semantics are preserved exactly.

    ``how`` supports inner / left / left_outer (the fact-preserving
    shapes; a right/full join against a *dim* table is a different
    problem — broadcast the whole dim instead).
    """
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(f"skew_join supports inner/left joins, got {how!r}")
    if hot_keys is None:
        hot_keys = [k for (k,) in detect_hot_keys(
            fact, [fact_key], min_share=min_share)]
    else:
        hot_keys = list(hot_keys)
    cond = fact[fact_key] == dim[dim_key]
    if not hot_keys:
        return fact.join(dim, cond, how)
    non_null_hot = [k for k in hot_keys if k is not None]
    is_hot = F.col(fact_key).isin(non_null_hot) if non_null_hot else F.lit(False)
    # NULL keys: cold path (equi-join never matches them; inner drops,
    # left preserves — both exactly as the plain join would).
    fact_hot = fact.filter(is_hot)
    fact_cold = fact.filter(~is_hot | F.col(fact_key).isNull())
    dim_hot = dim.filter(
        F.col(dim_key).isin(non_null_hot) if non_null_hot else F.lit(False)
    )
    cold = fact_cold.join(dim, fact_cold[fact_key] == dim[dim_key], how)
    hot = fact_hot.join(
        F.broadcast(dim_hot), fact_hot[fact_key] == dim_hot[dim_key], how
    )
    # positional union: both branches are fact-subset JOIN dim-subset, so
    # their layouts are identical (fact.columns ++ dim.columns) BY
    # CONSTRUCTION.  unionByName would raise on the duplicate column the
    # output legitimately has when fact_key == dim_key share a name —
    # the very case the plain join (our row-identity contract) tolerates.
    return cold.union(hot)


def salted_replicate_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    *,
    how: str = "inner",
    hot_keys: list | None = None,
    min_share: float = 0.01,
    n_salts: int = 16,
) -> DataFrame:
    """Skew join for when even the HOT dim rows are too wide/many to
    broadcast: replicate each hot dim row across ``n_salts`` salts and
    give each hot fact row a deterministic salt, turning one hot reducer
    into ``n_salts`` balanced ones.  Cold keys join with salt 0 on both
    sides (no replication).  Row-identical to the plain join.

    The fact salt is ``xxhash64(monotonically_increasing_id) % n_salts``
    — row-unique input, so the hot rows spread uniformly without an RNG
    (deterministic re-runs, no rand() re-evaluation hazard under
    shuffle replays).
    """
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(
            f"salted_replicate_join supports inner/left joins, got {how!r}"
        )
    if hot_keys is None:
        hot_keys = [k for (k,) in detect_hot_keys(
            fact, [fact_key], min_share=min_share)]
    non_null_hot = [k for k in hot_keys if k is not None]
    if not non_null_hot:
        return fact.join(dim, fact[fact_key] == dim[dim_key], how)
    fact_hot = F.col(fact_key).isin(non_null_hot)
    f = fact.withColumn(
        "_fsalt",
        F.when(
            fact_hot,
            F.pmod(F.xxhash64(F.monotonically_increasing_id()), n_salts),
        ).otherwise(F.lit(0)).cast("int"),
    )
    dim_hot = F.col(dim_key).isin(non_null_hot)
    d = dim.withColumn(
        "_dsalts",
        F.when(dim_hot, F.sequence(F.lit(0), F.lit(n_salts - 1)))
        .otherwise(F.array(F.lit(0))),
    ).withColumn("_dsalt", F.explode("_dsalts")).drop("_dsalts")
    out = f.join(
        d,
        (f[fact_key] == d[dim_key]) & (f["_fsalt"] == d["_dsalt"]),
        how,
    )
    return out.drop("_fsalt", "_dsalt")
