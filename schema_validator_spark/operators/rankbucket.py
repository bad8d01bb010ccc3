"""Per-group exact rank + quantile-bucket labels — CCNet's
head/middle/tail quality bucketing (Wenzek et al. 2020 §4.3: rank
each language's documents by LM perplexity and cut into thirds; the
head/middle buckets are what LLaMA-class corpora train on).  Works
for any (group, score) pair: perplexity buckets per language,
length buckets per domain, classifier-score deciles.

Scale shape — DISTRIBUTED exact rank, no per-group total sort: a
window ``row_number() over (partition by lang order by score)`` makes
the dominant language ONE sort task.  Instead (the
``sample_token_budget`` two-pass shape, sampling.py):

1. one tiny agg per group finds (min, max) of the scaled score and a
   count; 2. each row gets a RANGE key — a monotone 256-way bucketing
   of the score between its group's min/max — so (range, score, id)
   order equals (score, id) order; 3. per-(group, range) counts
   cumsum into range offsets over the tiny #groups x 256 frame;
   4. rank = offset + row_number within (group, range) — the dominant
   group sorts as up to 256 parallel tasks, not one.  Value-skewed
   scores degrade balance, never correctness (ties share a range by
   construction and break by id).

Bucket labels use integer cross-multiplication — ``bucket b`` iff
``rank * n_buckets <= (b + 1) * n`` first holds — so no float ever
decides a boundary and any engine replaying
``row_number() over (...)`` reproduces the labels exactly.

Reference anchor: deterministic total order mirrors the reference's
sorted violation emission (SURVEY §5 error-ordering note); part of
the engine-extension surface SURVEY §2.9 mandates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: canonical CCNet labels for n_buckets=3, else b0..b{k-1}
CCNET_LABELS = ["head", "middle", "tail"]


def rank_buckets(
    df: DataFrame,
    group_cols: list[str],
    score_col: str,
    id_col: str,
    *,
    n_buckets: int = 3,
    n_ranges: int = 256,
    max_groups: int = 32_768,
) -> DataFrame:
    """All input columns + ``(rank, group_n, bucket)``: ``rank`` is
    the exact 1-based position of the row within its group ordered by
    ``(score, id)`` ascending (NULL scores sort FIRST, like SQL
    ``asc nulls first`` — quarantine them upstream if that is not
    wanted); ``bucket`` is ``head/middle/tail`` for ``n_buckets=3``,
    ``b0..b{k-1}`` otherwise, cut by integer cross-multiplication so
    every group's buckets differ in size by at most one row.
    """
    if n_buckets < 2:
        raise ValueError("n_buckets must be >= 2")
    if not 2 <= n_ranges <= 65536:
        raise ValueError("n_ranges must be in [2, 65536]")
    for c in ("_rng", "_rk", "_off", "_mn", "_mx", "_n"):
        if c in df.columns:
            raise ValueError(f"reserved temp column {c!r} present in input")
    clash = [c for c in ("rank", "group_n", "bucket") if c in df.columns]
    if clash:
        raise ValueError(
            f"input column(s) {clash} collide with rank_buckets outputs"
        )

    s = F.col(score_col)
    # group stats: min/max span for the monotone range key + the count
    stats = df.groupBy(*group_cols).agg(
        F.min(s).alias("_mn"),
        F.max(s).alias("_mx"),
        F.count(F.lit(1)).alias("_n"),
    )
    # the stats and offsets frames are force-broadcast below — guard
    # the BROADCAST VOLUME loudly (the repo rule: never an opaque
    # broadcast OOM).  The offsets frame is up to n_groups x n_ranges
    # rows, so the bound is on the product, not the group count; the
    # stats frame is materialized once (localCheckpoint) so the guard
    # count and the join below share one aggregation pass
    # (_cap_hot_buckets precedent).
    stats = stats.localCheckpoint()
    n_groups = stats.count()
    budget = max_groups * 256  # ~8.4M offset rows at the default
    if n_groups * n_ranges > budget:
        raise ValueError(
            f"{n_groups} groups x {n_ranges} ranges exceeds the "
            f"broadcast budget ({budget} offset rows): lower "
            "n_ranges for high-cardinality groupings, bucket a "
            "coarser grouping, or raise max_groups only with "
            "executor memory to match"
        )
    st = stats
    for c in group_cols:
        st = st.withColumnRenamed(c, f"_g_{c}")
    cond = [F.col(c).eqNullSafe(F.col(f"_g_{c}")) for c in group_cols]
    withstats = df.join(F.broadcast(st), cond).drop(
        *[f"_g_{c}" for c in group_cols]
    )

    # range key in DOUBLE on purpose: long arithmetic overflows for
    # wide spans ((s - mn) * 256 wraps past 2^63/256 ≈ 3.6e16, and
    # mx - mn itself wraps for full-range hash scores) — ANSI mode
    # kills the job, legacy mode silently breaks monotonicity.
    # floor() of double math is only WEAKLY monotone in s, which is
    # exactly what correctness needs (equal scores must share a
    # range; nearby scores may share one too — that is just balance).
    sd = s.cast("double")
    mn = F.col("_mn").cast("double")
    mx = F.col("_mx").cast("double")
    span = mx - mn
    rng = F.when(
        s.isNull() | (span <= 0), F.lit(0)
    ).otherwise(
        F.least(
            F.lit(n_ranges - 1),
            F.floor((sd - mn) / span * n_ranges).cast("long"),
        )
    ).cast("int")
    withrng = withstats.withColumn("_rng", rng)

    # pass 1: per-(group, range) counts -> running offsets over the
    # tiny #groups x n_ranges frame
    counts = withrng.groupBy(*group_cols, "_rng").agg(
        F.count(F.lit(1)).alias("_c")
    )
    w_off = (
        Window.partitionBy(*group_cols)
        .orderBy(F.col("_rng").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        *group_cols,
        "_rng",
        F.coalesce(F.sum("_c").over(w_off), F.lit(0)).alias("_off"),
    )
    off = offsets
    for c in [*group_cols, "_rng"]:
        off = off.withColumnRenamed(c, f"_o_{c}")
    jcond = [
        withrng[c].eqNullSafe(off[f"_o_{c}"])
        for c in [*group_cols, "_rng"]
    ]

    # pass 2: local row_number within (group, range) + offset
    w_local = Window.partitionBy(*group_cols, "_rng").orderBy(
        s.asc_nulls_first(), F.col(id_col).asc()
    )
    rank = (F.row_number().over(w_local) + F.col("_off")).alias("rank")

    if n_buckets == 3:
        labels = CCNET_LABELS
    else:
        labels = [f"b{i}" for i in range(n_buckets)]
    rk, n = F.col("rank"), F.col("_n")
    expr = None
    for b, name in enumerate(labels[:-1]):
        c = rk * n_buckets <= (b + 1) * n
        expr = F.when(c, F.lit(name)) if expr is None else expr.when(
            c, F.lit(name)
        )
    bucket = expr.otherwise(F.lit(labels[-1]))

    return (
        withrng.join(F.broadcast(off), jcond)
        .withColumn("rank", rank)
        .select(
            *[withrng[c] for c in df.columns],
            F.col("rank"),
            F.col("_n").alias("group_n"),
            bucket.alias("bucket"),
        )
    )
