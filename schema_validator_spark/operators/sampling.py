"""Sampling operators for training-data curation.

* ``stratified_sample_approx`` — per-stratum Bernoulli sampling
  (``sampleBy``): single scan, no shuffle, approximate counts — the
  right tool at 10^12 rows when quotas are fractions.
* ``stratified_sample_exact`` — exact per-stratum quotas via a
  deterministic hash ranking (md5 of the id, so any engine reproduces
  the same sample — no RNG state): one shuffle on the stratum column.
  AQE splits skewed strata; for a dominant stratum prefer the approx
  form or pre-filter.
* ``split_train_eval`` — deterministic hash split (no leakage across
  runs or engines; complement property guaranteed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _hash_key(id_col: str, salt: str) -> F.Column:
    # NULL ids coalesce to a sentinel so the hash (and thus the split /
    # rank) is never NULL — a NULL would otherwise drop the row from BOTH
    # sides of split_train_eval, breaking the complement guarantee.
    key = F.coalesce(F.col(id_col).cast("string"), F.lit("\x00null"))
    return F.md5(F.concat(key, F.lit(salt)))


def stratified_sample_exact(
    df: DataFrame,
    strata_cols: list[str],
    id_col: str,
    n_per_stratum: int,
    *,
    salt: str = "v1",
) -> DataFrame:
    """Exactly min(n, |stratum|) rows per stratum, chosen by md5 rank —
    deterministic across engines/runs (oracle-able in plain SQL)."""
    w = Window.partitionBy(*strata_cols).orderBy(
        _hash_key(id_col, salt).asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= n_per_stratum)
        .drop("_rk")
    )


def stratified_sample_approx(
    df: DataFrame,
    strata_col: str,
    fractions: dict,
    *,
    seed: int = 42,
) -> DataFrame:
    """Bernoulli per-stratum sampling (single scan, approximate counts)."""
    return df.sampleBy(strata_col, fractions, seed)


def sample_token_budget(
    df: DataFrame,
    strata_cols: list[str],
    id_col: str,
    token_col: str,
    budget_per_stratum: int,
    *,
    salt: str = "v1",
) -> DataFrame:
    """Token-budget sampling for dataset mixing: within each stratum
    (e.g. domain/language), walk the docs in deterministic md5-rank order
    and keep them while the running token total stays within the budget
    (the first doc that would cross the budget is excluded).

    This is how mixture weights become concrete document sets — quotas
    expressed in TOKENS, not rows, so long docs count for what they cost.
    Deterministic across engines (hash rank, no RNG).

    Scale shape — DISTRIBUTED prefix sum, no per-stratum serial walk: the
    md5 rank's first byte splits every stratum into 256 ordered ranges
    (the byte is a prefix of the rank, so (range, rank) order == rank
    order).  Pass 1 aggregates per-(stratum, range) token sums (map-side
    combinable) and turns them into running offsets with a window over
    the tiny #strata x 256 aggregate.  Pass 2 broadcast-joins the offsets
    back and cumsums WITHIN each (stratum, range) — so an LLM mixture's
    dominant stratum ("web", 10^10 docs) sorts as 256 parallel tasks of
    1/256th each, not one.  Result is row-identical to the serial
    definition (see _sample_token_budget_serial, kept for the
    equivalence test and as the oracle-SQL reference semantics).
    """
    h = _hash_key(id_col, salt)
    rng = F.conv(F.substring(h, 1, 2), 16, 10).cast("int")
    withb = df.withColumn("_h", h).withColumn("_rng", rng)

    tok = F.coalesce(F.col(token_col), F.lit(0))  # NULL tokens count 0
    bucket_sums = withb.groupBy(*strata_cols, "_rng").agg(
        F.sum(tok).alias("_bsum")
    )
    w_off = (
        Window.partitionBy(*strata_cols)
        .orderBy(F.col("_rng").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = bucket_sums.select(
        *strata_cols,
        "_rng",
        F.coalesce(F.sum("_bsum").over(w_off), F.lit(0)).alias("_off"),
    )

    w_local = Window.partitionBy(*strata_cols, "_rng").orderBy(
        F.col("_h").asc(), F.col(id_col).asc()
    )
    cum_local = F.sum(tok).over(
        w_local.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # null-SAFE join keys: a NULL stratum is a legitimate stratum (the
    # serial window treats NULL as its own partition); a plain equi-join
    # would silently drop every NULL-stratum row.
    off = offsets
    for c in [*strata_cols, "_rng"]:
        off = off.withColumnRenamed(c, f"_o_{c}")
    cond = [
        withb[c].eqNullSafe(off[f"_o_{c}"]) for c in [*strata_cols, "_rng"]
    ]
    return (
        withb.join(F.broadcast(off), cond)
        .withColumn("_cum_tokens", cum_local + F.col("_off"))
        .filter(F.col("_cum_tokens") <= budget_per_stratum)
        .drop("_h", "_rng", "_off", "_cum_tokens",
              *[f"_o_{c}" for c in [*strata_cols, "_rng"]])
    )


def _sample_token_budget_serial(
    df: DataFrame,
    strata_cols: list[str],
    id_col: str,
    token_col: str,
    budget_per_stratum: int,
    *,
    salt: str = "v1",
) -> DataFrame:
    """Reference semantics of :func:`sample_token_budget` as one serial
    window per stratum — what the DuckDB oracle expresses in SQL.  Kept
    ONLY for the equivalence test; the distributed form above is the API."""
    w = Window.partitionBy(*strata_cols).orderBy(
        _hash_key(id_col, salt).asc(), F.col(id_col).asc()
    )
    cum = F.sum(F.col(token_col)).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.withColumn("_cum_tokens", cum)
        .filter(F.col("_cum_tokens") <= budget_per_stratum)
        .drop("_cum_tokens")
    )


def split_train_eval(
    df: DataFrame,
    id_col: str,
    *,
    eval_fraction: float = 0.01,
    salt: str = "split-v1",
) -> tuple[DataFrame, DataFrame]:
    """Deterministic hash split: (train, eval).  A row's side depends only
    on (id, salt), so re-runs and different engines agree, and the two
    sides are exact complements."""
    bucket = F.conv(F.substring(_hash_key(id_col, salt), 1, 4), 16, 10).cast("long")
    cutoff = int(eval_fraction * 65536)
    is_eval = bucket < cutoff
    return df.filter(~is_eval), df.filter(is_eval)


def temperature_sample(
    df: DataFrame,
    strata_cols: list[str],
    id_col: str,
    *,
    temperature: float,
    target_fraction: float,
    salt: str = "v1",
) -> DataFrame:
    """Temperature-based mixture reweighting (the multilingual /
    multi-source standard: sample stratum s with probability
    ∝ n_s^(1/T), so T=1 keeps natural proportions and T→∞ flattens the
    mixture — mT5/XLM-R's alpha sampling with alpha = 1/T).

    Expected kept rows ≈ target_fraction · |df|, allocated across
    strata by the tempered weights; per-row keep decisions are
    DETERMINISTIC hash acceptance (md5-uniform(id ∥ salt) < p_s, no RNG
    state), so any engine reproduces the exact row set.  p_s is rounded
    to 6dp before the comparison — the acceptance boundary is then a
    grid value identical across engines regardless of pow() libm ulps.

    Scale shape: one tiny per-stratum count aggregate broadcast back
    onto the corpus (the corpus itself never shuffles), then a per-row
    filter — a single scan at any size.  Oversubscribed strata
    (p_s ≥ 1) keep every row, exactly like the temperature formula says.
    """
    if temperature <= 0:
        raise ValueError("temperature must be positive")
    if not 0 < target_fraction <= 1:
        raise ValueError("target_fraction must be in (0, 1]")

    counts = df.groupBy(*strata_cols).agg(F.count(F.lit(1)).alias("_ns"))
    tempered = counts.withColumn(
        "_qs", F.pow(F.col("_ns").cast("double"), F.lit(1.0 / temperature))
    )
    totals = tempered.agg(
        F.sum("_qs").alias("_qsum"), F.sum("_ns").alias("_ntot")
    )
    probs = (
        tempered.join(F.broadcast(totals))
        .withColumn(
            "_ps",
            F.round(
                F.least(
                    F.lit(target_fraction)
                    * F.col("_ntot") * F.col("_qs")
                    / (F.col("_qsum") * F.col("_ns")),
                    F.lit(1.0),
                ),
                6,
            ),
        )
        .select(*strata_cols, "_ps")
    )
    u = (
        F.conv(F.substring(_hash_key(id_col, salt), 1, 8), 16, 10)
        .cast("double") / F.lit(4294967296.0)
    )
    # null-safe stratum join — a NULL stratum is counted in the tempered
    # allocation above, so it must also be sampled, not silently dropped
    p2 = probs
    for c in strata_cols:
        p2 = p2.withColumnRenamed(c, f"_p_{c}")
    cond = [df[c].eqNullSafe(p2[f"_p_{c}"]) for c in strata_cols]
    return (
        df.join(F.broadcast(p2), cond)
        .filter(u < F.col("_ps"))
        .drop("_ps", *[f"_p_{c}" for c in strata_cols])
    )


def sample_weighted(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    k: int,
    *,
    strata_cols: list[str] | None = None,
    salt: str = "v1",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis-Spirakis A-ES):
    keep the top-``k`` rows by key ``u^(1/w)`` where ``u`` is the
    md5-uniform of the id — each row's inclusion probability is
    proportional to its weight, with no RNG state, so reruns and other
    engines reproduce the exact row set.  The standard one-pass scheme
    for "sample 10k docs preferring high quality scores".

    Cross-engine determinism: the key is rounded to 6dp and ties broken
    by the md5 rank itself, so the selection boundary never depends on
    pow() libm ulps.  Rows with NULL or non-positive weight are
    excluded (they have zero inclusion probability in A-ES).  Rounding
    caveat: at extreme weight ratios (w below ~1e-3 of the max) keys
    collapse toward 0.0 at 6dp and the md5 tie-break makes selection
    among those rows effectively unweighted — normalize weights into a
    sane range if the tail matters.

    With ``strata_cols``, k rows per stratum (one rank window per
    stratum — the same shuffle shape as stratified_sample_exact).
    Without, a global top-k via the two-level trick: per-partition
    heads cap the window input, then one tiny global sort.
    """
    if k <= 0:
        raise ValueError("k must be positive")
    w = F.col(weight_col).cast("double")
    u = (
        F.conv(F.substring(_hash_key(id_col, salt), 1, 8), 16, 10)
        .cast("double") + F.lit(1.0)
    ) / F.lit(4294967297.0)  # (hash+1)/(2^32+1): u in (0,1), never 0 or 1
    key = F.round(F.pow(u, F.lit(1.0) / w), 6)
    src = (
        df.filter(w.isNotNull() & (w > 0))
        .withColumn("_akey", key)
        .withColumn("_tie", _hash_key(id_col, salt))
    )
    order = [F.col("_akey").desc(), F.col("_tie").asc()]
    if strata_cols:
        win = Window.partitionBy(*strata_cols).orderBy(*order)
        out = (
            src.withColumn("_rn", F.row_number().over(win))
            .filter(F.col("_rn") <= k)
        )
    else:
        # two-level: each input partition can contribute at most k rows,
        # so the global window sorts <= k * n_partitions rows, not |df|
        part_win = Window.partitionBy(F.spark_partition_id()).orderBy(*order)
        heads = src.withColumn("_prn", F.row_number().over(part_win)).filter(
            F.col("_prn") <= k
        )
        win = Window.partitionBy().orderBy(*order)
        out = (
            heads.withColumn("_rn", F.row_number().over(win))
            .filter(F.col("_rn") <= k)
        )
    return out.drop("_akey", "_tie", "_rn", "_prn")


def mixture_plan(
    df: DataFrame,
    source_col: str,
    tokens_col: str,
    weights: dict[str, float],
    budget_tokens: int,
) -> DataFrame:
    """Per-source sampling plan for a target data mixture — the step
    between "counted every source's tokens" and "sample/pack the
    training set": given target mixture ``weights`` and a total token
    ``budget_tokens``, compute each source's sampling rate and epoch
    count (the LLaMA-style mixture table: sources with rate > 1 are
    upsampled / seen for multiple epochs; GPT-3 and The Pile publish
    the same shape).

    Returns one row per source in ``weights`` UNION the data:
    ``(source, n_docs, n_tokens, weight, target_tokens, sample_rate,
    epochs)`` where ``weight`` is normalized over the given weights
    (NULL weight AND NULL rate for sources present in data but absent
    from the plan — excluded; treat NULL rate as do-not-sample),
    ``target_tokens = round(budget * weight)``,
    ``sample_rate = target / available`` (6dp — may exceed 1), and
    ``epochs = ceil(sample_rate)``.  A planned source with NO data
    rows reports ``n_tokens 0`` and NULL rate — the "you budgeted for
    a source you don't have" audit signal, never silently dropped.
    NULL/negative token counts count as 0.

    Scale shape: ONE map-side-combined groupBy on the source
    vocabulary (plan-sized, not corpus-sized) full-outer-joined to the
    weights literal — the corpus is scanned once and never shuffled;
    both join sides are plan-sized, so the join itself is
    metadata-scale (full outer joins cannot broadcast in Spark — no
    hint on purpose).
    Feed the rates to :func:`stratified_sample_approx` /
    :func:`sample_token_budget` per source to materialize the sample.
    """
    if not weights:
        raise ValueError("weights must be non-empty")
    if any(w is None or w < 0 for w in weights.values()):
        raise ValueError("weights must be non-negative")
    total_w = float(sum(weights.values()))
    if total_w <= 0:
        raise ValueError("weights must sum to a positive value")
    if budget_tokens <= 0:
        raise ValueError("budget_tokens must be positive")

    tok = F.greatest(
        F.coalesce(F.col(tokens_col).cast("long"), F.lit(0).cast("long")),
        F.lit(0).cast("long"),
    )
    counted = df.groupBy(
        F.col(source_col).cast("string").alias("source")
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(tok).alias("n_tokens"),
    )
    plan = df.sparkSession.createDataFrame(
        [(str(k), float(v) / total_w) for k, v in sorted(weights.items())],
        "source string, weight double",
    )
    joined = counted.join(plan, "source", "full_outer")
    n_tokens = F.coalesce(F.col("n_tokens"), F.lit(0).cast("long"))
    target = F.round(F.lit(float(budget_tokens)) * F.col("weight"))
    rate = F.when(
        n_tokens > 0, F.round(target / n_tokens, 6)
    )  # NULL when the planned source has no data
    return joined.select(
        "source",
        F.coalesce(F.col("n_docs"), F.lit(0).cast("long"))
        .alias("n_docs"),
        n_tokens.alias("n_tokens"),
        F.round(F.col("weight"), 6).alias("weight"),
        target.cast("long").alias("target_tokens"),
        rate.alias("sample_rate"),
        F.ceil(rate).cast("int").alias("epochs"),
    )
