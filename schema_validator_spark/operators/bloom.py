"""Bloom-accelerated EXACT referential integrity.

Middle scale tier between operators/referential.py's two plans:

- dim fits in a broadcast hash set  -> broadcast ``left_anti`` (0 Exchange);
- dim far too big for any summary   -> AQE sort-merge anti-join (both
  sides shuffle);
- **this tier**: the dim's *key set* is too big to broadcast (10^8-10^9
  keys x wide strings = many GB) but its Bloom filter (~1 byte/key at
  k=5 hashes) fits on every executor.  The fact table is classified in
  pure codegen against the broadcast bitmap — a Bloom miss is a
  DEFINITE orphan (no false negatives), decided with ZERO joins and
  ZERO shuffle of fact rows.  Only the *distinct* Bloom-positive keys
  (≈ |dim keys| + fpp·|orphan keys|, never ≈ |fact rows|) go through an
  exact anti-join to weed out Bloom false positives, and the few
  surviving FP keys are broadcast back.  Results are therefore EXACT —
  identical to ``referential.referential_violations`` for every input
  and any (num_bits, num_hashes); the Bloom parameters only move work
  between the codegen path and the verify join.

Generalizes the same reference semantics as operators/referential.py
(cross-field lookup, rule/field.go:12): NULL FKs never match and
surface as violations.

Scale shape (10^12 fact rows, 10^9-key dim):
- build: ONE map-side-combinable ``bit_or`` aggregation over k·|dim|
  (word, mask) pairs — each task pre-reduces to ≤ num_bits/64 rows, so
  the shuffle is bounded by #tasks · #words, independent of |dim|;
- probe: per-row hash arithmetic + array indexing inside whole-stage
  codegen; the bitmap rides a 1-row broadcast (BroadcastNestedLoopJoin
  of a single row = a closure, not a join);
- verify: shuffles only DISTINCT survivor keys (map-side combined),
  never fact rows; FP keys are tiny by construction (fpp · orphan keys)
  and broadcast back with a ``left_semi``.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SEED = 0x9E3779B9  # second-hash salt (Kirsch-Mitzenmacher double hashing)


def _hash_pair(cols: list, num_bits: int) -> tuple:
    """(h1, h2) both pre-reduced into [0, num_bits) so the k position
    expressions ``h1 + i*h2`` stay far from long overflow (ANSI mode
    would raise on wraparound).  ``cols`` may be names or Columns (the
    referential path passes type-aligned cast expressions)."""
    exprs = [F.col(c) if isinstance(c, str) else c for c in cols]
    h1 = F.pmod(F.xxhash64(*exprs), F.lit(num_bits))
    h2 = F.pmod(F.xxhash64(F.lit(_SEED), *exprs), F.lit(num_bits))
    return h1, h2


_INT_WIDTH = {"tinyint": 0, "smallint": 1, "int": 2, "bigint": 3}


def _aligned_key_types(
    fact: DataFrame, fk_cols: list[str], dim: DataFrame, pk_cols: list[str]
) -> list[str | None]:
    """Per key pair, the common type BOTH sides must be cast to before
    hashing (None = already identical).  xxhash64 is type-sensitive:
    int 7 and bigint 7 hash to different values, so an unaligned
    fact-vs-dim dtype pair would make every dim key Bloom-negative and
    emit matched fact rows as 'definite orphans' with no verify join.
    Integral pairs widen to the larger type (lossless); any other
    mismatch raises — silently wrong results are worse than an error."""
    f_types = dict(fact.dtypes)
    d_types = dict(dim.dtypes)
    out: list[str | None] = []
    for fk, pk in zip(fk_cols, pk_cols):
        ft, dt = f_types[fk], d_types[pk]
        if ft == dt:
            out.append(None)
        elif ft in _INT_WIDTH and dt in _INT_WIDTH:
            out.append(ft if _INT_WIDTH[ft] >= _INT_WIDTH[dt] else dt)
        else:
            raise ValueError(
                f"bloom_referential_violations: key dtype mismatch "
                f"{fk}:{ft} vs {pk}:{dt} — cast one side to a common "
                f"type first (xxhash64 is type-sensitive)"
            )
    return out


def _cast_exprs(cols: list[str], types: list | None) -> list:
    """Column expressions with the per-key common-type casts applied
    (``types[i] is None`` = no cast needed)."""
    if types is None:
        return list(cols)
    return [
        F.col(c).cast(t) if t is not None else F.col(c)
        for c, t in zip(cols, types)
    ]


def bloom_bitmap(
    dim: DataFrame,
    pk_cols: list[str],
    *,
    num_bits: int,
    num_hashes: int,
    cast_types: list | None = None,
) -> list[int]:
    """Build the dim-key Bloom as ``num_bits/64`` longs with ONE
    map-side-combinable ``bit_or`` aggregation (partial state per task
    is at most the word count, independent of |dim|).  NULL-keyed dim
    rows are excluded — they can never satisfy an equi-lookup.
    ``cast_types`` (from _aligned_key_types) pre-casts each key so the
    probe side can hash the identical logical value to the same bits."""
    if num_bits % 64 != 0 or num_bits <= 0:
        raise ValueError("num_bits must be a positive multiple of 64")
    h1, h2 = _hash_pair(_cast_exprs(pk_cols, cast_types), num_bits)
    nonnull = dim.filter(
        reduce(lambda a, b: a & b, [F.col(c).isNotNull() for c in pk_cols])
    )
    words = (
        nonnull.select(h1.alias("_h1"), h2.alias("_h2"))
        .select(
            F.explode(
                F.array(
                    *[
                        F.pmod(
                            F.col("_h1") + F.lit(i) * F.col("_h2"),
                            F.lit(num_bits),
                        )
                        for i in range(num_hashes)
                    ]
                )
            ).alias("_pos")
        )
        .select(
            F.expr("CAST(_pos DIV 64 AS INT)").alias("_word"),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(_pos % 64 AS INT))"
            ).alias("_mask"),
        )
        .groupBy("_word")
        .agg(F.bit_or("_mask").alias("_bits"))
        .collect()
    )
    by_word = {r["_word"]: r["_bits"] for r in words}
    return [by_word.get(w, 0) for w in range(num_bits // 64)]


def bloom_referential_violations(
    fact: DataFrame,
    fk_cols: list[str],
    dim: DataFrame,
    pk_cols: list[str] | None = None,
    *,
    num_bits: int = 1 << 23,
    num_hashes: int = 5,
) -> DataFrame:
    """EXACT orphan fact rows (same schema as ``fact``), equal to
    ``referential.referential_violations`` for every input; the Bloom
    only decides how much work the verify join sees.

    Three disjoint orphan sources, unioned:
    1. NULL-FK rows (never equi-match — reference semantics);
    2. Bloom-negative rows — definite orphans, zero joins;
    3. Bloom-positive keys missing from dim (Bloom false positives
       among the true orphans), found by the exact distinct-key
       anti-join and broadcast back.
    """
    pk_cols = pk_cols or fk_cols
    spark = fact.sparkSession
    # xxhash64 is type-sensitive (int 7 != bigint 7): hash BOTH sides at
    # a per-key common type or every matched fact row with a narrower FK
    # dtype would be Bloom-negative => a silent "definite orphan".
    key_types = _aligned_key_types(fact, fk_cols, dim, pk_cols)
    bits = bloom_bitmap(
        dim, pk_cols, num_bits=num_bits, num_hashes=num_hashes,
        cast_types=key_types,
    )
    bloom_df = spark.createDataFrame([(bits,)], "_bloom array<bigint>")

    null_pred = reduce(
        lambda a, b: a | b, [F.col(c).isNull() for c in fk_cols]
    )
    null_rows = fact.filter(null_pred)
    nonnull = fact.filter(~null_pred)

    h1, h2 = _hash_pair(_cast_exprs(fk_cols, key_types), num_bits)
    probed = (
        nonnull.join(F.broadcast(bloom_df), how="cross")
        .withColumn("_h1", h1)
        .withColumn("_h2", h2)
    )
    checks = []
    for i in range(num_hashes):
        probed = probed.withColumn(
            f"_p{i}",
            F.pmod(F.col("_h1") + F.lit(i) * F.col("_h2"), F.lit(num_bits)),
        )
        checks.append(
            F.expr(
                f"(shiftrightunsigned(element_at(_bloom, "
                f"CAST(_p{i} DIV 64 AS INT) + 1), "
                f"CAST(_p{i} % 64 AS INT)) & CAST(1 AS BIGINT)) "
                f"= CAST(1 AS BIGINT)"
            )
        )
    might = reduce(lambda a, b: a & b, checks)
    probed = probed.withColumn("_might", might)

    out_cols = fact.columns
    definite = probed.filter(~F.col("_might")).select(*out_cols)

    dim_keys = dim.select(
        *[F.col(p).alias(f) for p, f in zip(pk_cols, fk_cols)]
    )
    fp_keys = (
        probed.filter(F.col("_might"))
        .select(*fk_cols)
        .distinct()
        .join(dim_keys, on=fk_cols, how="left_anti")
    )
    fp_rows = nonnull.join(F.broadcast(fp_keys), on=fk_cols, how="left_semi")

    return null_rows.select(*out_cols).unionByName(definite).unionByName(
        fp_rows.select(*out_cols)
    )
