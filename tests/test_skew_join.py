"""skew_join / salted_replicate_join: row-identical to the plain join,
with the hot keys taken off the shuffle path.

Reference parity note: the reference library has no joins at all
(validator.go:32-34 — single in-memory value); skewed-join handling is
mandated by repo:BASELINE.json north_rule ("handles skewed repos via
salted repartitioning and AQE skew-join hints").
"""

from __future__ import annotations

from pyspark.sql import functions as F

from schema_validator_spark.operators import skew
from schema_validator_spark.plans.inspect import join_kinds


def _frames(spark):
    # fact: key 7 owns ~40% of rows, key None ~10%, key 3 present but
    # missing from dim (unmatched cold), rest from {5,6,8,9}
    fact_rows = []
    for i in range(400):
        if i % 10 < 3 or i % 10 == 7:
            k = 7
        elif i % 10 == 4:
            k = None
        else:
            k = i % 10
        fact_rows.append((i, k))
    fact = spark.createDataFrame(fact_rows, "fid long, k long")
    # dim misses key 3 (unmatched cold) and key 9 is dim-only (no fact hot)
    dim = spark.createDataFrame(
        [(k, f"name-{k}") for k in [0, 1, 2, 4, 5, 6, 7, 8, 9]],
        "dk long, name string",
    )
    return fact, dim


def _sorted_rows(df):
    return sorted(
        tuple(r) for r in df.select("fid", "k", "dk", "name").collect()
    )


def test_skew_join_inner_equals_plain(spark):
    fact, dim = _frames(spark)
    plain = fact.join(dim, fact["k"] == dim["dk"], "inner")
    out = skew.skew_join(fact, dim, "k", "dk", hot_keys=[7])
    assert _sorted_rows(out) == _sorted_rows(plain)


def test_skew_join_left_preserves_unmatched_and_nulls(spark):
    fact, dim = _frames(spark)
    plain = fact.join(dim, fact["k"] == dim["dk"], "left")
    out = skew.skew_join(fact, dim, "k", "dk", how="left", hot_keys=[7])
    assert _sorted_rows(out) == _sorted_rows(plain)
    # NULL keys and the dim-missing key 3 must appear with null dim side
    nulls = [r for r in _sorted_rows(out) if r[2] is None]
    assert any(r[1] is None for r in nulls)
    assert any(r[1] == 3 for r in nulls)


def test_skew_join_same_named_keys(spark):
    # fact key and dim key share the name "k": the plain expression join
    # tolerates the duplicate output column, so the split join must too
    # (the old unionByName raised an ambiguous-column AnalysisException).
    fact, dim = _frames(spark)
    dim_k = dim.select(F.col("dk").alias("k"), "name")
    for how in ("inner", "left"):
        plain = fact.join(dim_k, fact["k"] == dim_k["k"], how)
        out = skew.skew_join(fact, dim_k, "k", "k", how=how, hot_keys=[7])
        key = lambda df: sorted(
            (r["fid"], r["name"]) for r in df.select("fid", "name").collect()
        )
        assert key(out) == key(plain)


def test_skew_join_detects_hot_keys_when_not_given(spark):
    fact, dim = _frames(spark)
    hot = skew.detect_hot_keys(fact, ["k"], min_share=0.2)
    assert hot == [(7,)]
    plain = fact.join(dim, fact["k"] == dim["dk"], "inner")
    out = skew.skew_join(fact, dim, "k", "dk", min_share=0.2)
    assert _sorted_rows(out) == _sorted_rows(plain)


def test_skew_join_hot_side_is_broadcast(spark):
    fact, dim = _frames(spark)
    out = skew.skew_join(fact, dim, "k", "dk", hot_keys=[7])
    kinds = join_kinds(out)
    assert "BroadcastHashJoin" in kinds, kinds


def test_skew_join_no_hot_keys_falls_back_to_plain(spark):
    fact, dim = _frames(spark)
    out = skew.skew_join(fact, dim, "k", "dk", hot_keys=[])
    plain = fact.join(dim, fact["k"] == dim["dk"], "inner")
    assert _sorted_rows(out) == _sorted_rows(plain)


def test_salted_replicate_join_inner_and_left(spark):
    fact, dim = _frames(spark)
    for how in ("inner", "left"):
        plain = fact.join(dim, fact["k"] == dim["dk"], how)
        out = skew.salted_replicate_join(
            fact, dim, "k", "dk", how=how, hot_keys=[7], n_salts=4
        )
        assert _sorted_rows(out) == _sorted_rows(plain), how


def test_salted_replicate_join_spreads_hot_rows(spark):
    """The hot key's fact rows must not all carry one salt (the whole
    point); check the salt distribution directly."""
    fact, dim = _frames(spark)
    f = fact.filter(F.col("k") == 7).withColumn(
        "_fsalt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), 4)
    )
    n_salts_used = f.select("_fsalt").distinct().count()
    assert n_salts_used >= 3  # 160 rows over 4 salts: all 4 w.h.p.


def test_skew_join_rejects_right_join(spark):
    fact, dim = _frames(spark)
    import pytest

    with pytest.raises(ValueError):
        skew.skew_join(fact, dim, "k", "dk", how="right", hot_keys=[7])
    with pytest.raises(ValueError):
        skew.salted_replicate_join(fact, dim, "k", "dk", how="full", hot_keys=[7])
