from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from schema_validator_spark.operators.sampling import sample_weighted


@pytest.fixture()
def items(spark):
    rows = [(i, "heavy" if i < 500 else "light", 10.0 if i < 500 else 0.1)
            for i in range(1000)]
    return spark.createDataFrame(rows, "id long, grp string, w double")


def test_exact_k_and_deterministic(spark, items):
    a = sorted(r["id"] for r in sample_weighted(items, "id", "w", 50).collect())
    b = sorted(r["id"] for r in sample_weighted(items, "id", "w", 50).collect())
    assert len(a) == 50 and a == b
    c = sorted(
        r["id"]
        for r in sample_weighted(items, "id", "w", 50, salt="other").collect()
    )
    assert a != c  # salt changes the sample


def test_weights_bias_selection(spark, items):
    got = sample_weighted(items, "id", "w", 200).collect()
    heavy = sum(1 for r in got if r["grp"] == "heavy")
    # w=10 vs w=0.1: heavy items should dominate overwhelmingly
    assert heavy > 180


def test_matches_brute_force_global_topk(spark, items):
    # the two-level plan must pick exactly the k largest keys
    got = {r["id"] for r in sample_weighted(items, "id", "w", 25).collect()}
    keyed = items.select(
        "id",
        F.round(
            F.pow(
                (F.conv(F.substring(F.md5(F.concat(F.col("id").cast("string"),
                                                   F.lit("v1"))), 1, 8), 16, 10)
                 .cast("double") + F.lit(1.0)) / F.lit(4294967297.0),
                F.lit(1.0) / F.col("w"),
            ),
            6,
        ).alias("k"),
        F.md5(F.concat(F.col("id").cast("string"), F.lit("v1"))).alias("t"),
    ).orderBy(F.col("k").desc(), F.col("t").asc()).limit(25)
    want = {r["id"] for r in keyed.collect()}
    assert got == want


def test_strata_and_bad_weights(spark):
    rows = [(i, "a" if i % 2 == 0 else "b",
             None if i == 0 else (-1.0 if i == 1 else 1.0))
            for i in range(100)]
    df = spark.createDataFrame(rows, "id long, s string, w double")
    got = sample_weighted(df, "id", "w", 10, strata_cols=["s"]).collect()
    by = {}
    for r in got:
        by.setdefault(r["s"], []).append(r["id"])
    assert len(by["a"]) == 10 and len(by["b"]) == 10
    assert 0 not in by["a"] and 1 not in by["b"]  # null/negative excluded
