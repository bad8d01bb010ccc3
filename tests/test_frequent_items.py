"""frequent_items_exact: sketch candidates (no false negatives) + exact
verify pass == the exact groupBy-having answer, without shuffling the
full key space.

No reference analog (single-value validator, validator.go:32-34); hot-key
profiling supports the north rule's skew handling.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from schema_validator_spark.operators import skew


def _exact(df, col, support):
    n = df.count()
    return {
        (r["item"], r["n_item"])
        for r in df.groupBy(F.col(col).alias("item"))
        .agg(F.count(F.lit(1)).alias("n_item"))
        .filter(F.col("n_item") >= support * n)
        .collect()
    }


def test_frequent_items_matches_exact_definition(spark):
    # key 7 ~ 40%, NULL ~ 10%, keys 3,5,6,8,9 ~ 10% each
    rows = []
    for i in range(1000):
        if i % 10 < 3 or i % 10 == 7:
            k = 7
        elif i % 10 == 4:
            k = None
        else:
            k = i % 10
        rows.append((i, k))
    df = spark.createDataFrame(rows, "i long, k long")
    for support in (0.05, 0.2, 0.35):
        got = {
            (r["item"], r["n_item"])
            for r in skew.frequent_items_exact(df, "k", support=support).collect()
        }
        assert got == _exact(df, "k", support), support


def test_frequent_items_counts_null_heavy_hitter(spark):
    df = spark.createDataFrame(
        [(i, None if i % 2 == 0 else i % 4) for i in range(400)],
        "i long, k long",
    )
    got = {
        (r["item"], r["n_item"])
        for r in skew.frequent_items_exact(df, "k", support=0.3).collect()
    }
    assert got == {(None, 200)}


def test_frequent_items_no_heavy_hitters(spark):
    df = spark.createDataFrame([(i, i) for i in range(100)], "i long, k long")
    assert skew.frequent_items_exact(df, "k", support=0.5).count() == 0
