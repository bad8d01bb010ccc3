from __future__ import annotations

from pyspark.sql import functions as F

from schema_validator_spark.operators.drift import category_churn_df


def test_new_gone_common(spark):
    base = spark.createDataFrame(
        [("a",), ("a",), ("b",), (None,)], "v string"
    )
    cur = spark.createDataFrame([("a",), ("c",), ("c",)], "v string")
    got = {
        r["category"]: (r["n_base"], r["n_cur"], r["kind"])
        for r in category_churn_df(base, cur, "v").collect()
    }
    assert got == {
        "a": (2, 1, "common"),
        "b": (1, 0, "gone"),
        "c": (0, 2, "new"),
        None: (1, 0, "gone"),  # NULL is its own category
    }


def test_single_shuffle_plan(spark):
    from schema_validator_spark.plans import inspect

    base = spark.range(100).select(F.col("id").cast("string").alias("v"))
    cur = spark.range(50, 150).select(F.col("id").cast("string").alias("v"))
    out = category_churn_df(base, cur, "v")
    assert not inspect.uses_python(out)
    assert inspect.n_exchanges(out) <= 1
