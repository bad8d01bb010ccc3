from __future__ import annotations

import math

import pytest

from schema_validator_spark.operators.sampling import mixture_plan

SCHEMA = "source string, n_tokens long"


def _plan(spark, rows, weights, budget):
    df = spark.createDataFrame(rows, SCHEMA)
    return {
        r["source"]: r.asDict()
        for r in mixture_plan(
            df, "source", "n_tokens", weights, budget
        ).collect()
    }


def test_mixture_plan_basic(spark):
    got = _plan(
        spark,
        [("web", 60), ("web", 40), ("code", 50)],
        {"web": 3.0, "code": 1.0},
        100,
    )
    web, code = got["web"], got["code"]
    assert web["n_docs"] == 2 and web["n_tokens"] == 100
    assert web["weight"] == 0.75 and web["target_tokens"] == 75
    assert web["sample_rate"] == 0.75 and web["epochs"] == 1
    assert code["target_tokens"] == 25
    assert code["sample_rate"] == 0.5 and code["epochs"] == 1


def test_mixture_plan_upsampling_epochs(spark):
    got = _plan(
        spark, [("a", 300), ("b", 50)], {"a": 1.0, "b": 3.0}, 400
    )
    b = got["b"]
    assert b["target_tokens"] == 300
    assert b["sample_rate"] == 6.0 and b["epochs"] == 6
    assert got["a"]["sample_rate"] == pytest.approx(100 / 300, abs=1e-6)


def test_mixture_plan_unplanned_source_excluded_not_dropped(spark):
    got = _plan(spark, [("a", 10), ("zzz", 99)], {"a": 1.0}, 10)
    z = got["zzz"]
    assert z["n_tokens"] == 99
    assert z["weight"] is None and z["sample_rate"] is None


def test_mixture_plan_planned_source_with_no_data(spark):
    got = _plan(spark, [("a", 10)], {"a": 1.0, "ghost": 1.0}, 100)
    g = got["ghost"]
    assert g["n_docs"] == 0 and g["n_tokens"] == 0
    assert g["target_tokens"] == 50
    assert g["sample_rate"] is None and g["epochs"] is None


def test_mixture_plan_null_and_negative_tokens_count_zero(spark):
    df_rows = [("a", None), ("a", -5), ("a", 7)]
    got = _plan(spark, df_rows, {"a": 1.0}, 7)
    assert got["a"]["n_tokens"] == 7
    assert got["a"]["sample_rate"] == 1.0


def test_mixture_plan_validation(spark):
    df = spark.createDataFrame([("a", 1)], SCHEMA)
    with pytest.raises(ValueError):
        mixture_plan(df, "source", "n_tokens", {}, 10)
    with pytest.raises(ValueError):
        mixture_plan(df, "source", "n_tokens", {"a": -1.0}, 10)
    with pytest.raises(ValueError):
        mixture_plan(df, "source", "n_tokens", {"a": 1.0}, 0)


def test_mixture_plan_weight_normalization_sums_to_one(spark):
    got = _plan(
        spark, [("a", 1), ("b", 1), ("c", 1)],
        {"a": 2.0, "b": 5.0, "c": 13.0}, 1000
    )
    assert math.isclose(
        sum(v["weight"] for v in got.values()), 1.0, abs_tol=2e-6
    )
