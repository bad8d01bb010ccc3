from __future__ import annotations

import math

import pytest

from schema_validator_spark.operators.profile import column_entropy


def test_uniform_and_constant(spark):
    rows = [(str(i % 4), "k") for i in range(40)]
    df = spark.createDataFrame(rows, "u string, c string")
    got = {r["column"]: r for r in column_entropy(df).collect()}
    u = got["u"]
    assert u["entropy"] == pytest.approx(math.log(4), abs=1e-6)
    assert u["norm_entropy"] == pytest.approx(1.0, abs=1e-6)
    assert u["n_distinct"] == 4
    assert u["distinctness"] == pytest.approx(4 / 40, abs=1e-6)
    assert u["unique_value_ratio"] == 0.0
    c = got["c"]
    assert c["entropy"] == 0.0
    assert c["norm_entropy"] is None  # single value: undefined


def test_hand_computed_skew_and_nulls(spark):
    vals = ["a"] * 6 + ["b"] * 3 + ["c"] + [None] * 2
    df = spark.createDataFrame([(v,) for v in vals], "v string")
    r = column_entropy(df, ["v"]).collect()[0]
    n = 10
    h = -sum(p * math.log(p) for p in (6 / n, 3 / n, 1 / n))
    assert r["n_rows"] == 12 and r["n_nonnull"] == 10
    assert r["entropy"] == pytest.approx(h, abs=1e-6)
    assert r["unique_value_ratio"] == pytest.approx(1 / 3, abs=1e-6)


def test_numeric_columns_stringified(spark):
    df = spark.createDataFrame([(1, 1.5), (2, 1.5), (1, 2.5)], "a long, b double")
    got = {r["column"]: r for r in column_entropy(df).collect()}
    assert got["a"]["n_distinct"] == 2
    assert got["b"]["unique_value_ratio"] == pytest.approx(0.5)
