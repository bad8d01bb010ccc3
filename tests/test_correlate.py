from __future__ import annotations

import math

import pytest

from schema_validator_spark.operators.correlate import (
    correlation_matrix,
    mutual_information,
)


def test_correlation_perfect_and_constant(spark):
    df = spark.createDataFrame(
        [(float(i), 2.0 * i + 1, -3.0 * i, 5.0) for i in range(20)],
        "x double, y double, z double, k double",
    )
    rows = {
        (r["col_a"], r["col_b"]): r["corr"]
        for r in correlation_matrix(df, ["x", "y", "z", "k"]).collect()
    }
    assert rows[("x", "y")] == pytest.approx(1.0)
    assert rows[("x", "z")] == pytest.approx(-1.0)
    assert rows[("x", "k")] is None  # zero variance -> NULL like SQL corr
    assert len(rows) == 6
    n = correlation_matrix(df, ["x", "y"]).collect()[0]["n_rows"]
    assert n == 20


def test_correlation_defaults_to_numeric_columns(spark):
    df = spark.createDataFrame(
        [(1, 1.0, "s"), (2, 4.0, "t")], "a long, b double, c string"
    )
    out = correlation_matrix(df)
    assert [(r["col_a"], r["col_b"]) for r in out.collect()] == [("a", "b")]
    with pytest.raises(ValueError):
        correlation_matrix(df, ["a"])


def test_mi_identical_columns_is_entropy(spark):
    # uniform over 4 categories, b == a: MI = H = ln 4, NMI = 1
    df = spark.createDataFrame(
        [(str(i % 4), str(i % 4)) for i in range(40)], "a string, b string"
    )
    r = mutual_information(df, "a", "b").collect()[0]
    assert r["mi"] == pytest.approx(math.log(4), abs=1e-6)
    assert r["h_a"] == pytest.approx(math.log(4), abs=1e-6)
    assert r["nmi"] == pytest.approx(1.0, abs=1e-6)
    assert r["card_a"] == r["card_b"] == 4


def test_mi_independent_columns_is_zero(spark):
    # complete product design -> exactly independent -> MI = 0
    df = spark.createDataFrame(
        [(str(i), str(j)) for i in range(3) for j in range(5)] * 2,
        "a string, b string",
    )
    r = mutual_information(df, "a", "b").collect()[0]
    assert r["mi"] == pytest.approx(0.0, abs=1e-6)
    assert r["nmi"] == pytest.approx(0.0, abs=1e-6)


def test_mi_hand_computed_with_nulls(spark):
    rows = [("x", "p")] * 4 + [("x", None)] * 2 + [("y", "p")] * 1 + [("y", None)] * 3
    df = spark.createDataFrame(rows, "a string, b string")
    n = len(rows)
    from collections import Counter

    joint = Counter(rows)
    ca = Counter(a for a, _ in rows)
    cb = Counter(b for _, b in rows)
    mi = sum(
        (c / n) * math.log((c / n) / ((ca[a] / n) * (cb[b] / n)))
        for (a, b), c in joint.items()
    )
    r = mutual_information(df, "a", "b").collect()[0]
    assert r["mi"] == pytest.approx(mi, abs=1e-6)
    assert r["card_b"] == 2  # NULL is its own category
    assert r["n_rows"] == n
