from __future__ import annotations

import pytest

from schema_validator_spark.operators.checks import (
    Check,
    run_checks,
    suite_passes,
)

ROWS = [
    (1, "a", 10.0),
    (2, "a", 20.0),
    (3, "b", None),
    (4, None, 40.0),
    (5, "c", 50.0),
]


@pytest.fixture()
def df(spark):
    return spark.createDataFrame(ROWS, "id long, cat string, v double")


def _report(df, checks):
    return {r["check"]: r for r in run_checks(df, checks).collect()}


def test_metric_values_and_statuses(df):
    got = _report(df, [
        Check("rows", "size", ">=", 5),
        Check("cat filled", "completeness", ">=", 0.9, column="cat"),
        Check("v in range", "compliance", ">=", 0.5,
              predicate="v between 10 and 45"),
        Check("id unique", "uniqueness", "==", 1.0, column="id"),
        Check("cat variety", "distinctness", ">=", 0.5, column="cat"),
        Check("v mean", "mean", "<=", 30.0, column="v"),
        Check("v min", "min", ">", 15.0, column="v"),
    ])
    assert got["rows"]["value"] == 5.0 and got["rows"]["status"] == "pass"
    assert got["cat filled"]["value"] == 0.8
    assert got["cat filled"]["status"] == "fail"
    # 3 of 5 rows satisfy the predicate (NULL v -> false)
    assert got["v in range"]["value"] == 0.6
    assert got["v in range"]["status"] == "pass"
    assert got["id unique"]["value"] == 1.0
    assert got["id unique"]["status"] == "pass"
    # groups: a(2) b(1) c(1) NULL(1) -> 4 distinct of 5 rows
    assert got["cat variety"]["value"] == 0.8
    assert got["v mean"]["value"] == 30.0 and got["v mean"]["status"] == "pass"
    assert got["v min"]["value"] == 10.0 and got["v min"]["status"] == "fail"


def test_null_is_a_value_for_frequency_metrics(spark):
    df = spark.createDataFrame(
        [(1, None), (2, None), (3, "x")], "id long, c string"
    )
    got = _report(df, [
        Check("u", "uniqueness", ">=", 0.0, column="c"),
        Check("d", "distinctness", ">=", 0.0, column="c"),
    ])
    # groups: NULL(2), x(1) -> uniqueness 1/3, distinctness 2/3
    assert got["u"]["value"] == round(1 / 3, 6)
    assert got["d"]["value"] == round(2 / 3, 6)


def test_error_status_on_null_metric(spark):
    df = spark.createDataFrame([(1, None), (2, None)], "id long, v double")
    got = _report(df, [Check("m", "mean", ">=", 0.0, column="v")])
    assert got["m"]["status"] == "error" and got["m"]["value"] is None


def test_quantile_exact_interpolated(df):
    got = _report(df, [
        Check("v median", "quantile", ">=", 20.0, column="v", q=0.5),
        Check("v p75", "quantile", "<=", 100.0, column="v", q=0.75),
    ])
    # exact interpolated percentile over [10, 20, 40, 50]
    assert got["v median"]["value"] == 30.0
    assert got["v median"]["status"] == "pass"
    assert got["v p75"]["value"] == 42.5


def test_composite_uniqueness(spark):
    rows = [(1, "a"), (1, "b"), (2, "a"), (2, "a")]
    df = spark.createDataFrame(rows, "x long, y string")
    got = _report(df, [
        Check("xy unique", "uniqueness", "==", 1.0, column=("x", "y")),
        Check("xy distinct", "distinctness", ">=", 0.5, column=("x", "y")),
        Check("x unique", "uniqueness", ">=", 0.0, column="x"),
    ])
    # groups: (1,a) (1,b) (2,a)x2 -> 2 of 4 unique, 3 of 4 distinct
    assert got["xy unique"]["value"] == 0.5
    assert got["xy unique"]["status"] == "fail"
    assert got["xy distinct"]["value"] == 0.75
    assert got["xy unique"]["subject"] == "x,y"
    assert got["x unique"]["value"] == 0.0


def test_quantile_validation(df):
    with pytest.raises(ValueError):
        Check("bad", "quantile", ">=", 1.0, column="v")  # no q
    with pytest.raises(ValueError):
        Check("bad", "quantile", ">=", 1.0, column="v", q=1.5)
    with pytest.raises(ValueError):
        Check("bad", "mean", ">=", 1.0, column=("a", "b"))  # tuple


def test_suite_passes_verdict(df):
    ok = run_checks(df, [Check("rows", "size", ">=", 1)])
    bad = run_checks(df, [Check("rows", "size", ">=", 100)])
    assert suite_passes(ok) is True
    assert suite_passes(bad) is False


def test_report_preserves_check_order(df):
    names = ["z", "a", "m"]
    rep = run_checks(df, [Check(n, "size", ">=", 0) for n in names])
    assert [r["check"] for r in rep.collect()] == names


def test_validation(df):
    with pytest.raises(ValueError):
        Check("x", "nope", ">=", 1)
    with pytest.raises(ValueError):
        Check("x", "mean", "~", 1)
    with pytest.raises(ValueError):
        Check("x", "compliance", ">=", 1)  # no predicate
    with pytest.raises(ValueError):
        Check("x", "mean", ">=", 1)  # no column
    with pytest.raises(ValueError):
        run_checks(df, [])
