from __future__ import annotations

import pytest

from schema_validator_spark.operators.diff import reconcile_aggregates


@pytest.fixture()
def books(spark):
    detail = spark.createDataFrame(
        [(1, 10.0), (1, 5.0), (2, 7.0), (3, 1.0), (4, 2.0), (None, 9.0)],
        "acct long, amt double",
    )
    ledger = spark.createDataFrame(
        [(1, 15.0), (2, 7.5), (4, 2.0), (5, 3.0)],
        "acct long, total double",
    )
    return detail, ledger


def test_mismatches_only(spark, books):
    detail, ledger = books
    got = {
        r["acct"]: (r["sum_left"], r["sum_right"], r["diff"], r["kind"])
        for r in reconcile_aggregates(
            detail, ledger, ["acct"],
            left_measure="amt", right_measure="total",
        ).collect()
    }
    assert got[2] == (7.0, 7.5, 0.5, "mismatch")
    assert got[3] == (1.0, None, None, "missing_right")
    assert got[5] == (None, 3.0, None, "missing_left")
    assert 1 not in got and 4 not in got      # balanced
    assert None not in got                     # NULL keys excluded


def test_tolerance(spark, books):
    detail, ledger = books
    got = {
        r["acct"]: r["kind"]
        for r in reconcile_aggregates(
            detail, ledger, ["acct"],
            left_measure="amt", right_measure="total", tolerance=0.6,
        ).collect()
    }
    assert 2 not in got  # 0.5 within tolerance
    assert got[3] == "missing_right" and got[5] == "missing_left"
