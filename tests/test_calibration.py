"""operators/calibration.py — reliability bins + ECE (exact arithmetic
on hand-built frames; bin edges, NULL score/label handling)."""

from __future__ import annotations

import pytest


def _report(spark, rows, **kw):
    from schema_validator_spark.operators.calibration import (
        calibration_report,
    )

    df = spark.createDataFrame(rows, "score double, label boolean")
    return {
        r["bin"]: r.asDict()
        for r in calibration_report(df, "score", "label", **kw).collect()
    }


def test_bins_exact(spark):
    rows = [
        (0.05, False), (0.08, False),          # bin 0: mean .065, pos 0
        (0.55, True), (0.55, False),           # bin 5: mean .55, pos .5
        (0.95, True), (1.0, True),             # bin 9 (1.0 clamps in)
    ]
    got = _report(spark, rows, n_bins=10)
    assert set(got) == {0, 5, 9}
    b0 = got[0]
    assert (b0["n"], b0["mean_score"], b0["pos_rate"]) == (2, 0.065, 0.0)
    assert b0["gap"] == -0.065
    b5 = got[5]
    assert (b5["n"], b5["mean_score"], b5["pos_rate"]) == (2, 0.55, 0.5)
    assert b5["gap"] == round(0.5 - 0.55, 6)
    b9 = got[9]
    assert (b9["n"], b9["mean_score"], b9["pos_rate"]) == (2, 0.975, 1.0)


def test_null_score_and_label(spark):
    rows = [
        (None, True),            # NULL-bin row, reported not dropped
        (0.2, None),             # counts in n, excluded from pos_rate
        (0.25, True),
    ]
    got = _report(spark, rows, n_bins=10)
    assert set(got) == {None, 2}
    assert got[None]["n"] == 1 and got[None]["mean_score"] is None
    b2 = got[2]
    assert b2["n"] == 2
    assert b2["mean_score"] == 0.225
    assert b2["pos_rate"] == 1.0          # the NULL label is ignored
    assert b2["gap"] == 0.775


def test_ece_rollup(spark):
    from schema_validator_spark.operators.calibration import (
        expected_calibration_error,
    )

    rows = [
        (0.05, False), (0.08, False),   # |gap| = 0.065, n=2
        (0.55, True), (0.55, False),    # |gap| = 0.05,  n=2
        (None, True),                   # excluded (NULL bin)
    ]
    df = spark.createDataFrame(rows, "score double, label boolean")
    got = expected_calibration_error(df, "score", "label").collect()[0]
    assert got["n_bins_used"] == 2 and got["n_scored"] == 4
    assert got["ece"] == round((2 * 0.065 + 2 * 0.05) / 4, 6)


def test_one_shuffle_plan_and_bad_bins(spark):
    from schema_validator_spark.operators.calibration import (
        calibration_report,
    )
    from schema_validator_spark.plans.inspect import n_exchanges

    df = spark.createDataFrame([(0.5, True)], "score double, label boolean")
    assert n_exchanges(calibration_report(df, "score", "label")) == 1
    with pytest.raises(ValueError, match="n_bins"):
        calibration_report(df, "score", "label", n_bins=0)
