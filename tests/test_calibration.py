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


def test_threshold_sweep_exact(spark):
    from schema_validator_spark.operators.calibration import (
        threshold_sweep,
    )

    rows = [
        (0.9, True), (0.8, True), (0.7, False),
        (0.4, True), (0.2, False), (None, True), (0.95, None),
    ]
    df = spark.createDataFrame(rows, "score double, label boolean")
    got = {
        r["threshold"]: r.asDict()
        for r in threshold_sweep(
            df, "score", "label", thresholds=[0.5, 0.99]
        ).collect()
    }
    t5 = got[0.5]
    # kept: .9T .8T .7F .95(NULL label) -> n_kept 4, tp 2, fp 1
    # not kept with label=True: .4T and the NULL-score True row -> fn 2
    assert (t5["n_kept"], t5["tp"], t5["fp"], t5["fn"]) == (4, 2, 1, 2)
    assert t5["precision"] == round(2 / 3, 6)
    assert t5["recall"] == 0.5
    p, r = 2 / 3, 0.5
    assert abs(t5["f1"] - 2 * round(p, 6) * r / (round(p, 6) + r)) < 2e-6
    t99 = got[0.99]
    # nothing reaches 0.99 -> no kept rows: precision NULL, recall 0
    assert (t99["n_kept"], t99["tp"], t99["fp"], t99["fn"]) == (0, 0, 0, 4)
    assert t99["precision"] is None and t99["recall"] == 0.0
    assert t99["f1"] is None


def test_threshold_sweep_single_pass_plan(spark):
    from schema_validator_spark.operators.calibration import (
        threshold_sweep,
    )
    from schema_validator_spark.plans.inspect import n_exchanges

    df = spark.createDataFrame([(0.5, True)], "score double, label boolean")
    out = threshold_sweep(df, "score", "label")
    # one scalar aggregation (single Exchange to the 1-row reduce)
    assert n_exchanges(out) <= 1
