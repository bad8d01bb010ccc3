from __future__ import annotations

import pytest

from schema_validator_spark.operators.paireval import pair_metrics


def _pairs(spark, rows):
    return spark.createDataFrame(rows, "id_a long, id_b long")


def test_basic_precision_recall(spark):
    pred = _pairs(spark, [(1, 2), (3, 4), (5, 6), (7, 8)])
    truth = _pairs(spark, [(1, 2), (3, 4), (9, 10)])
    r = pair_metrics(pred, truth).collect()[0]
    assert (r["n_pred"], r["n_true"], r["n_hit"]) == (4, 3, 2)
    assert r["precision"] == 0.5
    assert r["recall"] == pytest.approx(2 / 3, abs=1e-12)
    p, rec = 0.5, 2 / 3
    assert r["f1"] == pytest.approx(2 * p * rec / (p + rec), abs=1e-12)


def test_canonicalization_orientation_and_dups(spark):
    pred = _pairs(spark, [(2, 1), (1, 2), (1, 2), (3, 3), (None, 4)])
    truth = _pairs(spark, [(1, 2)])
    r = pair_metrics(pred, truth).collect()[0]
    # (2,1)/(1,2)/(1,2) collapse to one; self-pair and NULL dropped
    assert (r["n_pred"], r["n_true"], r["n_hit"]) == (1, 1, 1)
    assert r["precision"] == 1.0 and r["recall"] == 1.0 and r["f1"] == 1.0


def test_empty_sides(spark):
    empty = _pairs(spark, []).filter("id_a is not null")
    some = _pairs(spark, [(1, 2)])
    r = pair_metrics(empty, some).collect()[0]
    assert r["precision"] == 0.0 and r["recall"] == 0.0 and r["f1"] == 0.0
    r2 = pair_metrics(some, empty).collect()[0]
    assert (r2["n_pred"], r2["n_true"]) == (1, 0)
    assert r2["recall"] == 0.0 and r2["f1"] == 0.0


def test_both_empty_returns_zeros(spark):
    empty = _pairs(spark, []).filter("id_a is not null")
    r = pair_metrics(empty, empty).collect()[0]
    assert (r["n_pred"], r["n_true"], r["n_hit"]) == (0, 0, 0)
    assert r["precision"] == 0.0 and r["recall"] == 0.0 and r["f1"] == 0.0
