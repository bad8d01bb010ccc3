from __future__ import annotations

import random

import pytest

from schema_validator_spark.operators.drift import emd_2sample_df


def _w1_brute(xs, ys):
    """W1 via the sorted-CDF integral, pure Python."""
    vals = sorted(set(xs) | set(ys))
    nb, nc = len(xs), len(ys)
    cb = cc = 0
    total = 0.0
    for v, nxt in zip(vals, vals[1:]):
        cb += sum(1 for x in xs if x == v)
        cc += sum(1 for y in ys if y == v)
        total += abs(cb / nb - cc / nc) * (nxt - v)
    return total


def _df(spark, xs, ys):
    rows = [("b", float(x)) for x in xs] + [("c", float(y)) for y in ys]
    return spark.createDataFrame(rows, "g string, v double")


def test_unit_shift_is_one(spark):
    df = _df(spark, [0, 1, 2], [1, 2, 3])
    r = emd_2sample_df(df, "v", "g", "b", "c").collect()[0]
    assert r["w1"] == pytest.approx(1.0)
    assert (r["n_base"], r["n_curr"]) == (3, 3)


def test_identical_is_zero(spark):
    df = _df(spark, [5, 5, 9, 2], [5, 5, 9, 2])
    assert emd_2sample_df(df, "v", "g", "b", "c").collect()[0]["w1"] == 0.0


@pytest.mark.parametrize("n_ranges", [1, 8, 64])
def test_matches_brute_force(spark, n_ranges):
    rng = random.Random(11)
    xs = [rng.uniform(0, 100) for _ in range(300)] + [rng.choice([7.0, 9.0]) for _ in range(50)]
    ys = [rng.gauss(60, 15) for _ in range(250)] + [7.0] * 30
    df = _df(spark, xs, ys)
    got = emd_2sample_df(df, "v", "g", "b", "c", n_ranges=n_ranges).collect()[0]
    assert got["w1"] == pytest.approx(_w1_brute(xs, ys), abs=1e-5)
    assert got["n_base"] == 350 and got["n_curr"] == 280


def test_unequal_sizes_and_mass_interpretation(spark):
    # base all at 0, cur all at d -> W1 = d regardless of sample sizes
    df = _df(spark, [0] * 10, [4.5] * 3)
    assert emd_2sample_df(df, "v", "g", "b", "c").collect()[0]["w1"] == pytest.approx(4.5)
