from __future__ import annotations

import math
import random

import pytest

from schema_validator_spark.operators.profile import (
    benford_report,
    benford_summary,
)


def _df(spark, vals):
    return spark.createDataFrame([(float(v),) for v in vals], "v double")


def test_digit_extraction_edges(spark):
    # powers of ten, sub-1 values, negatives, nulls, zeros
    df = spark.createDataFrame(
        [(1.0,), (10.0,), (100.0,), (0.02,), (-30.5,), (None,), (0.0,), (999.0,)],
        "v double",
    )
    got = {r["digit"]: r["n_digit"] for r in benford_report(df, "v").collect()}
    assert got[1] == 3       # 1, 10, 100
    assert got[2] == 1       # 0.02
    assert got[3] == 1       # -30.5
    assert got[9] == 1       # 999
    assert sum(got.values()) == 6  # null and zero excluded
    assert sorted(got) == list(range(1, 10))  # always the full grid


def test_benford_distributed_sample_conforms(spark):
    # log-uniform values follow Benford closely
    rng = random.Random(3)
    vals = [10 ** rng.uniform(0, 5) for _ in range(20000)]
    r = benford_summary(_df(spark, vals), "v").collect()[0]
    assert r["n"] == 20000
    assert r["mad"] < 0.01


def test_uniform_sample_deviates(spark):
    # uniform[1, 2) is all first-digit 1 -> gross deviation
    vals = [1.0 + i / 1000 for i in range(1000)]
    r = benford_summary(_df(spark, vals), "v").collect()[0]
    assert r["mad"] > 0.1
    report = {r["digit"]: r for r in benford_report(_df(spark, vals), "v").collect()}
    assert report[1]["obs_p"] == 1.0
    assert report[5]["n_digit"] == 0
    assert report[5]["abs_dev"] == pytest.approx(math.log10(1 + 1 / 5), abs=1e-6)


def test_summary_matches_hand_computation(spark):
    vals = [1, 1, 1, 2, 3, 9, 55, 120]
    n = len(vals)
    obs = {d: 0 for d in range(1, 10)}
    for v in vals:
        obs[int(str(v)[0])] += 1
    mad = sum(
        abs(obs[d] / n - math.log10(1 + 1 / d)) for d in range(1, 10)
    ) / 9
    chi2 = n * sum(
        (obs[d] / n - math.log10(1 + 1 / d)) ** 2 / math.log10(1 + 1 / d)
        for d in range(1, 10)
    )
    r = benford_summary(_df(spark, vals), "v").collect()[0]
    assert r["mad"] == pytest.approx(mad, abs=1e-6)
    assert r["chi2"] == pytest.approx(chi2, abs=1e-4)
