from __future__ import annotations

import math

import pytest

from schema_validator_spark.operators.drift import categorical_drift_df


def _one(df):
    return df.collect()[0].asDict()


def test_identical_distributions_zero(spark):
    rows = [(c,) for c in "aabbbcc"]
    base = spark.createDataFrame(rows, "v string")
    cur = spark.createDataFrame(rows, "v string")
    r = _one(categorical_drift_df(base, cur, "v"))
    assert r["chi2"] == 0.0 and r["jsd"] == 0.0 and r["tvd"] == 0.0
    assert r["n_categories"] == 3 and r["dof"] == 2
    assert r["n_base"] == 7 and r["n_cur"] == 7


def test_disjoint_distributions_hit_bounds(spark):
    base = spark.createDataFrame([("a",)] * 4, "v string")
    cur = spark.createDataFrame([("b",)] * 4, "v string")
    r = _one(categorical_drift_df(base, cur, "v"))
    # JSD (natural log) maxes at ln 2; TVD at 1
    assert r["jsd"] == pytest.approx(math.log(2), abs=1e-6)
    assert r["tvd"] == 1.0
    assert r["chi2"] == pytest.approx(8.0)  # 2x2 complete separation = N


def test_matches_hand_computation(spark):
    base_counts = {"a": 30, "b": 10, "c": 0}
    cur_counts = {"a": 10, "b": 20, "c": 10}
    base = spark.createDataFrame(
        [(k,) for k, n in base_counts.items() for _ in range(n)], "v string"
    )
    cur = spark.createDataFrame(
        [(k,) for k, n in cur_counts.items() for _ in range(n)], "v string"
    )
    n_b, n_c = 40, 40
    chi2 = jsd = tvd = 0.0
    for k in "abc":
        b, c = base_counts[k], cur_counts[k]
        e_b = n_b * (b + c) / (n_b + n_c)
        e_c = n_c * (b + c) / (n_b + n_c)
        chi2 += (b - e_b) ** 2 / e_b + (c - e_c) ** 2 / e_c
        p, q = b / n_b, c / n_c
        m = (p + q) / 2
        jsd += (p * math.log(p / m) / 2 if p else 0.0) + (
            q * math.log(q / m) / 2 if q else 0.0
        )
        tvd += abs(p - q) / 2
    r = _one(categorical_drift_df(base, cur, "v"))
    assert r["chi2"] == pytest.approx(chi2, abs=1e-6)
    assert r["jsd"] == pytest.approx(jsd, abs=1e-6)
    assert r["tvd"] == pytest.approx(tvd, abs=1e-6)
    assert r["n_categories"] == 3


def test_null_is_its_own_category(spark):
    base = spark.createDataFrame([("a",), (None,)], "v string")
    cur = spark.createDataFrame([("a",), ("a",)], "v string")
    r = _one(categorical_drift_df(base, cur, "v"))
    assert r["n_categories"] == 2
    assert r["tvd"] == pytest.approx(0.5)
