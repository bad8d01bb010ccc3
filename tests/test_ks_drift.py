"""ks_2sample_df: exact two-sample Kolmogorov-Smirnov via distributed
prefix-sum CDF — checked against a serial bisect reference.

No reference analog (the reference validates single values,
validator.go:32-34); drift testing is mandated by repo:BASELINE.json
north_rule ("distribution drift ... compared across commits").
"""

from __future__ import annotations

import bisect

from schema_validator_spark.operators import drift


def _ks_exact(a: list[float], b: list[float]) -> float:
    sa, sb = sorted(a), sorted(b)
    best = 0.0
    for x in set(a) | set(b):
        fa = bisect.bisect_right(sa, x) / len(sa)
        fb = bisect.bisect_right(sb, x) / len(sb)
        best = max(best, abs(fa - fb))
    return best


def _df(spark, a, b):
    rows = [("base", float(x)) for x in a] + [("curr", float(x)) for x in b]
    return spark.createDataFrame(rows, "g string, v double")


def test_ks_matches_serial_reference(spark):
    # heavy ties within and ACROSS groups (shared lattice points)
    a = [(i % 17) * 0.5 for i in range(300)]
    b = [(i % 23) * 0.4 + 1.0 for i in range(400)]
    out = drift.ks_2sample_df(_df(spark, a, b), "v", "g", "base", "curr")
    row = out.collect()[0]
    assert row["baseline"] == "base" and row["curr"] == "curr"
    assert row["n_base"] == 300 and row["n_curr"] == 400
    assert abs(row["ks"] - round(_ks_exact(a, b), 6)) < 1e-9


def test_ks_identical_distributions_is_zero(spark):
    a = [(i % 11) * 1.5 for i in range(220)]
    out = drift.ks_2sample_df(_df(spark, a, a), "v", "g", "base", "curr")
    assert out.collect()[0]["ks"] == 0.0


def test_ks_disjoint_supports_is_one(spark):
    out = drift.ks_2sample_df(
        _df(spark, [1.0, 2.0, 3.0], [10.0, 11.0]), "v", "g", "base", "curr"
    )
    assert out.collect()[0]["ks"] == 1.0


def test_ks_range_count_does_not_change_result(spark):
    a = [(i % 29) * 0.3 for i in range(500)]
    b = [(i % 31) * 0.35 for i in range(450)]
    df = _df(spark, a, b)
    expect = round(_ks_exact(a, b), 6)
    for n_ranges in (1, 4, 64):
        row = drift.ks_2sample_df(
            df, "v", "g", "base", "curr", n_ranges=n_ranges
        ).collect()[0]
        assert abs(row["ks"] - expect) < 1e-9, n_ranges


def test_ks_ignores_other_groups_and_nulls(spark):
    rows = (
        [("base", float(i)) for i in range(10)]
        + [("curr", float(i) + 0.5) for i in range(10)]
        + [("other", 99.0), ("base", None), ("curr", None)]
    )
    df = spark.createDataFrame(rows, "g string, v double")
    row = drift.ks_2sample_df(df, "v", "g", "base", "curr").collect()[0]
    assert row["n_base"] == 10 and row["n_curr"] == 10
    a = [float(i) for i in range(10)]
    b = [float(i) + 0.5 for i in range(10)]
    assert abs(row["ks"] - round(_ks_exact(a, b), 6)) < 1e-9
