from __future__ import annotations

import datetime as dt

import pytest

from schema_validator_spark.operators.freshness import (
    freshness_summary,
    partition_freshness,
)


def _df(spark, days):
    rows = [(dt.datetime(2024, 3, d, 10, 0, 0),) for d in days for _ in range(d)]
    return spark.createDataFrame(rows, "ts timestamp")


def test_grid_flags_missing_days(spark):
    df = _df(spark, [1, 2, 5, 6])  # days 3 and 4 missing
    got = {
        r["bucket"].day: (r["n_rows"], r["is_missing"])
        for r in partition_freshness(df, "ts").collect()
    }
    assert sorted(got) == [1, 2, 3, 4, 5, 6]
    assert got[3] == (0, True) and got[4] == (0, True)
    assert got[1] == (1, False) and got[6] == (6, False)


def test_summary_max_gap_and_staleness(spark):
    df = _df(spark, [1, 4, 5, 9])  # gaps: 2-3 (run 2), 6-8 (run 3)
    r = freshness_summary(
        df, "ts", as_of=dt.datetime(2024, 3, 12, 3, 0, 0)
    ).collect()[0]
    assert r["n_buckets"] == 9
    assert r["n_missing"] == 5
    assert r["max_gap"] == 3
    assert r["staleness_us"] == 3 * 86400 * 1_000_000  # day 9 -> day 12


def test_no_missing_days(spark):
    df = _df(spark, [1, 2, 3])
    r = freshness_summary(df, "ts").collect()[0]
    assert r["n_missing"] == 0 and r["max_gap"] == 0
    assert r["staleness_us"] is None


def test_hour_grain_and_bad_grain(spark):
    rows = [(dt.datetime(2024, 3, 1, h),) for h in (0, 3)]
    df = spark.createDataFrame(rows, "ts timestamp")
    grid = partition_freshness(df, "ts", grain="hour").collect()
    assert len(grid) == 4
    assert sum(r["is_missing"] for r in grid) == 2
    with pytest.raises(ValueError):
        partition_freshness(df, "ts", grain="minute")
