from __future__ import annotations

import datetime as dt

import pytest

from schema_validator_spark.operators.freshness import volume_anomalies


def _df(spark, day_counts):
    rows = [
        (dt.datetime(2024, 5, d, 12),) for d, n in day_counts.items()
        for _ in range(n)
    ]
    return spark.createDataFrame(rows, "ts timestamp")


def test_spike_drop_and_missing_day_flagged(spark):
    counts = {d: 100 for d in range(1, 15)}
    counts[5] = 400     # spike
    counts[9] = 10      # drop
    del counts[12]      # missing day -> zero count
    df = _df(spark, counts)
    got = {r["bucket"].day: r for r in volume_anomalies(df, "ts").collect()}
    assert len(got) == 14  # full grid incl. missing day
    flagged = {d for d, r in got.items() if r["anomalous"]}
    assert flagged == {5, 9, 12}
    assert got[12]["n_rows"] == 0
    # most buckets identical -> MAD = 0 -> fallback path, deviation NULL
    assert got[1]["deviation"] is None


def test_hand_computed_deviation(spark):
    counts = {1: 10, 2: 10, 3: 10, 4: 10, 5: 40}
    df = _df(spark, counts)
    got = {r["bucket"].day: r for r in volume_anomalies(df, "ts").collect()}
    # median 10, absdevs [0,0,0,0,30], MAD 0 -> fallback: flag != median
    assert got[5]["anomalous"] is True and got[5]["deviation"] is None
    assert got[1]["anomalous"] is False


def test_nonzero_mad_path(spark):
    counts = {1: 8, 2: 10, 3: 12, 4: 9, 5: 11, 6: 100}
    df = _df(spark, counts)
    got = {r["bucket"].day: r for r in volume_anomalies(df, "ts", n_mads=3.0).collect()}
    med, mad = 10.5, 1.5  # absdevs [2.5,0.5,1.5,1.5,0.5,89.5] -> median 1.5
    assert got[6]["deviation"] == pytest.approx(
        89.5 / (1.4826 * mad), abs=1e-4
    )
    assert got[6]["anomalous"] is True
    assert sum(r["anomalous"] for r in got.values()) == 1
