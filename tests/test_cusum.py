from __future__ import annotations

import datetime as dt

import pytest

from schema_validator_spark.operators.freshness import cusum_changepoints


def _df(spark, day_counts):
    rows = [
        (dt.datetime(2024, 7, d, 9),) for d, n in day_counts.items()
        for _ in range(n)
    ]
    return spark.createDataFrame(rows, "ts timestamp")


def _cusum_ref(counts, slack_mads, threshold_mads):
    """Direct recursion reference implementation."""
    import statistics

    days = sorted(counts)
    xs = [counts[d] for d in days]
    med = statistics.median(xs)
    mad = statistics.median([abs(x - med) for x in xs])
    s = 1.4826 * mad
    su = sd = 0.0
    out = {}
    for d, x in zip(days, xs):
        su = max(0.0, su + (x - med - slack_mads * s) / s)
        sd = max(0.0, sd + (med - x - slack_mads * s) / s)
        out[d] = (su, sd, su > threshold_mads or sd > threshold_mads)
    return out


def test_matches_direct_recursion(spark):
    counts = {d: 100 + (d % 3) for d in range(1, 25)}
    for d in range(15, 25):      # sustained 12% drop from day 15
        counts[d] = 88 + (d % 3)
    counts[5] = 108              # modest point spike (resets, no alarm)
    df = _df(spark, counts)
    got = {
        r["bucket"].day: (r["cusum_up"], r["cusum_down"], r["alarm"])
        for r in cusum_changepoints(df, "ts").collect()
    }
    ref = _cusum_ref(counts, 0.5, 5.0)
    for d, (su, sd, alarm) in ref.items():
        assert got[d][0] == pytest.approx(su, abs=1e-5), d
        assert got[d][1] == pytest.approx(sd, abs=1e-5), d
        assert got[d][2] == alarm, d
    # the sustained shift must eventually alarm; the early spike must not
    assert any(ref[d][2] for d in range(15, 25))
    assert not ref[5][2]


def test_zero_mad_no_alarm(spark):
    df = _df(spark, {d: 10 for d in range(1, 8)})
    got = cusum_changepoints(df, "ts").collect()
    assert all(r["alarm"] is False and r["cusum_up"] is None for r in got)
