"""Sessionization + functional-dependency operators."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from schema_validator_spark.operators import sessions as SS
from schema_validator_spark.operators import uniqueness as U


def _ts(minute):
    return dt.datetime(2024, 1, 1, 0, 0, 0) + dt.timedelta(minutes=minute)


def test_sessionize_gap_splits(spark):
    rows = [
        (1, 10, _ts(0)), (1, 11, _ts(5)),          # session 1
        (1, 12, _ts(45)), (1, 13, _ts(50)),        # >30min gap -> session 2
        (2, 20, _ts(0)),                           # other user, own session
    ]
    df = spark.createDataFrame(rows, "user_id long, event_id long, ts timestamp")
    got = {(r["user_id"], r["event_id"]): r["session_idx"]
           for r in SS.sessionize(df, "user_id", "ts", id_col="event_id").collect()}
    assert got == {(1, 10): 1, (1, 11): 1, (1, 12): 2, (1, 13): 2, (2, 20): 1}

    stats = {(r["user_id"], r["session_idx"]): (r["n_events"], r["duration_sec"])
             for r in SS.session_stats(df, "user_id", "ts",
                                       id_col="event_id").collect()}
    assert stats[(1, 1)] == (2, 300)
    assert stats[(1, 2)] == (2, 300)
    assert stats[(2, 1)] == (1, 0)


def test_functional_dependency(spark):
    df = spark.createDataFrame(
        [(1, "a"), (1, "a"), (2, "a"), (2, "b"), (3, "c")],
        "k long, v string",
    )
    viol = {r["k"]: r["n_distinct_dep"]
            for r in U.functional_dependency_violations(df, ["k"], ["v"]).collect()}
    assert viol == {2: 2}
    s = U.functional_dependency_stats(df, ["k"], ["v"]).first()
    assert s["n_determinants"] == 3 and s["n_violating"] == 1
    assert abs(s["violation_rate"] - 1 / 3) < 1e-6


def test_sessionize_chunked_equals_serial(spark):
    """The (user, chunk)-windowed sessionizer must be ROW-identical to
    the single-window definition on data engineered to hit every stitch
    case: sessions spanning chunk boundaries (stitch), boundary gaps just
    over the threshold (no stitch), empty chunks between events, ties on
    ts, and a planted mega-user."""
    import random

    rng = random.Random(7)
    rows = []
    eid = 0
    # mega-user 1: 3000 events, gaps drawn to straddle the 30-min gap and
    # the 2-hour chunk boundary alike
    t = 0
    for _ in range(3000):
        t += rng.choice([60, 300, 1799, 1800, 1801, 7200, 7201])
        eid += 1
        rows.append((1, eid, dt.datetime.fromtimestamp(t, dt.timezone.utc)))
    # user 2: exact tie timestamps (order falls back to event_id)
    base = dt.datetime(2024, 3, 1, tzinfo=dt.timezone.utc)
    for i in range(5):
        eid += 1
        rows.append((2, eid, base))
    # user 3: session exactly spanning a chunk boundary (gap <= 1800
    # across floor(ts/7200) boundary -> must stitch)
    b = dt.datetime.fromtimestamp(7200 * 500, dt.timezone.utc)
    for off in (-60, 60):
        eid += 1
        rows.append((3, eid, b + dt.timedelta(seconds=off)))
    # user 4: boundary gap just OVER the threshold -> no stitch
    for off in (-1000, 801):
        eid += 1
        rows.append((4, eid, b + dt.timedelta(seconds=off)))
    df = spark.createDataFrame(rows, "user_id long, event_id long, ts timestamp")

    serial = SS.sessionize(df, "user_id", "ts", id_col="event_id",
                           gap_seconds=1800)
    chunked = SS.sessionize_chunked(df, "user_id", "ts", id_col="event_id",
                                    gap_seconds=1800, chunk_seconds=7200)
    a = {(r["user_id"], r["event_id"]): r["session_idx"] for r in serial.collect()}
    b_ = {(r["user_id"], r["event_id"]): r["session_idx"] for r in chunked.collect()}
    assert a == b_
    assert set(chunked.columns) == set(serial.columns)
    # stitch + no-stitch both actually exercised
    u3 = sorted((k[1], v) for k, v in a.items() if k[0] == 3)
    u4 = sorted((k[1], v) for k, v in a.items() if k[0] == 4)
    assert u3[0][1] == u3[1][1] == 1          # stitched across the boundary
    assert (u4[0][1], u4[1][1]) == (1, 2)     # split at the boundary

    # the raw-event window partitions by (user, chunk), never user alone
    from schema_validator_spark.plans import inspect as P
    import re
    plan = P.executed_plan(chunked)
    assert any("_chunk" in m for m in re.findall(
        r"windowspecdefinition\(([^)]*)\)", plan)), plan


def test_sessionize_chunked_rejects_bad_chunk():
    import pytest

    with pytest.raises(ValueError, match="must exceed"):
        SS.sessionize_chunked(None, "u", "ts", gap_seconds=1800,
                              chunk_seconds=1800)


def test_session_stats_large_gap_autosizes_chunk(spark):
    """gap >= 1 day must not raise: the chunk auto-sizes to 4x the gap
    (round-3 review: fixed-86400 default rejected day-scale gaps)."""
    rows = [(1, 1, _ts(0)), (1, 2, _ts(60 * 24)),          # 1 day apart
            (1, 3, _ts(60 * 24 * 5))]                       # 4 days later
    df = spark.createDataFrame(rows, "user_id long, event_id long, ts timestamp")
    got = {(r["user_id"], r["session_idx"]): r["n_events"]
           for r in SS.session_stats(df, "user_id", "ts", id_col="event_id",
                                     gap_seconds=86400).collect()}
    assert got == {(1, 1): 2, (1, 2): 1}  # day-gap merges, 4-day gap splits
