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
