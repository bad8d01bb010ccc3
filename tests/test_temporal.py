"""As-of join + binned range join (operators/temporal.py)."""
from __future__ import annotations

import datetime as dt
import random

import pytest
from pyspark.sql import functions as F

from schema_validator_spark.operators import temporal as T
from schema_validator_spark.plans import inspect as P

EPOCH = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)


def _ts(us: int) -> dt.datetime:
    return EPOCH + dt.timedelta(microseconds=us)


def test_asof_basic_and_ties(spark):
    left = spark.createDataFrame(
        [
            (1, 100, _ts(5_000_000)),   # between updates a(0s) and b(7s)
            (1, 101, _ts(7_000_000)),   # EXACTLY at update b -> inclusive
            (1, 102, _ts(1)),           # after a only
            (2, 200, _ts(3_000_000)),   # key with no updates
            (1, 103, _ts(0)),           # exactly at a
            (3, 300, None),             # NULL ts never matches
        ],
        "k long, eid long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (1, _ts(0), "a"),
            (1, _ts(7_000_000), "b"),
            (3, _ts(0), "x"),
        ],
        "k long, ts timestamp, tag string",
    )
    got = {r["eid"]: (r["tag"], r["ts_right"])
           for r in T.asof_join(left, right, ["k"], "ts").collect()}
    assert got[100] == ("a", _ts(0).replace(tzinfo=None))
    assert got[101][0] == "b"
    assert got[102][0] == "a"
    assert got[200] == (None, None)
    assert got[103][0] == "a"
    assert got[300] == (None, None)


def test_asof_duplicate_right_ts_greatest_payload_wins(spark):
    left = spark.createDataFrame([(1, 10, _ts(5))], "k long, eid long, ts timestamp")
    right = spark.createDataFrame(
        [(1, _ts(5), "aa"), (1, _ts(5), "zz")], "k long, ts timestamp, tag string"
    )
    [row] = T.asof_join(left, right, ["k"], "ts").collect()
    assert row["tag"] == "zz"


def test_asof_tolerance(spark):
    left = spark.createDataFrame(
        [(1, 10, _ts(10_000_000)), (1, 11, _ts(2_000_000))],
        "k long, eid long, ts timestamp",
    )
    right = spark.createDataFrame([(1, _ts(0), "a")], "k long, ts timestamp, tag string")
    got = {r["eid"]: r["tag"]
           for r in T.asof_join(left, right, ["k"], "ts",
                                tolerance_seconds=5).collect()}
    assert got == {10: None, 11: "a"}  # 10s-old match exceeds tolerance


def test_asof_plan_one_shuffle_no_join(spark):
    left = spark.range(100).select(
        (F.col("id") % 5).alias("k"), F.col("id").alias("eid"),
        F.timestamp_micros(F.col("id") * 1000).alias("ts"))
    right = spark.range(20).select(
        (F.col("id") % 5).alias("k"),
        F.timestamp_micros(F.col("id") * 7777).alias("ts"),
        F.col("id").alias("tag"))
    out = T.asof_join(left, right, ["k"], "ts")
    plan = P.executed_plan(out)
    assert "Join" not in plan, plan          # pure union+window, no join node
    assert P.n_exchanges(out) == 1, plan     # one hash partitioning by key
    assert not P.uses_python(out)


def test_asof_rejects_collision(spark):
    l = spark.createDataFrame([(1, _ts(0), "x")], "k long, ts timestamp, tag string")
    with pytest.raises(ValueError, match="collide"):
        T.asof_join(l, l, ["k"], "ts")


def _brute_range_pairs(lrows, rrows, lo_us, hi_us):
    out = set()
    for k, lid, lus in lrows:
        for k2, rid, rus in rrows:
            if k == k2 and lo_us <= rus - lus <= hi_us:
                out.add((lid, rid))
    return out


def test_range_join_matches_brute_force(spark):
    rng = random.Random(3)
    W = 3_600 * 1_000_000
    lrows = [(rng.randrange(4), 1000 + i, rng.randrange(0, 10 * W))
             for i in range(150)]
    rrows = [(rng.randrange(4), 2000 + i, rng.randrange(0, 10 * W))
             for i in range(150)]
    # exact-boundary pairs: diff == lower and diff == upper
    lrows += [(9, 1900, 5 * W), (9, 1901, 5 * W)]
    rrows += [(9, 2900, 5 * W), (9, 2901, 6 * W)]
    left = spark.createDataFrame(
        [(k, i, _ts(us)) for k, i, us in lrows], "k long, lid long, ts_l timestamp")
    right = spark.createDataFrame(
        [(k, i, _ts(us)) for k, i, us in rrows], "k long, rid long, ts_r timestamp")
    got = {
        (r["lid"], r["rid"])
        for r in T.range_join_binned(
            left, right, ["k"], "ts_l", "ts_r",
            lower_seconds=0, upper_seconds=3600,
        ).collect()
    }
    want = _brute_range_pairs(lrows, rrows, 0, W)
    assert got == want
    assert (1900, 2900) in got and (1901, 2901) in got  # boundary inclusive


def test_range_join_plan_is_equi_join(spark):
    left = spark.range(50).select((F.col("id") % 3).alias("k"),
                                  F.col("id").alias("lid"),
                                  F.timestamp_micros(F.col("id") * 9999).alias("ts_l"))
    right = spark.range(50).select((F.col("id") % 3).alias("k"),
                                   F.col("id").alias("rid"),
                                   F.timestamp_micros(F.col("id") * 7777).alias("ts_r"))
    out = T.range_join_binned(left, right, ["k"], "ts_l", "ts_r",
                              lower_seconds=0, upper_seconds=1)
    kinds = P.join_kinds(out)
    assert kinds and "CartesianProduct" not in kinds, kinds
    assert "BroadcastNestedLoopJoin" not in kinds, kinds


def test_range_join_validations(spark):
    df = spark.createDataFrame([(1, _ts(0))], "k long, ts timestamp")
    with pytest.raises(ValueError, match="exceed"):
        T.range_join_binned(df, df, ["k"], "ts", "ts",
                            lower_seconds=1, upper_seconds=1)
    with pytest.raises(ValueError, match="collide"):
        T.range_join_binned(df, df, ["k"], "ts", "ts",
                            lower_seconds=0, upper_seconds=1)


def test_range_join_rejects_submicrosecond_window(spark):
    df = spark.createDataFrame([(1, _ts(0))], "k long, ts timestamp")
    r = df.select("k", F.col("ts").alias("ts2"))
    with pytest.raises(ValueError, match="microsecond"):
        T.range_join_binned(df, r, ["k"], "ts", "ts2",
                            lower_seconds=0, upper_seconds=4e-7)


def test_asof_matches_brute_force_random(spark):
    """Randomized as-of equivalence: latest right at-or-before each left
    row, per key — including planted exact-timestamp collisions."""
    rng = random.Random(17)
    lrows = [(rng.randrange(5), 1000 + i, rng.randrange(0, 10**7))
             for i in range(200)]
    rrows = [(rng.randrange(5), 2000 + i, rng.randrange(0, 10**7))
             for i in range(60)]
    # exact left==right timestamp collisions (inclusive match)
    for j in range(10):
        k, _, us = lrows[j]
        rrows.append((k, 3000 + j, us))
    left = spark.createDataFrame([(k, i, _ts(us)) for k, i, us in lrows],
                                 "k long, eid long, ts timestamp")
    right = spark.createDataFrame([(k, _ts(us), i) for k, i, us in rrows],
                                  "k long, ts timestamp, rid long")
    got = {r["eid"]: r["rid"]
           for r in T.asof_join(left, right, ["k"], "ts").collect()}

    def brute(k, lus):
        cands = [(us, rid) for (rk, rid, us) in rrows if rk == k and us <= lus]
        if not cands:
            return None
        # ties on ts: greatest payload struct (ts, rid) wins -> max rid
        best_us = max(us for us, _ in cands)
        return max(rid for us, rid in cands if us == best_us)

    for k, eid, us in lrows:
        assert got[eid] == brute(k, us), (eid, k, us)


def test_asof_chunked_equals_plain(spark):
    """asof_join_chunked must be row-identical to asof_join on random
    data with a hot key, matches older than many chunks, ties, NULL ts,
    and keys with no right rows at all."""
    rng = random.Random(23)
    lrows = [(rng.randrange(4), 1000 + i, rng.randrange(0, 30 * 86_400) * 1_000_000)
             for i in range(300)]
    # hot key 0 gets a dense stream; key 3 has NO right rows
    rrows = [(rng.randrange(3), 2000 + i, rng.randrange(0, 30 * 86_400) * 1_000_000)
             for i in range(80)]
    rrows += [(0, 2900 + j, j * 7_200 * 1_000_000) for j in range(50)]
    # right-ts ties for the greatest-payload rule
    rrows += [(1, 3000, 86_400 * 1_000_000), (1, 3001, 86_400 * 1_000_000)]
    left = spark.createDataFrame(
        [(k, i, _ts(us)) for k, i, us in lrows] + [(2, 999, None)],
        "k long, eid long, ts timestamp")
    right = spark.createDataFrame([(k, _ts(us), i) for k, i, us in rrows],
                                  "k long, ts timestamp, rid long")

    plain = {r["eid"]: (r["rid"], r["ts_right"])
             for r in T.asof_join(left, right, ["k"], "ts").collect()}
    for chunk in (86_400, 3_600 * 5):
        chunked = {r["eid"]: (r["rid"], r["ts_right"])
                   for r in T.asof_join_chunked(
                       left, right, ["k"], "ts",
                       chunk_seconds=chunk).collect()}
        assert chunked == plain, chunk
    # tolerance path too
    pt = {r["eid"]: r["rid"]
          for r in T.asof_join(left, right, ["k"], "ts",
                               tolerance_seconds=3600).collect()}
    ct = {r["eid"]: r["rid"]
          for r in T.asof_join_chunked(left, right, ["k"], "ts",
                                       tolerance_seconds=3600).collect()}
    assert ct == pt

    # the raw-row window partitions by (key, chunk)
    import re
    from schema_validator_spark.plans import inspect as P
    plan = P.executed_plan(T.asof_join_chunked(left, right, ["k"], "ts"))
    assert any("_chunk" in m for m in
               re.findall(r"windowspecdefinition\(([^)]*)\)", plan)), plan
