from __future__ import annotations

import random

from schema_validator_spark.operators.sequence import (
    interval_overlaps,
    monotonic_violations,
    sequence_gaps,
)


def test_sequence_gaps_and_dups(spark):
    rows = [("a", 1), ("a", 2), ("a", 2), ("a", 5), ("b", 10), ("b", 11),
            ("c", None), ("c", 7)]
    df = spark.createDataFrame(rows, "k string, seq long")
    got = {
        (r["k"], r["prev_seq"], r["seq"]): (r["kind"], r["missing"])
        for r in sequence_gaps(df, ["k"], "seq").collect()
    }
    assert got == {
        ("a", 2, 2): ("dup", 0),
        ("a", 2, 5): ("gap", 2),
    }


def test_interval_overlaps_catches_containment_chain(spark):
    rows = [
        ("u", 0, 100),   # long interval swallows the next two
        ("u", 1, 2),
        ("u", 3, 4),
        ("u", 100, 110),  # half-open: touching is fine
        ("v", 0, 5), ("v", 5, 10),  # clean key
    ]
    df = spark.createDataFrame(rows, "k string, s long, e long")
    got = sorted(
        (r["k"], r["start"], r["end"], r["prev_max_end"])
        for r in interval_overlaps(df, ["k"], "s", "e").collect()
    )
    assert got == [("u", 1, 2, 100), ("u", 3, 4, 100)]


def test_interval_overlaps_matches_brute_force(spark):
    rng = random.Random(5)
    rows = []
    for k in range(8):
        for _ in range(40):
            s = rng.randrange(0, 500)
            rows.append((str(k), s, s + rng.randrange(1, 30)))
    df = spark.createDataFrame(rows, "k string, s long, e long")
    got = {(r["k"], r["start"], r["end"])
           for r in interval_overlaps(df, ["k"], "s", "e").collect()}
    # brute force: an interval violates iff any interval of the same key
    # sorts strictly before it (start, end) and overlaps it
    want = set()
    for k, s, e in rows:
        for k2, s2, e2 in rows:
            if k == k2 and (s2, e2) < (s, e) and s < e2 and s2 < e:
                want.add((k, s, e))
    assert got == want


def test_monotonic_violations(spark):
    rows = [("m", 1, 10.0), ("m", 2, 12.0), ("m", 3, 11.0), ("m", 4, 11.0),
            ("n", 1, 5.0), ("n", 2, 5.0)]
    df = spark.createDataFrame(rows, "k string, t long, v double")
    loose = {(r["k"], r["t"]) for r in
             monotonic_violations(df, ["k"], "t", "v").collect()}
    assert loose == {("m", 3)}
    strict = {(r["k"], r["t"]) for r in
              monotonic_violations(df, ["k"], "t", "v", strict=True).collect()}
    assert strict == {("m", 3), ("m", 4), ("n", 2)}
