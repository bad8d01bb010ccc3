"""Cross-table fuzzy entity matching (operators/linkage.py)."""
from __future__ import annotations

from pyspark.sql import functions as F

from schema_validator_spark.operators import linkage as L
from schema_validator_spark.plans import inspect as P


def _grams(s, n=3):
    s = s.lower()
    return {s[i:i + n] for i in range(len(s) - n + 1)} if len(s) >= n else {s}


def _jac(a, b):
    ga, gb = _grams(a), _grams(b)
    return len(ga & gb) / len(ga | gb)


def test_fuzzy_match_finds_typos_exactly(spark):
    people = [
        (1, "Jonathan Smithers"),
        (2, "Maria Gonzalez-Lopez"),
        (3, "Wei Zhang"),
        (4, "Completely Unrelated Name"),
    ]
    crm = [
        (10, "Jonathan Smithers"),        # exact
        (11, "Maria Gonzales-Lopez"),     # one-char typo
        (12, "Zhang Wei"),                # token swap (lower jaccard)
        (13, "Someone Else Entirely"),
    ]
    left = spark.createDataFrame(people, "pid long, name string")
    right = spark.createDataFrame(crm, "cid long, name string")
    got = {(r["id_a"], r["id_b"]): r["jaccard"]
           for r in L.fuzzy_match(left, right, "pid", "cid",
                                  "name", "name", threshold=0.5).collect()}
    # brute-force expected set at the same threshold
    want = {(p, c): _jac(pn, cn)
            for p, pn in people for c, cn in crm if _jac(pn, cn) >= 0.5}
    assert set(got) == set(want)
    for k, v in want.items():
        assert abs(got[k] - v) < 1e-12
    assert (1, 10) in got and (2, 11) in got


def test_fuzzy_match_no_cross_join_in_plan(spark):
    left = spark.range(50).select(
        F.col("id").alias("pid"),
        F.concat(F.lit("name-"), F.col("id")).alias("name"))
    right = spark.range(50).select(
        F.col("id").alias("cid"),
        F.concat(F.lit("name-"), F.col("id")).alias("name"))
    # threshold 0.95: only the identical pairs qualify ("name-1" vs
    # "name-2" genuinely sits at jaccard 0.6 — sequential-id names are
    # legitimately similar)
    out = L.fuzzy_match(left, right, "pid", "cid", "name", "name",
                        threshold=0.95)
    kinds = P.join_kinds(out)
    assert "CartesianProduct" not in kinds, kinds
    assert "BroadcastNestedLoopJoin" not in kinds, kinds
    # identical strings always share every band -> all 50 exact matches
    assert out.count() == 50
    assert {(r["id_a"], r["id_b"]) for r in out.collect()} == {
        (i, i) for i in range(50)}


def test_fuzzy_match_null_and_empty_keys_never_match(spark):
    left = spark.createDataFrame(
        [(1, None), (2, ""), (3, "  "), (4, "real name")],
        "pid long, name string")
    right = spark.createDataFrame(
        [(10, None), (11, ""), (12, "real name")], "cid long, name string")
    got = {(r["id_a"], r["id_b"])
           for r in L.fuzzy_match(left, right, "pid", "cid",
                                  "name", "name", threshold=0.5).collect()}
    assert got == {(4, 12)}  # no null/empty bipartite clique


def test_fuzzy_match_hot_bucket_cap(spark):
    # one degenerate repeated key on both sides -> capped buckets are
    # EXCLUDED (same contract as the dedup tiers), real pair survives
    left = spark.createDataFrame(
        [(i, "placeholder-key") for i in range(40)] + [(100, "unique entity")],
        "pid long, name string")
    right = spark.createDataFrame(
        [(1000 + i, "placeholder-key") for i in range(40)]
        + [(2000, "unique entity")],
        "cid long, name string")
    capped = L.fuzzy_match(left, right, "pid", "cid", "name", "name",
                           threshold=0.9, max_bucket_size=10,
                           log_dropped=False)
    assert {(r["id_a"], r["id_b"]) for r in capped.collect()} == {(100, 2000)}
    uncapped = L.fuzzy_match(left, right, "pid", "cid", "name", "name",
                             threshold=0.9)
    assert uncapped.count() == 40 * 40 + 1
