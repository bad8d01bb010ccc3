from __future__ import annotations

from schema_validator_spark.operators.packing import (
    assign_shards,
    shard_leakage,
)

PAIR_SCHEMA = "id_a long, id_b long"
SHARD_SCHEMA = "doc_id long, shard_id long"


def _run(spark, pairs, shards):
    p = spark.createDataFrame(pairs, PAIR_SCHEMA)
    s = spark.createDataFrame(shards, SHARD_SCHEMA)
    got = shard_leakage(p, s, id_col="doc_id")
    return {
        (r["shard_a"], r["shard_b"]): (
            r["n_pairs"],
            r["n_docs_a"],
            r["n_docs_b"],
        )
        for r in got.collect()
    }


def test_cross_shard_pairs_counted_same_shard_ignored(spark):
    shards = [(1, 0), (2, 0), (3, 1), (4, 1)]
    pairs = [(1, 2), (3, 4), (1, 3), (2, 4)]
    got = _run(spark, pairs, shards)
    assert got == {(0, 1): (2, 2, 2)}


def test_orientation_normalized(spark):
    # pair given high-shard-side first must still normalize
    shards = [(1, 5), (2, 2)]
    got = _run(spark, [(1, 2)], shards)
    assert got == {(2, 5): (1, 1, 1)}
    # doc_a must be the shard_a-side doc (doc 2 on shard 2)
    # verified implicitly by the distinct counts above


def test_docs_missing_from_manifest_drop(spark):
    shards = [(1, 0)]
    got = _run(spark, [(1, 99)], shards)
    assert got == {}


def test_distinct_doc_counts(spark):
    # one hub doc on shard 0 linked to three docs on shard 1
    shards = [(1, 0), (2, 1), (3, 1), (4, 1)]
    pairs = [(1, 2), (1, 3), (1, 4)]
    got = _run(spark, pairs, shards)
    assert got == {(0, 1): (3, 1, 3)}


def test_composes_with_assign_shards(spark):
    docs = spark.createDataFrame(
        [(i, 10) for i in range(40)], "doc_id long, n_bytes long"
    )
    shards = assign_shards(docs, "doc_id", "n_bytes", num_shards=4)
    # every doc duplicated with its neighbor in id space; stream order
    # is md5-rank so many pairs straddle shard boundaries
    pairs = spark.createDataFrame(
        [(2 * k, 2 * k + 1) for k in range(20)], PAIR_SCHEMA
    )
    got = shard_leakage(pairs, shards, id_col="doc_id")
    rows = got.collect()
    assert sum(r["n_pairs"] for r in rows) <= 20
    assert all(r["shard_a"] < r["shard_b"] for r in rows)
    assert all(0 <= r["shard_a"] <= 3 and r["shard_b"] <= 3 for r in rows)
