from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from schema_validator_spark.operators.split import (
    leakage_safe_split,
    split_leakage,
    split_thresholds,
)


def _docs(spark, n):
    return spark.range(n).select(F.col("id").alias("doc_id"))


def _pairs(spark, ps):
    if not ps:
        return spark.createDataFrame([], "id_a long, id_b long")
    return spark.createDataFrame(ps, "id_a long, id_b long")


def test_thresholds_shape_and_order():
    b = split_thresholds({"train": 0.9, "val": 0.05, "test": 0.05})
    assert [n for n, _ in b] == ["train", "val", "test"]
    assert b[0][1] < b[1][1] < b[2][1]
    assert len(b[0][1]) == 15


def test_threshold_validation():
    for bad in (
        {"train": 1.0},
        {"train": 0.5, "": 0.5},
        {"train": 0.7, "val": 0.2},
        {"train": 1.2, "val": -0.2},
    ):
        with pytest.raises(ValueError):
            split_thresholds(bad)


def test_pair_members_share_split(spark):
    docs = _docs(spark, 400)
    # chains of 4: 0-1, 1-2, 2-3 then 8-9, 9-10, 10-11, ...
    ps = [(i + j, i + j + 1) for i in range(0, 392, 8) for j in range(3)]
    pairs = _pairs(spark, ps)
    out = leakage_safe_split(docs, "doc_id", pairs)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert len(rows) == 400
    for i in range(0, 392, 8):
        group = [rows[i + j] for j in range(4)]
        assert len({g["split"] for g in group}) == 1
        assert {g["cluster_id"] for g in group} == {i}
    # audit form agrees: zero leaked pairs by construction
    assert split_leakage(out, pairs).count() == 0


def test_singletons_use_own_id(spark):
    docs = _docs(spark, 20)
    out = leakage_safe_split(docs, "doc_id", _pairs(spark, [(0, 1)]))
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[5]["cluster_id"] == 5
    assert rows[0]["cluster_id"] == 0 and rows[1]["cluster_id"] == 0


def test_ratios_roughly_honored(spark):
    out = leakage_safe_split(
        _docs(spark, 4000), "doc_id", _pairs(spark, []),
        ratios={"train": 0.8, "val": 0.1, "test": 0.1},
    )
    frac = {r["split"]: r["n"] for r in
            out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert abs(frac["train"] / 4000 - 0.8) < 0.03
    assert abs(frac["val"] / 4000 - 0.1) < 0.02
    assert abs(frac["test"] / 4000 - 0.1) < 0.02


def test_deterministic_and_salt_sensitivity(spark):
    docs = _docs(spark, 300)
    pairs = _pairs(spark, [(i, i + 1) for i in range(0, 200, 2)])
    a = {r["doc_id"]: r["split"] for r in
         leakage_safe_split(docs, "doc_id", pairs).collect()}
    b = {r["doc_id"]: r["split"] for r in
         leakage_safe_split(docs, "doc_id", pairs).collect()}
    assert a == b
    c = {r["doc_id"]: r["split"] for r in
         leakage_safe_split(docs, "doc_id", pairs, salt="v2").collect()}
    assert a != c  # re-roll moves at least one document


def test_naive_split_would_leak_here(spark):
    # sanity that the audit can fire: a per-document hash split over
    # the same pairs does leak (otherwise the zero above is vacuous).
    docs = _docs(spark, 400)
    pairs = _pairs(spark, [(i, i + 1) for i in range(0, 400, 2)])
    naive = docs.select(
        "doc_id",
        F.lit(0).alias("cluster_id"),
        F.when(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15)
            < F.lit(format(int(0.5 * 16**15), "015x")),
            F.lit("train"),
        ).otherwise(F.lit("test")).alias("split"),
    )
    assert split_leakage(naive, pairs).count() > 0


def test_reserved_column_guard(spark):
    docs = _docs(spark, 5).withColumn("cluster_id", F.lit(1))
    with pytest.raises(ValueError):
        leakage_safe_split(docs, "doc_id", _pairs(spark, [(0, 1)]))
