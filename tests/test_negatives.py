from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from schema_validator_spark.operators.negatives import mine_hard_negatives


def _vec(i, dim=8):
    return [float((i * 7 + j * 3) % 11 + (9 if j == i % dim else 0))
            for j in range(dim)]


def _corpus(spark, n=20):
    # label groups of 4: ids 0-3 -> label 0, 4-7 -> label 1, ...
    return spark.createDataFrame(
        [(i, _vec(i), i // 4) for i in range(n)],
        "vec_id long, embedding array<double>, label int")


def test_positives_are_excluded(spark):
    corpus = _corpus(spark)
    queries = corpus.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), "embedding", "label")
    got = mine_hard_negatives(queries, corpus, k=19).collect()
    for r in got:
        assert r["vec_id"] // 4 != r["query_id"] // 4  # never same label
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(r)
    # 20 corpus rows - 4 positives = 16 eligible
    assert all(len(v) == 16 for v in by_q.values())


def test_ranking_matches_serial_window(spark):
    corpus = _corpus(spark, 24)
    queries = corpus.filter(F.col("vec_id") % 7 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding", "label")
    fast = {(r["query_id"], r["rank"]): r["vec_id"]
            for r in mine_hard_negatives(queries, corpus, k=5).collect()}
    # serial replay
    rows = corpus.collect()
    qs = [(r["vec_id"], r["embedding"], r["label"])
          for r in rows if r["vec_id"] % 7 == 0]

    def cos(a, b):
        import math
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return round(d / (na * nb), 6) if na > 0 and nb > 0 else 0.0

    for qid, qv, ql in qs:
        cand = sorted(
            ((-cos(qv, r["embedding"]), r["vec_id"]) for r in rows
             if r["label"] != ql),
        )[:5]
        for rank, (_, vid) in enumerate(cand, 1):
            assert fast[(qid, rank)] == vid


def test_null_labels_never_positive(spark):
    corpus = spark.createDataFrame(
        [(1, _vec(1), None), (2, _vec(2), None), (3, _vec(3), 7)],
        "vec_id long, embedding array<double>, label int")
    queries = spark.createDataFrame(
        [(10, _vec(1), None), (11, _vec(3), 7)],
        "query_id long, embedding array<double>, label int")
    got = {}
    for r in mine_hard_negatives(queries, corpus, k=10).collect():
        got.setdefault(r["query_id"], set()).add(r["vec_id"])
    assert got[10] == {1, 2, 3}      # NULL query label excludes nothing
    assert got[11] == {1, 2}         # label 7 corpus row excluded


def test_k_guard(spark):
    corpus = _corpus(spark, 8)
    with pytest.raises(ValueError, match="k"):
        mine_hard_negatives(corpus.select(
            F.col("vec_id").alias("query_id"), "embedding", "label"),
            corpus, k=0)
