from __future__ import annotations

import math

import pytest

from schema_validator_spark.operators.embdrift import embedding_drift


def _df(spark, vecs):
    return spark.createDataFrame([(v,) for v in vecs], "v array<double>")


def test_identical_populations(spark):
    vecs = [[1.0, 2.0, 2.0], [3.0, 0.0, 4.0]]
    r = embedding_drift(_df(spark, vecs), _df(spark, vecs), "v").collect()[0]
    assert r["centroid_cosine"] == pytest.approx(1.0)
    assert r["centroid_shift"] == 0.0
    assert r["norm_base"] == r["norm_cur"] == pytest.approx((3 + 5) / 2)
    assert r["dims"] == 3 and r["n_base"] == r["n_cur"] == 2


def test_orthogonal_centroids(spark):
    r = embedding_drift(
        _df(spark, [[2.0, 0.0]]), _df(spark, [[0.0, 3.0]]), "v"
    ).collect()[0]
    assert r["centroid_cosine"] == 0.0
    assert r["centroid_shift"] == pytest.approx(math.hypot(2, 3), abs=1e-6)


def test_hand_computed_means(spark):
    base = [[1.0, 0.0], [3.0, 2.0]]   # mean (2, 1)
    cur = [[4.0, 2.0]]                # mean (4, 2) -> same direction
    r = embedding_drift(_df(spark, base), _df(spark, cur), "v").collect()[0]
    assert r["centroid_cosine"] == pytest.approx(1.0)
    assert r["centroid_shift"] == pytest.approx(math.hypot(2, 1), abs=1e-6)
    assert r["norm_cur"] == pytest.approx(math.hypot(4, 2), abs=1e-6)


def test_null_and_empty_vectors_excluded(spark):
    base = spark.createDataFrame(
        [([1.0, 1.0],), (None,), ([],)], "v array<double>"
    )
    r = embedding_drift(base, _df(spark, [[1.0, 1.0]]), "v").collect()[0]
    assert r["n_base"] == 1 and r["centroid_cosine"] == pytest.approx(1.0)
