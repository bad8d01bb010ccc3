from __future__ import annotations

import pytest

from schema_validator_spark.operators.diff import join_profile


def test_overlap_multiplicity_and_output_size(spark):
    left = spark.createDataFrame(
        [(1,), (1,), (2,), (3,), (None,)], "k long"
    )
    right = spark.createDataFrame(
        [(1,), (2,), (2,), (2,), (9,)], "k long"
    )
    r = join_profile(left, right, ["k"]).collect()[0]
    assert (r["n_left"], r["n_right"]) == (4, 5)  # NULL key excluded
    assert (r["n_left_keys"], r["n_right_keys"]) == (3, 3)
    assert r["n_shared_keys"] == 2                 # {1, 2}
    assert r["left_match_rate"] == pytest.approx(3 / 4)   # 1,1,2 match
    assert r["right_match_rate"] == pytest.approx(4 / 5)  # 1,2,2,2 match
    assert (r["max_mult_left"], r["max_mult_right"]) == (2, 3)
    # join output: key 1 -> 2*1, key 2 -> 1*3
    assert r["join_rows"] == 5
    # cross-check against the actual join
    assert left.join(right, on="k").count() == 5


def test_disjoint_and_renamed_keys(spark):
    left = spark.createDataFrame([(1, "a")], "id long, x string")
    right = spark.createDataFrame([(2, "b")], "rid long, y string")
    r = join_profile(left, right, ["id"], ["rid"]).collect()[0]
    assert r["n_shared_keys"] == 0 and r["join_rows"] == 0
    assert r["left_match_rate"] == 0.0


def test_multicol_keys(spark):
    left = spark.createDataFrame([(1, "x"), (1, "y")], "a long, b string")
    right = spark.createDataFrame([(1, "x"), (2, "x")], "a long, b string")
    r = join_profile(left, right, ["a", "b"]).collect()[0]
    assert r["n_shared_keys"] == 1 and r["join_rows"] == 1
