from __future__ import annotations

import pytest

from schema_validator_spark.operators.profile import category_coverage


def test_topk_shares_and_ties(spark):
    vals = ["a"] * 5 + ["b"] * 3 + ["c"] * 3 + ["d"] + [None]
    df = spark.createDataFrame([(v,) for v in vals], "v string")
    got = category_coverage(df, "v", k=3).collect()
    assert [(r["rank"], r["value"], r["n"]) for r in got] == [
        (1, "a", 5), (2, "b", 3), (3, "c", 3)  # tie b/c broken by value
    ]
    assert got[0]["share"] == pytest.approx(5 / 13, abs=1e-6)
    assert got[2]["cum_share"] == pytest.approx(11 / 13, abs=1e-6)


def test_null_category_and_small_k(spark):
    df = spark.createDataFrame([(None,), (None,), ("x",)], "v string")
    got = category_coverage(df, "v", k=5).collect()
    assert got[0]["value"] is None and got[0]["n"] == 2
    assert len(got) == 2
    assert got[-1]["cum_share"] == pytest.approx(1.0)
    with pytest.raises(ValueError):
        category_coverage(df, "v", k=0)
