from __future__ import annotations

import math

import pytest

from schema_validator_spark.operators.embquality import embedding_quality

ROWS = [
    (1, [3.0, 4.0]),          # valid, norm 5
    (2, [0.0, 0.0]),          # valid but zero vector
    (3, None),                # null vector
    (4, [1.0]),               # wrong dim
    (5, [1.0, None]),         # null element
    (6, [float("nan"), 1.0]),  # NaN element
    (7, [1.0, 0.0]),          # valid, norm 1
]


def test_summary_counts_and_norms(spark):
    df = spark.createDataFrame(ROWS, "id long, v array<float>")
    row = embedding_quality(df, "v", expected_dim=2).collect()[0]
    assert row["n_rows"] == 7
    assert row["n_null_vecs"] == 1
    assert row["n_wrong_dim"] == 1
    assert row["n_with_null_elem"] == 1
    assert row["n_with_nan"] == 1
    assert row["n_valid"] == 3
    assert row["n_zero_vecs"] == 1
    assert row["norm_min"] == 0.0
    assert row["norm_max"] == 5.0
    assert math.isclose(row["norm_mean"], round(6.0 / 3, 6))


def test_all_clean_corpus(spark):
    df = spark.createDataFrame(
        [(i, [float(i), 0.0, 0.0]) for i in range(1, 5)],
        "id long, v array<float>",
    )
    row = embedding_quality(df, "v", expected_dim=3).collect()[0]
    assert row["n_valid"] == 4 and row["n_zero_vecs"] == 0
    assert (row["n_null_vecs"], row["n_wrong_dim"], row["n_with_nan"],
            row["n_with_null_elem"]) == (0, 0, 0, 0)
    assert row["norm_min"] == 1.0 and row["norm_max"] == 4.0


def test_single_agg_pass_plan(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 2.0])], "id long, v array<float>"
    )
    plan = (
        embedding_quality(df, "v", expected_dim=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # one partial + one final agg exchange, nothing else
    assert plan.count("Exchange") <= 1


def test_validation(spark):
    df = spark.createDataFrame([(1, [1.0])], "id long, v array<float>")
    with pytest.raises(ValueError):
        embedding_quality(df, "v", expected_dim=0)
