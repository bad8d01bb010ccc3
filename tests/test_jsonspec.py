from __future__ import annotations

import pytest

from schema_validator_spark.operators.jsonspec import infer_json_spec

ROWS = [
    (1, '{"a": 1, "b": "x", "nested": {"c": true}, "arr": [1], "z": null}'),
    (2, '{"a": 2, "b": "y"}'),
    (3, '{"a": 2.5, "b": "1"}'),       # a drifts to float; b string "1"
    (4, '{"a": 3, "flag": false}'),
    (5, "not json"),                   # corrupt
    (6, None),                         # missing (not corrupt)
    (7, "[1, 2]"),                     # valid JSON but not an object
]


def _rows(spark, dominance=0.95):
    df = spark.createDataFrame(ROWS, "id long, js string")
    return {
        (r["key"], r["vtype"]): r
        for r in infer_json_spec(df, "js", dominance=dominance).collect()
    }


def test_types_counts_rates(spark):
    got = _rows(spark)
    # 4 object rows, 1 corrupt, scalar array row not an object
    any_row = next(iter(got.values()))
    assert any_row["n_obj"] == 4 and any_row["n_corrupt"] == 1

    assert got[("a", "int")]["n_type"] == 3
    assert got[("a", "float")]["n_type"] == 1
    assert got[("a", "int")]["n_key"] == 4
    assert got[("a", "int")]["presence_rate"] == 1.0
    assert got[("a", "int")]["type_share"] == 0.75

    # JSON string "1" is a string, not an int
    assert got[("b", "string")]["n_type"] == 3
    assert ("b", "int") not in got

    assert got[("nested", "object")]["n_type"] == 1
    assert got[("arr", "array")]["n_type"] == 1
    assert got[("z", "null")]["n_type"] == 1
    assert got[("flag", "bool")]["presence_rate"] == 0.25


def test_dominance_verdicts(spark):
    got = _rows(spark, dominance=0.7)
    assert got[("a", "int")]["dominant"] is True     # 0.75 >= 0.7
    assert got[("a", "float")]["dominant"] is False
    assert got[("b", "string")]["dominant"] is True  # 3/3
    strict = _rows(spark, dominance=0.95)
    assert strict[("a", "int")]["dominant"] is False  # 0.75 < 0.95


def test_validation(spark):
    df = spark.createDataFrame([(1, "{}")], "id long, js string")
    with pytest.raises(ValueError):
        infer_json_spec(df, "js", dominance=0.4)
