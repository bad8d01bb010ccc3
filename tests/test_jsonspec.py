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


class TestJsonSpecDrift:
    def _drift(self, spark, base_rows, curr_rows):
        from schema_validator_spark.operators.jsonspec import (
            json_spec_drift,
        )

        b = spark.createDataFrame([(r,) for r in base_rows], "js string")
        c = spark.createDataFrame([(r,) for r in curr_rows], "js string")
        return {r["key"]: r for r in json_spec_drift(b, c, "js").collect()}

    def test_added_removed_common_and_type_change(self, spark):
        base = ['{"k": 1, "legacy": true}'] * 4
        curr = ['{"k": "1", "fresh": 1.5}'] * 4
        got = self._drift(spark, base, curr)
        assert got["legacy"]["status"] == "removed"
        assert got["legacy"]["curr_type"] is None
        assert got["fresh"]["status"] == "added"
        assert got["fresh"]["curr_type"] == "float"
        assert got["k"]["status"] == "common"
        assert got["k"]["base_type"] == "int"
        assert got["k"]["curr_type"] == "string"
        assert got["k"]["type_changed"] == 1

    def test_presence_delta(self, spark):
        base = ['{"a": 1}', '{"a": 2}', '{"b": 1}', '{"b": 2}']
        curr = ['{"a": 1}', '{"b": 1}', '{"b": 2}', '{"b": 3}']
        got = self._drift(spark, base, curr)
        assert got["a"]["base_presence"] == 0.5
        assert got["a"]["curr_presence"] == 0.25
        assert got["a"]["presence_delta"] == -0.25
        assert got["a"]["type_changed"] == 0

    def test_majority_tie_breaks_by_type_name(self, spark):
        # k is int in 2 rows, string in 2 rows on the same side:
        # tie -> 'int' < 'string'
        base = ['{"k": 1}', '{"k": 2}', '{"k": "x"}', '{"k": "y"}']
        curr = ['{"k": true}']
        got = self._drift(spark, base, curr)
        assert got["k"]["base_type"] == "int"
        assert got["k"]["curr_type"] == "bool"
        assert got["k"]["type_changed"] == 1

    def test_corrupt_rows_do_not_create_keys(self, spark):
        base = ['{"k": 1}', "not json", None]
        curr = ['{"k": 1}']
        got = self._drift(spark, base, curr)
        assert set(got) == {"k"}
        assert got["k"]["base_presence"] == 1.0  # of the 1 object row
