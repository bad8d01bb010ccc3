from __future__ import annotations

import pytest

from schema_validator_spark.operators.patterns import value_patterns

ROWS = [
    (1, "Customer#000000001", "AB-12"),
    (2, "Customer#000000042", "CD-34"),
    (3, "Customer#000000777", "EF-5"),
    (4, "weird", None),
    (5, None, "GH-67"),
]


def _got(spark, **kw):
    df = spark.createDataFrame(ROWS, "id long, name string, code string")
    return {
        (r["column"], r["mask"]): (r["n"], r["share"], r["rank"])
        for r in value_patterns(df, ["name", "code"], **kw).collect()
    }


def test_compressed_masks(spark):
    got = _got(spark)
    assert got[("name", "Aa#9")] == (3, 0.75, 1)
    assert got[("name", "a")] == (1, 0.25, 2)
    assert got[("code", "A-9")] == (4, 1.0, 1)
    assert len(got) == 3  # NULLs excluded entirely


def test_raw_masks_and_topk(spark):
    got = _got(spark, compress=False)
    assert got[("name", "Aaaaaaaa#999999999")][0] == 3
    assert got[("code", "AA-99")][0] == 3
    assert got[("code", "AA-9")][0] == 1
    only1 = _got(spark, compress=False, top_k=1)
    assert all(r == 1 for (_, _, r) in only1.values())
    assert len([k for k in only1 if k[0] == "code"]) == 1


def test_numeric_column_castable(spark):
    df = spark.createDataFrame([(1, 123), (2, 4567)], "id long, v int")
    got = {r["mask"]: r["n"] for r in
           value_patterns(df, ["v"], compress=True).collect()}
    assert got == {"9": 2}


def test_deterministic_tiebreak(spark):
    df = spark.createDataFrame(
        [(1, "ab"), (2, "12")], "id long, s string"
    )
    rows = value_patterns(df, ["s"], compress=True).collect()
    ranked = {r["rank"]: r["mask"] for r in rows}
    assert ranked == {1: "9", 2: "a"}  # count tie -> mask asc


def test_validation(spark):
    df = spark.createDataFrame([(1, "x")], "id long, s string")
    with pytest.raises(ValueError):
        value_patterns(df, [])
    with pytest.raises(ValueError):
        value_patterns(df, ["s"], top_k=0)
