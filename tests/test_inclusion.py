from __future__ import annotations

import pytest

from schema_validator_spark.operators.inclusion import discover_inclusions


@pytest.fixture()
def tabs(spark):
    fact = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 20), (4, None), (5, 99)],
        "id long, fk long",
    )
    dim = spark.createDataFrame(
        [(10, "a"), (20, "b"), (30, "c")], "pk long, name string"
    )
    return {"fact": fact, "dim": dim}


def _got(tabs, **kw):
    rep = discover_inclusions(
        tabs, {"fact": ["fk"], "dim": ["pk", "name"]}, **kw
    )
    return {(r["from_id"], r["to_id"]): r for r in rep.collect()}


def test_coverage_and_holds(tabs):
    got = _got(tabs)
    assert len(got) == 6  # all ordered pairs of 3 columns, incl. 0-cov
    r = got[("fact.fk", "dim.pk")]
    # fk distinct non-null = {10, 20, 99}; 2 of 3 inside pk
    assert (r["n_from"], r["n_common"]) == (3, 2)
    assert r["coverage"] == round(2 / 3, 6) and r["holds"] is False
    # pk ⊄ fk (30 missing), and pk vs name share nothing
    assert got[("dim.pk", "fact.fk")]["coverage"] == round(2 / 3, 6)
    assert got[("dim.pk", "dim.name")]["n_common"] == 0
    assert got[("dim.name", "dim.pk")]["coverage"] == 0.0


def test_exact_inclusion_detected(spark):
    fact = spark.createDataFrame([(i, i % 3) for i in range(30)],
                                 "id long, fk long")
    dim = spark.createDataFrame([(0,), (1,), (2,), (3,)], "pk long")
    got = {
        (r["from_id"], r["to_id"]): r
        for r in discover_inclusions(
            {"fact": fact, "dim": dim}, {"fact": ["fk"], "dim": ["pk"]}
        ).collect()
    }
    assert got[("fact.fk", "dim.pk")]["holds"] is True
    assert got[("fact.fk", "dim.pk")]["coverage"] == 1.0
    assert got[("dim.pk", "fact.fk")]["holds"] is False  # 3 not in fk


def test_type_mismatch_still_matches_as_string(spark):
    a = spark.createDataFrame([(1,), (2,)], "x int")
    b = spark.createDataFrame([(1,), (2,), (3,)], "y bigint")
    got = {
        (r["from_id"], r["to_id"]): r
        for r in discover_inclusions(
            {"a": a, "b": b}, {"a": ["x"], "b": ["y"]}
        ).collect()
    }
    r = got[("a.x", "b.y")]
    assert r["coverage"] == 1.0 and r["holds"] is True


def test_all_null_column_materialized(spark):
    a = spark.createDataFrame([(None,), (None,)], "x int")
    b = spark.createDataFrame([(1,), (2,)], "y bigint")
    got = {
        (r["from_id"], r["to_id"]): r
        for r in discover_inclusions(
            {"a": a, "b": b}, {"a": ["x"], "b": ["y"]}
        ).collect()
    }
    # the all-NULL column still appears on both sides, marked vacuous
    r = got[("a.x", "b.y")]
    assert r["n_from"] == 0 and r["coverage"] is None and r["holds"] is None
    assert got[("b.y", "a.x")]["coverage"] == 0.0
    assert got[("b.y", "a.x")]["holds"] is False


def test_partial_threshold(tabs):
    got = _got(tabs, min_coverage=0.6)
    assert got[("fact.fk", "dim.pk")]["holds"] is True


def test_validation(tabs):
    with pytest.raises(ValueError):
        discover_inclusions(tabs, {"fact": ["fk"]})  # one column only
    with pytest.raises(ValueError):
        discover_inclusions(tabs, {"nope": ["x"], "dim": ["pk"]})
    with pytest.raises(ValueError):
        discover_inclusions(
            tabs, {"fact": ["fk"], "dim": ["pk"]}, min_coverage=0.0
        )
