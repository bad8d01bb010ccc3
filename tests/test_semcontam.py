from __future__ import annotations

import pytest

from schema_validator_spark.operators.semcontam import (
    decontaminate_semantic,
    semantic_contamination,
    semantic_overlap,
)


def _vec(i, dim=8):
    # well-separated deterministic directions
    return [float((i * 7 + j * 3) % 11 + (9 if j == i % dim else 0))
            for j in range(dim)]


def _frames(spark, n=12, planted=(0, 3, 6, 9)):
    train = spark.createDataFrame(
        [(i, _vec(i)) for i in range(n)],
        "vec_id long, embedding array<double>")
    ev = spark.createDataFrame(
        [(100 + i, [x * 2.0 for x in _vec(i)]) for i in planted],
        "vec_id long, embedding array<double>")
    return train, ev


@pytest.mark.parametrize("use_arrow", [False, True])
def test_planted_copies_flagged(spark, use_arrow):
    train, ev = _frames(spark)
    got = {r["vec_id"]: r for r in semantic_contamination(
        train, ev, threshold=0.999, use_arrow=use_arrow).collect()}
    assert set(got) == {0, 3, 6, 9}
    for i, r in got.items():
        assert r["eval_id"] == 100 + i
        assert r["cosine"] == pytest.approx(1.0, abs=1e-6)


def test_overlap_covers_every_row(spark):
    train, ev = _frames(spark)
    rows = semantic_overlap(train, ev).collect()
    assert len(rows) == train.count()
    assert all(-1.0 <= r["cosine"] <= 1.0 for r in rows)


def test_tie_breaks_by_smallest_eval_id(spark):
    train = spark.createDataFrame(
        [(1, _vec(2))], "vec_id long, embedding array<double>")
    ev = spark.createDataFrame(
        [(205, _vec(2)), (201, [x * 3.0 for x in _vec(2)]), (300, _vec(5))],
        "vec_id long, embedding array<double>")
    for use_arrow in (False, True):
        r = semantic_overlap(train, ev, use_arrow=use_arrow).collect()[0]
        assert r["eval_id"] == 201  # both 201 and 205 score 1.0
        assert r["cosine"] == pytest.approx(1.0, abs=1e-6)


def test_null_zero_and_ragged_vectors_score_zero(spark):
    train = spark.createDataFrame(
        [(1, None), (2, [0.0] * 8), (3, [1.0, 2.0]),
         (4, [1.0, None] + [1.0] * 6)],  # NULL element, correct dim
        "vec_id long, embedding array<double>")
    ev = spark.createDataFrame(
        [(100, _vec(1)), (101, _vec(2))],
        "vec_id long, embedding array<double>")
    for use_arrow in (False, True):
        rows = {r["vec_id"]: r for r in semantic_overlap(
            train, ev, use_arrow=use_arrow).collect()}
        assert len(rows) == 4
        for r in rows.values():
            assert r["cosine"] == 0.0
            assert r["eval_id"] == 100  # smallest eval id wins the tie


def test_arrow_matches_hof_tier(spark):
    train, ev = _frames(spark, n=40)
    hof = {(r["vec_id"], r["eval_id"]): r["cosine"]
           for r in semantic_overlap(train, ev).collect()}
    arrow = {(r["vec_id"], r["eval_id"]): r["cosine"]
             for r in semantic_overlap(train, ev, use_arrow=True).collect()}
    assert set(hof) == set(arrow)
    for k in hof:
        assert hof[k] == pytest.approx(arrow[k], abs=1.1e-6)


def test_decontaminate_removes_flagged(spark):
    train, ev = _frames(spark)
    kept = decontaminate_semantic(train, ev, threshold=0.999)
    assert {r["vec_id"] for r in kept.collect()} == \
        set(range(12)) - {0, 3, 6, 9}


def test_zero_only_eval_raises(spark):
    train, _ = _frames(spark)
    ev = spark.createDataFrame(
        [(1, [0.0] * 8)], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="zero vectors"):
        semantic_overlap(train, ev)


def test_mixed_dim_eval_raises(spark):
    train, _ = _frames(spark)
    ev = spark.createDataFrame(
        [(1, [1.0] * 8), (2, [1.0] * 4)],
        "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="mixed dims"):
        semantic_overlap(train, ev)


def test_literal_budget_guard(spark, monkeypatch):
    import schema_validator_spark.operators.semcontam as M

    train, ev = _frames(spark)
    monkeypatch.setattr(M, "_MAX_LITERAL_CELLS", 8)
    with pytest.raises(ValueError, match="use_arrow"):
        M.semantic_overlap(train, ev)
    # arrow tier unaffected by the literal budget
    assert M.semantic_overlap(train, ev, use_arrow=True).count() == 12
