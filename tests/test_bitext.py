from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from schema_validator_spark.operators.bitext import mine_parallel_pairs


def _vec(i, dim=8, bump=0):
    # deterministic, well-separated directions
    return [float((i * 7 + j * 3 + bump) % 11 + (1 if j == i % dim else 0) * 9)
            for j in range(dim)]


def _frames(spark, n=8, with_copies=True, extra_b=()):
    a = spark.createDataFrame(
        [(i, _vec(i)) for i in range(n)],
        "vec_id long, embedding array<double>")
    brows = []
    if with_copies:
        brows += [(1000 + i, [x * 1.2 for x in _vec(i)]) for i in range(n)]
    brows += list(extra_b)
    b = spark.createDataFrame(
        brows, "vec_id long, embedding array<double>")
    return a, b


def test_planted_copies_are_mutual_best(spark):
    a, b = _frames(spark)
    got = {(r["id_a"], r["id_b"]): r for r in
           mine_parallel_pairs(a, b, k=3).collect()}
    assert set(got) == {(i, 1000 + i) for i in range(8)}
    for r in got.values():
        assert r["cosine"] == pytest.approx(1.0, abs=1e-6)
        assert r["margin_e6"] > 1_000_000  # scaled copy clears margin 1


def test_mutuality_excludes_asymmetric_best(spark):
    # a=9 has NO copy in B; its best b is some other a's copy, but
    # that copy's backward best is its own a -> 9 emits nothing.
    a = spark.createDataFrame(
        [(i, _vec(i)) for i in range(10)],
        "vec_id long, embedding array<double>")
    b = spark.createDataFrame(
        [(1000 + i, [x * 1.2 for x in _vec(i)]) for i in range(9)],
        "vec_id long, embedding array<double>")
    got = {r["id_a"] for r in mine_parallel_pairs(a, b, k=3).collect()}
    assert 9 not in got
    assert got == set(range(9))


def test_threshold_prunes(spark):
    a, b = _frames(spark)
    loose = mine_parallel_pairs(a, b, k=3, margin_threshold=1.0).count()
    tight = mine_parallel_pairs(a, b, k=3,
                                margin_threshold=50.0).count()
    assert loose == 8 and tight == 0


def test_margin_matches_python_replay(spark):
    import math

    a, b = _frames(spark)
    arows = {r["vec_id"]: r["embedding"] for r in a.collect()}
    brows = {r["vec_id"]: r["embedding"] for r in b.collect()}

    def cos6(x, y):
        d = sum(p * q for p, q in zip(x, y))
        nx = math.sqrt(sum(p * p for p in x))
        ny = math.sqrt(sum(q * q for q in y))
        return round(d / (nx * ny), 6)

    k = 3
    fwd = {ia: sorted(((cos6(va, vb), ib) for ib, vb in brows.items()),
                      key=lambda t: (-t[0], t[1]))[:k]
           for ia, va in arows.items()}
    bwd = {ib: sorted(((cos6(vb, va), ia) for ia, va in arows.items()),
                      key=lambda t: (-t[0], t[1]))[:k]
           for ib, vb in brows.items()}
    SA = {ia: sum(int(round(c * 1e6)) for c, _ in tk)
          for ia, tk in fwd.items()}
    SB = {ib: sum(int(round(c * 1e6)) for c, _ in tk)
          for ib, tk in bwd.items()}

    got = {(r["id_a"], r["id_b"]): r["margin_e6"] for r in
           mine_parallel_pairs(a, b, k=k).collect()}
    for (ia, ib), m in got.items():
        cos_e6 = int(round(cos6(arows[ia], brows[ib]) * 1e6))
        kk = len(fwd[ia]) + len(bwd[ib])
        want = int(round(cos_e6 * kk * 1e6 / (SA[ia] + SB[ib])))
        assert m == want, ((ia, ib), m, want)


def test_k_guard(spark):
    a, b = _frames(spark)
    with pytest.raises(ValueError):
        mine_parallel_pairs(a, b, k=0)


def test_arrow_tier_recovers_same_planted_pairs(spark):
    a, b = _frames(spark)
    exact = {(r["id_a"], r["id_b"]) for r in
             mine_parallel_pairs(a, b, k=3).collect()}
    arrow = {(r["id_a"], r["id_b"]) for r in
             mine_parallel_pairs(a, b, k=3, use_arrow=True).collect()}
    assert exact == arrow == {(i, 1000 + i) for i in range(8)}


def test_arrow_empty_a_returns_empty(spark):
    a = spark.createDataFrame([], "vec_id long, embedding array<double>")
    _, b = _frames(spark)
    assert mine_parallel_pairs(a, b, k=3, use_arrow=True).count() == 0
    assert mine_parallel_pairs(a, b, k=3).count() == 0


def test_arrow_duplicate_b_ids_match_hof_tier(spark):
    a, b = _frames(spark)
    b_dup = b.unionByName(b.filter(F.col("vec_id") == 1000))
    exact = {(r["id_a"], r["id_b"]): r["margin_e6"] for r in
             mine_parallel_pairs(a, b_dup, k=3).collect()}
    arrow = {(r["id_a"], r["id_b"]): r["margin_e6"] for r in
             mine_parallel_pairs(a, b_dup, k=3,
                                 use_arrow=True).collect()}
    assert set(exact) == set(arrow)
