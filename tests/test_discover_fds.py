from __future__ import annotations

import pytest

from schema_validator_spark.operators.uniqueness import discover_fds


@pytest.fixture()
def frame(spark):
    rows = [
        (i, f"L{i % 5}", f"U{i % 5}", f"S{i % 3}")
        for i in range(200)
    ]
    # id -> everything; lang <-> upper (bijection); src independent of lang
    return spark.createDataFrame(rows, "id long, lang string, up string, src string")


def test_discovers_planted_fds(spark, frame):
    got = {
        (r["determinant"], r["dependent"]): r["holds"]
        for r in discover_fds(frame, ["id", "lang", "up", "src"]).collect()
    }
    assert got[("id", "lang")] is True
    assert got[("lang", "up")] is True and got[("up", "lang")] is True
    assert got[("lang", "id")] is False       # 5 langs -> 200 ids
    assert got[("lang", "src")] is False      # 5 x 3 grid: no dependency
    assert got[("src", "lang")] is False
    assert len(got) == 12


def test_null_determinant_breaks_fd(spark):
    rows = [(None, "x"), (None, "y"), ("a", "x")]
    df = spark.createDataFrame(rows, "k string, v string")
    got = {
        (r["determinant"], r["dependent"]): r["holds"]
        for r in discover_fds(df, ["k", "v"]).collect()
    }
    # NULL k maps to both x and y -> k -> v must NOT hold
    assert got[("k", "v")] is False
    assert got[("v", "k")] is False  # x maps to both NULL and 'a'


def test_exact_verify_covers_non_candidates(spark, frame):
    # holds must be an EXACT verdict for every pair, including ones the
    # sketch pass marked non-candidate: a true FD whose two HLL sketches
    # drift apart by >3*relative_sd must never be misreported as False.
    got = discover_fds(frame, ["id", "lang", "up", "src"]).collect()
    assert all(r["holds"] is not None for r in got)
    # non-candidate pairs still carry the (exact) False verdict
    non_cand = [r for r in got if not r["candidate"]]
    assert non_cand and all(r["holds"] is False for r in non_cand)


def test_candidate_only_mode(spark, frame):
    got = discover_fds(frame, ["id", "lang"], exact_verify=False).collect()
    assert all(r["holds"] is None for r in got)
    cand = {(r["determinant"], r["dependent"]): r["candidate"] for r in got}
    assert cand[("id", "lang")] is True
    assert cand[("lang", "id")] is False
    with pytest.raises(ValueError):
        discover_fds(frame, ["id"])
