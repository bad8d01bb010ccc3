from __future__ import annotations

import pytest

from schema_validator_spark.operators.crossrepo import shared_content_pairs

ROWS = [
    ("r1", "alpha"), ("r1", "beta"), ("r1", "gamma"), ("r1", "alpha"),
    ("r2", "alpha"), ("r2", "beta"),          # vendors 2 files of r1
    ("r3", "gamma"), ("r3", "delta"),         # shares 1 with r1
    ("r4", "epsilon"),                        # shares nothing
    ("r4", ""), ("r1", ""),                   # empty excluded
    ("r5", None),                             # null excluded
]


def _got(df, **kw):
    return {
        (r["repo_a"], r["repo_b"]): r["shared_files"]
        for r in shared_content_pairs(df, "repo", "content", **kw).collect()
    }


def test_pair_counts(spark):
    df = spark.createDataFrame(ROWS, "repo string, content string")
    assert _got(df) == {("r1", "r2"): 2, ("r1", "r3"): 1}
    # within-repo duplicate ('r1','alpha') twice counts once
    assert _got(df, min_shared=2) == {("r1", "r2"): 2}


def test_boilerplate_cap_drops_and_logs(spark, caplog):
    rows = [(f"r{i}", "license") for i in range(10)]  # 1 content, 10 repos
    rows += [("r0", "real"), ("r1", "real")]
    df = spark.createDataFrame(rows, "repo string, content string")
    with caplog.at_level("WARNING"):
        got = _got(df, max_repos_per_content=5)
    assert got == {("r0", "r1"): 1}  # boilerplate bucket dropped, logged
    assert any("shared_content_pairs" in r.message for r in caplog.records)


def test_validation(spark):
    df = spark.createDataFrame([("r", "x")], "repo string, content string")
    with pytest.raises(ValueError):
        shared_content_pairs(df, "repo", "content", min_shared=0)
