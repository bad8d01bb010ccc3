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


def test_repo_similarity_jaccard_and_containment(spark):
    from schema_validator_spark.operators.crossrepo import repo_similarity

    df = spark.createDataFrame(ROWS, "repo string, content string")
    got = {(r["repo_a"], r["repo_b"]): r.asDict()
           for r in repo_similarity(df, "repo", "content").collect()}
    # r1 = {alpha, beta, gamma}, r2 = {alpha, beta}: shared 2
    p = got[("r1", "r2")]
    assert (p["shared_files"], p["n_a"], p["n_b"]) == (2, 3, 2)
    assert p["jaccard"] == round(2 / 3, 6)
    assert p["containment"] == 1.0            # r2 fully contained: fork
    q = got[("r1", "r3")]
    assert q["jaccard"] == round(1 / 4, 6)
    assert q["containment"] == 0.5
    assert ("r1", "r4") not in got            # nothing shared


def test_repo_similarity_min_jaccard_and_cap_consistency(spark):
    from schema_validator_spark.operators.crossrepo import repo_similarity

    df = spark.createDataFrame(ROWS, "repo string, content string")
    got = repo_similarity(df, "repo", "content", min_jaccard=0.5).collect()
    assert [(r["repo_a"], r["repo_b"]) for r in got] == [("r1", "r2")]
    # sizes computed on the CAPPED frame: dropping the hot content must
    # keep shared <= min(n_a, n_b) (ratios never exceed 1)
    rows = [(f"r{i}", "license") for i in range(10)]
    rows += [("r0", "real"), ("r1", "real")]
    df2 = spark.createDataFrame(rows, "repo string, content string")
    got2 = repo_similarity(
        df2, "repo", "content", max_repos_per_content=5,
        log_dropped=False,
    ).collect()
    assert len(got2) == 1
    r = got2[0]
    assert (r["n_a"], r["n_b"], r["jaccard"]) == (1, 1, 1.0)

    with pytest.raises(ValueError):
        repo_similarity(df, "repo", "content", min_jaccard=1.5)


def test_fork_dedup_transitive_and_canonical(spark):
    from schema_validator_spark.operators.crossrepo import fork_dedup

    rows = (
        # base: 4 files; fork: 2 of them (j=0.5 vs base);
        # fork2: 1 of fork's files (j=0.5 vs fork, 0.25 vs base) —
        # joins the family only transitively through fork
        [("base", f"c{i}") for i in range(4)]
        + [("fork", "c0"), ("fork", "c1")]
        + [("fork2", "c0")]
        + [("solo", "x")]
    )
    df = spark.createDataFrame(rows, "repo string, content string")
    got = {r["repo"]: r.asDict()
           for r in fork_dedup(df, "repo", "content",
                               min_jaccard=0.4).collect()}
    assert got["base"]["is_canonical"] == 1
    assert got["fork"]["canonical_repo"] == "base"
    assert got["fork2"]["canonical_repo"] == "base"   # transitive
    assert got["fork2"]["is_canonical"] == 0
    assert got["solo"]["canonical_repo"] == "solo"    # singleton
    assert got["solo"]["is_canonical"] == 1
    assert got["base"]["n_files"] == 4


def test_fork_dedup_tie_breaks_by_repo_name(spark):
    from schema_validator_spark.operators.crossrepo import fork_dedup

    rows = [("a", "c0"), ("a", "c1"), ("b", "c0"), ("b", "c1")]
    df = spark.createDataFrame(rows, "repo string, content string")
    got = {r["repo"]: r["canonical_repo"]
           for r in fork_dedup(df, "repo", "content",
                               min_jaccard=0.9).collect()}
    assert got == {"a": "b", "b": "b"}    # equal sizes: greatest name
