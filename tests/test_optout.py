from __future__ import annotations

from schema_validator_spark.operators.optout import filter_optout, optout_audit

SCHEMA = "repo string, path string"

ROWS = [
    ("alice/web", "a.py"),
    ("alice/web", "b.py"),
    ("alice/cli", "c.py"),
    ("bob/tool", "d.py"),
    ("bob/tool", "e.py"),
    ("carol/app", "f.py"),
    ("standalone", "g.py"),
    (None, "h.py"),
]


def test_owner_optout_removes_all_owner_repos(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    kept = filter_optout(df, "repo", owners=["alice"])
    assert sorted(r["repo"] for r in kept.collect() if r["repo"]) == [
        "bob/tool", "bob/tool", "carol/app", "standalone",
    ]


def test_repo_optout_is_exact(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    kept = filter_optout(df, "repo", repos=["bob/tool"])
    repos = [r["repo"] for r in kept.collect()]
    assert "bob/tool" not in repos and "alice/web" in repos


def test_null_repo_kept(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    kept = filter_optout(df, "repo", owners=["alice"], repos=["bob/tool"])
    assert any(r["repo"] is None for r in kept.collect())


def test_empty_lists_noop(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    assert filter_optout(df, "repo") is df


def test_repo_without_separator_is_own_owner(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    kept = filter_optout(df, "repo", owners=["standalone"])
    assert "standalone" not in [r["repo"] for r in kept.collect()]


def test_audit_reason_priority_and_counts(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    # bob/tool matches BOTH an owner and an exact-repo request:
    # the exact repo wins attribution.
    audit = {
        r["repo"]: r
        for r in optout_audit(
            df, "repo", owners=["alice", "bob"], repos=["bob/tool"]
        ).collect()
    }
    assert set(audit) == {"alice/web", "alice/cli", "bob/tool"}
    assert audit["bob/tool"]["reason"] == "repo"
    assert audit["bob/tool"]["n_files"] == 2
    assert audit["alice/web"]["reason"] == "owner"
    assert audit["alice/web"]["n_files"] == 2
    assert audit["alice/web"]["owner"] == "alice"


def test_filter_and_audit_partition_the_corpus(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    kw = dict(owners=["alice"], repos=["carol/app"])
    kept = filter_optout(df, "repo", **kw).count()
    removed = (
        optout_audit(df, "repo", **kw)
        .agg({"n_files": "sum"})
        .collect()[0][0]
    )
    assert kept + removed == len(ROWS)
