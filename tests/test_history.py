from __future__ import annotations

import hashlib

from schema_validator_spark.operators.history import (
    churn_stats,
    latest_files,
)

SCHEMA = "repo string, path string, commit long, lang string, content string"

ROWS = [
    # f1: three commits, last two identical content
    ("r", "f1", 1, "py", "v1"),
    ("r", "f1", 2, "py", "v2"),
    ("r", "f1", 3, "py", "v2"),
    # f2: single version
    ("r", "f2", 7, "go", "only"),
    # f3: NULL content in head version
    ("r", "f3", 1, "py", "x"),
    ("r", "f3", 9, "py", None),
]


def _sha(s: str) -> str:
    return hashlib.sha256(s.encode()).hexdigest()


def test_latest_files_head_selection(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    got = {(r["repo"], r["path"]): r.asDict()
           for r in latest_files(df, ["repo", "path"], "commit").collect()}
    assert len(got) == 3
    f1 = got[("r", "f1")]
    assert f1["commit"] == 3 and f1["content"] == "v2"
    assert got[("r", "f2")]["commit"] == 7
    f3 = got[("r", "f3")]
    assert f3["commit"] == 9 and f3["content"] is None
    # schema: key, version, payload — original column set preserved
    assert sorted(f1) == sorted(["repo", "path", "commit", "lang",
                                 "content"])


def test_latest_files_tie_breaks_on_payload(spark):
    df = spark.createDataFrame(
        [("r", "f", 1, "py", "a"), ("r", "f", 1, "py", "b")], SCHEMA
    )
    got = latest_files(df, ["repo", "path"], "commit").collect()
    assert len(got) == 1
    assert got[0]["content"] == "b"      # greatest payload tuple wins


def test_latest_files_explicit_payload_cols(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    got = latest_files(
        df, ["repo", "path"], "commit", payload_cols=["content"]
    )
    assert got.columns == ["repo", "path", "commit", "content"]


def test_churn_stats(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    got = {r["path"]: r.asDict()
           for r in churn_stats(df, ["repo", "path"], "commit",
                                "content").collect()}
    f1 = got["f1"]
    assert f1["n_versions"] == 3
    assert f1["n_distinct_versions"] == 2        # v1, v2 (v2 repeated)
    assert (f1["first_version"], f1["last_version"]) == (1, 3)
    assert f1["head_sha"] == _sha("v2")
    assert f1["churn_ratio"] == round(1 - 2 / 3, 6)
    f2 = got["f2"]
    assert f2["n_versions"] == 1 and f2["churn_ratio"] == 0.0
    # NULL content hashes as '' and still counts as a distinct state
    f3 = got["f3"]
    assert f3["n_distinct_versions"] == 2
    assert f3["head_sha"] == _sha("")


def test_reserved_names_raise(spark):
    import pytest

    df = spark.createDataFrame(
        [("r", "f", 1, "x")],
        "repo string, path string, commit long, _v string",
    )
    with pytest.raises(ValueError, match="_v"):
        latest_files(df, ["repo", "path"], "commit")
    with pytest.raises(ValueError, match="_head"):
        churn_stats(
            df.withColumnRenamed("_v", "_head"),
            ["repo", "path"], "commit", "_head",
        )


def test_one_exchange_plans(spark):
    from schema_validator_spark.plans.inspect import n_exchanges

    df = spark.createDataFrame(ROWS, SCHEMA)
    assert n_exchanges(latest_files(df, ["repo", "path"], "commit")) <= 1
    # churn adds the count(distinct) second phase
    assert n_exchanges(
        churn_stats(df, ["repo", "path"], "commit", "content")
    ) <= 2
