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


def test_edit_pairs_basic(spark):
    from schema_validator_spark.operators.history import edit_pairs

    rows = [
        # f1: 1 -> 2 is a real edit (one line swapped of three),
        # 2 -> 3 is byte-identical (changed=False)
        ("r", "f1", 1, "py", "h\na\nb"),
        ("r", "f1", 2, "py", "h\na\nc"),
        ("r", "f1", 3, "py", "h\na\nc"),
        # f2: single version -> no pair
        ("r", "f2", 5, "py", "solo"),
        # f3: NULL -> text (NULL splits as one empty line)
        ("r", "f3", 1, "py", None),
        ("r", "f3", 2, "py", "x"),
    ]
    df = spark.createDataFrame(
        rows, "repo string, path string, commit long, lang string,"
        " content string"
    )
    got = {
        (r["repo"], r["path"], r["from_version"], r["to_version"]):
            r.asDict()
        for r in edit_pairs(
            df, ["repo", "path"], "commit", "content"
        ).collect()
    }
    assert len(got) == 3
    p12 = got[("r", "f1", 1, 2)]
    assert (p12["n_added"], p12["n_removed"], p12["n_common"]) == (1, 1, 2)
    assert p12["changed"] and abs(p12["line_jaccard"] - 0.5) < 1e-9
    p23 = got[("r", "f1", 2, 3)]
    assert not p23["changed"]
    assert (p23["n_added"], p23["n_removed"], p23["n_common"]) == (0, 0, 3)
    assert p23["line_jaccard"] == 1.0
    pn = got[("r", "f3", 1, 2)]
    # before = [''], after = ['x']: disjoint line sets
    assert (pn["n_added"], pn["n_removed"], pn["n_common"]) == (1, 1, 0)
    assert pn["changed"] and pn["line_jaccard"] == 0.0


def test_edit_pairs_changed_only_and_dup_lines(spark):
    from schema_validator_spark.operators.history import edit_pairs

    rows = [
        # duplicate lines count ONCE (distinct-line sets), but the
        # changed flag sees the raw bytes: v2 only duplicates a line
        ("r", "d", 1, "py", "a\nb"),
        ("r", "d", 2, "py", "a\nb\nb"),
        ("r", "d", 3, "py", "a\nb\nb"),
    ]
    df = spark.createDataFrame(
        rows, "repo string, path string, commit long, lang string,"
        " content string"
    )
    out = edit_pairs(
        df, ["repo", "path"], "commit", "content", changed_only=True
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["from_version"], r["to_version"]) == (1, 2)
    # distinct-line diff is empty, yet the pair IS a byte change
    assert (r["n_added"], r["n_removed"], r["n_common"]) == (0, 0, 2)
    assert r["changed"] and r["line_jaccard"] == 1.0


def test_edit_pairs_reserved_names(spark):
    import pytest

    from schema_validator_spark.operators.history import edit_pairs

    df = spark.createDataFrame(
        [("r", 1, "x", "y")],
        "repo string, commit long, _sha string, content string",
    )
    with pytest.raises(ValueError, match="_sha"):
        edit_pairs(df, ["repo"], "commit", "content")
