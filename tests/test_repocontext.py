from __future__ import annotations

from schema_validator_spark.operators.repocontext import (
    repo_context_order,
    repo_context_text,
)

# a tiny 2-repo corpus: in r1, util is imported by app and cli (fan_in
# 2), app by cli (fan_in 1), cli by nobody; ext is an external import
# (defined in r2 only) so it must NOT count inside r1.
FILES = [
    ("r1", "src/util.py", "util", "import json\n", "py"),
    ("r1", "src/app.py", "app", "import util\nimport ext\n", "py"),
    ("r1", "src/cli.py", "cli", "import util\nimport app\n", "py"),
    ("r2", "ext.py", "ext", "import os\n", "py"),
    ("r2", "main.py", "main", "import ext\n", "py"),
]
COLS = ["repo", "path", "module", "content", "lang"]


def test_fan_in_order(spark):
    df = spark.createDataFrame(FILES, COLS)
    out = repo_context_order(
        df, "repo", "path", "module", "content", "lang"
    ).collect()
    by_repo = {}
    for r in out:
        by_repo.setdefault(r["repo"], []).append(r)
    r1 = sorted(by_repo["r1"], key=lambda r: r["seq"])
    assert [r["path"] for r in r1] == [
        "src/util.py",  # fan_in 2
        "src/app.py",   # fan_in 1
        "src/cli.py",   # fan_in 0
    ]
    assert [r["fan_in"] for r in r1] == [2, 1, 0]
    r2 = sorted(by_repo["r2"], key=lambda r: r["seq"])
    assert [r["path"] for r in r2] == ["ext.py", "main.py"]
    assert [r["fan_in"] for r in r2] == [1, 0]
    # seq is 1-based and dense per repo
    assert [r["seq"] for r in r1] == [1, 2, 3]


def test_ties_break_on_path(spark):
    rows = [
        ("r", "b.py", "b", "x = 1\n", "py"),
        ("r", "a.py", "a", "y = 2\n", "py"),
    ]
    out = repo_context_order(
        spark.createDataFrame(rows, COLS),
        "repo", "path", "module", "content", "lang",
    ).orderBy("seq").collect()
    assert [r["path"] for r in out] == ["a.py", "b.py"]


def test_context_text_concatenation(spark):
    df = spark.createDataFrame(FILES, COLS)
    out = {
        r["repo"]: r
        for r in repo_context_text(
            df, "repo", "path", "module", "content", "lang"
        ).collect()
    }
    assert out["r1"]["n_files"] == 3
    assert out["r1"]["context"] == (
        "<file_sep>src/util.py\nimport json\n"
        "<file_sep>src/app.py\nimport util\nimport ext\n"
        "<file_sep>src/cli.py\nimport util\nimport app\n"
    )
    assert out["r2"]["context"].startswith("<file_sep>ext.py\n")
