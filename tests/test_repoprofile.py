from __future__ import annotations

from schema_validator_spark.operators.repoprofile import repo_profile

MIT = "Permission is hereby granted, free of charge"
GPL = "GNU General Public License"

ROWS = [
    # rA: 4 source files (2 identical), 1 test, 1 vendored, MIT LICENSE
    ("rA", "src/a.go", "go", "package a"),
    ("rA", "src/b.go", "go", "package b"),
    ("rA", "src/c.go", "go", "package a"),        # intra-repo dup of a
    ("rA", "lib/d.py", "py", "x = 1"),
    ("rA", "tests/t.go", "go", "package t"),
    ("rA", "vendor/v.go", "go", "package v"),
    ("rA", "LICENSE", "", MIT),
    # rB: no license file, single lang, no dups
    ("rB", "src/x.py", "py", "import os"),
    ("rB", "src/y.py", "py", "import sys"),
]


def test_repo_profile(spark):
    df = spark.createDataFrame(
        ROWS, "repo string, path string, lang string, content string"
    )
    got = {r["repo"]: r.asDict()
           for r in repo_profile(df, "repo", "path", "lang", "content")
           .collect()}
    a = got["rA"]
    assert a["n_files"] == 7
    assert a["n_bytes"] == sum(len(c) for r, _, _, c in ROWS if r == "rA")
    assert a["n_langs"] == 3                     # go, py, ""
    assert a["top_lang"] == "go"
    assert a["test_share"] == round(1 / 7, 6)
    assert a["vendored_share"] == round(1 / 7, 6)
    assert a["dup_share"] == round(1 / 7, 6)     # one copy beyond first
    assert a["repo_license"] == "MIT"
    b = got["rB"]
    assert b["n_files"] == 2
    assert b["dup_share"] == 0.0
    assert b["top_lang"] == "py"
    assert b["repo_license"] == "NONE"


def test_bytes_are_octets_and_lang_case_folds(spark):
    rows = [
        ("r", "a.go", "Go", "héllo日本"),   # 5 ascii + é(2) + 2x3 bytes
        ("r", "b.go", "go", "x"),
    ]
    df = spark.createDataFrame(
        rows, "repo string, path string, lang string, content string"
    )
    got = repo_profile(df, "repo", "path", "lang", "content").collect()[0]
    assert got["n_bytes"] == len("héllo日本".encode()) + 1  # octets, not chars
    assert got["n_langs"] == 1                             # Go == go
    assert got["top_lang"] == "go"


def test_reserved_pcls_raises(spark):
    import pytest

    df = spark.createDataFrame(
        [("r", "a.go", "go", "x", "boom")],
        "repo string, path string, lang string, content string,"
        " _pcls string",
    )
    with pytest.raises(ValueError, match="_pcls"):
        repo_profile(df, "repo", "path", "lang", "content")


def test_top_lang_tie_breaks_desc(spark):
    rows = [("r", "a.go", "go", "1"), ("r", "b.py", "py", "2")]
    df = spark.createDataFrame(
        rows, "repo string, path string, lang string, content string"
    )
    got = repo_profile(df, "repo", "path", "lang", "content").collect()[0]
    assert got["top_lang"] == "py"               # tie: lexicographic max
