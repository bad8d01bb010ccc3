from __future__ import annotations

import pytest

from schema_validator_spark.operators.clones import (
    normalize_type2,
    type2_clone_groups,
    type2_clone_members,
)

SCHEMA = "repo string, path string, lang string, content string"


def _norm(spark, rows):
    df = spark.createDataFrame(
        [("r", str(i), lg, c) for i, (lg, c) in enumerate(rows)], SCHEMA
    )
    got = df.select(
        "path", normalize_type2("content", "lang").alias("n")
    ).collect()
    return [r["n"] for r in sorted(got, key=lambda r: int(r["path"]))]


def test_rename_and_literal_blind(spark):
    # identifier renames, literal values, comments, whitespace: all
    # normalize away; structure does not
    a, b, c, c2, d = _norm(spark, [
        ("py", "def add(x, y):\n    return x + y  # sum\n"),
        ("py", "def plus(a, b):\n        return a   +   b\n"),
        ("py", 'def add(x, y):\n    return x + 42  # "lit"\n'),
        ("py", "def inc(q, r):\n    return q + 0xFF\n"),
        ("py", "def add(x, y):\n    return x - y\n"),
    ])
    assert a == b            # type-2 clone pair (rename + whitespace)
    assert c == c2           # literal VALUES blind (42 vs 0xFF)
    assert a != c            # identifier vs literal position: type-3
    assert a != d            # '-' vs '+' is structural


def test_number_literal_shapes(spark):
    # every numeric-literal form is ONE class token, and a hex-letter
    # run after a literal can't swallow a following identifier
    a, b, c, d = _norm(spark, [
        ("py", "x = 1e+3"),
        ("py", "x = 27"),
        ("py", "y = 1.fee"),
        ("py", "y = 1.foo"),
    ])
    assert a == b            # signed exponent is part of the literal
    assert c == d            # '1.' + identifier, hex letters not eaten
    e, f = _norm(spark, [("py", "z = 0x1F_ab"), ("py", "z = 1_000.5")])
    assert e == f


def test_strings_protect_comment_markers(spark):
    # '//' inside a string is NOT a js line comment after step 1
    a, b = _norm(spark, [
        ("js", 'const u = "http://x.io";\n'),
        ("js", 'const url = "https://y.dev/z";\n'),
    ])
    assert a == b and "http" not in a


def test_block_comments_stripped(spark):
    a, b = _norm(spark, [
        ("js", "function f(x) { /* doc\n line */ return x; }"),
        ("js", "function g(y) { return y; }"),
    ])
    assert a == b


def test_unregistered_lang_is_lexical_only(spark):
    # comment syntax unknown -> comments stay, literals still normalize
    a, b = _norm(spark, [
        ("rs", "let x = 10; // ten"),
        ("rs", "let y = 99; // six"),
    ])
    # comments survive (no syntax entry) but their words are
    # identifier-shaped and blind to the lexical steps
    assert a == b == "¶ ¶ = ¤; // ¶"
    c, = _norm(spark, [("rs", "let x = 10; // ten!")])
    assert a != c  # unstripped comment PUNCTUATION differs


def test_members_and_groups(spark):
    rows = [
        ("r1", "a.py", "py", "def f(x):\n    return x + 1\n"),
        ("r2", "b.py", "py", "def g(y):\n    return y + 2\n"),
        ("r1", "c.py", "py", "def h(y):\n    return y * 2\n"),
        ("r1", "d.py", "py", "# only a comment\n"),
        ("r1", "e.py", "py", ""),
        ("r2", "f.py", "py", None),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    mem = type2_clone_members(df, ["repo", "path"], "content", "lang")
    got = sorted((r["repo"], r["path"], r["group_size"])
                 for r in mem.collect())
    assert got == [("r1", "a.py", 2), ("r2", "b.py", 2)]

    grp = type2_clone_groups(
        df, "path", "content", "lang", repo_col="repo"
    ).collect()
    assert len(grp) == 1
    g = grp[0]
    assert (g["n_files"], g["n_repos"], g["representative"]) == (
        2, 2, "a.py"
    )


def test_validation(spark):
    df = spark.createDataFrame([("r", "p", "py", "x = 1")], SCHEMA)
    with pytest.raises(ValueError, match="id columns"):
        type2_clone_members(df, [], "content", "lang")
    with pytest.raises(ValueError, match="min_group"):
        type2_clone_members(df, ["path"], "content", "lang", min_group=1)
    with pytest.raises(ValueError, match="min_group"):
        type2_clone_groups(df, "path", "content", "lang", min_group=0)


def test_plan_shapes(spark):
    from schema_validator_spark.plans.inspect import n_exchanges

    df = spark.createDataFrame(
        [("r", "p", "py", "def f(): pass")], SCHEMA
    )
    # normalization + hashing ride the scan; groups = one clone-key
    # groupBy; members adds the family-dim join-back (its fact-side
    # exchange collapses to a broadcast under AQE at runtime)
    assert n_exchanges(
        type2_clone_groups(df, "path", "content", "lang")
    ) == 1
    assert n_exchanges(
        type2_clone_members(df, ["repo", "path"], "content", "lang")
    ) <= 3
