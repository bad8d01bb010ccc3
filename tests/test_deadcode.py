from __future__ import annotations

from schema_validator_spark.operators.deadcode import dead_symbols

SCHEMA = "repo string, path string, lang string, content string"


def _run(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    got = dead_symbols(df, "repo", "path", "content", "lang").collect()
    return {(r["repo"], r["symbol"]): r.asDict() for r in got}


def test_cross_file_use_vs_dead(spark):
    out = _run(spark, [
        # used_fn referenced from b.py -> live; dead_fn nowhere -> dead
        ("r1", "a.py", "py", "def used_fn():\n    pass\n"
                             "def dead_fn():\n    return used_fn()\n"),
        ("r1", "b.py", "py", "import a\na.used_fn()\n"),
        # private _helper never exported: not a symbol at all
        ("r1", "c.py", "py", "def _helper():\n    pass\n"),
    ])
    assert set(out) == {("r1", "dead_fn")}
    d = out[("r1", "dead_fn")]
    assert d["lang"] == "py" and d["n_def_files"] == 1
    # NOTE: dead_fn calls used_fn within a.py — within-file mentions
    # (including the def line itself) never make a symbol live


def test_mention_in_comment_or_string_counts(spark):
    out = _run(spark, [
        ("r1", "a.py", "py", "def maybe():\n    pass\n"),
        # a docstring mention in ANOTHER file shields the symbol
        ("r1", "b.py", "py", '"""see maybe()"""\nx = 1\n'),
        ("r2", "a.py", "py", "def gone():\n    pass\n"),
        ("r2", "b.py", "py", "y = 2\n"),
    ])
    assert set(out) == {("r2", "gone")}


def test_multi_def_files_and_repo_scope(spark):
    out = _run(spark, [
        # defined in TWO files of r1, no third-file mention -> dead
        ("r1", "a.py", "py", "def dup():\n    pass\n"),
        ("r1", "b.py", "py", "def dup():\n    pass\n"),
        # same name LIVE in r2 (repo-scoped identity)
        ("r2", "a.py", "py", "def dup():\n    pass\n"),
        ("r2", "b.py", "py", "dup()\n"),
    ])
    assert set(out) == {("r1", "dup")}
    assert out[("r1", "dup")]["n_def_files"] == 2


def test_go_and_js_conventions(spark):
    out = _run(spark, [
        # Go: Exported dead, unexported lower() is no symbol
        ("g", "m.go", "go", "func Dead() {}\nfunc lower() {}\n"),
        ("g", "u.go", "go", "func Main() {}\n"),
        ("g", "use.go", "go", "// calls Main\nvar x = Main\n"),
        # JS: export picked up, required cross-file
        ("j", "l.js", "js", "export function api() {}\n"
                            "export const unused_c = 1;\n"),
        ("j", "u.js", "js", "import { api } from './l';\napi();\n"),
    ])
    assert set(out) == {("g", "Dead"), ("j", "unused_c")}


def test_unregistered_lang_and_nulls(spark):
    out = _run(spark, [
        ("r", "a.rs", "rust", "pub fn x() {}\n"),
        ("r", "b.py", "py", None),
    ])
    assert out == {}
