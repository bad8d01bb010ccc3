from __future__ import annotations

from schema_validator_spark.operators.callgraph import (
    call_edges,
    function_fanin,
)

SCHEMA = "repo string, path string, lang string, content string"

PY_A = "def helper(x):\n    return x\n\ndef main():\n    return helper(1)\n"
PY_B = "import a\n\ndef run():\n    return helper(2) + helper(3)\n"


def _edges(spark, rows, **kw):
    df = spark.createDataFrame(rows, SCHEMA)
    got = call_edges(df, "repo", "path", "content", "lang", **kw)
    return {
        (r["repo"], r["caller_path"], r["symbol"]): r["n_calls"]
        for r in got.collect()
    }


def test_same_file_and_cross_file_edges(spark):
    got = _edges(
        spark,
        [("r1", "a.py", "py", PY_A), ("r1", "b.py", "py", PY_B)],
    )
    assert got[("r1", "a.py", "helper")] == 1  # def line subtracted
    assert got[("r1", "b.py", "helper")] == 2
    # main is defined and never called -> no edge anywhere
    assert not any(k[2] == "main" for k in got)


def test_undefined_callees_excluded(spark):
    got = _edges(spark, [("r1", "b.py", "py", PY_B)])
    # helper is not defined in this repo -> no edge; 'a' not callable
    assert got == {}


def test_repos_isolated(spark):
    got = _edges(
        spark,
        [("r1", "a.py", "py", PY_A), ("r2", "b.py", "py", PY_B)],
    )
    # r2 never defines helper: only r1's recursive-ish self edge stays
    assert set(got) == {("r1", "a.py", "helper")}


def test_keyword_call_shapes_die_without_defs(spark):
    body = "def f():\n    if (x):\n        while (y):\n            f()\n"
    got = _edges(spark, [("r1", "a.py", "py", body)])
    assert set(got) == {("r1", "a.py", "f")}
    assert got[("r1", "a.py", "f")] == 1


def test_go_method_receiver_and_js_function(spark):
    go = "func (s *T) Work(x int) int {\n\treturn Work(x)\n}\n"
    js = "function fooBar(x) { return fooBar(x - 1) }\n"
    got = _edges(
        spark,
        [("r1", "m.go", "go", go), ("r1", "f.js", "js", js)],
    )
    assert got[("r1", "m.go", "Work")] == 1
    assert got[("r1", "f.js", "fooBar")] == 1


def test_unregistered_lang_defines_nothing(spark):
    got = _edges(spark, [("r1", "x.rs", "rust", "fn f() { f() }")])
    assert got == {}


def test_fanin_summary(spark):
    df_rows = [("r1", "a.py", "py", PY_A), ("r1", "b.py", "py", PY_B)]
    df = spark.createDataFrame(df_rows, SCHEMA)
    got = {
        r["symbol"]: r
        for r in function_fanin(
            df, "repo", "path", "content", "lang"
        ).collect()
    }
    assert got["helper"]["fan_in_files"] == 2
    assert got["helper"]["n_calls"] == 3
    assert got["helper"]["n_def_files"] == 1
    assert got["main"]["fan_in_files"] == 0 and got["main"]["n_calls"] == 0
    assert got["run"]["fan_in_files"] == 0


def test_null_content_and_lang(spark):
    got = _edges(spark, [("r1", "a.py", None, None), ("r1", "b.py", "py", None)])
    assert got == {}
