from __future__ import annotations

import pytest

from schema_validator_spark.operators.codechunk import (
    chunk_functions,
    function_dedup_stats,
)
from schema_validator_spark.plans.inspect import n_exchanges, uses_python

PY = (
    "import os\n"
    "\n"
    "def f(x):\n"
    "    return x\n"
    "\n"
    "class C:\n"
    "    def m(self):\n"
    "        return 1\n"
    "\n"
    "async def g():\n"
    "    pass\n"
)
GO = (
    "package m\n"
    "\n"
    "type T struct{}\n"
    "\n"
    "func A() int {\n"
    "\treturn 1\n"
    "}\n"
    "\n"
    "func B() int {\n"
    "\treturn 2\n"
    "}\n"
)

ROWS = [
    (1, PY, "py"),
    (2, GO, "go"),
    (3, "function a() {}\nclass B {}\n", "js"),
    (4, "no boundaries here\njust text\n", "py"),
    (5, "def first_line():\n    pass\n", "py"),
    (6, "anything", "rust"),  # unregistered lang -> whole file
    (7, None, "py"),
    (8, "", "go"),
    (9, "import x\n\n@a\n@b(1)\ndef f():\n    pass\ndef g():\n    pass\n",
     "py"),
    (10, "@first_line\ndef f():\n    pass\n", "py"),
    (11, "export default function App() {}\n"
         "export default class C {}\n"
         "export async function go() {}\n", "js"),
]


def _chunks(spark):
    df = spark.createDataFrame(ROWS, "id long, content string, lang string")
    return chunk_functions(df, ["id"], "content", "lang")


def test_boundaries_and_preamble(spark):
    by_id = {}
    for r in _chunks(spark).collect():
        by_id.setdefault(r["id"], []).append((r["chunk_idx"], r["chunk_text"]))
    for v in by_id.values():
        v.sort()
    py = [t for _, t in by_id[1]]
    assert py[0] == "import os\n"              # preamble
    assert py[1].startswith("def f(x):")
    assert py[2].startswith("class C:")        # indented def m stays inside
    assert "def m(self):" in py[2]
    assert py[3].startswith("async def g():")
    assert len(py) == 4
    go = [t for _, t in by_id[2]]
    assert [c.split("\n")[0] for c in go] == [
        "package m", "type T struct{}", "func A() int {", "func B() int {"
    ]
    assert len(by_id[3]) == 2                  # function a / class B
    assert len(by_id[4]) == 1                  # no boundary -> one chunk
    assert by_id[5][0][1].startswith("def first_line")
    assert len(by_id[5]) == 1                  # boundary on line 1: no preamble
    assert by_id[6] == [(0, "anything")]       # unregistered lang
    assert by_id[7] == [(0, "")]               # NULL content
    assert by_id[8] == [(0, "")]               # empty content
    # decorator stack travels with its function: the unit starts at
    # the FIRST decorator, and def g (no decorators) starts its own
    dec = [t for _, t in by_id[9]]
    assert dec[0] == "import x\n"
    assert dec[1] == "@a\n@b(1)\ndef f():\n    pass"
    assert dec[2] == "def g():\n    pass\n"
    # decorator on line 1: boundary at index 0, no preamble
    assert len(by_id[10]) == 1
    assert by_id[10][0][1].startswith("@first_line")
    # export default function/class start units
    js_units = [t for _, t in by_id[11]]
    assert [u.split("\n")[0] for u in js_units] == [
        "export default function App() {}",
        "export default class C {}",
        "export async function go() {}",
    ]


def test_reconstruction_byte_exact(spark):
    # joining a file's chunks with \n reproduces the file exactly
    by_id = {}
    for r in _chunks(spark).collect():
        by_id.setdefault(r["id"], []).append((r["chunk_idx"], r["chunk_text"]))
    for i, content, _ in ROWS:
        want = content if content is not None else ""
        got = "\n".join(t for _, t in sorted(by_id[i]))
        assert got == want, i


def test_zero_shuffle_and_sha(spark):
    df = spark.createDataFrame(ROWS, "id long, content string, lang string")
    out = chunk_functions(df, ["id"], "content", "lang")
    assert n_exchanges(out) == 0
    assert not uses_python(out)
    r = out.filter("id = 5").collect()[0]
    import hashlib
    assert r["chunk_sha"] == hashlib.sha256(
        r["chunk_text"].encode()).hexdigest()


def test_function_dedup_stats(spark):
    rows = [
        (1, "def a():\n    return 1\ndef b():\n    return 2\n", "py"),
        (2, "def a():\n    return 1\ndef c():\n    return 3\n", "py"),
    ]
    df = spark.createDataFrame(rows, "id long, content string, lang string")
    got = function_dedup_stats(df, ["id"], "content", "lang").collect()[0]
    # chunks: def a (x2, identical), def b+trailer, def c+trailer
    assert got["n_chunks"] == 4
    assert got["n_distinct_chunks"] == 3
    assert got["n_dup_chunks"] == 1
    assert got["dup_frac"] == 0.25


def test_empty_map_raises(spark):
    df = spark.createDataFrame([(1, "x", "py")],
                               "id long, content string, lang string")
    with pytest.raises(ValueError):
        chunk_functions(df, ["id"], "content", "lang", boundary_res={})


def test_reserved_column_raises(spark):
    df = spark.createDataFrame(
        [(1, "x", "py", "boom")],
        "id long, content string, lang string, _cf_lines string",
    )
    with pytest.raises(ValueError, match="_cf_lines"):
        chunk_functions(df, ["id"], "content", "lang")


def test_many_boundaries_linear_shape(spark):
    # 300 top-level defs in one file: every def is its own chunk and
    # the file reconstructs byte-exactly (the materialized-column plan
    # makes this linear; the old in-lambda expression tree re-ran the
    # line split per chunk)
    content = "".join(
        f"def f{i}():\n    return {i}\n" for i in range(300)
    )
    df = spark.createDataFrame([(1, content, "py")],
                               "id long, content string, lang string")
    rows = sorted(
        (r["chunk_idx"], r["chunk_text"])
        for r in chunk_functions(df, ["id"], "content", "lang").collect()
    )
    assert len(rows) == 300
    assert "\n".join(t for _, t in rows) == content
    assert rows[0][1].startswith("def f0")
    assert rows[299][1].startswith("def f299")


def test_docstring_tags_are_not_boundaries(spark):
    # '@author: jane' at column 0 inside a module docstring must NOT
    # start a unit (strict decorator shape: bare name / dotted path /
    # call-opening only)
    content = (
        '"""Utils.\n'
        "\n"
        "@author: jane\n"
        "@param x the thing\n"
        '"""\n'
        "import os\n"
        "def f():\n"
        "    pass\n"
    )
    df = spark.createDataFrame([(1, content, "py")],
                               "id long, content string, lang string")
    rows = sorted(
        (r["chunk_idx"], r["chunk_text"])
        for r in chunk_functions(df, ["id"], "content", "lang").collect()
    )
    assert len(rows) == 2                       # preamble + def f
    assert rows[0][1].startswith('"""Utils.')
    assert "@author: jane" in rows[0][1]        # stays in the preamble
    assert rows[1][1].startswith("def f():")


def test_multiline_decorator_documented_fallback(spark):
    # multi-line decorator calls break pairwise contiguity: the def
    # starts its own unit and the decorator lands in the unit above —
    # the documented pre-feature fallback, never a crash
    content = (
        "import os\n"
        '@pytest.mark.parametrize(\n'
        '    "x", [1])\n'
        "def f(x):\n"
        "    pass\n"
    )
    df = spark.createDataFrame([(1, content, "py")],
                               "id long, content string, lang string")
    rows = sorted(
        (r["chunk_idx"], r["chunk_text"])
        for r in chunk_functions(df, ["id"], "content", "lang").collect()
    )
    assert [t.split("\n")[0] for _, t in rows] == [
        "import os", "@pytest.mark.parametrize(", "def f(x):"
    ]
    assert "\n".join(t for _, t in rows) == content
