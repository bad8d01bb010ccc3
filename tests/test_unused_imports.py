from __future__ import annotations

from schema_validator_spark.functions.imports import unused_imports

SCHEMA = "doc_id long, lang string, content string"


def _run(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    got = unused_imports(df, ["doc_id"], "content", "lang").collect()
    out: dict[int, set[str]] = {}
    for r in got:
        out.setdefault(r["doc_id"], set()).add(r["binding"])
    return out


def test_py_forms(spark):
    out = _run(spark, [
        # os used, sys unused; json aliased and unused; Path used
        (0, "py", "import os\nimport sys\nimport json as j\n"
                  "from pathlib import Path\n"
                  "p = Path(os.getcwd())\n"),
        # dotted import binds the FIRST segment; a.b.c() uses it
        (1, "py", "import a.b\nimport x.y\na.b.c()\n"),
        # comma lists on both forms, as-alias inside the list
        (2, "py", "from m import f, g as h, k\nimport u, v as w\n"
                  "f(); h(); u.run()\n"),
        # star import and parenthesized continuation: never reported
        (3, "py", "from m import *\nfrom n import (\n    alpha,\n"
                  "    beta)\n"),
        # mention in ANOTHER import line is not usage
        (4, "py", "import q\nfrom q import r\nr()\n"),
    ])
    assert out.get(0) == {"sys", "j"}
    assert out.get(1) == {"x"}
    assert out.get(2) == {"k", "w"}
    assert 3 not in out
    assert out.get(4) == {"q"}


def test_go_forms(spark):
    out = _run(spark, [
        (0, "go", 'import "fmt"\nimport js "encoding/json"\n'
                  'import (\n\t_ "db/driver"\n\t. "dot/pkg"\n'
                  '\t"net/http"\n\tx2 "sub/mod"\n)\n'
                  'func main() { fmt.Println(x2.V) }\n'),
        # dashed last segment fails the identifier gate: never reported
        (1, "go", 'import "github.com/google/go-cmp"\n'),
    ])
    assert out.get(0) == {"js", "http"}
    assert 1 not in out


def test_never_invents_bindings(spark):
    out = _run(spark, [
        # go: bare `ident "string"` lines are NOT imports — no phantom
        # 'return' / 'case' bindings, and the strings stay in the
        # usage residue
        (0, "go", 'import "fmt"\n'
                  'func f() string {\n\treturn "v1"\n}\n'
                  'func g(s string) {\n\tswitch s {\n'
                  '\tcase "alpha":\n\t}\n\tfmt.Println(s)\n}\n'),
        # py: an import-shaped line inside a docstring binds nothing
        (1, "py", '"""Usage:\n    import phantom\n"""\nx = 1\n'),
        # py: docstring import masked, real unused import still found
        (2, "py", 'import dead\n"""Example:\nimport ghost\n"""\n'),
        # py: single-line docstring glued around a real import
        (3, "py", '"""mod doc"""\nimport lone\n'),
    ])
    assert 0 not in out
    assert 1 not in out
    assert out.get(2) == {"dead"}
    assert out.get(3) == {"lone"}


def test_js_forms(spark):
    out = _run(spark, [
        (0, "js", "import React from 'react';\n"
                  "import * as ns from 'lib';\n"
                  "import { a, b as c } from 'm';\n"
                  "const fs = require('fs');\n"
                  "React.render(a); fs.read();\n"),
        (1, "ts", "import Dflt, { used } from 'm';\nused();\n"),
    ])
    assert out.get(0) == {"ns", "c"}
    assert out.get(1) == {"Dflt"}


def test_java_forms(spark):
    out = _run(spark, [
        (0, "java", "import java.util.List;\nimport java.util.Map;\n"
                    "import static java.lang.Math.max;\n"
                    "import java.io.*;\n"
                    "class X { List<Integer> l; int m = max(1, 2); }\n"),
    ])
    assert out.get(0) == {"Map"}


def test_unknown_lang_and_nulls(spark):
    out = _run(spark, [
        (0, "rust", "use std::io;\n"),
        (1, "py", None),
        (2, None, "import zz\n"),
    ])
    assert out == {}
