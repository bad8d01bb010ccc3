from __future__ import annotations

import pytest

from schema_validator_spark.functions.imports import (
    extract_imports,
    import_edges,
)
from schema_validator_spark.plans.inspect import n_exchanges, uses_python

PY = "import os\nfrom a.b import c\nx = 1\nimport os\n"
GO = 'package m\n\nimport "fmt"\n\nimport (\n\t"x/y"\n\t"z"\n)\n'
JS = "const a = require('x');\nimport {b} from \"y/z\";\nimport 'pf';\n"
JAVA = "import static a.b.C;\nimport d.E;\nclass F {}\n"

ROWS = [
    (1, "py", PY),
    (2, "go", GO),
    (3, "js", JS),
    (4, "java", JAVA),
    (5, "cobol", "IMPORT everything"),
    (6, "py", None),
]


def _df(spark):
    return spark.createDataFrame(ROWS, "id long, lang string, content string")


def test_extract_per_lang(spark):
    got = {}
    for r in extract_imports(_df(spark), ["id"], "content", "lang").collect():
        got.setdefault(r["id"], []).append(r["module"])
    assert got[1] == ["os", "a.b", "os"]  # multiplicity preserved
    assert got[2] == ["fmt", "x/y", "z"]
    assert got[3] == ["x", "y/z", "pf"]
    assert got[4] == ["a.b.C", "d.E"]
    assert 5 not in got and 6 not in got


def test_ts_alias_and_case_insensitive_lang(spark):
    df = spark.createDataFrame(
        [(1, "TS", "import {x} from 'mod';")],
        "id long, lang string, content string",
    )
    out = extract_imports(df, ["id"], "content", "lang").collect()
    assert [r["module"] for r in out] == ["mod"]


def test_extract_zero_shuffle(spark):
    out = extract_imports(_df(spark), ["id"], "content", "lang")
    assert n_exchanges(out) == 0
    assert not uses_python(out)


def test_import_edges(spark):
    rows = [
        ("r1", "f1", "py", "import os\nimport os\n"),
        ("r1", "f2", "py", "import os\nimport sys\n"),
        ("r2", "f3", "py", "import os\n"),
    ]
    df = spark.createDataFrame(
        rows, "repo string, path string, lang string, content string"
    )
    got = {
        (r["src_repo"], r["module"]): r["n_files"]
        for r in import_edges(
            df, "repo", ["path"], "content", "lang"
        ).collect()
    }
    # within-file duplicates collapse; n_files counts FILES not spans
    assert got == {("r1", "os"): 2, ("r1", "sys"): 1, ("r2", "os"): 1}


def test_empty_pattern_map_raises(spark):
    with pytest.raises(ValueError):
        extract_imports(_df(spark), ["id"], "content", "lang", patterns={})
