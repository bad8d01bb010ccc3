from __future__ import annotations

from schema_validator_spark.operators.licenses import (
    strip_license_headers,
)

SCHEMA = "doc_id long, lang string, content string"


def _run(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    got = strip_license_headers(
        df, ["doc_id"], "content", "lang"
    ).collect()
    return {r["doc_id"]: r for r in got}


def test_py_header_strip_and_shebang(spark):
    got = _run(spark, [
        (0, "py", "# Copyright 2020 Acme\n# All rights reserved.\n\n"
                  "import os\n"),
        # shebang survives, header after it goes
        (1, "py", "#!/usr/bin/env python\n# SPDX-License-Identifier: "
                  "MIT\nx = 1\n"),
        # comment header WITHOUT a marker is kept
        (2, "py", "# module notes\nimport sys\n"),
        # module docstring is not a comment: never stripped
        (3, "py", '"""Copyright Acme"""\nimport io\n'),
    ])
    assert got[0]["content_clean"] == "import os\n"
    assert got[0]["header_removed"] and got[0]["header_lines"] == 3
    assert got[1]["content_clean"] == "#!/usr/bin/env python\nx = 1\n"
    assert got[2]["content_clean"].startswith("# module notes")
    assert not got[2]["header_removed"]
    assert got[3]["content_clean"].startswith('"""')


def test_pep263_coding_cookie_survives(spark):
    got = _run(spark, [
        # cookie inside the license run: run stripped, cookie kept
        (0, "py", "# -*- coding: latin-1 -*-\n# Copyright Acme\n"
                  "x = 'café'\n"),
        # shebang + cookie (PEP 263 line 2) both survive
        (1, "py", "#!/usr/bin/env python\n# coding=utf-8\n"
                  "# All rights reserved.\ny = 1\n"),
        # documented caveat: a cookie BELOW a non-cookie comment line
        # (legal per PEP 263 line 2) is outside the anchored preserved
        # prefix and goes with its marker-bearing run
        (2, "py", "# Copyright Acme\n# vim: set coding=utf-8 :\nz = 1\n"),
        # cookie only, no marker anywhere: nothing stripped
        (3, "py", "# -*- coding: utf-8 -*-\nimport os\n"),
    ])
    assert got[0]["content_clean"] == (
        "# -*- coding: latin-1 -*-\nx = 'café'\n"
    )
    assert got[0]["header_removed"] and got[0]["header_lines"] == 1
    assert got[1]["content_clean"] == (
        "#!/usr/bin/env python\n# coding=utf-8\ny = 1\n"
    )
    assert got[2]["content_clean"] == "z = 1\n"
    assert got[2]["header_lines"] == 2
    assert not got[3]["header_removed"]
    assert got[3]["content_clean"].startswith("# -*- coding")


def test_block_and_line_headers(spark):
    got = _run(spark, [
        (0, "java", "/*\n * Licensed under the Apache License\n */\n"
                    "class A {}\n"),
        (1, "go", "// Copyright the authors\n// Use governed by "
                  "a BSD-style license\n\npackage main\n"),
        # a block comment that is NOT a license stays
        (2, "js", "/* util helpers */\nlet x = 1;\n"),
    ])
    assert got[0]["content_clean"] == "class A {}\n"
    assert got[1]["content_clean"] == "package main\n"
    assert got[1]["header_lines"] == 3
    assert not got[2]["header_removed"]
    assert got[2]["content_clean"].startswith("/* util")


def test_unregistered_and_nulls(spark):
    got = _run(spark, [
        (0, "rust", "// Copyright\nfn main() {}\n"),
        (1, "py", None),
    ])
    assert not got[0]["header_removed"]
    assert got[0]["content_clean"].startswith("// Copyright")
    assert got[1]["content_clean"] == "" and not got[1]["header_removed"]
