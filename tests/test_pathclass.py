from __future__ import annotations

import pytest

from schema_validator_spark.operators.pathclass import (
    classify_paths,
    path_class_summary,
)
from schema_validator_spark.plans.inspect import n_exchanges, uses_python

ROWS = [
    (1, "vendor/lib/x.py", "vendored"),
    (2, "a/node_modules/m/index.js", "vendored"),
    (3, "pkg/api.pb.go", "generated"),
    (4, "web/app.min.js", "generated"),
    (5, "build/out.o", "generated"),
    (6, "tests/test_x.py", "test"),
    (7, "pkg/foo_test.go", "test"),
    (8, "src/Button.spec.ts", "test"),
    (9, "src/FooTest.java", "test"),
    (18, "src/FooTests.java", "test"),
    (19, "a/TestRunner.java", "test"),
    # camel-case Java test suffix is case-SENSITIVE: these end in
    # lowercase 'test.java' and are real source, not tests
    (20, "src/Latest.java", "source"),
    (21, "src/Contest.java", "source"),
    (22, "src/attest.java", "source"),
    (10, "docs/guide.md", "docs"),
    (11, "README.md", "docs"),
    (12, "Makefile", "config"),
    (13, "conf/app.yaml", "config"),
    (14, "poetry.lock", "config"),
    (15, "src/main.go", "source"),
    (16, None, "source"),
    # priority: vendored dir containing tests is still vendored
    (17, "vendor/pkg/tests/x_test.go", "vendored"),
]


def test_classify(spark):
    df = spark.createDataFrame(
        [(i, p) for i, p, _ in ROWS], "id long, path string"
    )
    got = {r["id"]: r["path_class"]
           for r in classify_paths(df, "path").collect()}
    for i, _, want in ROWS:
        assert got[i] == want, (i, got[i], want)


def test_zero_shuffle(spark):
    df = spark.createDataFrame([(1, "src/a.go")], "id long, path string")
    out = classify_paths(df, "path")
    assert n_exchanges(out) == 0
    assert not uses_python(out)


def test_summary_shares(spark):
    df = spark.createDataFrame(
        [(i, p) for i, p, _ in ROWS], "id long, path string"
    )
    got = {r["path_class"]: (r["n_files"], r["share"])
           for r in path_class_summary(df, "path").collect()}
    n = len(ROWS)
    assert got["vendored"] == (3, round(3 / n, 6))
    assert got["test"] == (6, round(6 / n, 6))
    assert got["source"] == (5, round(5 / n, 6))
    assert sum(v[0] for v in got.values()) == n


def test_custom_rules_and_empty(spark):
    df = spark.createDataFrame([(1, "x/secret.key")], "id long, path string")
    out = classify_paths(
        df, "path", rules=[("keys", r"\.key$")]
    ).collect()
    assert out[0]["path_class"] == "keys"
    with pytest.raises(ValueError):
        classify_paths(df, "path", rules=[])
