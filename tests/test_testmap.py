from __future__ import annotations

from schema_validator_spark.operators.testmap import (
    source_test_mapping,
)

ROWS = [
    # r1: app.py tested (prefix convention), util.py untested,
    # lib.go tested (suffix), orphan test for a missing module
    ("r1", "src/app.py"),
    ("r1", "tests/test_app.py"),
    ("r1", "src/util.py"),
    ("r1", "pkg/lib.go"),
    ("r1", "pkg/lib_test.go"),
    ("r1", "tests/test_gone.py"),            # orphan
    # r2: js .test/.spec suffixes; app.go NOT claimed by test_app.py-
    # style names in other exts (ext-scoped matching)
    ("r2", "web/c.js"),
    ("r2", "web/c.test.js"),
    ("r2", "web/d.ts"),
    ("r2", "web/d.spec.ts"),
    ("r2", "app.go"),
    ("r2", "test_app.py"),                   # orphan: wrong ext for app.go
]


def _got(spark, rows=ROWS):
    df = spark.createDataFrame(rows, "repo string, path string")
    return {r["repo"]: r.asDict()
            for r in source_test_mapping(df, "repo", "path").collect()}


def test_conventions_and_coverage(spark):
    got = _got(spark)
    r1 = got["r1"]
    assert r1["n_source_files"] == 3          # app.py util.py lib.go
    assert r1["n_test_files"] == 3
    assert r1["n_tested_sources"] == 2        # app.py lib.go
    assert r1["n_orphan_tests"] == 1          # test_gone.py
    assert r1["test_coverage"] == round(2 / 3, 6)
    r2 = got["r2"]
    assert r2["n_source_files"] == 3          # c.js d.ts app.go
    assert r2["n_tested_sources"] == 2        # c.js d.ts
    assert r2["n_orphan_tests"] == 1          # test_app.py (py != go)


def test_edge_names(spark):
    got = _got(spark, [
        ("r", "test_.py"),        # bare prefix: NOT a test (empty stem)
        ("r", "_test.go"),        # bare suffix: NOT a test
        ("r", "a/b/deep_test.go"),
        ("r", "a/deep.go"),       # tested despite different dir
        ("r", None),              # NULL path -> source with empty stem
    ])["r"]
    assert got["n_test_files"] == 1
    assert got["n_tested_sources"] == 1
    assert got["n_source_files"] == 4


def test_only_tests_gives_null_coverage(spark):
    got = _got(spark, [("r", "test_x.py")])["r"]
    assert got["n_source_files"] == 0
    assert got["test_coverage"] is None


def test_two_groupbys_no_join(spark):
    from schema_validator_spark.plans.inspect import n_exchanges

    df = spark.createDataFrame(ROWS, "repo string, path string")
    out = source_test_mapping(df, "repo", "path")
    assert n_exchanges(out) <= 2
    assert "Join" not in out._jdf.queryExecution().executedPlan().toString()
