from __future__ import annotations

import math

from schema_validator_spark.operators.depgraph import (
    module_graph,
    repo_self_containment,
)

SCHEMA = "repo string, module string, lang string, content string"


def _run(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    got = repo_self_containment(df, "repo", "module", "content", "lang")
    return {r["repo"]: r for r in got.collect()}


def test_internal_vs_external_split(spark):
    rows = [
        ("r1", "m0", "py", "import m1\nimport numpy\n"),
        ("r1", "m1", "py", "import os\n"),
    ]
    r = _run(spark, rows)["r1"]
    assert r["n_files"] == 2 and r["n_modules"] == 2
    assert r["n_import_edges"] == 3
    assert r["n_internal"] == 1 and r["n_external"] == 2
    assert math.isclose(r["self_containment"], round(1 / 3, 6))


def test_no_imports_gives_null_ratio(spark):
    r = _run(spark, [("r1", "m0", "py", "x = 1\n")])["r1"]
    assert r["n_import_edges"] == 0
    assert r["self_containment"] is None


def test_self_import_dropped_like_module_graph(spark):
    rows = [
        ("r1", "m0", "py", "import m0\nimport m1\n"),
        ("r1", "m1", "py", ""),
    ]
    r = _run(spark, rows)["r1"]
    assert r["n_import_edges"] == 1 and r["n_internal"] == 1


def test_n_internal_agrees_with_module_graph(spark):
    rows = [
        ("r1", "m0", "py", "import m1\nimport numpy\n"),
        ("r1", "m1", "py", "import m0\nimport m2\n"),
        ("r1", "m2", "py", "import requests\n"),
        ("r2", "a", "py", "import b\n"),
        ("r2", "b", "py", ""),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    graph_counts = {
        r["repo"]: r["n"]
        for r in module_graph(df, "repo", "module", "content", "lang")
        .groupBy("repo")
        .count()
        .withColumnRenamed("count", "n")
        .collect()
    }
    got = _run(spark, rows)
    for repo, r in got.items():
        assert r["n_internal"] == graph_counts.get(repo, 0)


def test_cross_repo_names_do_not_resolve(spark):
    rows = [
        ("r1", "m0", "py", "import shared\n"),
        ("r2", "shared", "py", ""),
    ]
    got = _run(spark, rows)
    assert got["r1"]["n_external"] == 1 and got["r1"]["n_internal"] == 0


def test_duplicate_imports_count_once(spark):
    rows = [
        ("r1", "m0", "py", "import m1\nimport m1\n"),
        ("r1", "m1", "py", ""),
    ]
    r = _run(spark, rows)["r1"]
    assert r["n_import_edges"] == 1
