from __future__ import annotations

from schema_validator_spark.operators.treestats import repo_tree_stats

SCHEMA = "repo string, path string"


def _run(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    return {r["repo"]: r for r in repo_tree_stats(df, "repo", "path").collect()}


def test_shape_stats(spark):
    got = _run(
        spark,
        [
            ("r", "README.md"),
            ("r", "src/main.py"),
            ("r", "src/util/io.py"),
            ("r", "tests/test_main.py"),
            ("r", "docs/index.md"),
        ],
    )["r"]
    assert got["n_files"] == 5
    assert got["max_depth"] == 2
    assert got["avg_depth"] == round((0 + 1 + 2 + 1 + 1) / 5, 6)
    assert got["n_root_files"] == 1
    assert got["n_top_dirs"] == 3  # src, tests, docs
    assert (got["has_src"], got["has_tests"], got["has_docs"]) == (1, 1, 1)


def test_flat_repo(spark):
    got = _run(spark, [("f", "a.py"), ("f", "b.py")])["f"]
    assert got["max_depth"] == 0 and got["n_top_dirs"] == 0
    assert got["n_root_files"] == 2
    assert (got["has_src"], got["has_tests"], got["has_docs"]) == (0, 0, 0)


def test_case_insensitive_convention_match(spark):
    got = _run(spark, [("r", "SRC/Main.java"), ("r", "Tests/T.java")])["r"]
    assert got["has_src"] == 1 and got["has_tests"] == 1


def test_null_and_empty_paths_counted_without_depth_vote(spark):
    got = _run(spark, [("r", None), ("r", ""), ("r", "lib/x.go")])["r"]
    assert got["n_files"] == 3
    assert got["max_depth"] == 1
    assert got["avg_depth"] == 1.0  # only the known path votes
    assert got["n_root_files"] == 0
    assert got["has_src"] == 1  # lib counts as src-convention


def test_all_unknown_paths(spark):
    got = _run(spark, [("r", None)])["r"]
    assert got["n_files"] == 1
    assert got["max_depth"] is None and got["avg_depth"] is None
    assert got["n_top_dirs"] == 0
    assert (got["has_src"], got["has_tests"], got["has_docs"]) == (0, 0, 0)
