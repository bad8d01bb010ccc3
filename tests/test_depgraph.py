from __future__ import annotations

from pyspark.sql import functions as F

from schema_validator_spark.operators.depgraph import (
    import_cycles,
    module_graph,
    module_rank,
)

SCHEMA = "repo string, module string, lang string, content string"


def _graph(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    return module_graph(df, "repo", "module", "content", "lang")


def test_module_graph_intra_repo_only(spark):
    got = _graph(spark, [
        ("r1", "a", "py", "import b\nimport numpy\n"),
        ("r1", "b", "py", "import a\n"),
        # same module names in r2, but r2 defines only 'a'
        ("r2", "a", "py", "import b\n"),
    ]).collect()
    edges = {(r["repo"], r["src_module"], r["dst_module"]) for r in got}
    # numpy (external) and r2's a->b (b not defined in r2) drop out
    assert edges == {("r1", "a", "b"), ("r1", "b", "a")}


def test_module_graph_drops_self_edges_and_dedups(spark):
    got = _graph(spark, [
        ("r1", "a", "py", "import a\nimport b\nimport b\n"),
        ("r1", "a", "py", "import b\n"),  # second file, same module
        ("r1", "b", "py", "x = 1\n"),
    ]).collect()
    edges = [(r["src_module"], r["dst_module"]) for r in got]
    assert edges == [("a", "b")]


def _edges(spark, rows):
    return spark.createDataFrame(
        rows, "repo string, src_module string, dst_module string"
    )


def test_import_cycles_two_and_three(spark):
    e = _edges(spark, [
        ("r1", "a", "b"), ("r1", "b", "a"),          # 2-cycle
        ("r1", "p", "q"), ("r1", "q", "s"), ("r1", "s", "p"),  # 3-cycle
        ("r1", "x", "y"),                             # acyclic
        ("r2", "a", "b"),                             # cross-repo no close
    ])
    got = {(r["cycle_path"], r["length"])
           for r in import_cycles(e).collect()}
    assert got == {("a->b->a", 2), ("p->q->s->p", 3)}


def test_import_cycles_both_triangle_directions(spark):
    e = _edges(spark, [
        ("r1", "a", "b"), ("r1", "b", "c"), ("r1", "c", "a"),
        ("r1", "a", "c"), ("r1", "c", "b"), ("r1", "b", "a"),
    ])
    got = import_cycles(e).collect()
    three = sorted(r["cycle_path"] for r in got if r["length"] == 3)
    assert three == ["a->b->c->a", "a->c->b->a"]
    # the reversed pair a<->b also forms 2-cycles etc.
    two = sorted(r["cycle_path"] for r in got if r["length"] == 2)
    assert two == ["a->b->a", "a->c->a", "b->c->b"]


def test_import_cycles_triangle_not_from_two_cycle_plus_edge(spark):
    e = _edges(spark, [
        ("r1", "a", "b"), ("r1", "b", "a"), ("r1", "b", "c"),
    ])
    got = {r["cycle_path"] for r in import_cycles(e).collect()}
    assert got == {"a->b->a"}


def test_module_rank_per_repo_components(spark):
    # two identical star graphs in different repos must rank identically
    e = _edges(spark, [
        ("r1", "a", "hub"), ("r1", "b", "hub"), ("r1", "c", "hub"),
        ("r2", "a", "hub"), ("r2", "b", "hub"), ("r2", "c", "hub"),
    ])
    got = module_rank(e, iterations=3).collect()
    by_repo = {}
    for r in got:
        by_repo.setdefault(r["repo"], {})[r["module"]] = r["rank"]
    assert by_repo["r1"] == by_repo["r2"]
    assert by_repo["r1"]["hub"] > by_repo["r1"]["a"]
    assert set(by_repo) == {"r1", "r2"}
