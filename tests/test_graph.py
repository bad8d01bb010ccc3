from __future__ import annotations

from collections import Counter, defaultdict

import pytest

from schema_validator_spark.operators.graph import pagerank


def _py_pagerank(edges, d=0.85, iters=10):
    """First-principles replay of the exact recurrence (6dp rounding at
    every iteration boundary, dangling mass redistributed uniformly)."""
    e = sorted(set(edges))
    nodes = sorted({a for a, _ in e} | {b for _, b in e})
    n = len(nodes)
    deg = Counter(a for a, _ in e)
    r = {v: round(1.0 / n, 6) for v in nodes}
    for _ in range(iters):
        dang = sum(r[v] for v in nodes if deg[v] == 0)
        base = (1 - d) / n + d * dang / n
        incoming = defaultdict(float)
        for a, b in e:
            incoming[b] += r[a] / deg[a]
        r = {v: round(base + d * incoming[v], 6) for v in nodes}
    return r


def _run(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {r["node"]: r["rank"] for r in pagerank(df, **kw).collect()}


def test_two_node_cycle_is_uniform(spark):
    got = _run(spark, [(1, 2), (2, 1)], iterations=5)
    assert got == {1: 0.5, 2: 0.5}


def test_matches_reference_replay(spark):
    edges = [(1, 2), (1, 3), (2, 3), (3, 1), (4, 3), (5, 4), (2, 4)]
    got = _run(spark, edges, iterations=10)
    assert got == _py_pagerank(edges, iters=10)


def test_dangling_mass_redistributed(spark):
    # node 3 has no out-edges; total rank must stay ~1
    edges = [(1, 2), (2, 3), (1, 3)]
    got = _run(spark, edges, iterations=8)
    assert got == _py_pagerank(edges, iters=8)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-4)


def test_duplicate_edges_do_not_double_count(spark):
    got_dup = _run(spark, [(1, 2), (1, 2), (2, 1)], iterations=4)
    got = _run(spark, [(1, 2), (2, 1)], iterations=4)
    assert got_dup == got


def test_hub_ranks_highest(spark):
    # bidirectional star: spokes feed the hub, hub spreads back 1/7 each
    edges = [(i, 0) for i in range(1, 8)] + [(0, i) for i in range(1, 8)]
    got = _run(spark, edges, iterations=10)
    assert got[0] == max(got.values())
    assert got[0] > 2 * got[1]
    assert got == _py_pagerank(edges, iters=10)
