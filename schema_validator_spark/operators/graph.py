"""Iterative graph ranking — PageRank over an edge list.

Web-curation pipelines rank DOMAINS to pick what to crawl/keep (the
Common-Crawl-style frontier: a link graph over registered domains, cf.
functions/url.py registered_domain); PageRank is the standard score.
This is the repo's second iterative-graph workload beside connected
components (dedup.py), with the same discipline: a FIXED number of
DataFrame-only iterations, lineage truncated each round, no driver-side
graph state.

Determinism: ranks are rounded to 6 decimal places at the END OF EVERY
ITERATION, so any engine replaying the same recurrence (the DuckDB
oracle unrolls it) reproduces bit-identical scores — float summation
order cannot accumulate across iterations (the repo's
"engine-reproducible rounding mode", cf. operators/drift.py).

Scale shape per iteration: one equi-join ranks⋈edges on src (edges are
hash-pre-partitioned on src ONCE and reused — the join reuses that
layout every round) + one groupBy dst (map-side combinable sum) + two
tiny scalar aggs (dangling mass, node count).  Nothing is ever
collected; the |V|-sized rank frame is localCheckpoint'ed each round
(the one materializing job), which truncates the iterative lineage.  Skewed in-degree (every page
links to the hub) is a sum, so AQE/salting concerns don't apply —
partial aggregation absorbs the hot key map-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    iterations: int = 10,
) -> DataFrame:
    """Rank nodes of the (deduplicated) directed graph ``edges``.

    Returns ``(node, rank)`` with ranks rounded 6dp.  Nodes = every
    distinct endpoint.  Dangling mass (nodes with no out-edges) is
    redistributed uniformly, the standard correction — total rank stays
    ~1 up to rounding.
    """
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    e = edges.select(
        F.col(src).alias("_src"), F.col(dst).alias("_dst")
    ).distinct()
    nodes = (
        e.select(F.col("_src").alias("node"))
        .unionByName(e.select(F.col("_dst").alias("node")))
        .distinct()
    )
    deg = e.groupBy("_src").agg(F.count(F.lit(1)).alias("_deg"))
    # pre-partition the (static) edge side once; every iteration's join
    # reuses this layout instead of re-shuffling the edges
    e = e.repartition(F.col("_src")).persist()
    n_nodes = nodes.count()  # one scalar; also materializes `nodes`
    nodes = nodes.persist()
    outdeg = nodes.join(
        deg, nodes["node"] == deg["_src"], "left"
    ).select("node", F.coalesce(F.col("_deg"), F.lit(0)).alias("deg")).persist()

    r0 = round(1.0 / n_nodes, 6)
    ranks = outdeg.select("node", "deg", F.lit(r0).alias("rank"))
    # dangling mass of round 0 is analytic (uniform ranks); every later
    # round's mass rides the round's ONE materializing job as an
    # Observation (the connected-components 1-job/iter discipline,
    # dedup.py) — no extra per-iteration scalar job
    n_dangling = outdeg.filter(F.col("deg") == 0).count()
    dangling = r0 * n_dangling
    for _ in range(iterations):
        from pyspark.sql import Observation

        contribs = (
            ranks.filter(F.col("deg") > 0)
            .join(e, ranks["node"] == e["_src"])
            .groupBy("_dst")
            .agg(F.sum(F.col("rank") / F.col("deg")).alias("_in"))
        )
        base = (1.0 - damping) / n_nodes + damping * dangling / n_nodes
        obs = Observation()
        new_ranks = (
            outdeg.join(contribs, outdeg["node"] == contribs["_dst"], "left")
            .select(
                "node",
                "deg",
                F.round(
                    F.lit(base)
                    + F.lit(damping) * F.coalesce(F.col("_in"), F.lit(0.0)),
                    6,
                ).alias("rank"),
            )
            .observe(
                obs,
                F.coalesce(
                    F.sum(F.when(F.col("deg") == 0, F.col("rank"))), F.lit(0.0)
                ).alias("dangling"),
            )
        )
        # localCheckpoint = ONE materializing job per iteration that
        # both truncates lineage (iterative logical plans otherwise grow
        # until even explain() OOMs) and yields the Observation metric
        ranks = new_ranks.localCheckpoint()
        dangling = obs.get["dangling"]
    return ranks.select("node", "rank")
