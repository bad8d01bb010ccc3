"""Intra-repo module dependency graph: edges, circular-import audit,
and module centrality — the architecture-health views of a source-code
corpus (which modules are load-bearing, where the import cycles are).

Reference anchor: the reference validates per-record fields only
(schema-validator rule/*.go); the dependency-graph family is part of
the engine-extension surface SURVEY §2.9 mandates for the north rule's
(repo, path, commit, lang, content) table.

Scale shape: extraction rides the scan (functions/imports — lazy CASE,
regexp_extract_all, one explode, zero shuffles); the intra-repo
restriction is ONE semi-join against the (repo, module) dim — the
DISTINCT module set, orders of magnitude smaller than the file table,
so AQE broadcasts it when it fits; cycle detection joins the DEDUPED
edge list against itself on (repo, module) keys — edge-scale, never
file-scale; centrality reuses operators/graph.pagerank (one ranks⋈edges
join + one map-side-combinable sum per iteration, ranks
localCheckpoint'ed, nothing collected).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.imports import extract_imports
from .graph import pagerank

#: node-key separator for the global pagerank over per-repo components;
#: U+001F (unit separator) cannot appear in repo or module names
#: extracted by the import grammars
NODE_SEP = "\x1f"


def module_graph(
    df: DataFrame,
    repo_col: str,
    module_col: str,
    content_col: str,
    lang_col: str,
    *,
    patterns: dict[str, tuple[str, int]] | None = None,
) -> DataFrame:
    """Distinct intra-repo import edges ``(repo, src_module,
    dst_module)``.

    ``module_col`` is the module a FILE defines (caller-derived from
    its path — e.g. the dotted stem for Python); an import edge is kept
    only when the imported name is defined by some file of the SAME
    repo, so external libraries drop out and the graph is the repo's
    internal architecture.  Self-edges (a module importing itself —
    possible when several files share a module name) are dropped."""
    ex = extract_imports(
        df.select(
            F.col(repo_col).alias("repo"),
            F.col(module_col).alias("src_module"),
            F.col(content_col).alias("_content"),
            F.col(lang_col).alias("_lang"),
        ),
        ["repo", "src_module"],
        "_content",
        "_lang",
        patterns=patterns,
    )
    edges = ex.select(
        "repo", "src_module", F.col("module").alias("dst_module")
    ).distinct()
    defined = df.select(
        F.col(repo_col).alias("repo"),
        F.col(module_col).alias("dst_module"),
    ).distinct()
    return edges.join(
        defined, ["repo", "dst_module"], "left_semi"
    ).filter(F.col("src_module") != F.col("dst_module")).select(
        "repo", "src_module", "dst_module"
    )


def import_cycles(edges: DataFrame, *, max_len: int = 3) -> DataFrame:
    """Circular imports up to length ``max_len`` (2 or 3) over a
    ``(repo, src_module, dst_module)`` edge list:
    ``(repo, cycle_path, length)``.

    A 2-cycle (mutual import) is emitted once with its members sorted;
    a directed 3-cycle is emitted once, rotated to start at its
    smallest module (direction preserved — a→b→c→a and a→c→b→a are
    DIFFERENT cycles and both emitted when both exist).  Longer cycles
    need iteration (the connected-components discipline) and are out of
    scope by design — 2- and 3-cycles are the actionable audit tier."""
    if max_len not in (2, 3):
        raise ValueError("max_len must be 2 or 3")
    e = edges.select("repo", "src_module", "dst_module")
    a, b = e.alias("a"), e.alias("b")
    two = (
        a.join(
            b,
            (F.col("a.repo") == F.col("b.repo"))
            & (F.col("a.dst_module") == F.col("b.src_module"))
            & (F.col("b.dst_module") == F.col("a.src_module"))
            & (F.col("a.src_module") < F.col("a.dst_module")),
        )
        .select(
            F.col("a.repo").alias("repo"),
            F.concat_ws(
                "->",
                F.col("a.src_module"),
                F.col("a.dst_module"),
                F.col("a.src_module"),
            ).alias("cycle_path"),
            F.lit(2).alias("length"),
        )
    )
    if max_len == 2:
        return two
    c = e.alias("c")
    three = (
        a.join(
            b,
            (F.col("a.repo") == F.col("b.repo"))
            & (F.col("a.dst_module") == F.col("b.src_module")),
        )
        .join(
            c,
            (F.col("b.repo") == F.col("c.repo"))
            & (F.col("b.dst_module") == F.col("c.src_module"))
            & (F.col("c.dst_module") == F.col("a.src_module")),
        )
        # rotate to the smallest start; strict < also kills degenerate
        # "triangles" that reuse a node (a 2-cycle + an edge)
        .filter(
            (F.col("a.src_module") < F.col("a.dst_module"))
            & (F.col("a.src_module") < F.col("b.dst_module"))
            & (F.col("a.dst_module") != F.col("b.dst_module"))
        )
        .select(
            F.col("a.repo").alias("repo"),
            F.concat_ws(
                "->",
                F.col("a.src_module"),
                F.col("a.dst_module"),
                F.col("b.dst_module"),
                F.col("a.src_module"),
            ).alias("cycle_path"),
            F.lit(3).alias("length"),
        )
    )
    return two.unionByName(three)


def module_rank(
    edges: DataFrame,
    *,
    damping: float = 0.85,
    iterations: int = 5,
) -> DataFrame:
    """PageRank centrality of every module in its repo's import graph:
    ``(repo, module, rank)``.

    All repos rank in ONE pagerank run — nodes are keyed
    ``repo␟module`` so per-repo components stay disconnected inside a
    single global job (no per-repo loop, no driver-side iteration over
    repos).  Note rank mass is normalized over the GLOBAL node count
    (the standard multi-component PageRank convention): ranks compare
    WITHIN a repo; cross-repo comparisons should divide by the repo's
    node share."""
    keyed = edges.select(
        F.concat_ws(
            NODE_SEP, F.col("repo"), F.col("src_module")
        ).alias("src"),
        F.concat_ws(
            NODE_SEP, F.col("repo"), F.col("dst_module")
        ).alias("dst"),
    )
    ranked = pagerank(
        keyed, damping=damping, iterations=iterations
    )
    return ranked.select(
        F.substring_index("node", NODE_SEP, 1).alias("repo"),
        F.substring_index("node", NODE_SEP, -1).alias("module"),
        "rank",
    )


def repo_self_containment(
    df: DataFrame,
    repo_col: str,
    module_col: str,
    content_col: str,
    lang_col: str,
    *,
    patterns: dict[str, tuple[str, int]] | None = None,
) -> DataFrame:
    """Per-repo import-resolution completeness: ``(repo, n_files,
    n_modules, n_import_edges, n_internal, n_external,
    self_containment)`` — the repo-level sample-selection signal for
    repo-context training (a repo whose imports mostly resolve
    in-repo yields complete dependency-first context windows; one that
    mostly imports external libraries does not).

    Edges are DISTINCT ``(src_module, imported_name)`` pairs per repo;
    an edge is internal when the imported name is defined by some file
    of the SAME repo.  Self-edges (a module importing its own name)
    are dropped, mirroring :func:`module_graph`, so ``n_internal``
    agrees with that graph's edge count.  ``self_containment`` =
    internal / total edges, 6dp, NULL for repos importing nothing.

    Scale shape: same as :func:`module_graph` — extraction rides the
    scan, the resolution test is ONE join against the (repo, module)
    dim (distinct module names, broadcast-sized per AQE), then one
    map-side-combinable groupBy at repo grain.
    """
    ex = extract_imports(
        df.select(
            F.col(repo_col).alias("repo"),
            F.col(module_col).alias("src_module"),
            F.col(content_col).alias("_content"),
            F.col(lang_col).alias("_lang"),
        ),
        ["repo", "src_module"],
        "_content",
        "_lang",
        patterns=patterns,
    )
    edges = (
        ex.select("repo", "src_module", F.col("module").alias("dst_module"))
        .distinct()
        .filter(F.col("src_module") != F.col("dst_module"))
    )
    defined = df.select(
        F.col(repo_col).alias("repo"),
        F.col(module_col).alias("dst_module"),
    ).distinct()
    flagged = edges.join(
        defined.withColumn("_internal", F.lit(True)),
        ["repo", "dst_module"],
        "left",
    )
    per_repo = flagged.groupBy("repo").agg(
        F.count(F.lit(1)).alias("n_import_edges"),
        F.sum(
            F.when(F.col("_internal"), F.lit(1)).otherwise(F.lit(0))
        ).alias("n_internal"),
    )
    sizes = df.groupBy(F.col(repo_col).alias("repo")).agg(
        F.count(F.lit(1)).alias("n_files"),
        F.count_distinct(F.col(module_col)).alias("n_modules"),
    )
    n = F.col("n_import_edges")
    return sizes.join(per_repo, "repo", "left").select(
        "repo",
        "n_files",
        "n_modules",
        F.coalesce(n, F.lit(0)).alias("n_import_edges"),
        F.coalesce("n_internal", F.lit(0)).alias("n_internal"),
        (F.coalesce(n, F.lit(0)) - F.coalesce("n_internal", F.lit(0))).alias(
            "n_external"
        ),
        F.when(
            F.coalesce(n, F.lit(0)) > 0,
            F.round(F.col("n_internal") / n, 6),
        ).alias("self_containment"),
    )
