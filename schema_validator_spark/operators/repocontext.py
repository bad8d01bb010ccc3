"""Repo-level context ordering — dependency-first file order for
repository-context training samples (the StarCoder2 / DeepSeek-Coder
"repo-level" data format: concatenate a repo's files so definitions
tend to precede their usages, then chunk the stream into training
windows).

Reference anchor: the reference validates per-record fields only
(schema-validator rule/*.go); repo-context assembly is part of the
engine-extension surface SURVEY §2.9 mandates for the north rule's
(repo, path, commit, lang, content) table.

Ordering rule (deterministic, engine-reproducible): a file's score is
the intra-repo FAN-IN of the module it defines — how many DISTINCT
in-repo modules import it (depgraph.module_graph edges, external
imports already excluded).  Files sort by ``(fan_in DESC, path ASC)``
within their repo: heavily-imported modules (the repo's load-bearing
definitions) come first, an O(E) approximation of topological order
that is total, cycle-proof, and needs no iteration.  Exact topological
sort needs a loop over the longest dependency chain and is ill-defined
under cycles (which real repos have — see depgraph.import_cycles);
fan-in ordering is the standard practical stand-in.

Scale shape: edges are module-scale (DISTINCT imports, orders of
magnitude smaller than the file table); fan-in is one map-side-
combinable groupBy on them; the file join is against that module-scale
dim (AQE broadcasts it when it fits); the final ``row_number`` windows
per REPO — thousands of files per partition key, never corpus-scale.
The manifest (repo, path, seq) is the 100 TB product: a packer
consumes it streaming.  ``repo_context_text`` materializes one row per
repo and is the small-scale/demo tier — a mega-repo would produce a
row of its own total size, so production packing should feed the
manifest to operators/packing.pack_sequences instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .depgraph import module_graph


def repo_context_order(
    df: DataFrame,
    repo_col: str,
    path_col: str,
    module_col: str,
    content_col: str,
    lang_col: str,
    *,
    patterns: dict[str, tuple[str, int]] | None = None,
) -> DataFrame:
    """Per-file ordering manifest ``(repo, path, module, fan_in, seq)``.

    ``fan_in`` = number of DISTINCT in-repo source modules importing
    the module this file defines (0 for leaves/unimported files);
    ``seq`` = 1-based position in the repo's context stream, ordered
    ``fan_in DESC, path ASC`` (total and deterministic — path is
    unique per repo in a well-formed corpus)."""
    edges = module_graph(
        df, repo_col, module_col, content_col, lang_col, patterns=patterns
    )
    fan_in = edges.groupBy(
        F.col("repo"), F.col("dst_module").alias("_module")
    ).agg(F.count(F.lit(1)).alias("fan_in"))

    files = df.select(
        F.col(repo_col).alias("repo"),
        F.col(path_col).alias("path"),
        F.col(module_col).alias("module"),
    )
    scored = files.join(
        fan_in,
        (files["repo"] == fan_in["repo"])
        & (files["module"] == fan_in["_module"]),
        "left",
    ).select(
        files["repo"], files["path"], files["module"],
        F.coalesce(F.col("fan_in"), F.lit(0)).alias("fan_in"),
    )
    w = Window.partitionBy("repo").orderBy(
        F.col("fan_in").desc(), F.col("path").asc()
    )
    return scored.withColumn("seq", F.row_number().over(w))


def repo_context_text(
    df: DataFrame,
    repo_col: str,
    path_col: str,
    module_col: str,
    content_col: str,
    lang_col: str,
    *,
    file_sep: str = "<file_sep>",
    patterns: dict[str, tuple[str, int]] | None = None,
) -> DataFrame:
    """One context document per repo: files in manifest order, each as
    ``<file_sep>path\\n ⊕ content``: ``(repo, n_files, context)``.

    Small-scale/demo tier — the row is repo-sized (see module
    docstring); production packing consumes :func:`repo_context_order`
    streaming instead."""
    order = repo_context_order(
        df, repo_col, path_col, module_col, content_col, lang_col,
        patterns=patterns,
    )
    files = df.select(
        F.col(repo_col).alias("repo"),
        F.col(path_col).alias("path"),
        F.col(content_col).alias("content"),
    )
    joined = order.join(files, ["repo", "path"]).select(
        "repo",
        F.struct(
            F.col("seq"),
            F.concat(
                F.lit(file_sep), F.col("path"), F.lit("\n"),
                F.coalesce(F.col("content"), F.lit("")),
            ).alias("piece"),
        ).alias("_p"),
    )
    return joined.groupBy("repo").agg(
        F.count(F.lit(1)).alias("n_files"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list("_p")), lambda s: s["piece"]
            ),
            "",
        ).alias("context"),
    )
