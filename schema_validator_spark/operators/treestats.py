"""Per-repo directory-tree profile (layout conventions + shape stats).

Repo layout is a cheap, strong curation signal over a source-code
corpus: real maintained projects keep conventional top-level trees
(``src/``, ``tests/``, ``docs/``), dumps and vendored mirrors are flat
or pathologically deep.  Mixture planning and the repo-health
dashboard (operators/repoprofile.py) both want the tree shape without
ever reading file contents.

Reference anchor: the reference validates per-record fields only
(schema-validator rule/*.go); repo-grain profiling is part of the
engine-extension surface SURVEY §2.9 mandates over the north rule's
(repo, path, commit, lang, content) table.

Scale shape: pure path arithmetic in whole-stage codegen plus ONE
groupBy on the repo key — every aggregate except the exact
``n_top_dirs`` count-distinct is map-side combinable, and the single
count-distinct rides Spark's standard two-phase distinct-aggregate
plan (no expand explosion: there is exactly one distinct aggregate).
Output is repo-scale, orders of magnitude below the file table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Conventional top-level directory names, lowercase-matched.
SRC_DIRS = ("src", "lib", "pkg", "app")
TEST_DIRS = ("test", "tests", "spec", "specs")
DOC_DIRS = ("doc", "docs", "documentation")


def repo_tree_stats(df: DataFrame, repo_col: str, path_col: str) -> DataFrame:
    """Per-repo tree shape: ``(repo, n_files, max_depth, avg_depth,
    n_root_files, n_top_dirs, has_src, has_tests, has_docs)``.

    ``depth`` = number of ``/`` separators in the path (a root-level
    file has depth 0); ``avg_depth`` rounds to 6dp.  ``n_top_dirs``
    counts distinct first path segments of non-root files exactly.
    The ``has_*`` flags are 0/1 ints keyed on the lowercase top-level
    segment against the module's convention lists.  NULL/empty paths
    count toward ``n_files`` only (no depth vote — their shape is
    unknown, and the validation suite flags them separately).
    """
    path = F.col(path_col)
    known = path.isNotNull() & (path != "")
    depth = F.when(
        known, F.size(F.split(path, "/")) - F.lit(1)
    )
    top = F.when(
        known & (depth > 0), F.lower(F.split_part(path, F.lit("/"), F.lit(1)))
    )

    def has(names) -> F.Column:
        return F.max(F.col("_top").isin(*names).cast("int")).alias("_")

    return (
        df.select(
            F.col(repo_col).alias("repo"),
            depth.alias("_depth"),
            top.alias("_top"),
        )
        .groupBy("repo")
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.max("_depth").alias("max_depth"),
            F.round(F.avg("_depth"), 6).alias("avg_depth"),
            F.count(F.when(F.col("_depth") == 0, 1)).alias("n_root_files"),
            F.count_distinct(F.col("_top")).alias("n_top_dirs"),
            F.coalesce(has(SRC_DIRS), F.lit(0)).alias("has_src"),
            F.coalesce(has(TEST_DIRS), F.lit(0)).alias("has_tests"),
            F.coalesce(has(DOC_DIRS), F.lit(0)).alias("has_docs"),
        )
    )
