"""Path classification over the code table — The Stack / CodeParrot
preprocessing excludes vendored, generated, test, docs, and config
files BY PATH before any content filter runs (Kocetkov et al. 2022
§3); this is that classifier, as a priority-ordered RE2-safe rule
table over the ``path`` column.

Scale shape: one fixed CASE-over-rlike chain riding the scan — pure
codegen, zero shuffles; the class summary adds one map-side-combinable
groupBy bounded by the class vocabulary (6 values).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: (class, RE2-safe path regex) in priority order — first match wins.
#: Published directory/filename conventions; case-insensitive.
PATH_RULES: list[tuple[str, str]] = [
    (
        "vendored",
        r"(?i)(^|/)(vendor|vendored|third[_-]?party|node_modules|external)/",
    ),
    (
        "generated",
        r"(?i)((^|/)(generated|gen|build|dist|target)/"
        r"|\.pb\.go$|_pb2\.py$|\.min\.(js|css)$)",
    ),
    (
        "test",
        # Java naming is camel-case, so that alternative is pinned
        # case-sensitive via (?-i:...) — plain (?i)Tests?\.java$ would
        # misclassify Latest.java / Contest.java / attest.java as tests
        # (they end in lowercase 'test.java') and drop real source.
        r"(?i)((^|/)(tests?|testing|spec|__tests__)/"
        r"|(^|/)test_[^/]*\.py$|_test\.go$|\.spec\.(js|ts)$"
        r"|(?-i:Tests?\.java$|(^|/)Test[A-Z][^/]*\.java$))",
    ),
    (
        "docs",
        r"(?i)((^|/)(docs?|documentation|examples?)/"
        r"|\.(md|rst|txt|adoc)$)",
    ),
    (
        "config",
        r"(?i)((^|/)(makefile|dockerfile|\.gitignore|\.gitattributes)$"
        r"|\.(ya?ml|json|toml|ini|cfg|lock|properties)$)",
    ),
]

#: verdict when nothing matches — the trainable payload
SOURCE = "source"


def classify_paths(
    df: DataFrame,
    path_col: str,
    *,
    out_col: str = "path_class",
    rules: list[tuple[str, str]] | None = None,
) -> DataFrame:
    """Adds ``out_col``: the first matching class in priority order
    (``vendored > generated > test > docs > config``), else
    ``source``."""
    rs = rules if rules is not None else PATH_RULES
    if not rs:
        raise ValueError("empty rule list")
    p = F.coalesce(F.col(path_col), F.lit(""))
    chain = None
    for cls, pat in rs:
        cond = p.rlike(pat)
        chain = (
            F.when(cond, F.lit(cls))
            if chain is None
            else chain.when(cond, F.lit(cls))
        )
    return df.withColumn(out_col, chain.otherwise(F.lit(SOURCE)))


def path_class_summary(
    df: DataFrame,
    path_col: str,
    *,
    rules: list[tuple[str, str]] | None = None,
) -> DataFrame:
    """``(path_class, n_files, share)`` — the corpus-composition view a
    curation run reports before dropping the non-source classes
    (6dp share)."""
    d = classify_paths(df, path_col, rules=rules)
    counts = d.groupBy("path_class").agg(F.count(F.lit(1)).alias("n_files"))
    from pyspark.sql import Window

    w = Window.partitionBy()
    return counts.select(
        "path_class",
        "n_files",
        F.round(F.col("n_files") / F.sum("n_files").over(w), 6).alias(
            "share"
        ),
    )
