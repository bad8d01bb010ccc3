"""Cross-language parallel-file mining (TransCoder-style candidates).

Code-translation training data (TransCoder, Roziere et al. 2020;
CodeXGLUE's code-to-code track) starts from *parallel candidates*:
the same program implemented in two languages.  The highest-precision
cheap signal is path convention — the same repo keeps ``algo/sort.py``
next to ``algo/sort.go`` / ``algo/sort.js`` when it maintains parallel
implementations — so the miner pairs files that share a repo and a
path *stem* (path minus extension) but declare different languages.

Reference anchor: the reference validates per-record fields only
(schema-validator rule/*.go); pair mining is part of the
engine-extension surface SURVEY §2.9 mandates for training-data
construction over the north rule's (repo, path, commit, lang, content)
table (same family as operators/docpairs.py and operators/fim.py).

Scale shape: ONE hash shuffle total — files collapse to their
``(repo, stem)`` group via a map-side-combinable ``collect_list`` and
pairs are generated *inside* the group with codegen HOFs, so there is
no self-join and no second exchange.  Group width is bounded: the
default ``unambiguous_only=True`` keeps only stems where every
language appears exactly once (ambiguous stems — five ``index.js``
variants — are junk for translation anyway), making the per-group pair
count at most C(n_langs, 2); ``max_files_per_stem`` hard-caps the
degenerate case when ambiguity is allowed, and dropped stems are
countable by comparing against the uncapped frame.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Trailing-extension pattern removed to form the stem.  One extension
#: only (``archive.tar.gz`` stems to ``archive.tar``), ASCII alnum to
#: stay RE2-safe for the DuckDB oracle replay.
EXT_RE = r"\.[0-9A-Za-z]+$"


def _pairs(files: Column) -> Column:
    """All (i, j>i) cross-language pairs from a sorted file array —
    O(k²) in the bounded group width, zero additional shuffles."""
    return F.flatten(
        F.transform(
            F.sequence(F.lit(1), F.size(files) - 1),
            lambda i: F.filter(
                F.transform(
                    F.slice(files, F.lit(1).cast("int"), i.cast("int")),
                    lambda a: F.struct(
                        a.alias("a"),
                        F.element_at(files, (i + 1).cast("int")).alias("b"),
                    ),
                ),
                lambda p: p["a"]["lang"] != p["b"]["lang"],
            ),
        )
    )


def cross_lang_pairs(
    df: DataFrame,
    repo_col: str,
    path_col: str,
    lang_col: str,
    content_col: str,
    *,
    unambiguous_only: bool = True,
    max_files_per_stem: int = 16,
) -> DataFrame:
    """Parallel-implementation candidates: one row per unordered
    cross-language pair sharing ``(repo, stem)``.

    Output: ``(repo, stem, lang_a, path_a, n_chars_a, lang_b, path_b,
    n_chars_b, size_ratio)`` with ``(lang_a, path_a) < (lang_b,
    path_b)`` lexicographically (deterministic orientation) and
    ``size_ratio = round(smaller/larger chars, 6)`` — wildly unequal
    sizes are a downstream junk signal.  NULL-lang rows are excluded
    (they cannot witness a *cross*-language pair).

    ``unambiguous_only`` keeps only stems where each language maps to
    exactly ONE file; with it off, every cross-language combination in
    a stem pairs, capped at ``max_files_per_stem`` files per stem
    (larger stems are dropped whole — boilerplate names, not parallel
    code).
    """
    if max_files_per_stem < 2:
        raise ValueError(
            f"max_files_per_stem must be >= 2, got {max_files_per_stem}"
        )
    base = df.where(F.col(lang_col).isNotNull()).select(
        F.col(repo_col).alias("repo"),
        F.regexp_replace(F.col(path_col), EXT_RE, "").alias("stem"),
        F.struct(
            F.col(lang_col).alias("lang"),
            F.col(path_col).alias("path"),
            F.length(F.col(content_col)).alias("n_chars"),
        ).alias("f"),
    )
    grouped = base.groupBy("repo", "stem").agg(
        F.sort_array(F.collect_list("f")).alias("files")
    )
    files = F.col("files")
    langs = F.transform(files, lambda a: a["lang"])
    multi = F.size(F.array_distinct(langs)) >= 2
    if unambiguous_only:
        eligible = multi & (F.size(F.array_distinct(langs)) == F.size(langs))
    else:
        eligible = multi & (F.size(files) <= F.lit(max_files_per_stem))
    a, b = F.col("p.a"), F.col("p.b")
    ratio = F.round(
        F.least(a["n_chars"], b["n_chars"])
        / F.greatest(a["n_chars"], b["n_chars"]),
        6,
    )
    return (
        grouped.where(eligible)
        .select("repo", "stem", F.explode(_pairs(files)).alias("p"))
        .select(
            "repo",
            "stem",
            a["lang"].alias("lang_a"),
            a["path"].alias("path_a"),
            a["n_chars"].alias("n_chars_a"),
            b["lang"].alias("lang_b"),
            b["path"].alias("path_b"),
            b["n_chars"].alias("n_chars_b"),
            F.when(
                F.greatest(a["n_chars"], b["n_chars"]) > 0, ratio
            ).otherwise(F.lit(1.0)).alias("size_ratio"),
        )
    )
