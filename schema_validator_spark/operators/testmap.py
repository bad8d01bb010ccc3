"""Source-to-test mapping by naming convention — the per-repo
test-coverage proxy a corpus curator reads without running anything:
which source files have a sibling test file, and which tests are
orphans (their target is gone — a staleness signal).

Conventions encoded (the published defaults of each ecosystem's
runner): pytest ``test_<stem>.py`` / ``<stem>_test.py``, Go
``<stem>_test.go``, JS/TS ``<stem>.test.<ext>`` / ``<stem>.spec.<ext>``.
Matching is on ``(repo, ext, stem)`` — extension-scoped so
``test_app.py`` can never claim ``app.go``; directory placement is
deliberately ignored (both ``tests/test_m.py`` and a sibling
``test_m.py`` count — the conventions, not the layout, carry the
signal).  A file whose basename parses as a test IS a test; everything
else is a source file.

Scale shape: classification is pure codegen riding the scan, and
because a test is keyed by the stem it TESTS, both sides collapse
into ONE map-side-combinable groupBy at ``(repo, ext, stem)`` key
scale (src/tst counts side by side — no join anywhere), followed by
one repo-scale groupBy.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: test-filename suffix/prefix conventions (stem-level, after the
#: final extension is stripped)
_TEST_PREFIX = "test_"
_TEST_SUFFIXES = ("_test", ".test", ".spec")


def _tested_stem(stem: Column) -> Column:
    """NULL if ``stem`` isn't a test name, else the stem it tests."""
    out = F.when(
        stem.startswith(_TEST_PREFIX) & (F.length(stem) > len(_TEST_PREFIX)),
        F.substring(stem, len(_TEST_PREFIX) + 1, 1 << 30),
    )
    for suf in _TEST_SUFFIXES:
        cond = stem.endswith(suf) & (F.length(stem) > len(suf))
        out = out.when(
            cond, F.substring(stem, 1, F.length(stem) - len(suf))
        )
    return out.otherwise(F.lit(None))


def source_test_mapping(
    df: DataFrame,
    repo_col: str,
    path_col: str,
) -> DataFrame:
    """Per-repo test-pairing report: ``(repo, n_source_files,
    n_test_files, n_tested_sources, n_orphan_tests, test_coverage)``.

    ``n_tested_sources`` counts source FILES whose (ext, stem) has at
    least one matching test; ``n_orphan_tests`` counts test FILES with
    no matching source; ``test_coverage`` = tested / sources rounded
    6dp (NULL when a repo has only test files)."""
    path = F.coalesce(F.col(path_col), F.lit(""))
    base = F.regexp_extract(path, r"([^/]+)$", 1)
    # ext case-folds (codebase norm, codequality ext parsing) so
    # Util.PY pairs with test_Util.py; stems stay case-sensitive —
    # Foo.js and foo.js are distinct modules on case-sensitive systems
    ext = F.lower(F.regexp_extract(base, r"\.([A-Za-z0-9]+)$", 1))
    stem = F.regexp_replace(base, r"\.[A-Za-z0-9]+$", "")
    tstem = _tested_stem(stem)
    frame = df.select(
        F.col(repo_col).alias("repo"),
        ext.alias("_ext"),
        F.coalesce(tstem, stem).alias("_stem"),
        tstem.isNotNull().cast("int").alias("_is_test"),
    )
    keyed = frame.groupBy("repo", "_ext", "_stem").agg(
        F.sum(1 - F.col("_is_test")).alias("_n_src"),
        F.sum("_is_test").alias("_n_tst"),
    )
    has_src = F.col("_n_src") > 0
    has_tst = F.col("_n_tst") > 0
    out = keyed.groupBy("repo").agg(
        F.sum("_n_src").alias("n_source_files"),
        F.sum("_n_tst").alias("n_test_files"),
        F.sum(F.when(has_src & has_tst, F.col("_n_src")).otherwise(0))
        .alias("n_tested_sources"),
        F.sum(F.when(~has_src, F.col("_n_tst")).otherwise(0))
        .alias("n_orphan_tests"),
    )
    return out.select(
        "repo",
        "n_source_files",
        "n_test_files",
        "n_tested_sources",
        "n_orphan_tests",
        F.when(
            F.col("n_source_files") > 0,
            F.round(
                F.col("n_tested_sources") / F.col("n_source_files"), 6
            ),
        ).alias("test_coverage"),
    )
