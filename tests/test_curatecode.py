from __future__ import annotations

from schema_validator_spark.operators.curate import CurationReport
from schema_validator_spark.operators.curatecode import curate_code

GOOD = "package m\n\nfunc f() int {\n\treturn 1\n}\n"
ROWS = [
    # (repo, path, content, why)
    ("r1", "src/a.go", GOOD, "survives"),
    ("r1", "vendor/b.go", GOOD, "path: vendored"),
    ("r1", "src/c.go", GOOD + "\x07", "encoding: control char"),
    ("r1", "src/d.go", "x" * 2000, "quality: max_line"),
    ("r1", "src/e.go", "// do not edit\n" + GOOD, "quality: autogen"),
    ("r1", "src/f.go",
     "// GNU General Public License\n" + GOOD, "license: GPL"),
    ("r1", "src/g.go",
     "key = AKIA" + "A" * 16 + "\n" + GOOD + "x\n", "secrets"),
    ("r2", "src/z.go", GOOD, "dedup: same content as r1/src/a.go"),
    ("r1", "src/b2.go", GOOD + "// extra\n", "survives (distinct)"),
]


def _run(spark):
    df = spark.createDataFrame(
        [(r, p, c) for r, p, c, _ in ROWS],
        "repo string, path string, content string",
    )
    rep = CurationReport()
    out = curate_code(df, report=rep).collect()
    return out, rep.counts


def test_funnel_counts_and_survivors(spark):
    out, counts = _run(spark)
    assert counts["input"] == 9
    assert counts["path"] == 8       # vendored dropped
    assert counts["encoding"] == 7   # control char dropped
    assert counts["quality"] == 5    # max_line + autogen dropped
    assert counts["license"] == 4    # GPL dropped
    assert counts["secrets"] == 3    # AKIA dropped
    assert counts["dedup"] == 2      # r1/src/a.go == r2/src/z.go
    got = {(r["repo"], r["path"]) for r in out}
    # min(struct(repo, path)) keeps the lexicographically first copy
    assert got == {("r1", "src/a.go"), ("r1", "src/b2.go")}
    assert all(len(r["content_sha"]) == 64 for r in out)


def test_null_repo_survivor_matches_oracle_ordering(spark):
    # Spark's min(struct(...)) sorts NULL fields FIRST, so a NULL-repo
    # copy of duplicated content is the survivor; the DuckDB oracle
    # orders 'repo nulls first, path nulls first' to match.
    df = spark.createDataFrame(
        [("r1", "src/a.go", GOOD), (None, "src/n.go", GOOD)],
        "repo string, path string, content string",
    )
    out = curate_code(df).collect()
    assert len(out) == 1
    assert out[0]["repo"] is None and out[0]["path"] == "src/n.go"


def test_reserved_column_names_raise(spark):
    import pytest

    df = spark.createDataFrame(
        [("r1", "src/a.go", GOOD, 5)],
        "repo string, path string, content string, n_chars int",
    )
    with pytest.raises(ValueError, match="n_chars"):
        curate_code(df)


def test_lazy_without_report(spark):
    df = spark.createDataFrame(
        [(r, p, c) for r, p, c, _ in ROWS],
        "repo string, path string, content string",
    )
    out = curate_code(df)  # no counts materialized
    assert out.count() == 2
    assert set(out.columns) == {"repo", "path", "content", "content_sha"}


def test_curation_verdicts(spark):
    from schema_validator_spark.operators.curatecode import (
        curation_verdicts,
    )

    df = spark.createDataFrame(
        [(r, p, c) for r, p, c, _ in ROWS],
        "repo string, path string, content string",
    )
    got = {
        (r["repo"], r["path"]): r["verdict"]
        for r in curation_verdicts(df).collect()
    }
    assert got == {
        ("r1", "src/a.go"): "kept",
        ("r1", "vendor/b.go"): "path",
        ("r1", "src/c.go"): "encoding",
        ("r1", "src/d.go"): "quality",
        ("r1", "src/e.go"): "quality",
        ("r1", "src/f.go"): "license",
        ("r1", "src/g.go"): "secrets",
        ("r2", "src/z.go"): "duplicate",
        ("r1", "src/b2.go"): "kept",
    }
    # kept == curate_code's survivor set, by construction
    kept = {k for k, v in got.items() if v == "kept"}
    surv = {
        (r["repo"], r["path"]) for r in curate_code(df).collect()
    }
    assert kept == surv


def test_curation_verdicts_full_row_duplicates(spark):
    from schema_validator_spark.operators.curatecode import (
        curation_verdicts,
    )

    # exact full-row duplicates are indistinguishable: every copy of
    # the surviving row is 'kept' (docstring rule; DISTINCT kept rows
    # == curate_code survivors), while a distinct-path copy of the
    # same content is 'duplicate'
    df = spark.createDataFrame(
        [("r1", "src/a.go", GOOD),
         ("r1", "src/a.go", GOOD),
         ("r2", "src/z.go", GOOD)],
        "repo string, path string, content string",
    )
    got = sorted(
        (r["repo"], r["path"], r["verdict"])
        for r in curation_verdicts(df).collect()
    )
    assert got == [
        ("r1", "src/a.go", "kept"),
        ("r1", "src/a.go", "kept"),
        ("r2", "src/z.go", "duplicate"),
    ]
    surv = {(r["repo"], r["path"]) for r in curate_code(df).collect()}
    assert surv == {("r1", "src/a.go")}


def test_curation_verdicts_null_content_and_reserved(spark):
    import pytest

    from schema_validator_spark.operators.curatecode import (
        curation_verdicts,
    )

    df = spark.createDataFrame(
        [("r1", "src/a.go", None)],
        "repo string, path string, content string",
    )
    got = curation_verdicts(df).collect()
    assert got[0]["verdict"] == "quality"  # empty/NULL fails min_chars

    bad = spark.createDataFrame(
        [("r", "p", "x", True)],
        "repo string, path string, content string, keep boolean",
    )
    with pytest.raises(ValueError, match="reserves"):
        curation_verdicts(bad)
