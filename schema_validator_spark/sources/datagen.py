"""Deterministic synthetic ``code_files`` / ``repos`` generators.

Everything derives from ``spark.range(n)`` with pure column expressions
— generation is distributed, seedless-deterministic (values are
functions of the row id), and scales to any row count without driver
memory.  Layout per FIXTURES.md F0/F1 and BASELINE.json input_hint:

    code_files(repo, path, commit, lang, content)

Violations are injected at known residues of the row id so expected
(row, field, code) sets are exact; skew is injected by making one repo
own ~20% of all rows (the "mega-repo" the salting/AQE path must handle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LANGS = ["go", "py", "java", "rs", "ts", "c", "other"]

# Residues (mod 1000) with injected violations — the oracle for tests.
BAD_COMMIT_CASE = 7      # uppercase commit → fails lowercase
BAD_COMMIT_SHORT = 19    # 12-char commit → fails len=40
BAD_LANG = 13            # lang='cobol' → fails oneof
BAD_CONTENT = 23         # content='' → fails required
BAD_PATH = 31            # absolute path → fails startsnotwith=/
MISSING_REPO_RESIDUE = 42  # repos dim drops repo ids ≡ 42 (mod 100) → RI orphans


def code_files(spark: SparkSession, n_rows: int, *, skew: bool = True) -> DataFrame:
    """Generate n_rows of code_files with known violations + skew."""
    df = spark.range(n_rows)
    i = F.col("id")
    r = i % 1000

    repo_idx = F.pmod(F.xxhash64(i), 200)
    base_repo = F.concat(
        F.lit("org_"), (repo_idx % 40).cast("string"),
        F.lit("/repo_"), repo_idx.cast("string"),
    )
    if skew:
        # ~20% of rows land in one mega-repo (FIXTURES.md F0 partitioning note)
        repo = F.when(i % 5 == 0, F.lit("bigorg/monorepo")).otherwise(base_repo)
    else:
        repo = base_repo

    ext = F.element_at(F.array(*[F.lit(x) for x in LANGS]), (i % 7 + 1).cast("int"))
    path = F.concat(
        F.lit("src/pkg_"), (i % 50).cast("string"),
        F.lit("/file_"), i.cast("string"), F.lit("."), ext,
    )
    path = F.when(r == BAD_PATH, F.concat(F.lit("/"), path)).otherwise(path)

    commit_full = F.substring(F.sha2(i.cast("string"), 256), 1, 40)
    commit = (
        F.when(r == BAD_COMMIT_CASE, F.upper(commit_full))
        .when(r == BAD_COMMIT_SHORT, F.substring(commit_full, 1, 12))
        .otherwise(commit_full)
    )

    lang = F.when(r == BAD_LANG, F.lit("cobol")).otherwise(ext)

    token = F.substring(F.sha2(F.concat(i.cast("string"), F.lit("c")), 256), 1, 8)
    content = F.concat(
        F.lit("package pkg_"), (i % 50).cast("string"), F.lit("\n\nfunc f_"),
        i.cast("string"), F.lit("() string {\n\treturn \""),
        F.repeat(token, ((i % 13) + 1).cast("int")), F.lit("\"\n}\n"),
    )
    content = F.when(r == BAD_CONTENT, F.lit("")).otherwise(content)

    return df.select(
        repo.alias("repo"),
        path.alias("path"),
        commit.alias("commit"),
        lang.alias("lang"),
        content.alias("content"),
    )


def repos_dim(spark: SparkSession) -> DataFrame:
    """F1 dimension: all repos except ids ≡ MISSING_REPO_RESIDUE (mod 100)
    — the known 1%-ish of orphaned FKs — plus the mega-repo."""
    base = spark.range(200).select(
        F.concat(
            F.lit("org_"), (F.col("id") % 40).cast("string"),
            F.lit("/repo_"), F.col("id").cast("string"),
        ).alias("repo"),
        F.lit("main").alias("default_branch"),
        F.pmod(F.xxhash64(F.col("id")), 10000).cast("int").alias("stars"),
    ).filter(F.col("id") % 100 != MISSING_REPO_RESIDUE)
    mega = spark.createDataFrame(
        [("bigorg/monorepo", "main", 99999)], "repo string, default_branch string, stars int"
    )
    return base.unionByName(mega)


FULL_SUITE_SPEC = {
    "repo": "required|contains=/|max=255",
    "path": "required|startsnotwith=/|max=4096|printascii",
    "commit": "required|len=40|hexadecimal|lowercase",
    "lang": "required|oneof=go,py,java,rs,ts,c,other",
    "content": "required",
    "content_sha256": "len=64|hexadecimal|lowercase",
}


def full_suite_engine(**kwargs):
    """The benchmarked 'full constraint suite' (FIXTURES.md F0) over
    code_files, including the sha256 per-row invariant."""
    from ..engine import ValidationEngine

    return ValidationEngine(
        FULL_SUITE_SPEC,
        key_cols=["repo", "path", "commit"],
        partition_cols=["lang"],
        derived={"content_sha256": F.sha2(F.col("content"), 256)},
        **kwargs,
    )
