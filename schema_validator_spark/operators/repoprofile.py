"""Per-repo health profile — the repo-level dashboard a code-corpus
curation run reads before deciding what to ingest (the repo-grain
counterpart of operators/profile.py's column profile): size, language
mix, test/vendored composition, exact-dup load, and the repo license
verdict, in one frame.

Composes the single-source-of-truth classifiers (pathclass.PATH_RULES,
licenses.LICENSE_FILE_RE/LICENSE_RANK) so the profile can never
disagree with the filters a curation funnel applies.

Scale shape: three map-side-combinable aggregations — one at (repo)
grain, one at (repo, content_sha) for the dup load, one at
(repo, lang) for the dominant language (arg-max via ``max(struct)``)
— then repo-scale joins (each side is one row per repo) plus the
broadcast license dimension.  The file table is scanned once per
aggregation; nothing joins at file grain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .licenses import repo_license
from .pathclass import classify_paths


def repo_profile(
    df: DataFrame,
    repo_col: str,
    path_col: str,
    lang_col: str,
    content_col: str,
) -> DataFrame:
    """One row per repo: ``(repo, n_files, n_bytes, n_langs, top_lang,
    test_share, vendored_share, dup_share, repo_license)``.

    ``dup_share`` = fraction of the repo's files whose content sha256
    occurs more than once WITHIN the repo (what intra-repo exact dedup
    would remove, counting every copy after the first).  ``n_bytes``
    is UTF-8 octets, not characters.  Lang labels are lowercased
    (``Go`` == ``go``), matching codechunk's dispatch.  ``top_lang``
    ties break lexicographically descending (deterministic).  Shares
    round to 6dp."""
    if "_pcls" in df.columns:
        raise ValueError(
            "repo_profile reserves the column name '_pcls'; rename it"
        )
    base = classify_paths(df, path_col, out_col="_pcls").select(
        F.col(repo_col).alias("repo"),
        F.col("_pcls"),
        F.lower(F.coalesce(F.col(lang_col), F.lit(""))).alias("_lang"),
        F.coalesce(F.col(content_col), F.lit("")).alias("_content"),
    )
    per_file = base.select(
        "repo",
        "_lang",
        (F.col("_pcls") == "test").cast("int").alias("_is_test"),
        (F.col("_pcls") == "vendored").cast("int").alias("_is_vend"),
        F.octet_length("_content").alias("_bytes"),
        F.sha2("_content", 256).alias("_sha"),
    )
    agg = per_file.groupBy("repo").agg(
        F.count(F.lit(1)).alias("n_files"),
        F.sum("_bytes").alias("n_bytes"),
        F.countDistinct("_lang").alias("n_langs"),
        F.round(F.avg("_is_test"), 6).alias("test_share"),
        F.round(F.avg("_is_vend"), 6).alias("vendored_share"),
    )
    dup = (
        per_file.groupBy("repo", "_sha")
        .agg(F.count(F.lit(1)).alias("_n"))
        .groupBy("repo")
        .agg(
            F.round(
                (F.sum("_n") - F.count(F.lit(1))) / F.sum("_n"), 6
            ).alias("dup_share")
        )
    )
    top = (
        per_file.groupBy("repo", "_lang")
        .agg(F.count(F.lit(1)).alias("_n"))
        .groupBy("repo")
        .agg(F.max(F.struct("_n", "_lang")).alias("_m"))
        .select("repo", F.col("_m._lang").alias("top_lang"))
    )
    lic = repo_license(df, repo_col, path_col, content_col).select(
        "repo", "repo_license"
    )
    out = (
        agg.join(dup, "repo")
        .join(top, "repo")
        .join(F.broadcast(lic), "repo", "left")
    )
    return out.select(
        "repo",
        "n_files",
        "n_bytes",
        "n_langs",
        "top_lang",
        "test_share",
        "vendored_share",
        "dup_share",
        F.coalesce("repo_license", F.lit("NONE")).alias("repo_license"),
    )


def dataset_card(
    df: DataFrame,
    lang_col: str,
    repo_col: str,
    content_col: str,
) -> DataFrame:
    """Corpus datasheet ("datasheets for datasets", Gebru et al. 2021)
    at language grain: ``(lang, n_files, n_repos, n_chars, n_distinct,
    dup_frac, file_share, char_share)`` — the per-language composition
    table a training-mixture plan and a dataset card both start from.
    ``n_distinct`` is exact (md5 of content), so ``dup_frac`` is the
    true exact-dup load; shares are corpus-wide fractions, 6dp.

    Scale shape: NOT one groupBy with two countDistinct — Spark plans
    multiple distinct aggregates via EXPAND (every input row replicated
    once per distinct column: 3x the shuffle rows at corpus scale;
    measured 164s vs 75s at 64M).  Instead two explicit two-level
    aggregations: (lang, sha) -> lang carries count/sum up with the
    distinct count, (lang, repo) -> lang joins its repo count back on
    the lang-vocabulary frame.  Both first levels are map-side
    combinable and shuffle only their distinct keys; the join and the
    share window run over #lang rows.  NULL lang groups as 'unknown';
    NULL content hashes as ''."""
    from pyspark.sql import Window

    s = F.coalesce(F.col(content_col), F.lit(""))
    base = df.select(
        F.coalesce(F.col(lang_col), F.lit("unknown")).alias("lang"),
        F.col(repo_col).alias("_repo"),
        F.md5(s).alias("_sha"),
        F.length(s).alias("_len"),
    )
    by_sha = (
        base.groupBy("lang", "_sha")
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.sum("_len").alias("_chars"),
        )
        .groupBy("lang")
        .agg(
            F.sum("_n").alias("n_files"),
            F.sum("_chars").alias("n_chars"),
            F.count(F.lit(1)).alias("n_distinct"),
        )
    )
    by_repo = (
        base.groupBy("lang", "_repo")
        .agg(F.count(F.lit(1)).alias("_n"))
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_repos"))
    )
    agg = by_sha.join(by_repo, "lang").select(
        "lang", "n_files", "n_repos", "n_chars", "n_distinct"
    )
    w = Window.partitionBy()
    return agg.select(
        "lang",
        "n_files",
        "n_repos",
        "n_chars",
        "n_distinct",
        F.round(1 - F.col("n_distinct") / F.col("n_files"), 6).alias(
            "dup_frac"
        ),
        F.round(F.col("n_files") / F.sum("n_files").over(w), 6).alias(
            "file_share"
        ),
        F.round(F.col("n_chars") / F.sum("n_chars").over(w), 6).alias(
            "char_share"
        ),
    )
