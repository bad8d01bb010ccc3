"""End-to-end CODE-corpus curation funnel — the composition the
code-table operator pack exists for (the source-code counterpart of
operators/curate.py's text funnel; The Stack's published pipeline
shape, Kocetkov et al. 2022 §3):

    raw (repo, path, lang, content) files
      -> path classification (keep ``source``: drop vendored/
         generated/test/docs/config BEFORE touching content)
      -> encoding hygiene (drop control-char / mojibake / mixed-
         line-ending files)
      -> code quality gate (The Stack filters, integer-exact keep)
      -> license gate (file-level marker verdict in an allowlist)
      -> secret quarantine (any credential pattern -> drop)
      -> exact dedup on sha256(content) — the north rule's row
         invariant — keeping the (repo, path)-minimal copy

Every stage is one of the tested operators; this module only wires
them.  Scale notes: stages 1-5 are pure codegen filters that compose
into ONE scan (the stats passes carry the caller's columns through
``keep_cols`` so no join is ever needed); the ONLY shuffle in the
whole funnel is the final dedup groupBy, and its survivor selection is
a map-side-combinable ``min(struct(...))`` — no window, no hot
reducer.  Pass a ``CurationReport`` to also collect per-stage counts
(that materializes each stage once — audits, not production runs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .codequality import code_quality, encoding_stats
from .curate import CurationReport
from .licenses import detect_license
from .pathclass import SOURCE, classify_paths
from .secrets import has_secret

#: license verdicts a permissive-only corpus keeps (The Stack's gate;
#: NONE = no marker and no copyright line — plain source files)
DEFAULT_ALLOWED_LICENSES = ("MIT", "Apache-2.0", "BSD", "Unlicense", "NONE")

_ENC_STATS = [
    "n_chars", "n_control", "has_bom", "n_replacement", "n_crlf",
    "n_lone_lf", "n_lone_cr", "line_ending",
]
_CQ_STATS = [
    "n_chars", "n_lines", "max_line_len", "avg_line_len", "alnum_frac",
    "alpha_frac", "autogen", "ends_newline", "bracket_balance", "keep",
]


def curate_code(
    df: DataFrame,
    *,
    repo_col: str = "repo",
    path_col: str = "path",
    content_col: str = "content",
    allowed_licenses: tuple[str, ...] = DEFAULT_ALLOWED_LICENSES,
    quality_kwargs: dict | None = None,
    report: CurationReport | None = None,
) -> DataFrame:
    """Return the curated code corpus: the caller's columns plus
    ``content_sha`` (sha256 hex of content, the row invariant the
    dedup keyed on).  Lazily composed; caller writes it."""
    reserved = set(_ENC_STATS) | set(_CQ_STATS) | {
        "_pc", "_lic", "content_sha",
    }
    clash = sorted(reserved & set(df.columns))
    if clash:
        raise ValueError(
            "curate_code reserves these column names for its stage "
            f"outputs; rename the input columns: {clash}"
        )
    track = report is not None

    def stage(name: str, d: DataFrame) -> DataFrame:
        if track:
            report.counts[name] = d.count()
        return d

    cols = df.columns
    out = stage("input", df)

    # 1. path classification — cheapest filter first (metadata only)
    out = stage(
        "path",
        classify_paths(out, path_col, out_col="_pc")
        .filter(F.col("_pc") == SOURCE)
        .drop("_pc"),
    )

    # 2. encoding hygiene (stats carry all caller columns -> no join)
    enc = encoding_stats(out, content_col, keep_cols=cols)
    out = stage(
        "encoding",
        enc.filter(
            (F.col("n_control") == 0)
            & (F.col("n_replacement") == 0)
            & (F.col("line_ending") != "mixed")
        ).drop(*_ENC_STATS),
    )

    # 3. The Stack quality gate (integer-exact keep)
    cq = code_quality(out, content_col, keep_cols=cols,
                      **(quality_kwargs or {}))
    out = stage("quality", cq.filter(F.col("keep")).drop(*_CQ_STATS))

    # 4. file-level license allowlist
    out = stage(
        "license",
        detect_license(out, content_col, out_col="_lic")
        .filter(F.col("_lic").isin(*allowed_licenses))
        .drop("_lic"),
    )

    # 5. credential quarantine
    out = stage("secrets", out.filter(~has_secret(content_col)))

    # 6. exact dedup on the sha256 row invariant; survivor = the
    # (repo, path)-minimal copy via map-side-combinable min(struct)
    ordered = [repo_col, path_col] + [
        c for c in cols if c not in (repo_col, path_col)
    ]
    sha = F.sha2(F.col(content_col), 256)
    survivors = (
        out.select(sha.alias("content_sha"), F.struct(*ordered).alias("_r"))
        .groupBy("content_sha")
        .agg(F.min("_r").alias("_r"))
        .select([F.col(f"_r.{c}").alias(c) for c in ordered]
                + [F.col("content_sha")])
        .select(*cols, "content_sha")
    )
    return stage("dedup", survivors)


#: verdict vocabulary, funnel order (first failing stage wins)
VERDICTS = (
    "path", "encoding", "quality", "license", "secrets", "duplicate",
    "kept",
)


def curation_verdicts(
    df: DataFrame,
    *,
    repo_col: str = "repo",
    path_col: str = "path",
    content_col: str = "content",
    allowed_licenses: tuple[str, ...] = DEFAULT_ALLOWED_LICENSES,
    quality_kwargs: dict | None = None,
) -> DataFrame:
    """Row-level drop attribution for the ``curate_code`` funnel: the
    caller's columns plus ``verdict`` — the FIRST stage that rejects
    the file (``path``/``encoding``/``quality``/``license``/
    ``secrets``/``duplicate``) or ``kept``.  The DISTINCT ``kept``
    rows are exactly ``curate_code``'s survivor set (same predicates,
    same min-struct survivor rule — single-sourced through the same
    operators).  Exact FULL-ROW duplicates (identical in every caller
    column) are indistinguishable rows, so every copy of the surviving
    row is labeled ``kept`` — curate_code emits that row once;
    histogram consumers comparing against its output should count kept
    rows distinct.  The oracle mirrors this min-row-equality rule.

    This is the funnel's observability surface: a ``CurationReport``
    costs one materialization PER STAGE (7 count jobs); this computes
    every per-file reason — and the whole funnel histogram via one
    further tiny groupBy — in ONE scan plus the dedup-shaped shuffle.
    Stage flags 1-5 ride the scan in pure codegen; ``duplicate`` needs
    the sha-grain survivor dim joined back (key-scale, null-safe), the
    same shape as type2_clone_members."""
    reserved = set(_ENC_STATS) | set(_CQ_STATS) | {
        "_pc", "_lic", "_encfail", "_cqkeep", "_v", "_r", "_sha",
        "content_sha", "verdict",
    }
    clash = sorted(reserved & set(df.columns))
    if clash:
        raise ValueError(
            "curation_verdicts reserves these column names; rename "
            f"the input columns: {clash}"
        )
    cols = df.columns
    out = classify_paths(df, path_col, out_col="_pc")
    out = encoding_stats(
        out, content_col, keep_cols=cols + ["_pc"]
    ).withColumn(
        "_encfail",
        (F.col("n_control") > 0)
        | (F.col("n_replacement") > 0)
        | (F.col("line_ending") == "mixed"),
    ).drop(*_ENC_STATS)
    out = code_quality(
        out, content_col, keep_cols=cols + ["_pc", "_encfail"],
        **(quality_kwargs or {}),
    ).withColumn("_cqkeep", F.col("keep")).drop(*_CQ_STATS)
    out = detect_license(out, content_col, out_col="_lic")
    pre = (
        F.when(F.col("_pc") != SOURCE, F.lit("path"))
        .when(F.col("_encfail"), F.lit("encoding"))
        .when(~F.col("_cqkeep"), F.lit("quality"))
        .when(~F.col("_lic").isin(*allowed_licenses), F.lit("license"))
        .when(has_secret(content_col), F.lit("secrets"))
    )
    # survivor comparison struct: curate_code orders by [repo, path,
    # other cols] — but rows sharing a sha share the CONTENT by
    # construction, so content never breaks a tie and is excluded
    # here: the survivor dim then shuffles (sha + small id cols), not
    # file bodies, which matters in the common mostly-unique corpus
    # where the dim is corpus-sized
    ordered = [repo_col, path_col] + [
        c for c in cols if c not in (repo_col, path_col, content_col)
    ]
    fact = out.select(
        *cols,
        F.sha2(F.col(content_col), 256).alias("content_sha"),
        pre.alias("_v"),
    )
    surv = (
        fact.filter(F.col("_v").isNull())
        .groupBy("content_sha")
        .agg(F.min(F.struct(*ordered)).alias("_r"))
    )
    j = fact.join(
        surv.withColumnRenamed("content_sha", "_sha"),
        F.col("content_sha").eqNullSafe(F.col("_sha")),
        "left",
    )
    verdict = F.coalesce(
        F.col("_v"),
        F.when(
            F.struct(*[F.col(c) for c in ordered]).eqNullSafe(F.col("_r")),
            F.lit("kept"),
        ).otherwise(F.lit("duplicate")),
    )
    return j.select(*cols, verdict.alias("verdict"))
