"""End-to-end training-data curation pipeline — the composition the
individual operators exist for:

    raw docs
      -> constraint validation (drop rows with violations)
      -> [optional] C4-style line cleanup (operators/clean.py)
      -> quality + language filters (functions/text.py scores)
      -> [optional] Gopher/MassiveText repetition+shape gate (functions/gopher.py)
      -> [optional] fastText-style classifier gate (functions/classifier.py)
      -> exact dedup (fingerprint clusters, keep best quality)
      -> near-dup dedup (MinHash LSH pairs -> components -> keep best)
      -> stratified sample / train-eval split

Every stage is one of the tested operators; this module only wires them
and reports per-stage row counts (the curation funnel).  Scale notes:
stages are lazily composed — Spark sees ONE plan, so column pruning and
filter pushdown cross stage boundaries; the only shuffles are the dedup
groupBys/joins and the final sample's per-stratum window.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..engine import FAILS_COL, ValidationEngine
from ..functions import text as X
from . import dedup, sampling


@dataclass
class CurationReport:
    counts: dict = field(default_factory=dict)  # stage -> rows surviving


def curate(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    spec: dict | None = None,
    min_quality: float = 0.5,
    gopher_gate: dict | None = None,
    classifier_threshold: float | None = None,
    classifier_seed: str = "qc-v1",
    clean: bool = False,
    allowed_langs: list[str] | None = None,
    near_dup_threshold: float = 0.8,
    sample_per_stratum: int | None = None,
    strata_cols: list[str] | None = None,
    report: CurationReport | None = None,
) -> DataFrame:
    """Return the curated corpus (lazily composed; caller writes it).

    Pass a ``CurationReport`` to also collect the per-stage funnel —
    that materializes each stage once, so use it on samples/audits, not
    on the full production run.
    """
    track = report is not None

    def stage(name: str, df: DataFrame) -> DataFrame:
        if track:
            report.counts[name] = df.count()
        return df

    out = stage("input", docs)

    if spec:
        eng = ValidationEngine(spec, key_cols=[id_col])
        out = stage(
            "valid",
            eng.annotate(out).filter(F.size(F.col(FAILS_COL)) == 0).drop(FAILS_COL),
        )

    if clean:
        # C4-style line cleanup BEFORE scoring.  Computed on a pruned
        # (id, text) frame and joined back so the stage can never clobber
        # user columns that happen to share the audit-column names.
        from . import clean as C

        cleaned = C.clean_documents(
            out.select(id_col, text_col), text_col, out_col="_cleaned"
        ).select(id_col, F.col("_cleaned").alias(text_col))
        out = stage("clean", out.drop(text_col).join(cleaned, on=id_col))

    out = out.withColumn("_quality", X.quality_score(F.col(text_col)))
    out = stage("quality", out.filter(F.col("_quality") >= min_quality))

    if gopher_gate is not None:
        # Gopher/MassiveText repetition + shape gate (thresholds overridable
        # via the dict, e.g. {"min_tokens": 10}).  Metrics run on a pruned
        # frame; survivors semi-join back — no metric-column collisions.
        from ..functions import gopher as G

        keep_ids = (
            G.gopher_metrics(out.select(id_col, text_col), text_col)
            .filter(G.gopher_keep(**gopher_gate))
            .select(id_col)
        )
        out = stage("gopher", out.join(keep_ids, on=id_col, how="left_semi"))

    if classifier_threshold is not None:
        # fastText-style learned-classifier stage (functions/classifier.py):
        # a pure per-row expression, so it fuses into the same scan as the
        # heuristic gates above — no join, no shuffle.
        from ..functions import classifier as QC

        out = stage(
            "classifier",
            QC.classify_documents(out, text_col, seed=classifier_seed)
            .filter(F.col("qc_score") >= classifier_threshold)
            .drop("qc_score"),
        )

    if allowed_langs:
        out = stage(
            "lang",
            out.withColumn("_lid", X.lang_id(F.col(text_col)))
            .filter(F.col("_lid").isin(*allowed_langs))
            .drop("_lid"),
        )

    # exact tier: fingerprint clusters, keep best quality
    fp_groups = dedup.fingerprint_duplicates(out, id_col, text_col)
    fp_pairs = fp_groups.select(
        F.element_at("doc_ids", 1).alias("id_a"),
        F.explode(F.slice("doc_ids", 2, F.size("doc_ids") - 1)).alias("id_b"),
    )
    # near-dup tier on top of the exact pairs
    lsh_pairs = dedup.minhash_lsh_candidates(
        out.select(id_col, text_col), id_col, text_col,
        jaccard_threshold=near_dup_threshold,
    ).select("id_a", "id_b")
    clusters = dedup.cluster_pairs(fp_pairs.unionByName(lsh_pairs))
    out = stage(
        "dedup",
        dedup.dedup_keep_best(out, clusters, id_col, score_col="_quality"),
    )

    if sample_per_stratum and strata_cols:
        out = stage(
            "sample",
            sampling.stratified_sample_exact(
                out, strata_cols, id_col, sample_per_stratum
            ),
        )
    return out.drop("_quality")
