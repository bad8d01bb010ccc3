"""Web-corpus curation funnel — the composition of the post-2023
gates the way a FineWeb-class pipeline chains them:

    raw web docs (+ registered domain)
      -> synthetic-text gate       (functions/synthtext.py)
      -> word-list content gate    (functions/wordlist.py)
      -> n-gram saturation cap     (operators/saturation.py —
                                    memorization-risk soft dedup,
                                    computed on the SURVIVORS of the
                                    content gates, matching how the
                                    published pipelines order it)
      -> per-domain contribution cap (operators/groupcap.py)

Every stage is one of the tested operators; this module only wires
them and reports per-stage survivor counts.  The first two gates are
pure projections, so Spark sees them as ONE filter chain over the
scan; the saturation stage adds its three gram-grain shuffles over
the (already reduced) survivor set; the domain cap ranks only
over-cap domains.  Stage order is part of the contract — saturation
document frequencies are corpus-relative, so they are defined over
the post-gate corpus, and the domain cap runs last so capped domains
are not re-filled by later drops.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame

from ..functions.synthtext import filter_synthetic_text
from ..functions.wordlist import filter_blocked_terms
from .groupcap import cap_per_group
from .saturation import filter_saturated


@dataclass
class WebCurationReport:
    counts: dict = field(default_factory=dict)  # stage -> surviving rows


def curate_web(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    domain_col: str = "domain",
    blocked_terms: list[str],
    synth_kwargs: dict | None = None,
    saturation_k: int = 5,
    saturation_min_df: int = 2,
    max_saturation: float = 0.5,
    domain_cap: int = 20,
    report: WebCurationReport | None = None,
) -> DataFrame:
    """Survivors of the four-stage web funnel (all original columns).

    Pass a :class:`WebCurationReport` to ALSO collect per-stage
    survivor counts — counting forces each stage frame, so leave it
    None in production plans (one lazy plan end-to-end) and use it in
    audits."""
    s1 = filter_synthetic_text(docs, text_col, **(synth_kwargs or {}))
    s2 = filter_blocked_terms(s1, [id_col], text_col, blocked_terms)
    if report is not None:
        # audit mode: materialize the expensive stage boundaries so
        # the five counting actions (and the caller's own action on
        # the returned frame) do not re-run the upstream funnel —
        # saturation alone is 3 shuffles
        s2 = s2.localCheckpoint()
    s3 = filter_saturated(
        s2, id_col, text_col,
        k=saturation_k, min_df=saturation_min_df,
        max_saturation=max_saturation,
    )
    if report is not None:
        s3 = s3.localCheckpoint()
    out = cap_per_group(s3, domain_col, id_col, cap=domain_cap)
    if report is not None:
        report.counts["input"] = docs.count()
        report.counts["synthetic_text"] = s1.count()
        report.counts["blocked_terms"] = s2.count()
        report.counts["saturation"] = s3.count()
        out = out.localCheckpoint()
        report.counts["domain_cap"] = out.count()
    return out
