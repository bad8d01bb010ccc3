"""Fill-in-the-middle (FIM) transformation — the standard code-LLM
training-data augmentation (Bavarian et al. 2022, "Efficient Training
of Language Models to Fill in the Middle"; applied by SantaCoder /
StarCoder / DeepSeek-Coder): a deterministic fraction of documents is
re-serialized as ``prefix ⊕ suffix ⊕ middle`` with sentinel tokens so
the model learns infilling alongside left-to-right generation.

Reference anchor: the reference validates per-record fields only
(schema-validator rule/*.go); FIM is part of the engine-extension
surface SURVEY §2.9 mandates for the north rule's code table — the
training-pipeline transform stage that follows curation.

Determinism: everything derives from ``md5(id ‖ salt ‖ tag)`` with
INTEGER-only arithmetic (hex-prefix → bigint → pmod) — no floats, so
any engine replaying the recipe reproduces the split byte-exactly
(same discipline as packing.assign_shards' md5 rank).  The document
rate gate, the two cut points, and the PSM/SPM mode choice each use an
independent tag, so they are mutually independent uniform draws.

Scale shape: pure codegen — zero shuffles, zero UDFs, zero joins; the
transform rides the scan projection.  At 100 TB this is a map-only
stage that pipelines into whatever sink or packer follows (FIM is the
canonical pre-``pack_sequences`` step).  Character-based ``substring``
on both engines keeps multi-byte content safe.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: standard FIM sentinel tokens (SantaCoder / StarCoder vocabulary)
PREFIX_TOK = "<fim_prefix>"
MIDDLE_TOK = "<fim_middle>"
SUFFIX_TOK = "<fim_suffix>"

#: ppm denominator for the integer rate gates
_PPM = 1_000_000


def _h(id_str: Column, salt: str, tag: str) -> Column:
    """Deterministic uniform draw in [0, 2^32): first 8 md5 hex chars
    of ``id ‖ salt ‖ tag`` as an integer (DuckDB replay:
    ``('0x' || substr(md5(...), 1, 8))::bigint``)."""
    return F.conv(
        F.substring(F.md5(F.concat(id_str, F.lit(salt), F.lit(tag))), 1, 8),
        16,
        10,
    ).cast("bigint")


def fim_transform(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    rate: float = 0.5,
    spm_rate: float = 0.5,
    salt: str = "fim-v1",
    prefix_tok: str = PREFIX_TOK,
    middle_tok: str = MIDDLE_TOK,
    suffix_tok: str = SUFFIX_TOK,
    out_col: str = "fim_text",
) -> DataFrame:
    """Adds ``fim_mode`` ('psm' | 'spm' | 'none') and ``out_col``.

    A document transforms iff ``h(id,'-apply') % 1e6 < rate·1e6``.
    Two independent draws mod ``len+1`` give the cut points (sorted, so
    0 ≤ c1 ≤ c2 ≤ len; empty middle/prefix/suffix are legal and the
    paper keeps them).  PSM emits ``<fim_prefix>P<fim_suffix>S
    <fim_middle>M``; SPM (chosen per-doc at ``spm_rate`` among
    transformed docs) swaps the context order to ``<fim_suffix>S
    <fim_prefix>P<fim_middle>M``.  NULL text passes through as mode
    'none' with NULL output.  Character (not byte) splits on purpose:
    both Spark and DuckDB ``substring`` count characters, and splitting
    inside a multi-byte codepoint would corrupt the sample.
    """
    if not 0.0 <= rate <= 1.0 or not 0.0 <= spm_rate <= 1.0:
        raise ValueError("rate and spm_rate must be in [0, 1]")
    sid = F.col(id_col).cast("string")
    text = F.col(text_col)
    ln = F.length(text)

    applied = F.pmod(_h(sid, salt, "-apply"), F.lit(_PPM)) < int(rate * _PPM)
    spm = F.pmod(_h(sid, salt, "-mode"), F.lit(_PPM)) < int(spm_rate * _PPM)
    c_a = F.pmod(_h(sid, salt, "-a"), ln + 1)
    c_b = F.pmod(_h(sid, salt, "-b"), ln + 1)
    c1 = F.least(c_a, c_b)
    c2 = F.greatest(c_a, c_b)

    prefix = F.substring(text, F.lit(1), c1)
    middle = F.substring(text, c1 + 1, c2 - c1)
    suffix = F.substring(text, c2 + 1, ln - c2)

    psm_text = F.concat(
        F.lit(prefix_tok), prefix, F.lit(suffix_tok), suffix,
        F.lit(middle_tok), middle,
    )
    spm_text = F.concat(
        F.lit(suffix_tok), suffix, F.lit(prefix_tok), prefix,
        F.lit(middle_tok), middle,
    )

    mode = (
        F.when(text.isNull() | ~applied, F.lit("none"))
        .when(spm, F.lit("spm"))
        .otherwise(F.lit("psm"))
    )
    out = (
        F.when(text.isNull() | ~applied, text)
        .when(spm, spm_text)
        .otherwise(psm_text)
    )
    return df.withColumn("fim_mode", mode).withColumn(out_col, out)
