"""Unicode text normalization — the ingest-time canonicalization
stage every multilingual corpus needs BEFORE dedup and hashing:
byte-different but render-identical strings (NFC vs NFD accents,
curly vs straight quotes, NBSP vs space) otherwise defeat exact
dedup, sha-based lineage, and token-count comparability.  CCNet and
OSCAR normalize before hashing for exactly this reason; the engine's
sha256 row invariant makes it load-bearing here.

Two tiers, composed punctuation-first so the plan order is
replayable:

1. **Punctuation/whitespace unification — pure codegen**: curly
   single/double quotes -> ASCII quotes, en/em/horizontal-bar dashes
   -> ``-``, NBSP/narrow-NBSP -> space, zero-width+BOM characters
   removed, CRLF/CR -> LF.  One ``translate`` (1:1 maps) + one
   ``regexp_replace`` (deletions) + one for line endings.
2. **NFC composition — Arrow-batched Python** (``mapInPandas``):
   Unicode composition needs the UCD tables; Spark SQL has no
   normalizer, so this is the documented vectorized-Python tier (same
   rule as sketch/multimodal/ANN: Arrow batches, never per-row UDF).
   Rows whose post-punctuation text ``str.isascii()`` (a C check)
   skip the table lookup entirely — on mostly-ASCII corpora the
   Python stage is a near-no-op pass-through.

Reference anchor: canonicalize-before-compare mirrors the reference's
coercion layer (schema-validator value coercion before rule
evaluation); part of the engine-extension surface SURVEY §2.9
mandates.  The DuckDB oracle replays tier 1 with the same literal
maps and tier 2 with DuckDB's own ``nfc_normalize`` — two independent
UCD implementations agreeing on the planted stripes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: 1:1 character unifications (translate) — order-free by definition
PUNCT_MAP = {
    "‘": "'",   # left single curly
    "’": "'",   # right single curly
    "“": '"',   # left double curly
    "”": '"',   # right double curly
    "–": "-",   # en dash
    "—": "-",   # em dash
    "―": "-",   # horizontal bar
    " ": " ",   # NBSP
    " ": " ",   # narrow NBSP
}

#: characters deleted outright (regexp_replace with a char class)
ZW_DELETE = "​‌‍﻿"


def punct_normalize(col: Column) -> Column:
    """Tier 1 only (codegen): quotes/dashes/spaces unified, zero-width
    removed, CRLF and bare CR -> LF."""
    src = "".join(PUNCT_MAP)
    dst = "".join(PUNCT_MAP.values())
    out = F.translate(col, src, dst)
    out = F.regexp_replace(out, f"[{ZW_DELETE}]", "")
    return F.regexp_replace(out, "\r\n|\r", "\n")


def normalize_text(
    df: DataFrame,
    id_cols: list[str],
    text_col: str,
) -> DataFrame:
    """``(ids..., text_norm, changed, n_chars_before, n_chars_after)``
    — ``changed = 1`` iff normalization altered the string.  NULL text
    stays NULL (changed 0, lengths 0)."""
    for c in ("_t1", "_t2"):
        if c in df.columns:
            raise ValueError(f"reserved temp column {c!r} present in input")
    # only the punct-normalized column rides INTO Python alongside the
    # originals, and only the NFC result rides back OUT — shipping a
    # copy of the raw text both directions would double the Arrow
    # transfer volume of the heaviest column for no reason
    staged = df.withColumn("_t1", punct_normalize(F.col(text_col)))
    out_fields = [f"{f.name} {f.dataType.simpleString()}"
                  for f in df.schema.fields]
    out_schema = ", ".join(out_fields + ["_t2 string"])

    def batches(it):
        import unicodedata

        def nfc(s):
            if s is None:
                return None
            if s.isascii():
                return s
            return unicodedata.normalize("NFC", s)

        for pdf in it:
            yield pdf.assign(_t2=pdf["_t1"].map(nfc)).drop(
                columns=["_t1"]
            )

    normed = staged.mapInPandas(batches, schema=out_schema)
    t0, t2 = F.col(text_col), F.col("_t2")
    return normed.select(
        *[F.col(c) for c in id_cols],
        t2.alias("text_norm"),
        F.when(t0.isNull() | (t0 == t2), F.lit(0))
        .otherwise(F.lit(1)).alias("changed"),
        F.coalesce(F.length(t0), F.lit(0)).alias("n_chars_before"),
        F.coalesce(F.length(t2), F.lit(0)).alias("n_chars_after"),
    )
