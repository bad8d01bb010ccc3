"""Winnowing document fingerprints (Schleimer, Wilkerson, Aiken —
SIGMOD 2003; the MOSS code-plagiarism algorithm) — LOCAL similarity
fingerprints with a positional guarantee MinHash cannot give: any
common substring of length >= window + k - 1 between two documents is
GUARANTEED to produce at least one shared fingerprint.  MinHash bounds
the probability of missing a globally-similar pair; winnowing detects
every sufficiently long exact match (vendored functions, copied
license blocks, cloned code regions) even between otherwise-dissimilar
documents.

Algorithm: normalize (lowercase, strip all whitespace — MOSS's
noise-insensitivity step), hash every k-gram (md5-prefix → bigint, the
repo's portable deterministic hash), slide a window of ``window``
consecutive k-gram hashes and keep the window minimum (leftmost on
ties — any deterministic tie-break preserves the guarantee), dedupe
selected (position, hash) picks.  Expected density is 2/(window+1)
fingerprints per k-gram.

Scale shape: fingerprint selection is ONE narrow per-row projection —
the k-gram hash array is materialized ONCE as a column (the lambda-CSE
pitfall: inlining it into the window expression would re-hash every
gram ``window`` times), then windows slice it.  Candidate pairing
joins on fingerprint hash; boilerplate fingerprints form hot buckets,
capped + logged like every LSH tier.  Shared-count aggregation is
pair-scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ._util import ensure_parallelism
from .dedup import _cap_hot_buckets

#: md5-prefix hash of a k-gram starting at 1-based position i (SQL).
_GRAM_HASH = "cast(conv(substring(md5(substring(_norm, i, {k})), 1, 12), 16, 10) as bigint)"


def _fingerprint_frame(
    df: DataFrame, id_col: str, text_col: str, *, k: int, window: int
) -> DataFrame:
    """(_id, fp, pos): selected winnowing fingerprints per document.
    Documents whose normalized text is shorter than ``k`` are excluded
    (no k-grams to fingerprint)."""
    if k < 2 or window < 1:
        raise ValueError("need k >= 2 and window >= 1")
    norm = F.regexp_replace(
        F.lower(F.coalesce(F.col(text_col), F.lit(""))), r"\s+", ""
    )
    base = (
        ensure_parallelism(
            df.select(F.col(id_col).alias("_id"), norm.alias("_norm"))
        )
        .filter(F.length("_norm") >= k)
        # materialize the gram-hash array ONCE (CSE does not reach into
        # lambda bodies — see functions/classifier.py history)
        .withColumn(
            "_gh",
            F.expr(
                "transform(sequence(1, length(_norm) - {k} + 1),"
                " i -> {h})".format(k=k, h=_GRAM_HASH.format(k=k))
            ),
        )
    )
    # window starts 1..max(n-w+1, 1); slice truncates at the tail, so a
    # doc shorter than one window still yields its global-min fingerprint.
    # Slice and min are each computed ONCE per window (CSE never reaches
    # into lambda bodies): materialize the window arrays, then their
    # mins, then zip the two with the start index.
    base = base.withColumn(
        "_wins",
        F.expr(
            "transform(sequence(1, greatest(size(_gh) - {w} + 1, 1)),"
            " j -> slice(_gh, j, {w}))".format(w=window)
        ),
    )
    picks = F.expr(
        "array_distinct(zip_with("
        "  transform(_wins, w -> array_min(w)),"
        "  sequence(1, size(_wins)),"
        "  (m, j) -> named_struct("
        "    'pos', j - 1 + array_position(element_at(_wins, j), m),"
        "    'fp', m)))"
    )
    return base.select("_id", F.explode(picks).alias("_p")).select(
        "_id",
        F.col("_p.fp").alias("fp"),
        F.col("_p.pos").cast("long").alias("pos"),
    )


def winnow_fingerprints(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    k: int = 7,
    window: int = 8,
) -> DataFrame:
    """``(doc_id, fp, pos)`` — the selected fingerprints with their
    1-based k-gram positions in the normalized text."""
    out = _fingerprint_frame(df, id_col, text_col, k=k, window=window)
    return out.withColumnRenamed("_id", "doc_id")


def winnow_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    k: int = 7,
    window: int = 8,
    min_shared: int = 1,
    max_bucket_size: int | None = None,
    log_dropped: bool = True,
) -> DataFrame:
    """``(id_a, id_b, shared_fps)`` with ``id_a < id_b`` — document
    pairs sharing at least ``min_shared`` DISTINCT fingerprint hashes.
    Guarantee (cap off): any pair with a common normalized substring of
    length >= ``window + k - 1`` appears (min_shared=1).
    ``max_bucket_size`` drops fingerprints shared by more documents
    than that (boilerplate), with a logged drop count."""
    if min_shared < 1:
        raise ValueError("min_shared must be >= 1")
    fps = _fingerprint_frame(
        df, id_col, text_col, k=k, window=window
    ).select("_id", "fp").distinct()
    fps = _cap_hot_buckets(
        fps, ["fp"], max_bucket_size,
        what="winnow_pairs", log_dropped=log_dropped,
    )
    a, b = fps.alias("a"), fps.alias("b")
    return (
        a.join(b, on="fp")
        .filter(F.col("a._id") < F.col("b._id"))
        .groupBy(
            F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b")
        )
        .agg(F.count(F.lit(1)).alias("shared_fps"))
        .filter(F.col("shared_fps") >= min_shared)
    )
