"""Record linkage — cross-table fuzzy entity matching.

The classic MDM/entity-resolution join: rows of two tables match when a
noisy string key (name, address, title) is SIMILAR, not equal.  A naive
cross join is O(n·m); blocking makes it tractable: both sides compute
char-n-gram MinHash signatures, band them, and only rows sharing a
(band_id, band_hash) bucket across the two tables become candidates —
then the exact n-gram Jaccard verifies each candidate, so banding can
only cost recall (quantified by the S-curve), never precision.

Literally the same machinery as the near-dup tiers: the MinHash fold
and banding-key construction are dedup.py's
``minhash_signature_from_grams`` / ``band_cols_expr``, the degenerate
buckets cap via dedup's ``_cap_hot_buckets``, and the self-join simply
becomes an equi-join between the two tables' banded rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as X
from ._util import ensure_parallelism as _ensure_parallelism
from .dedup import _cap_hot_buckets, band_cols_expr, minhash_signatures_df


def _grams(key_col: str, n: int):
    # char_ngrams lowercases and dedupes already
    return X.char_ngrams(F.col(key_col), n)


def _banded(df: DataFrame, id_col: str, key_col: str, *,
            n: int, num_hashes: int, bands: int, side: str) -> DataFrame:
    """NARROW banded rows: (id, band_id, band_hash) only — shipping gram
    arrays through the ``bands``-way explode would multiply the shuffle
    payload (same note as dedup.minhash_lsh_candidates); the verify
    stage recomputes grams straight from the input instead."""
    base = minhash_signatures_df(
        _ensure_parallelism(df), id_col, _grams(key_col, n),
        num_hashes=num_hashes, out_id=f"id_{side}",
    )
    return base.select(
        f"id_{side}",
        F.explode(band_cols_expr("_sig", num_hashes, bands)).alias("_b"),
    ).select(f"id_{side}",
             F.col("_b.band_id").alias("band_id"),
             F.col("_b.band_hash").alias("band_hash"))


def fuzzy_match(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    right_id: str,
    left_col: str,
    right_col: str,
    *,
    n: int = 3,
    threshold: float = 0.6,
    num_hashes: int = 64,
    bands: int = 16,
    max_bucket_size: int | None = None,
    log_dropped: bool = True,
) -> DataFrame:
    """Cross-table fuzzy matches: (id_a from left, id_b from right,
    jaccard) for every pair whose char-n-gram Jaccard ≥ threshold that
    shares at least one MinHash band bucket.

    Recall: a true pair at similarity j is found with probability
    1-(1-j^r)^bands (r = num_hashes/bands); at the 64/16 default a
    j=0.85 pair is missed with probability ~2e-6.  Precision is exact
    (every candidate is verified).  r matters for COST, not just recall:
    a random cross pair at similarity j collides per band with
    probability j^r, so r=2 admits O(n·m·j²) junk candidates on
    low-entropy corpora (measured: 5.6M candidates for 300 true pairs) —
    r=4 cuts that to j⁴.

    NULL/empty keys never match (they'd otherwise all share the
    degenerate gram set and form a bipartite clique at jaccard 1.0).
    ``max_bucket_size`` excludes degenerate buckets per side, drops
    logged — same contract as the dedup tiers.
    """
    lf = left.filter(F.trim(F.coalesce(F.col(left_col), F.lit(""))) != "")
    rf = right.filter(F.trim(F.coalesce(F.col(right_col), F.lit(""))) != "")
    lb = _banded(lf, left_id, left_col,
                 n=n, num_hashes=num_hashes, bands=bands, side="a")
    rb = _banded(rf, right_id, right_col,
                 n=n, num_hashes=num_hashes, bands=bands, side="b")
    lb = _cap_hot_buckets(lb, ["band_id", "band_hash"], max_bucket_size,
                          what="fuzzy_match left", log_dropped=log_dropped)
    rb = _cap_hot_buckets(rb, ["band_id", "band_hash"], max_bucket_size,
                          what="fuzzy_match right", log_dropped=log_dropped)
    cands = lb.join(rb, ["band_id", "band_hash"]).select("id_a", "id_b").distinct()
    grams_a = lf.select(
        F.col(left_id).alias("id_a"), _grams(left_col, n).alias("_g_a"))
    grams_b = rf.select(
        F.col(right_id).alias("id_b"), _grams(right_col, n).alias("_g_b"))
    inter = F.size(F.array_intersect("_g_a", "_g_b"))
    union = F.size(F.array_union("_g_a", "_g_b"))
    return (
        cands.join(grams_a, "id_a").join(grams_b, "id_b")
        .withColumn("jaccard",
                    F.when(union > 0, inter / union).otherwise(F.lit(0.0)))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
