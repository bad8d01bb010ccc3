"""Per-document n-gram saturation — the memorization-risk score
between doc-level dedup and span-level dedup: what FRACTION of a
document's distinct word k-grams is corpus-common (appears in >=
``min_df`` documents)?  Near-1.0 means the doc is assembled from
boilerplate the model will see many times (high memorization
pressure, low marginal value); the score drives soft down-sampling
where hard span removal (dedup.remove_repeated_spans) would mangle
text.  The same doc-frequency frame is the corpus-level commonness
histogram (Lee et al. 2021 report exactly this tail).

Scale shape: (doc, distinct-gram) pairs explode once; gram document
frequency is ONE map-side-combinable count over them (per-doc-distinct
grams make count(*) = document frequency, no countDistinct EXPAND —
CLAUDE.md); the score join is gram-grain equi (hot boilerplate grams
skew its partitions — AQE skew-join splits them), and the final
per-doc rollup shuffles doc-grain rows.  Three shuffles total; the
corpus text itself is scanned once per consumer of the pair frame
(two scans), never collected.

Empty/short docs never vanish: an array shorter than k yields ONE
shingle joining all its tokens (functions/text.array_shingles), so
two empty docs share the ``''`` gram — consistent with exact-dedup
semantics (identical empties ARE duplicates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as X


def gram_doc_frequency(
    df: DataFrame, text_col: str, *, k: int = 5
) -> DataFrame:
    """Corpus document-frequency per distinct word k-gram:
    ``(_g, doc_freq)``.  Grams are per-doc distinct, so a plain
    count(*) IS the document frequency (map-side combinable)."""
    pairs = df.select(
        F.explode(X.word_shingles(F.col(text_col), k)).alias("_g")
    )
    return pairs.groupBy("_g").agg(
        F.count(F.lit(1)).cast("long").alias("doc_freq")
    )


def ngram_saturation(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    k: int = 5,
    min_df: int = 2,
) -> DataFrame:
    """Per-doc commonness score: ``(id_col, n_grams, n_common,
    saturation)`` where ``n_grams`` = the doc's distinct word k-grams,
    ``n_common`` = how many of them appear in >= ``min_df`` docs
    corpus-wide (the doc itself counts — min_df=2 means 'at least one
    OTHER doc'), ``saturation = round(n_common / n_grams, 6)``."""
    if min_df < 1:
        raise ValueError("min_df must be >= 1")
    if id_col == "_g" or text_col == "_g":
        raise ValueError("'_g' is reserved")
    pairs = df.select(
        F.col(id_col),
        F.explode(X.word_shingles(F.col(text_col), k)).alias("_g"),
    )
    dfreq = pairs.groupBy("_g").agg(
        F.count(F.lit(1)).cast("long").alias("_df")
    )
    return (
        pairs.join(dfreq, on="_g")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_grams"),
            F.sum((F.col("_df") >= min_df).cast("long")).alias("n_common"),
        )
        .select(
            id_col,
            "n_grams",
            "n_common",
            F.round(F.col("n_common") / F.col("n_grams"), 6).alias(
                "saturation"
            ),
        )
    )


def filter_saturated(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    k: int = 5,
    min_df: int = 2,
    max_saturation: float = 0.8,
) -> DataFrame:
    """Gate form: rows whose saturation STRICTLY exceeds
    ``max_saturation`` are dropped (all original columns preserved).
    The comparison is integer cross-multiply on the counts —
    ``n_common * 1e6 > round(max_saturation * 1e6) * n_grams`` — so no
    float boundary and no dependence on the rounded score."""
    scaled = int(round(max_saturation * 1e6))
    stats = ngram_saturation(df, id_col, text_col, k=k, min_df=min_df)
    flagged = stats.filter(
        F.col("n_common") * F.lit(1000000).cast("long")
        > F.lit(scaled).cast("long") * F.col("n_grams")
    ).select(id_col)
    return df.join(flagged, on=id_col, how="left_anti")
