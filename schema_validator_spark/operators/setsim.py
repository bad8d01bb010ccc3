"""EXACT set-similarity self-join via prefix filtering (PPJoin family,
Xiao et al. 2008) — the no-false-negative tier above MinHash-LSH.

dedup.minhash_lsh_candidates finds Jaccard >= t pairs with
P(miss) ~ (1 - t^r)^bands; this operator finds exactly ALL of them.
The prefix-filter lemma: order every document's distinct tokens by one
global order (rarest-first here); if |A ∩ B| / |A ∪ B| >= t, then A and
B must share at least one token among each one's first
``n - ceil(t*n) + 1`` tokens.  Candidates therefore come from an
equi-join on PREFIX tokens only — and because prefixes hold each
document's RAREST tokens, the join's buckets are small by construction
(the hot-token degenerate bucket that LSH needs a cap for cannot form:
a frequent token sorts out of every prefix unless the document is
almost all stop-words).

Scale shape: token frequency = one word-count agg; per-doc canonical
sort = collect_list + array_sort at doc-token scale; candidate join on
prefix tokens with the size filter ``t*na <= nb`` applied pre-verify;
exact verify joins token arrays by id for the (small) candidate set.
Every shuffle is word-count-shaped and map-side combined.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def setsim_join_exact(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    threshold: float,
) -> DataFrame:
    """All pairs with token-set Jaccard >= ``threshold``, EXACT:
    ``(id_a, id_b, jaccard)`` with ``id_a < id_b``, jaccard rounded 6dp
    before the threshold compare (engine-reproducible boundary).
    Tokens are whitespace-split distinct words of the trimmed text;
    empty-token documents are excluded."""
    if not 0 < threshold <= 1:
        raise ValueError("threshold must be in (0, 1]")
    toks = F.array_distinct(
        F.split(F.trim(F.coalesce(F.col(text_col), F.lit(""))), r"\s+")
    )
    base = df.select(F.col(id_col).alias("_id"), toks.alias("_toks")).filter(
        (F.size("_toks") > 0)
        & ~((F.size("_toks") == 1) & (F.element_at("_toks", 1) == ""))
    )
    doc_tok = base.select("_id", F.explode("_toks").alias("_t"))
    freq = doc_tok.groupBy("_t").agg(F.count(F.lit(1)).alias("_f"))
    per_doc = (
        doc_tok.join(freq, on="_t")
        .groupBy("_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("_f"), F.col("_t")))
            ).alias("_ord"),
            F.count(F.lit(1)).alias("_n"),
        )
        .select(
            "_id",
            "_n",
            F.transform(F.col("_ord"), lambda x: x["_t"]).alias("_sorted"),
        )
    )
    # prefix length: n - ceil(t*n) + 1 rarest tokens
    plen = (
        F.col("_n")
        - F.ceil(F.lit(threshold) * F.col("_n")).cast("long")
        + F.lit(1)
    )
    prefix = per_doc.select(
        "_id", "_n", F.explode(F.slice("_sorted", 1, plen)).alias("_t")
    )
    a, b = prefix.alias("a"), prefix.alias("b")
    cand = (
        a.join(b, on="_t")
        .filter(F.col("a._id") < F.col("b._id"))
        # size filter: jaccard >= t forces t*|A| <= |B| and t*|B| <= |A|
        .filter(
            (F.col("b._n") >= F.lit(threshold) * F.col("a._n"))
            & (F.col("a._n") >= F.lit(threshold) * F.col("b._n"))
        )
        .select(
            F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b")
        )
        .distinct()
    )
    ta = per_doc.select(
        F.col("_id").alias("id_a"), F.col("_sorted").alias("_ta"),
        F.col("_n").alias("_na"),
    )
    tb = per_doc.select(
        F.col("_id").alias("id_b"), F.col("_sorted").alias("_tb"),
        F.col("_n").alias("_nb"),
    )
    inter = F.size(F.array_intersect(F.col("_ta"), F.col("_tb")))
    jac = F.round(
        inter.cast("double") / (F.col("_na") + F.col("_nb") - inter), 6
    )
    return (
        cand.join(ta, on="id_a")
        .join(tb, on="id_b")
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
