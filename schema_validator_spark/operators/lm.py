"""N-gram language-model perplexity scoring — the CCNet quality stage
(Wenzek et al. 2020): score every document by how surprising it is under
a reference-corpus LM, then keep the head/middle of the perplexity
distribution.  Real CCNet uses a KenLM 5-gram; this module implements
the same pipeline shape with an add-alpha-smoothed bigram word LM whose
tables are plain DataFrames — a production deployment swaps in an
exported KenLM table without touching the scoring plan.

Scale shape:

* **Training** (``train_bigram_lm``) is two word-count-shaped
  aggregations over the reference corpus (unigram and bigram counts),
  both map-side combined — the classic skew-safe shape; plus a 1-row
  vocab-size aggregate.  The reference corpus (wiki-scale) is orders of
  magnitude smaller than the corpus being scored.
* **Scoring** (``perplexity_scores``) explodes each doc into (prev,
  cur) bigram rows and joins the LM tables.  With ``broadcast_lm=True``
  (default — right for LMs up to ~10^7 n-grams) both joins are
  broadcast, so the corpus side never shuffles; the only wide exchange
  is the final per-doc mean.  For KenLM-scale tables, pass False and the
  joins become AQE-managed shuffle joins on the n-gram key.

Determinism: probabilities are exact rational arithmetic until the final
``ln``; the driver query compares mean NLL as a 6dp-scaled long, so the
DuckDB oracle replays training AND scoring bit-stably.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as X


@dataclass
class BigramLM:
    """LM tables: unigram counts (w, cug), bigram counts (prev, cur,
    cbg), and the 1-row vocab size (v) — all lazy DataFrames."""

    unigrams: DataFrame
    bigrams: DataFrame
    vocab: DataFrame  # single row: (v: long)


def _doc_bigrams(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, prev, cur) per adjacent token pair.  Tokens materialized
    into a column first — lambda bodies don't CSE with outer
    expressions (see CLAUDE.md), so never tokenize inside the
    transform."""
    toks = docs.withColumn(
        "_toks", X.tokens(F.coalesce(F.col(text_col), F.lit("")))
    )
    n = F.size(F.col("_toks"))
    pairs = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.struct(
                F.element_at(F.col("_toks"), i).alias("prev"),
                F.element_at(F.col("_toks"), i + 1).alias("cur"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<prev:string,cur:string>>"))
    return toks.select(
        F.col(id_col), F.explode(pairs).alias("_bg")
    ).select(id_col, F.col("_bg.prev").alias("prev"), F.col("_bg.cur").alias("cur"))


def train_bigram_lm(
    reference_docs: DataFrame, text_col: str, *, id_col: str = "doc_id"
) -> BigramLM:
    """Count-based bigram LM from a reference corpus (lazy: nothing runs
    until scoring)."""
    bg = _doc_bigrams(reference_docs, id_col, text_col)
    bigrams = bg.groupBy("prev", "cur").agg(F.count(F.lit(1)).alias("cbg"))
    toks = reference_docs.select(
        F.explode(X.tokens(F.coalesce(F.col(text_col), F.lit("")))).alias("w")
    )
    unigrams = toks.groupBy("w").agg(F.count(F.lit(1)).alias("cug"))
    vocab = unigrams.agg(F.count(F.lit(1)).alias("v"))
    return BigramLM(unigrams=unigrams, bigrams=bigrams, vocab=vocab)


def perplexity_scores(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    lm: BigramLM,
    *,
    alpha: float = 0.1,
    broadcast_lm: bool = True,
) -> DataFrame:
    """Per-document mean negative log-likelihood under the LM:

        p(cur | prev) = (c(prev,cur) + alpha) / (c(prev) + alpha * V)
        nll(doc)      = -mean(ln p)  over the doc's bigrams

    Unseen bigrams/words count 0 (pure add-alpha smoothing — no UNK
    remap, so the oracle is exact).  Docs with < 2 tokens have no
    bigrams and are absent from the output (mirrored by the oracle).
    Returns (id, n_bigrams, nll)."""
    maybe_b = F.broadcast if broadcast_lm else (lambda df: df)
    bg = _doc_bigrams(docs, id_col, text_col)
    joined = (
        bg.join(maybe_b(lm.bigrams), ["prev", "cur"], "left")
        .join(maybe_b(lm.unigrams.withColumnRenamed("w", "prev")), ["prev"], "left")
        .join(F.broadcast(lm.vocab))
    )
    p = (F.coalesce(F.col("cbg"), F.lit(0)) + F.lit(alpha)) / (
        F.coalesce(F.col("cug"), F.lit(0)) + F.lit(alpha) * F.col("v")
    )
    return joined.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        (-F.avg(F.log(p))).alias("nll"),
    )


def perplexity_filter(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    lm: BigramLM,
    *,
    max_nll: float,
    alpha: float = 0.1,
    broadcast_lm: bool = True,
) -> DataFrame:
    """Keep documents whose mean NLL is <= max_nll (CCNet head+middle
    cut).  Docs with < 2 tokens are dropped (unscorable)."""
    scores = perplexity_scores(
        docs, id_col, text_col, lm, alpha=alpha, broadcast_lm=broadcast_lm
    )
    keep = scores.filter(F.col("nll") <= max_nll).select(id_col)
    return docs.join(keep, id_col, "left_semi")
