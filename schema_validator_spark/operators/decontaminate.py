"""Train/eval decontamination: flag training docs sharing word n-grams
with an evaluation set (the standard benchmark-leakage sweep).

Shape at scale: the eval side is small (benchmarks are thousands of
docs) — its distinct n-gram set broadcasts; the training side explodes
to (doc_id, gram) pairs that hash-join against the broadcast set, so
the 10^12-doc side is never shuffled.  With a huge eval set pass
``broadcast=False`` for a shuffled equi-join instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as X


def eval_ngram_set(eval_df: DataFrame, text_col: str, *, k: int = 8) -> DataFrame:
    """Distinct word k-grams of the evaluation corpus (one column: _g)."""
    return (
        eval_df.select(F.explode(X.word_shingles(F.col(text_col), k)).alias("_g"))
        .distinct()
    )


def ngram_contamination(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    k: int = 8,
    min_shared: int = 1,
    broadcast: bool = True,
) -> DataFrame:
    """(doc_id, n_shared_grams) for training docs with >= min_shared
    distinct k-grams found in the eval set."""
    grams = eval_ngram_set(eval_df, text_col, k=k)
    if broadcast:
        grams = F.broadcast(grams)
    train_grams = train.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(X.word_shingles(F.col(text_col), k))).alias("_g"),
    )
    return (
        train_grams.join(grams, on="_g")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared_grams"))
        .filter(F.col("n_shared_grams") >= min_shared)
    )


def decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    k: int = 8,
    min_shared: int = 1,
    broadcast: bool = True,
) -> DataFrame:
    """Training corpus minus contaminated docs (left_anti on the flags)."""
    flagged = ngram_contamination(
        train, eval_df, id_col, text_col,
        k=k, min_shared=min_shared, broadcast=broadcast,
    ).select(F.col("doc_id").alias(id_col))
    return train.join(flagged, on=id_col, how="left_anti")
