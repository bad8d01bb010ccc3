"""Train/eval decontamination: flag training docs sharing word n-grams
with an evaluation set (the standard benchmark-leakage sweep), plus
the CODE variant over type-2 normal forms (identifier/literal-blind),
which catches the renamed benchmark solution raw-text n-grams and
every sha tier miss.

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
from .clones import normalize_type2


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


def code_eval_gram_set(
    eval_df: DataFrame,
    content_col: str,
    lang_col: str,
    *,
    k: int = 6,
    syntax: dict[str, tuple[str, str | None]] | None = None,
) -> DataFrame:
    """Distinct token k-grams of the eval set's TYPE-2 NORMAL FORMS
    (one column: ``_g``).  Comment-only / empty files contribute
    nothing."""
    norm = normalize_type2(content_col, lang_col, syntax=syntax)
    # No length(_norm) filter: PushDownPredicate would inline the full
    # normalization chain into the filter conjunct below the Project and
    # codegen never CSEs across operators (CLAUDE.md), doubling the
    # dominant per-row cost.  An empty norm shingles to [''] (see
    # array_shingles), so dropping the '' gram AFTER the explode is
    # exactly equivalent and costs one cheap string compare per gram.
    return (
        eval_df.select(norm.alias("_norm"))
        .select(F.explode(X.word_shingles(F.col("_norm"), k)).alias("_g"))
        .filter(F.col("_g") != "")
        .distinct()
    )


def code_contamination(
    train: DataFrame,
    eval_df: DataFrame,
    id_cols: list[str],
    content_col: str = "content",
    lang_col: str = "lang",
    *,
    k: int = 6,
    min_shared: int = 1,
    broadcast: bool = True,
    syntax: dict[str, tuple[str, str | None]] | None = None,
) -> DataFrame:
    """Benchmark-decontamination sweep for CODE corpora:
    ``(id_cols..., n_grams, n_shared, share)`` for training files
    sharing >= ``min_shared`` distinct token k-grams of their type-2
    normal form (clones.normalize_type2: strings/numbers/identifiers
    -> class tokens, comments stripped, whitespace collapsed) with the
    evaluation set.  A HumanEval solution pasted with renamed
    variables and changed literals normalizes to the eval gram
    sequence and scores ``share = 1.0``; raw-text n-gram sweeps (see
    :func:`ngram_contamination`) and every exact-hash tier miss it.

    ``share`` = shared distinct grams / the file's distinct grams —
    1.0 means every structural window of the file appears in the eval
    set.  ``eval_df`` must carry the same content/lang column names.

    Scale shape: normalization + shingling ride both scans (pure
    codegen); the eval gram set broadcasts (benchmarks are thousands
    of docs), so the corpus side is never shuffled by the join — the
    only shuffle is the groupBy on the MATCHED (contaminated) rows,
    which is leak-count sized."""
    if not id_cols:
        raise ValueError("code_contamination needs id columns")
    if min_shared < 1:
        raise ValueError("min_shared must be >= 1")
    grams = code_eval_gram_set(
        eval_df, content_col, lang_col, k=k, syntax=syntax
    )
    if broadcast:
        grams = F.broadcast(grams)
    norm = normalize_type2(content_col, lang_col, syntax=syntax)
    # Same no-length-filter shape as code_eval_gram_set (see comment
    # there): an empty norm shingles to [''], whose single exploded gram
    # the _g filter drops — the row then vanishes from the groupBy, just
    # as the row filter would have removed it, without re-deriving the
    # normalization chain in a pushed-down filter conjunct.
    keyed = (
        train.select(*id_cols, norm.alias("_norm"))
        .select(
            *id_cols,
            X.word_shingles(F.col("_norm"), k).alias("_gs"),
        )
        .select(
            *id_cols,
            F.size("_gs").alias("n_grams"),
            F.explode("_gs").alias("_g"),
        )
        .filter(F.col("_g") != "")
    )
    return (
        keyed.join(grams, on="_g")
        .groupBy(*id_cols)
        .agg(
            F.max("n_grams").alias("n_grams"),
            F.count(F.lit(1)).alias("n_shared"),
        )
        .filter(F.col("n_shared") >= min_shared)
        .select(
            *id_cols,
            "n_grams",
            "n_shared",
            F.round(F.col("n_shared") / F.col("n_grams"), 6).alias("share"),
        )
    )


def decontaminate_code(
    train: DataFrame,
    eval_df: DataFrame,
    id_cols: list[str],
    content_col: str = "content",
    lang_col: str = "lang",
    *,
    k: int = 6,
    min_shared: int = 1,
    broadcast: bool = True,
    syntax: dict[str, tuple[str, str | None]] | None = None,
) -> DataFrame:
    """Training corpus minus type-2-contaminated files (left_anti on
    the :func:`code_contamination` flags)."""
    flagged = code_contamination(
        train, eval_df, id_cols, content_col, lang_col,
        k=k, min_shared=min_shared, broadcast=broadcast, syntax=syntax,
    ).select(*id_cols)
    return train.join(flagged, on=id_cols, how="left_anti")


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
