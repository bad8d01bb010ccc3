"""Near-duplicate detection for source code — The Stack / StarCoder
preprocessing recipe over the north rule's (repo, path, commit, lang,
content) table: strip license headers (so shared boilerplate can't make
unrelated files "similar"), lex to lowercase alnum/underscore tokens
(identifier- and literal-grain, whitespace/punct-insensitive — two
files differing only in formatting shingle identically), shingle the
token stream, MinHash-LSH block, exact-Jaccard verify.

Reference anchor: the reference validates per-file invariants only
(schema-validator rule/*.go); near-dup detection is part of the
engine-extension surface SURVEY §2.9 mandates for a code corpus
(The Stack v1.2 dedups exactly this way: comment/license-insensitive
token shingles + MinHash Jaccard).

Scale shape: strip + lex + shingle ride ONE codegen scan; signatures
are the explode + min-agg form (one narrow shuffle of
(id, 8·num_hashes bytes) rows); banding self-joins narrow
(id, band_id, band_hash) rows with the hot-bucket cap available for
degenerate boilerplate buckets; exact verify re-joins the gram arrays
for CANDIDATES only.  No all-pairs stage anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import array_shingles
from .dedup import minhash_lsh_candidates
from .licenses import strip_license_headers

#: lexer split: anything outside [a-z0-9_] separates tokens (content is
#: lowercased first).  RE2-safe; single source of truth for the oracle.
CODE_TOKEN_SPLIT_RE = r"[^a-z0-9_]+"


def code_tokens(content: Column) -> Column:
    """Lowercased alnum/underscore token array of a code column —
    identifier/number/keyword stream, all punctuation and whitespace
    dropped (formatting-insensitive by construction).

    Implementation note: the empty-token drop is ``array_remove`` and
    NOT a lambda ``F.filter`` on purpose — lambda HOFs are
    CodegenFallback (interpreted, excluded from whole-stage codegen
    AND from subexpression elimination), so when CollapseProject
    inlines a shared token column into N consumers a HOF form
    re-tokenizes N times per row (measured 5x inside bm25_search);
    the all-codegen form is deduped by codegen CSE."""
    return F.array_remove(
        F.split(F.lower(content), CODE_TOKEN_SPLIT_RE), ""
    )


def near_dup_code(
    df: DataFrame,
    id_col: str,
    content_col: str,
    lang_col: str,
    *,
    shingle_k: int = 5,
    num_hashes: int = 64,
    bands: int = 32,
    jaccard_threshold: float = 0.7,
    strip_headers: bool = True,
    max_bucket_size: int | None = None,
    log_dropped: bool = True,
) -> DataFrame:
    """Near-duplicate code pairs ``(id_a, id_b, jaccard)`` with
    id_a < id_b and jaccard = exact Jaccard of the distinct token
    ``shingle_k``-grams, ≥ ``jaccard_threshold``.

    With ``strip_headers`` (default) license/copyright comment headers
    are removed first (:func:`strip_license_headers`), so two unrelated
    files sharing a 20-line Apache header don't become candidates and —
    the converse — two copies whose ONLY difference is the header are
    still found at jaccard 1.0.

    Banding catch probability is 1-(1-j^r)^bands with
    r = num_hashes/bands; the defaults (r=2, 32 bands) give
    P(miss) = (1-0.7²)^32 ≈ 4.6e-10 at the default threshold — at the
    price of more sub-threshold candidates to verify (junk ∝ j²; use
    ``max_bucket_size`` to cap degenerate boilerplate buckets at corpus
    scale — drops are logged).  Raising r cuts candidate junk but costs
    recall: r=4, bands=16 misses ~1.2% of pairs AT j=0.7."""
    if strip_headers:
        base = strip_license_headers(
            df.select(id_col, lang_col, content_col),
            [id_col],
            content_col,
            lang_col,
        ).select(id_col, F.col("content_clean").alias("_c"))
    else:
        base = df.select(id_col, F.col(content_col).alias("_c"))
    grams = array_shingles(code_tokens(F.col("_c")), shingle_k)
    return minhash_lsh_candidates(
        base,
        id_col,
        "_c",
        num_hashes=num_hashes,
        bands=bands,
        jaccard_threshold=jaccard_threshold,
        max_bucket_size=max_bucket_size,
        log_dropped=log_dropped,
        grams=grams,
    )
