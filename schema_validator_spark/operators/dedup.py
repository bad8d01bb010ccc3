"""Deduplication operators for web-scale corpora.

Five tiers, all Spark-native:

* exact            — sha256 hash groupBy (one shuffle on the hash)
* fingerprint      — normalized-text md5 (case/punct/whitespace near-dups)
* minhash_lsh      — word-shingle MinHash signatures, banded LSH
                     bucketing, candidate pairs verified by true Jaccard;
                     the only shuffles are the band explode groupBy and
                     the verify join — no O(n²) stage anywhere
* simhash          — 64-bit simhash; hamming-≤k candidates via exact-match
                     chunk banding (pigeonhole: d ≤ k → some 1 of k+1
                     chunks matches exactly)
* embedding cosine — near-dup pairs via SRP-LSH buckets + exact cosine
                     verify (see operators/ann.py for search)
"""

from __future__ import annotations

import logging

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import similarity as V
from ..functions import text as X


from ._util import ensure_parallelism as _ensure_parallelism

log = logging.getLogger(__name__)


def _cap_hot_buckets(
    banded: DataFrame,
    key_cols: list[str],
    max_bucket_size: int | None,
    *,
    what: str,
    log_dropped: bool = True,
) -> DataFrame:
    """Exclude degenerate LSH buckets from pair generation.

    One bucket of b rows yields b(b-1)/2 candidate pairs; a single
    boilerplate bucket (empty docs, license headers) goes quadratic at
    corpus scale.  Capping bounds any bucket's contribution to
    O(max_bucket_size²).  The size filter is a window count over the
    bucket key — the self-join hashes on the same key, so the window's
    exchange is the one the join needs anyway.

    No silent caps: when ``log_dropped`` is set the drop count is
    computed eagerly and logged.  To avoid paying the signature+banding
    stage twice (once for the count, once for the candidate self-join —
    which itself evaluates both join sides), the banded rows are
    localCheckpoint'ed first: ONE materialization of the narrow
    (id, bucket-key) rows feeds the count AND both sides of the join.
    Pass ``log_dropped=False`` to keep the plan fully lazy (the cap
    still applies, just unlogged).
    """
    if max_bucket_size is None:
        return banded
    from pyspark.sql.window import Window

    if log_dropped:
        banded = banded.localCheckpoint()
        hot = (
            banded.groupBy(*key_cols)
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") > max_bucket_size)
            .agg(F.count(F.lit(1)).alias("buckets"), F.sum("n").alias("rows"))
            .first()
        )
        if hot["buckets"]:
            log.warning(
                "%s: dropped %d hot bucket(s) spanning %d row-bands "
                "(> max_bucket_size=%d); pairs within them are NOT emitted",
                what, hot["buckets"], hot["rows"], max_bucket_size,
            )
    w = Window.partitionBy(*key_cols)
    return (
        banded.withColumn("_bsz", F.count(F.lit(1)).over(w))
        .filter(F.col("_bsz") <= max_bucket_size)
        .drop("_bsz")
    )


# --------------------------------------------------------------------- exact

def exact_duplicates(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Duplicate groups by content hash: (content_sha256, n_docs, doc_ids)."""
    h = F.sha2(F.col(text_col), 256).alias("content_sha256")
    return (
        df.select(h, F.col(id_col))
        .groupBy("content_sha256")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sort_array(F.collect_list(id_col)).alias("doc_ids"),
        )
        .filter(F.col("n_docs") > 1)
    )


def fingerprint_duplicates(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Duplicate groups by normalized fingerprint (case/punct-insensitive)."""
    return (
        df.select(X.fingerprint(F.col(text_col)).alias("fp"), F.col(id_col))
        .groupBy("fp")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sort_array(F.collect_list(id_col)).alias("doc_ids"),
        )
        .filter(F.col("n_docs") > 1)
    )


def dedup_exact(df: DataFrame, text_col: str) -> DataFrame:
    """Keep one row per distinct content hash (the actual dedup pass)."""
    h = F.sha2(F.col(text_col), 256)
    return df.withColumn("_h", h).dropDuplicates(["_h"]).drop("_h")


# ------------------------------------------------------------------- minhash

def minhash_signature_from_grams(grams: Column, num_hashes: int = 64) -> Column:
    """MinHash signature (array<long>) over ANY gram/shingle array:
    hash function i is xxhash64(i, gram) — independent keyed hashes with
    no multiply, so ANSI-mode safe and fully JVM-side.

    Single ``aggregate`` pass: the gram array is referenced ONCE and all
    num_hashes minima fold simultaneously.  (The naive
    ``array(array_min(transform(grams, h_i)) for i ...)`` embeds a
    fresh copy of the gram-construction subtree in every element —
    measured 4x slower end-to-end at 5k docs.)  Shared by the near-dup
    tiers here (word shingles) and operators/linkage.py (char n-grams)."""
    idx = F.sequence(F.lit(0), F.lit(num_hashes - 1))
    init = F.array_repeat(F.lit(0x7FFFFFFFFFFFFFFF), num_hashes)
    return F.aggregate(
        grams,
        init,
        lambda acc, s: F.zip_with(
            acc, idx, lambda a, i: F.least(a, F.xxhash64(i, s))
        ),
    )


def minhash_signature(
    text: Column, *, num_hashes: int = 64, shingle_k: int = 3
) -> Column:
    """MinHash signature of a text column's word shingles (expression
    form — see :func:`minhash_signatures_df` for the hot-path form)."""
    return minhash_signature_from_grams(
        X.word_shingles(text, shingle_k), num_hashes
    )


def minhash_signatures_df(
    df: DataFrame,
    id_col: str,
    grams: Column,
    *,
    num_hashes: int = 64,
    out_id: str = "_id",
    out_col: str = "_sig",
) -> DataFrame:
    """(id, signature) frame via explode + ``num_hashes`` codegen
    min-aggregates — value-identical to
    :func:`minhash_signature_from_grams` (same ``xxhash64(i, gram)``
    hash family, same min fold) but evaluated in whole-stage codegen.

    Why not the expression form on the hot path: higher-order functions
    (``aggregate``/``zip_with``) never enter codegen — they eval
    interpreted, ~num_hashes closure calls + one 64-slot array alloc
    PER GRAM (~5.6k interpreted evals per 90-token doc; measured
    dominant in the 200k-doc curation run).  Exploding grams and taking
    ``min(xxhash64(i, gram))`` per hash keeps every eval inside one
    codegen span with map-side combine: each doc's grams sit in one
    task, so the partial agg already emits the final 1 row/doc and the
    added shuffle moves only (id, 8·num_hashes bytes) rows.

    Docs whose gram array is NULL/empty are DROPPED (no rows to
    aggregate) — word_shingles/char_ngrams always emit >= 1 gram, so
    every doc survives for those generators."""
    g = df.select(F.col(id_col).alias(out_id), F.explode(grams).alias("_g"))
    aggs = [
        F.min(F.xxhash64(F.lit(i), F.col("_g"))).alias(f"_h{i}")
        for i in range(num_hashes)
    ]
    return (
        g.groupBy(out_id)
        .agg(*aggs)
        .select(
            out_id,
            F.array(*[f"_h{i}" for i in range(num_hashes)]).alias(out_col),
        )
    )


def band_cols_expr(sig_col: str, num_hashes: int, bands: int) -> Column:
    """array<struct<band_id,band_hash>> over a signature column — the
    LSH banding key set (band_hash = xxhash64 of the band's r signature
    slots).  Shared by minhash_lsh_candidates and linkage._banded."""
    rows_per_band = num_hashes // bands
    return F.array(
        *[
            F.struct(
                F.lit(b).alias("band_id"),
                F.xxhash64(
                    F.concat_ws(
                        ",",
                        *[
                            F.element_at(sig_col, b * rows_per_band + r + 1)
                            .cast("string")
                            for r in range(rows_per_band)
                        ],
                    )
                ).alias("band_hash"),
            )
            for b in range(bands)
        ]
    )


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    jaccard_threshold: float = 0.5,
    max_bucket_size: int | None = None,
    log_dropped: bool = True,
    grams: Column | None = None,
) -> DataFrame:
    """Near-duplicate pairs (id_a < id_b) with verified shingle Jaccard.

    banding: rows hashing to the same (band_id, band_hash) bucket become
    candidates; with r = num_hashes/bands rows per band the match
    probability is 1-(1-j^r)^bands (the classic S-curve).

    ``max_bucket_size`` caps degenerate buckets (see _cap_hot_buckets) —
    set it at corpus scale, where one boilerplate bucket is quadratic.

    ``grams`` overrides the gram set (default: word k-shingles of
    ``text_col``) — the same expression feeds BOTH the signatures and
    the exact-Jaccard verify, so the verified similarity is always the
    Jaccard of the grams the banding blocked on (used by the code
    near-dup tier, which shingles lexer tokens instead of words).
    """
    # Band with ONLY (id, band_id, band_hash) — 3 narrow columns through the
    # explode+shuffle.  Shipping the shingle arrays here would multiply the
    # shuffle payload by `bands`; instead candidates (a tiny set at any sane
    # threshold) re-join the shingles below.
    df = _ensure_parallelism(df)
    if grams is None:
        grams = X.word_shingles(F.col(text_col), shingle_k)
    with_sig = minhash_signatures_df(
        df, id_col, grams, num_hashes=num_hashes,
    )
    band_cols = band_cols_expr("_sig", num_hashes, bands)
    banded = with_sig.select("_id", F.explode(band_cols).alias("b")).select(
        "_id", "b.band_id", "b.band_hash"
    )
    banded = _cap_hot_buckets(
        banded, ["band_id", "band_hash"], max_bucket_size,
        what="minhash_lsh_candidates", log_dropped=log_dropped,
    )

    left = banded.alias("l")
    right = banded.alias("r")
    pairs = (
        left.join(
            right,
            (F.col("l.band_id") == F.col("r.band_id"))
            & (F.col("l.band_hash") == F.col("r.band_hash"))
            & (F.col("l._id") < F.col("r._id")),
        )
        .select(F.col("l._id").alias("id_a"), F.col("r._id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )

    shing = df.select(F.col(id_col).alias("_id"), grams.alias("_sh"))
    a, b = shing.alias("a"), shing.alias("b")
    jac = (
        F.size(F.array_intersect("a._sh", "b._sh"))
        / F.size(F.array_union("a._sh", "b._sh"))
    ).alias("jaccard")
    return (
        pairs.join(a, F.col("id_a") == F.col("a._id"))
        .join(b, F.col("id_b") == F.col("b._id"))
        .select("id_a", "id_b", F.round(jac, 6).alias("jaccard"))
        .filter(F.col("jaccard") >= jaccard_threshold)
    )


# ------------------------------------------------------------------- simhash

def simhash_bits(text: Column, *, n_bits: int = 64) -> Column:
    """SimHash bit vector (array<int> of 0/1): per-token 64-bit hashes
    vote per bit position; sign of the vote is the bit."""
    hashes = F.transform(X.tokens(text), lambda t: F.xxhash64(t))
    votes = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0), n_bits),
        lambda acc, h: F.zip_with(
            acc,
            F.sequence(F.lit(0), F.lit(n_bits - 1)),
            lambda a, b: a + (F.getbit(h, b) * 2 - 1).cast("int"),
        ),
    )
    return F.transform(votes, lambda v: F.when(v > 0, 1).otherwise(0))


def simhash_bits_md5(text: Column, *, n_bits: int = 64) -> Column:
    """Portable simhash (array<int> of 0/1): per-token bits come from the
    md5 hex digest — bit i is bit (i mod 4) of hex digit i//4 — so ANY
    engine reproduces the signature exactly (this is the DuckDB-oracle
    tier; default :func:`simhash_bits` uses xxhash64, ~an order of
    magnitude less HOF work, for corpus scale)."""
    # unpack each digest's hex digits ONCE per token (n_bits/4 conv calls),
    # then the per-bit vote is pure arithmetic over the small int array —
    # 4x less string work than substring+conv per bit
    digit_vals = F.transform(
        F.transform(X.tokens(text), lambda t: F.md5(t)),
        lambda m: F.transform(
            F.sequence(F.lit(1), F.lit(n_bits // 4)),
            lambda p: F.conv(F.substring(m, p, 1), 16, 10).cast("int"),
        ),
    )
    idx = F.sequence(F.lit(0), F.lit(n_bits - 1))
    pow2 = F.array(F.lit(1), F.lit(2), F.lit(4), F.lit(8))

    def vote(acc, dv):
        def per_bit(a, i):
            val = F.element_at(dv, F.floor(i / 4).cast("int") + 1)
            bit = F.pmod(F.floor(val / F.element_at(pow2, F.pmod(i, F.lit(4)).cast("int") + 1)), 2)
            return a + (bit * 2 - 1).cast("int")

        return F.zip_with(acc, idx, per_bit)

    votes = F.aggregate(digit_vals, F.array_repeat(F.lit(0), n_bits), vote)
    return F.transform(votes, lambda v: F.when(v > 0, 1).otherwise(0))


def hamming(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: F.abs(x - y)), F.lit(0), lambda acc, v: acc + v
    )


def simhash_candidates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    max_hamming: int = 3,
    n_bits: int = 64,
    max_bucket_size: int | None = None,
    log_dropped: bool = True,
    portable: bool = False,
) -> DataFrame:
    """Near-dup pairs with hamming(simhash) ≤ max_hamming.

    Pigeonhole banding: split the n_bits signature into max_hamming+1
    chunks; any pair within distance max_hamming agrees exactly on at
    least one chunk → candidates = same (chunk_id, chunk_value) bucket.
    The banding is EXACT (no false negatives); the hamming verify removes
    false positives, so the output is precisely the set of pairs at
    distance ≤ max_hamming — deterministic ground truth.

    ``portable=True`` derives per-token bits from md5 instead of xxhash64
    so an external engine (DuckDB oracle) reproduces the output.
    """
    n_chunks = max_hamming + 1
    chunk = n_bits // n_chunks
    bits_fn = simhash_bits_md5 if portable else simhash_bits
    sig = bits_fn(F.col(text_col), n_bits=n_bits)
    base = _ensure_parallelism(df).select(F.col(id_col).alias("_id"), sig.alias("_sig"))

    # Narrow banding (id + chunk key only) — signatures re-join for the
    # verify step on the (small) candidate set, same shape as minhash LSH.
    chunks = F.array(
        *[
            F.struct(
                F.lit(c).alias("chunk_id"),
                F.concat_ws(
                    "", *[F.element_at("_sig", c * chunk + j + 1).cast("string")
                          for j in range(chunk)]
                ).alias("chunk_val"),
            )
            for c in range(n_chunks)
        ]
    )
    banded = base.select("_id", F.explode(chunks).alias("c")).select(
        "_id", "c.chunk_id", "c.chunk_val"
    )
    banded = _cap_hot_buckets(
        banded, ["chunk_id", "chunk_val"], max_bucket_size,
        what="simhash_candidates", log_dropped=log_dropped,
    )
    l, r = banded.alias("l"), banded.alias("r")
    pairs = (
        l.join(
            r,
            (F.col("l.chunk_id") == F.col("r.chunk_id"))
            & (F.col("l.chunk_val") == F.col("r.chunk_val"))
            & (F.col("l._id") < F.col("r._id")),
        )
        .select(F.col("l._id").alias("id_a"), F.col("r._id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    a, b = base.alias("a"), base.alias("b")
    return (
        pairs.join(a, F.col("id_a") == F.col("a._id"))
        .join(b, F.col("id_b") == F.col("b._id"))
        .select(
            "id_a", "id_b",
            hamming(F.col("a._sig"), F.col("b._sig")).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )


# ------------------------------------------------------------- ngram jaccard

def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n: int = 4,
    threshold: float = 0.8,
    block_col: str | None = None,
) -> DataFrame:
    """Character-n-gram Jaccard similar pairs.

    Exact O(n²) within a blocking key (pass ``block_col``; at scale use
    ``minhash_lsh_candidates`` instead — this is the verify-tier oracle).
    """
    grams = X.char_ngrams(F.col(text_col), n)
    cols = [F.col(id_col).alias("_id"), grams.alias("_g")]
    if block_col:
        cols.append(F.col(block_col).alias("_blk"))
    base = df.select(*cols)
    l, r = base.alias("l"), base.alias("r")
    cond = F.col("l._id") < F.col("r._id")
    if block_col:
        cond = cond & (F.col("l._blk") == F.col("r._blk"))
    jac = (
        F.size(F.array_intersect(F.col("l._g"), F.col("r._g")))
        / F.size(F.array_union(F.col("l._g"), F.col("r._g")))
    )
    return (
        l.join(r, cond)
        .select(
            F.col("l._id").alias("id_a"),
            F.col("r._id").alias("id_b"),
            F.round(jac, 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


# ----------------------------------------------------- global line dedup

def global_line_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    out_col: str = "text_dedup",
) -> DataFrame:
    """Corpus-WIDE duplicate-line removal (the RefinedWeb/CCNet
    boilerplate pass): a line that appears in many documents survives
    only at its first occurrence — ordered by (doc id, line index) — and
    is dropped everywhere else.

    Scale shape: explode to (id, idx, line); the first occurrence per
    line is ``min(struct(id, idx))`` — a map-side-combinable aggregate,
    so a boilerplate line repeated 10^9 times costs one combiner row per
    task, NOT one hot reducer (a window over the line would).  The
    keep-join shuffles on the line value (AQE skew-join splits hot
    lines); reassembly is one groupBy per doc.
    """
    lines = df.select(
        F.col(id_col).alias("_id"),
        F.posexplode(F.split(F.coalesce(F.col(text_col), F.lit("")), "\n"))
        .alias("_idx", "_line"),
    )
    first = lines.groupBy("_line").agg(
        F.min(F.struct(F.col("_id"), F.col("_idx"))).alias("_first")
    )
    kept = (
        lines.join(first, "_line")
        .filter(
            (F.col("_id") == F.col("_first._id"))
            & (F.col("_idx") == F.col("_first._idx"))
        )
        .select("_id", "_idx", "_line")
    )
    rebuilt = kept.groupBy("_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("_idx", "_line"))),
                lambda s: s["_line"],
            ),
            "\n",
        ).alias(out_col),
        F.count(F.lit(1)).alias("n_lines_kept"),
    )
    return (
        df.join(rebuilt, df[id_col] == rebuilt["_id"], "left")
        .drop("_id")
        .withColumns({
            out_col: F.coalesce(F.col(out_col), F.lit("")),
            "n_lines_kept": F.coalesce(F.col("n_lines_kept"), F.lit(0)),
        })
    )


# ---------------------------------------------- repeated-span (substring) dedup

def remove_repeated_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    k: int = 8,
    min_count: int = 2,
    out_col: str = "text_despan",
) -> DataFrame:
    """Exact substring-level dedup — the Lee et al. 2021 ("Deduplicating
    Training Data Makes Language Models Better") repeated-span pass, the
    modality exact/line/MinHash/SimHash dedup do not cover: a k-token
    span whose fingerprint occurs ``min_count``+ times anywhere in the
    corpus survives only at its globally-first occurrence (ordered by
    (id, position)); every other occurrence's tokens are removed.

    Distributed design — a k-gram fingerprint index instead of the
    paper's suffix array (which needs global sorted adjacency; this
    needs only equality on fingerprints, a natural shuffle key):

    1. explode each doc's k-token sliding windows to
       (id, pos, md5(k-gram)) — linear in corpus tokens, never pairs;
    2. per fingerprint, ``count(*)`` and ``min(struct(id, pos))`` — both
       map-side-combinable aggregates, so a boilerplate span repeated
       10^9 times costs one combiner row per task, NOT one hot reducer;
    3. join occurrences back on the fingerprint (AQE skew-join splits
       hot fingerprints; fan-out stays linear in occurrences — there is
       no pairwise stage anywhere, hence no hot-bucket cap needed);
    4. non-first occurrences expand to covered token indices
       (``sequence(pos, pos+k-1)``, distinct per doc);
    5. rebuild via ``array_except(all indices, covered)`` + ``get`` —
       hash-set membership, O(tokens + covered) per doc (never
       tokens × covered), order preserved for free, one groupBy per doc.

    Tokens are single-space splits so removal is byte-reversible and any
    engine (the DuckDB oracle replays 1-5 verbatim) produces the
    identical cleaned text.  Overlapping spans union their covered
    indices.  Adds ``out_col`` and ``n_tokens_removed``.
    """
    base = df.select(
        F.col(id_col).alias("_id"),
        F.split(F.coalesce(F.col(text_col), F.lit("")), " ").alias("_toks"),
    )
    n = F.size(F.col("_toks"))

    # (1) sliding k-gram fingerprints; guard n < k (sequence would descend)
    grams = F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(0), n - k),
            lambda i: F.struct(
                i.alias("pos"),
                F.md5(F.concat_ws(" ", F.slice(F.col("_toks"), i + 1, k))).alias("fp"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<pos:int,fp:string>>"))
    occ = (
        _ensure_parallelism(base)
        .select("_id", F.explode(grams).alias("g"))
        .select("_id", F.col("g.pos").alias("_pos"), F.col("g.fp").alias("_fp"))
    )

    # (2) repeated fingerprints + their globally-first occurrence
    rep = (
        occ.groupBy("_fp")
        .agg(
            F.count(F.lit(1)).alias("_cnt"),
            F.min(F.struct(F.col("_id"), F.col("_pos"))).alias("_first"),
        )
        .filter(F.col("_cnt") >= min_count)
        .select("_fp", "_first")
    )

    # (3)+(4) every non-first occurrence covers its k token indices
    covered = (
        occ.join(rep, "_fp")
        .filter(
            (F.col("_id") != F.col("_first._id"))
            | (F.col("_pos") != F.col("_first._pos"))
        )
        .select("_id", F.explode(F.sequence(F.col("_pos"), F.col("_pos") + k - 1)).alias("_ti"))
        .distinct()
        .groupBy("_id")
        .agg(F.collect_set("_ti").alias("_cov"))
    )

    # (5) rebuild: drop covered indices, order preserved by the array form.
    # array_except builds a hash set over _cov then scans the index range
    # once => O(tokens + covered) per doc.  (A per-token
    # array_contains(_cov, i) membership filter is O(tokens × covered):
    # a 100k-token boilerplate doc that is 90% covered would do ~10^10
    # comparisons in ONE row — a per-row CPU bomb at scale.)
    joined = base.join(covered, "_id", "left")
    cov = F.coalesce(F.col("_cov"), F.array().cast("array<int>"))
    n_out = F.size(F.col("_toks"))
    all_idx = F.when(
        n_out > 0, F.sequence(F.lit(0), n_out - 1)
    ).otherwise(F.array().cast("array<int>"))
    kept_idx = F.array_except(all_idx, cov)  # keeps all_idx's order
    kept = F.transform(kept_idx, lambda i: F.get(F.col("_toks"), i))
    rebuilt = joined.select(
        F.col("_id"),
        F.concat_ws(" ", kept).alias(out_col),
        F.size(cov).alias("n_tokens_removed"),
    )
    return df.join(rebuilt, df[id_col] == rebuilt["_id"]).drop("_id")


# -------------------------------------------------- clustering & selection

def cluster_pairs(
    pairs: DataFrame,
    *,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iters: int = 20,
) -> DataFrame:
    """Connected components over near-dup pairs: (doc_id, cluster_id)
    where cluster_id = min doc id of the component.

    Iterative min-label propagation (each node takes the min label in its
    neighborhood, repeat until fixed point) — the standard large-graph CC
    shape on Spark: per iteration one join + one groupBy, datasets only
    as wide as (node, label).  Converges in O(diameter) iterations; near-
    dup graphs are unions of small cliques, so 2-3 in practice.

    ONE Spark job per iteration: each node's old label rides the
    aggregation (max of the tagged own-label row), the changed-count is
    collected as an Observation metric on the very job that materializes
    the new labels (localCheckpoint, which also truncates lineage) — no
    separate convergence-check join/count action.
    """
    from pyspark.sql import Observation

    edges = (
        pairs.select(F.col(id_a).alias("a"), F.col(id_b).alias("b"))
        .union(pairs.select(F.col(id_b).alias("a"), F.col(id_a).alias("b")))
        .distinct()
        # materialize ONCE: edges join every iteration, and without
        # this the whole upstream pair-generation plan (LSH banding,
        # repo-similarity self-join, ...) re-executes per iteration —
        # measured 274s -> 38s on fork_dedup at 4M files/20k repos
        .localCheckpoint()
    )
    labels = (
        edges.groupBy("a")
        .agg(F.least(F.min("b"), F.first("a")).alias("label"))
        .select(F.col("a").alias("node"), "label")
        .localCheckpoint()
    )
    for _it in range(max_iters):
        # own label tagged with _old; neighbor labels carry _old = NULL —
        # after the groupBy, max(_old) is exactly the node's previous label
        # (labels has one row per node), min(label) is the new label.
        own = labels.select("node", "label", F.col("label").alias("_old"))
        label_type = labels.schema["label"].dataType
        neighbor = (
            edges.join(labels, edges["b"] == labels["node"])
            .select(edges["a"].alias("node"), F.col("label"),
                    F.lit(None).cast(label_type).alias("_old"))
        )
        merged = (
            own.unionByName(neighbor)
            .groupBy("node")
            .agg(F.min("label").alias("label"), F.max("_old").alias("_old"))
        )
        obs = Observation()
        observed = merged.observe(
            obs, F.sum((F.col("label") < F.col("_old")).cast("long")).alias("n_changed")
        )
        labels = observed.select("node", "label").localCheckpoint()  # the job
        if not obs.get["n_changed"]:
            break
    return labels.select(F.col("node").alias("doc_id"),
                         F.col("label").alias("cluster_id"))


def dedup_keep_best(
    df: DataFrame,
    cluster_assignments: DataFrame,
    id_col: str = "doc_id",
    *,
    score_col: str | None = None,
) -> DataFrame:
    """Keep ONE representative per near-dup cluster: highest score
    (ties/no score: lowest id).  Docs with no cluster assignment are
    singletons and always kept — the final pass of a dedup pipeline."""
    from pyspark.sql.window import Window

    joined = df.join(
        cluster_assignments.withColumnRenamed("doc_id", id_col), on=id_col, how="left"
    ).withColumn(
        "_cl", F.coalesce(F.col("cluster_id"), F.col(id_col))
    )
    order = [F.col(score_col).desc_nulls_last()] if score_col else []
    order.append(F.col(id_col).asc())
    w = Window.partitionBy("_cl").orderBy(*order)
    return (
        joined.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_cl", "cluster_id")
    )


# ------------------------------------------------------- embedding near-dups

def embedding_near_duplicates(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    *,
    cosine_threshold: float = 0.95,
    n_planes: int = 16,
    bands: int = 4,
    dim: int | None = None,
    max_bucket_size: int | None = None,
    log_dropped: bool = True,
) -> DataFrame:
    """Near-dup pairs by cosine ≥ threshold: banded SRP-LSH candidates,
    exact cosine verify.

    Banding (like MinHash LSH): the n_planes SRP bits split into
    ``bands`` groups; a pair is a candidate if ANY band's bits match
    exactly.  With per-bit collision prob p = 1 - θ/π, band match is
    p^(n_planes/bands) and candidate prob 1-(1-p^r)^bands — at
    cosine 0.95 (θ≈18°, p≈0.90) the 16/4 default catches ≈98.5% per
    banding round versus ≈43% for the old single all-bits bucket.
    Identical-direction vectors (cosine 1.0) always collide in every
    band, so exact duplicates are never missed.
    """
    if dim is None:
        first = df.select(F.size(vec_col).alias("d")).first()
        dim = int(first["d"])
    r_planes = n_planes // bands
    planes = V.deterministic_planes(n_planes, dim)
    sig = V.srp_signature(F.col(vec_col), planes)
    # normalize ONCE per row (4k rows) so the verify join needs a single
    # dot product per candidate pair (150k+ pairs) instead of dot+2 norms
    base = _ensure_parallelism(df).select(
        F.col(id_col).alias("_id"),
        V.normalize(F.col(vec_col)).alias("_v"),
        sig.alias("_sig"),
    )
    # narrow banding (id + band key only); vectors re-join for the verify
    band_cols = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_id"),
                F.concat_ws(
                    "",
                    *[
                        F.element_at("_sig", b * r_planes + j + 1).cast("string")
                        for j in range(r_planes)
                    ],
                ).alias("band_bits"),
            )
            for b in range(bands)
        ]
    )
    banded = base.select("_id", F.explode(band_cols).alias("b")).select(
        "_id", "b.band_id", "b.band_bits"
    )
    banded = _cap_hot_buckets(
        banded, ["band_id", "band_bits"], max_bucket_size,
        what="embedding_near_duplicates", log_dropped=log_dropped,
    )
    l, r = banded.alias("l"), banded.alias("r")
    pairs = (
        l.join(
            r,
            (F.col("l.band_id") == F.col("r.band_id"))
            & (F.col("l.band_bits") == F.col("r.band_bits"))
            & (F.col("l._id") < F.col("r._id")),
        )
        .select(F.col("l._id").alias("id_a"), F.col("r._id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    vecs = base.select("_id", "_v")
    a, b = vecs.alias("a"), vecs.alias("b")
    cos = V.dot(F.col("a._v"), F.col("b._v"))  # unit vectors: dot == cosine
    return (
        pairs.join(a, F.col("id_a") == F.col("a._id"))
        .join(b, F.col("id_b") == F.col("b._id"))
        .select("id_a", "id_b", F.round(cos, 6).alias("cosine"))
        .filter(F.col("cosine") >= cosine_threshold)
    )


# ---------------------------------------------------------------- SemDeDup

def _auto_nlist(df: DataFrame) -> int:
    """Corpus-derived cluster count: ~1 cluster per 1000 docs (min 16).
    Keeps E[Σ c_i²] ≈ 1000·n, i.e. the within-cluster pair work scales
    LINEARLY with the corpus instead of quadratically — the SemDeDup
    paper's regime (~10^5 clusters at 10^8-10^9 docs is the same ratio
    order).  A fixed small default would be a footgun: 10^9 docs over
    16 clusters is ~4×10^15 pairs."""
    return max(16, df.count() // 1000)


def semdedup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    *,
    cosine_threshold: float = 0.95,
    nlist: int | None = None,
    train_sample: int = 100_000,
    iters: int = 10,
    seed: int = 42,
    max_cluster_size: int | None = None,
    log_dropped: bool = True,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023) candidate stage: k-means-cluster the
    embedding space (sampled spherical k-means, reusing ``ann.ivf_build``),
    then exact all-pairs cosine WITHIN each cluster only — the clusters
    bound the quadratic blowup, which is the paper's whole trick.

    Returns (id_a, id_b, cosine) for within-cluster pairs at or above
    the threshold.  Identical-direction vectors always share a cluster
    (same normalized vector -> same argmax over centroids), so exact
    duplicates are never missed; near-dups split across a cluster
    boundary are missed by construction, exactly as in the paper.

    Scale: cost is Σ c_i² over cluster sizes — ``nlist`` must grow with
    the corpus (the paper uses ~10^5 clusters for 10^9 docs), so the
    default (``nlist=None``) derives it from a corpus count:
    ``max(16, n_docs // 1000)`` keeps the within-cluster pair work
    linear in n (E[Σ c_i²] ≈ 1000·n).  Pass an explicit ``nlist`` to
    skip the count job.  ``max_cluster_size`` caps degenerate clusters
    the same way the LSH tiers cap hot buckets (drops logged, never
    silent).
    """
    from . import ann as A

    if nlist is None:
        nlist = _auto_nlist(df)
    listed, _cent = A.ivf_build(
        df, corpus_id=id_col, corpus_vec=vec_col, nlist=nlist,
        train_sample=train_sample, iters=iters, seed=seed,
    )
    base = listed.select(
        F.col("vec_id").alias("_id"), "_list",
        V.normalize(F.col("_cv")).alias("_vn"),
    )
    capped = _cap_hot_buckets(
        base, ["_list"], max_cluster_size,
        what="semdedup cluster", log_dropped=log_dropped,
    )
    a = capped.select(
        F.col("_id").alias("id_a"), "_list", F.col("_vn").alias("_va"))
    b = capped.select(
        F.col("_id").alias("id_b"), "_list", F.col("_vn").alias("_vb"))
    return (
        a.join(b, "_list")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", V.dot(F.col("_va"), F.col("_vb")))
        .filter(F.col("cosine") >= cosine_threshold)
        .select("id_a", "id_b", "cosine")
    )


def semdedup(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    *,
    cosine_threshold: float = 0.95,
    nlist: int | None = None,
    train_sample: int = 100_000,
    iters: int = 10,
    seed: int = 42,
    max_cluster_size: int | None = None,
    log_dropped: bool = True,
) -> DataFrame:
    """Full SemDeDup pass: cluster-scoped near-dup pairs -> connected
    components -> ONE survivor per component (lowest id — deterministic;
    the paper keeps the lowest-centroid-similarity member instead, a
    policy swap via ``dedup_keep_best(score_col=...)`` if desired).
    ``nlist=None`` auto-derives the cluster count from corpus size (see
    :func:`semdedup_pairs`).  Returns the surviving rows of ``df``
    unchanged."""
    pairs = semdedup_pairs(
        df, id_col, vec_col, cosine_threshold=cosine_threshold, nlist=nlist,
        train_sample=train_sample, iters=iters, seed=seed,
        max_cluster_size=max_cluster_size, log_dropped=log_dropped,
    )
    clusters = cluster_pairs(pairs)
    return dedup_keep_best(df, clusters, id_col)
