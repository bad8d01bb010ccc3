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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import similarity as V
from ..functions import text as X


from ._util import ensure_parallelism as _ensure_parallelism


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

def minhash_signature(
    text: Column, *, num_hashes: int = 64, shingle_k: int = 3
) -> Column:
    """MinHash signature (array<long>): hash function i is
    xxhash64(i, shingle) — independent keyed hashes with no multiply,
    so ANSI-mode safe and fully JVM-side.

    Single ``aggregate`` pass: the shingle array is referenced ONCE and
    all num_hashes minima fold simultaneously.  (The naive
    ``array(array_min(transform(shingles, h_i)) for i ...)`` embeds a
    fresh copy of the shingle-construction subtree in every element —
    measured 4x slower end-to-end at 5k docs.)"""
    shingles = X.word_shingles(text, shingle_k)
    idx = F.sequence(F.lit(0), F.lit(num_hashes - 1))
    init = F.array_repeat(F.lit(0x7FFFFFFFFFFFFFFF), num_hashes)
    return F.aggregate(
        shingles,
        init,
        lambda acc, s: F.zip_with(
            acc, idx, lambda a, i: F.least(a, F.xxhash64(i, s))
        ),
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
) -> DataFrame:
    """Near-duplicate pairs (id_a < id_b) with verified shingle Jaccard.

    banding: rows hashing to the same (band_id, band_hash) bucket become
    candidates; with r = num_hashes/bands rows per band the match
    probability is 1-(1-j^r)^bands (the classic S-curve).
    """
    rows_per_band = num_hashes // bands
    sig = minhash_signature(F.col(text_col), num_hashes=num_hashes, shingle_k=shingle_k)

    # Band with ONLY (id, band_id, band_hash) — 3 narrow columns through the
    # explode+shuffle.  Shipping the shingle arrays here would multiply the
    # shuffle payload by `bands`; instead candidates (a tiny set at any sane
    # threshold) re-join the shingles below.
    df = _ensure_parallelism(df)
    with_sig = df.select(F.col(id_col).alias("_id"), sig.alias("_sig"))
    band_cols = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_id"),
                F.xxhash64(
                    F.concat_ws(
                        ",",
                        *[
                            F.element_at("_sig", b * rows_per_band + r + 1).cast("string")
                            for r in range(rows_per_band)
                        ],
                    )
                ).alias("band_hash"),
            )
            for b in range(bands)
        ]
    )
    banded = with_sig.select("_id", F.explode(band_cols).alias("b")).select(
        "_id", "b.band_id", "b.band_hash"
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

    shing = df.select(
        F.col(id_col).alias("_id"),
        X.word_shingles(F.col(text_col), shingle_k).alias("_sh"),
    )
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
) -> DataFrame:
    """Near-dup pairs with hamming(simhash) ≤ max_hamming.

    Pigeonhole banding: split the n_bits signature into max_hamming+1
    chunks; any pair within distance max_hamming agrees exactly on at
    least one chunk → candidates = same (chunk_id, chunk_value) bucket.
    """
    n_chunks = max_hamming + 1
    chunk = n_bits // n_chunks
    sig = simhash_bits(F.col(text_col), n_bits=n_bits)
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


# -------------------------------------------------- clustering & selection

def cluster_pairs(
    pairs: DataFrame,
    *,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iters: int = 20,
    checkpoint_every: int = 5,
) -> DataFrame:
    """Connected components over near-dup pairs: (doc_id, cluster_id)
    where cluster_id = min doc id of the component.

    Iterative min-label propagation (each node takes the min label in its
    neighborhood, repeat until fixed point) — the standard large-graph CC
    shape on Spark: per iteration one join + one groupBy, datasets only
    as wide as (node, label).  Converges in O(diameter) iterations; near-
    dup graphs are unions of small cliques, so 2-3 in practice.  Lineage
    is truncated with localCheckpoint every ``checkpoint_every`` iters.
    """
    from pyspark.sql.window import Window  # local: keep module header slim

    edges = (
        pairs.select(F.col(id_a).alias("a"), F.col(id_b).alias("b"))
        .union(pairs.select(F.col(id_b).alias("a"), F.col(id_a).alias("b")))
        .distinct()
    )
    labels = (
        edges.groupBy("a")
        .agg(F.least(F.min("b"), F.first("a")).alias("label"))
        .select(F.col("a").alias("node"), "label")
    )
    for it in range(max_iters):
        neighbor_labels = (
            edges.join(labels, edges["b"] == labels["node"])
            .select(edges["a"].alias("node"), F.col("label"))
        )
        new_labels = (
            labels.unionByName(neighbor_labels)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
        )
        if (it + 1) % checkpoint_every == 0:
            new_labels = new_labels.localCheckpoint()
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
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
    dim: int | None = None,
) -> DataFrame:
    """Near-dup pairs by cosine ≥ threshold: SRP-LSH bucket (all n_planes
    bits equal → high-cosine pairs collide with high probability), then
    exact cosine verify inside buckets."""
    if dim is None:
        first = df.select(F.size(vec_col).alias("d")).first()
        dim = int(first["d"])
    planes = V.deterministic_planes(n_planes, dim)
    sig = V.srp_signature(F.col(vec_col), planes)
    base = _ensure_parallelism(df).select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_v"),
        F.concat_ws("", *[F.element_at(sig, i + 1).cast("string") for i in range(n_planes)]).alias("_bkt"),
    )
    l, r = base.alias("l"), base.alias("r")
    cos = V.cosine(F.col("l._v"), F.col("r._v"))
    return (
        l.join(r, (F.col("l._bkt") == F.col("r._bkt")) & (F.col("l._id") < F.col("r._id")))
        .select(
            F.col("l._id").alias("id_a"),
            F.col("r._id").alias("id_b"),
            F.round(cos, 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= cosine_threshold)
    )
