"""Margin-based parallel-pair mining — Artetxe & Schwenk 2019 (the
LASER / CCMatrix bitext recipe): to mine translation pairs from two
monolingual embedding spaces, raw cosine is NOT enough (hubness —
some vectors are close to everything); the ratio of a candidate's
cosine to the mean cosine of each side's k-nearest neighbours
("margin") is, and mutual-best filtering removes asymmetric hubs.
This is how the WMT-scale parallel corpora behind translation-capable
LLMs are built.

``margin(a, b) = cos(a, b) / ((knnA(a) + knnB(b)) / 2)`` where
``knnX(v)`` is the mean top-k cosine of ``v`` in the OTHER space; a
pair is emitted iff each side is the other's best-margin candidate
and the margin clears ``threshold``.

Determinism: cosines come 6dp-rounded from ``ann.cosine_topk``; the
margin is computed as ONE integer-ratio division —
``cos_e6 * 2k / (SA + SB)`` with ``SA/SB`` integer SUMS of e6-scaled
cosines (long arithmetic; a float ``avg()`` would sum partial
aggregates in nondeterministic order and flip last-bit ties) — so
the ranking and the emitted ``margin_e6`` are bit-identical on any
engine replaying the same top-k.

Scale shape: rides cosine_topk's salted two-level top-k in both
directions (never a per-query hot reducer); the knn-denominator
frames are id-grain aggregates of the top-k output (|A| and |B| rows,
AQE broadcasts when they fit); everything after is candidate-grain
(|A|·k rows).  For corpus sizes where exact top-k is too big, swap
the two cosine_topk calls for ivf_topk/srp_topk — the margin/mutual
logic is tier-agnostic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .ann import cosine_topk


def _both_topk_arrow(a_df, b_df, a_id, b_id, a_vec, b_vec, k,
                     max_query_rows):
    """(forward, backward) top-k frames from ONE matmul pass over B.

    A is collected (bounded by ``max_query_rows``) and rides the task
    closure; per Arrow batch of B the sims matrix gives the forward
    batch-local top-k per A query and the exact backward top-k per B
    ROW (every A candidate is in-closure).  BOTH directions then pass
    the salted two-level window — forward to merge batches, backward
    to merge duplicate b-side ids to exactly k entries (identical
    semantics to the HOF tier's per-id window).  All tie-breaks use
    the deterministic (-cosine, id) order.  An empty A yields empty
    frames (the HOF tier's semantics), never an error.
    """
    import numpy as np
    import pandas as pd

    from .ann import _collect_query_rows, _det_topk, _stack, \
        _topk_two_level

    qrows = _collect_query_rows(a_df, [a_id, a_vec], max_query_rows)
    if not qrows:
        # empty A = empty mining result (same semantics as the HOF
        # tier, where an empty query side yields no candidates)
        empty = a_df.sparkSession.createDataFrame(
            [], "query_id long, vec_id long, cosine double, rank int"
        )
        return empty, empty.drop("rank")
    qids = np.asarray([r[0] for r in qrows])
    Q = np.asarray([list(map(float, r[1])) for r in qrows])
    Qn = Q / np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-12)
    n_a = len(qids)

    def run(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            C = _stack(pdf["_bv"])
            Cn = C / np.maximum(
                np.linalg.norm(C, axis=1, keepdims=True), 1e-12
            )
            sims = np.round(Cn @ Qn.T, 6)  # (n_batch, n_a)
            bids = pdf["_bid"].to_numpy()
            dirs, oq, oc, os_ = [], [], [], []
            ftop = min(k, sims.shape[0])
            for qi in range(n_a):
                sel = _det_topk(sims[:, qi], bids, ftop)
                dirs.extend(["f"] * len(sel))
                oq.extend([qids[qi]] * len(sel))
                oc.extend(bids[sel])
                os_.extend(sims[sel, qi])
            btop = min(k, n_a)
            for bi in range(sims.shape[0]):
                sel = _det_topk(sims[bi, :], qids, btop)
                dirs.extend(["b"] * len(sel))
                oq.extend([bids[bi]] * len(sel))
                oc.extend(qids[sel])
                os_.extend(sims[bi, sel])
            yield pd.DataFrame(
                {"dir": dirs, "query_id": oq, "vec_id": oc,
                 "cosine": os_}
            )

    tagged = (
        b_df.select(
            F.col(b_id).alias("_bid"), F.col(b_vec).alias("_bv")
        )
        .mapInPandas(
            run, "dir string, query_id long, vec_id long, cosine double"
        )
        # consumed by both directions: materialize the (bounded,
        # candidate-grain) result once instead of re-running the
        # matmul scan per consumer
        .localCheckpoint()
    )
    fwd = _topk_two_level(tagged.filter(F.col("dir") == "f").drop("dir"), k)
    # backward rows are exact per B ROW; reduce to per B ID through
    # the same two-level window so duplicate b-side ids keep exactly
    # k entries — identical semantics to the HOF tier's per-id window
    bwd = _topk_two_level(tagged.filter(F.col("dir") == "b").drop("dir"), k)
    return fwd, bwd


def _knn_sums(topk: DataFrame, out_id: str, out_sum: str) -> DataFrame:
    """Integer sum of e6-scaled top-k cosines per query id."""
    return topk.groupBy(F.col("query_id").alias(out_id)).agg(
        F.sum(F.round(F.col("cosine") * 1e6).cast("long")).alias(out_sum),
        F.count(F.lit(1)).alias(out_sum + "_k"),
    )


def mine_parallel_pairs(
    a_df: DataFrame,
    b_df: DataFrame,
    *,
    a_id: str = "vec_id",
    b_id: str = "vec_id",
    a_vec: str = "embedding",
    b_vec: str = "embedding",
    k: int = 4,
    margin_threshold: float = 1.0,
    use_arrow: bool = False,
    max_query_rows: int = 100_000,
) -> DataFrame:
    """Mutual-best margin pairs: ``(id_a, id_b, cosine, margin_e6)``.

    ``margin_e6 = round(1e6 * cos_e6 * (k_a + k_b) /
    (SA + SB))`` — the exact integer form of cos / mean-of-both-knns
    (sides may have fewer than k neighbours when the other space is
    small; the actual neighbour counts are used, never assumed k).
    Ties in the per-side argmax break by the partner id ascending.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    # use_arrow swaps BOTH top-k directions for one numpy-matmul pass
    # over B (A, the designated bounded side, rides in the closure):
    # the same sims matrix yields the forward batch top-k per A query
    # AND the exact backward top-k per B row — so the big side is
    # never collected to the driver (a cosine_topk_arrow(b, a) call
    # would be) and the corpus is scanned once, not twice.  Ties
    # break by (-cosine, id) at batch level (ann._det_topk), matching
    # the global window, so membership is deterministic.  Matmul SIMD
    # summation can still differ from the sequential HOF sum in the
    # last ulp of a cosine, so keep the default (exact HOF) wherever
    # an oracle replays the arithmetic.
    if use_arrow:
        fwd, bwd = _both_topk_arrow(
            a_df, b_df, a_id, b_id, a_vec, b_vec, k, max_query_rows
        )
    else:
        fwd = cosine_topk(
            a_df, b_df, query_id=a_id, corpus_id=b_id,
            query_vec=a_vec, corpus_vec=b_vec, k=k,
        )
        bwd = cosine_topk(
            b_df, a_df, query_id=b_id, corpus_id=a_id,
            query_vec=b_vec, corpus_vec=a_vec, k=k,
        )
    ka = _knn_sums(fwd, "_ida", "_sa")
    kb = _knn_sums(bwd, "_idb", "_sb")

    def canon(topk, query_is_a: bool):
        """Candidates in canonical (a, b) orientation + margin."""
        if query_is_a:
            cand = topk.select(
                F.col("query_id").alias("_a"),
                F.col("vec_id").alias("_b"),
                "cosine",
            )
        else:
            cand = topk.select(
                F.col("vec_id").alias("_a"),
                F.col("query_id").alias("_b"),
                "cosine",
            )
        cand = cand.join(ka, F.col("_a") == F.col("_ida")).join(
            kb, F.col("_b") == F.col("_idb")
        )
        cos_e6 = F.round(F.col("cosine") * 1e6).cast("long")
        denom = F.col("_sa") + F.col("_sb")
        kk = F.col("_sa_k") + F.col("_sb_k")
        margin_e6 = F.when(
            denom > 0,
            F.round(cos_e6 * kk * F.lit(1000000.0) / denom)
            .cast("long"),
        ).otherwise(F.lit(0).cast("long"))
        return cand.select(
            "_a", "_b", "cosine", margin_e6.alias("margin_e6")
        )

    fcand = canon(fwd, True)
    bcand = canon(bwd, False)

    wf = Window.partitionBy("_a").orderBy(
        F.col("margin_e6").desc(), F.col("_b").asc()
    )
    wb = Window.partitionBy("_b").orderBy(
        F.col("margin_e6").desc(), F.col("_a").asc()
    )
    fbest = (
        fcand.withColumn("_rn", F.row_number().over(wf))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    bbest = (
        bcand.withColumn("_rn", F.row_number().over(wb))
        .filter(F.col("_rn") == 1)
        .select(F.col("_a").alias("_ba"), F.col("_b").alias("_bb"))
    )
    thr = int(round(margin_threshold * 1e6))
    return (
        fbest.join(
            bbest,
            (F.col("_a") == F.col("_ba"))
            & (F.col("_b") == F.col("_bb")),
        )
        .filter(F.col("margin_e6") > thr)
        .select(
            F.col("_a").alias("id_a"),
            F.col("_b").alias("id_b"),
            "cosine",
            "margin_e6",
        )
    )
