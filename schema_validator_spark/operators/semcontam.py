"""Semantic (embedding-space) train/eval decontamination — the overlap
tier the n-gram sweeps miss: a benchmark item paraphrased, translated,
or re-formatted shares no 8-gram with its source, but its embedding
still sits next to the eval item's.  Post-2023 pipelines (e.g. the
Llama-3 / GPT-4 eval-hygiene reports) therefore audit max-cosine
against the eval set alongside the exact n-gram sweep
(operators/decontaminate.py); this module is that audit.

For every training vector the operator finds the NEAREST eval vector
by cosine and flags rows whose best cosine clears a threshold.

Scale shape: the eval side is small (benchmarks are 10^3-10^5 items) —
it ships to executors whole (HOF tier: a literal constant folded into
the plan; Arrow tier: a normalized float64 matrix in the task
closure).  The 10^12-row training side is SCANNED ONCE and never
shuffled, joined, or grouped: the per-row argmax happens inside the
row's own projection, so the whole audit is one map-only pass whose
output is |train| rows (or just the flagged subset).

Determinism: cosines are rounded to 6dp before the argmax on both
tiers; ties at 6dp break by eval_id ascending (HOF: max-struct over
``(cosine, -eval_id)``; Arrow: vectorized masked-min over eval ids at
the row max) — so both tiers, and a SQL replay ordering by
``cosine desc, eval_id asc``, pick the identical neighbor.

The HOF tier computes ``dot/(norm_t * norm_e)`` with sequential
left-to-right folds — the same association a DuckDB ``list_sum``
replay uses — so an oracle matches it exactly; the Arrow tier's numpy
matmul may differ in the last ulp before rounding (same caveat as
operators/bitext.py) and is the 100 TB path, equivalence-tested
against the HOF tier.  The tiers also differ in ROUNDING MODE at the
6dp boundary: ``F.round`` (HOF) is HALF_UP over the double's shortest
decimal repr (java BigDecimal.valueOf), ``np.round`` (Arrow) is
half-to-even over the binary value — a cosine landing exactly on a
.5 ulp at 6dp can diverge by rounding mode, not just association.
Both caveats affect only values within one ulp of a decision
boundary; the equivalence test pins identity on real data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .ann import _collect_query_rows, _stack
from ._util import ensure_parallelism

# n_eval * dim budget for the HOF tier's literal eval array: beyond
# this the constant-folded expression tree gets slow to analyze —
# switch to use_arrow (closure ships a compact float64 matrix instead).
_MAX_LITERAL_CELLS = 500_000


def _collect_eval(eval_df, id_col, vec_col, max_eval_rows):
    """Collect (eval_id, vector, norm) rows; zero-norm eval vectors are
    dropped (they have no direction — nothing can be 'near' them; the
    embedding_quality audit is the place that reports them)."""
    import math

    rows = _collect_query_rows(eval_df, [id_col, vec_col], max_eval_rows)
    out = []
    for r in rows:
        if r[1] is None:
            continue
        v = [float(x) for x in r[1]]
        ne = math.sqrt(sum(x * x for x in v))
        if ne > 0:
            out.append((int(r[0]), v, ne))
    if not out:
        raise ValueError(
            "semantic_overlap: eval set is empty (or all zero vectors)"
        )
    dims = {len(v) for _, v, _ in out}
    if len(dims) != 1:
        raise ValueError(
            f"semantic_overlap: eval vectors have mixed dims {sorted(dims)}"
        )
    return out


def semantic_overlap(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    eval_id_col: str = "vec_id",
    eval_vec_col: str = "embedding",
    *,
    use_arrow: bool = False,
    max_eval_rows: int = 100_000,
) -> DataFrame:
    """Best eval neighbor per training row:
    ``(id_col, eval_id, cosine)`` with cosine rounded to 6dp.

    Zero-norm / NULL training vectors get ``cosine = 0.0`` (their best
    'neighbor' is the smallest eval_id — deterministic, never NaN), the
    same convention as functions/similarity.cosine.

    ``use_arrow=True`` is the scale tier: numpy matmul per Arrow batch,
    eval matrix in the task closure; identical ids and 6dp cosines up
    to the matmul-association caveat in the module docstring.
    """
    ev = _collect_eval(eval_df, eval_id_col, eval_vec_col, max_eval_rows)
    if use_arrow:
        return _overlap_arrow(train, id_col, vec_col, ev)
    if len(ev) * len(ev[0][1]) > _MAX_LITERAL_CELLS:
        raise ValueError(
            f"HOF tier literal budget exceeded "
            f"({len(ev)} eval vectors x {len(ev[0][1])} dims > "
            f"{_MAX_LITERAL_CELLS}); pass use_arrow=True"
        )
    evs = F.array(*[
        F.struct(
            F.array(*[F.lit(x) for x in v]).alias("v"),
            F.lit(ne).alias("ne"),
            F.lit(-eid).alias("nid"),
        )
        for eid, v, ne in ev
    ])
    # dim-mismatched vectors -> NULL -> nt NULL -> the 0.0 branch below
    # (zip_with would otherwise pad with NULLs and poison the dot);
    # same cosine-0.0 convention as the Arrow tier's zero-fill.
    dim = len(ev[0][1])
    dvec = F.when(
        F.size(F.col(vec_col)) == dim,
        F.transform(F.col(vec_col), lambda x: x.cast("double")),
    )
    nt = F.sqrt(F.aggregate(dvec, F.lit(0.0), lambda a, x: a + x * x))
    # bind (vector, norm) ONCE as a lambda variable: a plain projected
    # column would be CollapseProject-inlined into every eval element's
    # dot product, re-deriving the norm n_eval times per row (CLAUDE.md)
    packed = F.array(F.struct(dvec.alias("v"), nt.alias("nt")))
    best = F.element_at(
        F.transform(
            packed,
            lambda p: F.array_max(
                F.transform(
                    evs,
                    lambda s: F.struct(
                        F.when(
                            p["nt"] > 0,
                            F.round(
                                F.aggregate(
                                    F.zip_with(
                                        p["v"], s["v"],
                                        lambda x, y: x * y,
                                    ),
                                    F.lit(0.0),
                                    lambda a, x: a + x,
                                )
                                / (p["nt"] * s["ne"]),
                                6,
                            ),
                        )
                        .otherwise(F.lit(0.0))
                        .alias("c"),
                        s["nid"].alias("nid"),
                    ),
                )
            ),
        ),
        1,
    )
    out = ensure_parallelism(train).select(
        F.col(id_col), best.alias("_b")
    )
    return out.select(
        id_col,
        (-F.col("_b")["nid"]).cast("long").alias("eval_id"),
        F.col("_b")["c"].alias("cosine"),
    )


def _overlap_arrow(train, id_col, vec_col, ev, eval_block: int = 2048):
    import numpy as np
    import pandas as pd

    # ascending eval_id order makes the cross-block tie rule trivial:
    # a later block can only replace the running best on a STRICTLY
    # larger cosine, so equal-cosine ties always keep the smaller id
    ev = sorted(ev, key=lambda e: e[0])
    eids = np.asarray([e[0] for e in ev], dtype=np.int64)
    E = np.asarray([e[1] for e in ev], dtype=np.float64)
    En = E / np.linalg.norm(E, axis=1, keepdims=True)  # norms > 0 by _collect_eval

    def run(batches):
        big = np.iinfo(np.int64).max
        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf["_id"].to_numpy()
            V = _stack(pdf["_v"])
            norms = np.linalg.norm(V, axis=1, keepdims=True)
            Vn = V / np.maximum(norms, 1e-300)  # zero rows stay zero
            # block the eval side so the sims matrix stays
            # rows x eval_block (a 10k-item eval set against a 10k-row
            # Arrow batch would otherwise materialize 800 MB per task)
            oc = np.full(len(ids), -np.inf)
            oe = np.full(len(ids), big, dtype=np.int64)
            for lo in range(0, En.shape[0], eval_block):
                Eb = En[lo:lo + eval_block]
                eb = eids[lo:lo + eval_block]
                sims = np.round(Vn @ Eb.T, 6)
                # vectorized deterministic top-1 within the block:
                # max cosine, ties -> smallest eval_id
                bbest = sims.max(axis=1, keepdims=True)
                beid = np.where(sims == bbest, eb[None, :], big).min(axis=1)
                take = bbest[:, 0] > oc
                oc = np.where(take, bbest[:, 0], oc)
                oe = np.where(take, beid, oe)
            yield pd.DataFrame({id_col: ids, "eval_id": oe, "cosine": oc})

    src = ensure_parallelism(train).select(
        F.col(id_col).alias("_id"),
        F.coalesce(
            F.col(vec_col).cast("array<double>"),
            F.array().cast("array<double>"),
        ).alias("_v"),
    )
    # NULL / ragged / NULL-element vectors: _stack would fail on
    # ragged input and a NULL element becomes NaN that poisons the
    # matmul (every block comparison false -> the -inf/int64-max init
    # sentinels would leak out) — give all three an all-zero vector of
    # the eval dim (cosine 0.0, smallest eval_id: the HOF tier's
    # convention for exactly these rows)
    dim = En.shape[1]
    clean = (F.size("_v") == dim) & ~F.exists(
        F.col("_v"), lambda x: x.isNull()
    )
    src = src.select(
        "_id",
        F.when(clean, F.col("_v"))
        .otherwise(F.array(*[F.lit(0.0)] * dim))
        .alias("_v"),
    )
    return src.mapInPandas(
        run, f"{id_col} long, eval_id long, cosine double"
    )


def semantic_contamination(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    eval_id_col: str = "vec_id",
    eval_vec_col: str = "embedding",
    *,
    threshold: float = 0.95,
    use_arrow: bool = False,
    max_eval_rows: int = 100_000,
) -> DataFrame:
    """Training rows whose best eval cosine (6dp-rounded) clears
    ``threshold``: ``(id_col, eval_id, cosine)`` — the semantic
    analog of decontaminate.ngram_contamination's flag frame."""
    best = semantic_overlap(
        train, eval_df, id_col, vec_col, eval_id_col, eval_vec_col,
        use_arrow=use_arrow, max_eval_rows=max_eval_rows,
    )
    return best.filter(F.col("cosine") >= threshold)


def decontaminate_semantic(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    eval_id_col: str = "vec_id",
    eval_vec_col: str = "embedding",
    *,
    threshold: float = 0.95,
    use_arrow: bool = False,
    max_eval_rows: int = 100_000,
) -> DataFrame:
    """Training corpus minus semantically contaminated rows (left_anti
    on the flag frame — flag output is leak-count sized, so the join
    broadcasts under AQE)."""
    flagged = semantic_contamination(
        train, eval_df, id_col, vec_col, eval_id_col, eval_vec_col,
        threshold=threshold, use_arrow=use_arrow,
        max_eval_rows=max_eval_rows,
    ).select(F.col(id_col))
    return train.join(flagged, on=id_col, how="left_anti")
