"""Hard-negative mining for retrieval/embedding training — the DPR /
contrastive-learning data stage (Karpukhin et al. 2020): for each
query vector, the best-scoring corpus items that are NOT its
positives make the informative negatives; random negatives are too
easy and the trained retriever plateaus.

``mine_hard_negatives`` returns the exact top-k cosine neighbors of
each query EXCLUDING corpus rows that share the query's label (label
= the positive-group key: the source document, the cluster, the
duplicate-group representative).  A NULL corpus label never matches
any query label (it is nobody's positive).

Scale shape: identical to ann.cosine_topk — the query set broadcasts
(bounded, search-batch sized), the corpus is scanned once and never
shuffled, the exclusion predicate rides the scored projection BEFORE
ranking (so excluded rows never enter a reducer), and the per-query
top-k runs through the salted two-level window (no hot reducer).

Determinism: cosines 6dp-rounded before ranking, ties break by corpus
id ascending — the same contract as every ANN tier, so a SQL replay
ordering by ``(cosine desc, id asc)`` reproduces the ranking.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import similarity as V
from ._util import ensure_parallelism
from .ann import _MAX_DRIVER_QUERY_ROWS, _topk_two_level


def mine_hard_negatives(
    queries: DataFrame,
    corpus: DataFrame,
    *,
    query_id: str = "query_id",
    corpus_id: str = "vec_id",
    query_vec: str = "embedding",
    query_label: str = "label",
    corpus_label: str = "label",
    corpus_vec: str = "embedding",
    k: int = 10,
    n_salts: int = 64,
    max_query_rows: int = _MAX_DRIVER_QUERY_ROWS,
) -> DataFrame:
    """Exact top-k non-positive neighbors per query:
    ``(query_id, vec_id, cosine, rank)``.

    Exclusion: a corpus row is a positive of the query iff their
    labels are equal AND both non-NULL (``<=>``-style equality would
    instead pair NULL with NULL — two unlabeled rows are NOT positives
    of each other).
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    q = queries.select(
        F.col(query_id).alias("query_id"),
        F.col(query_vec).alias("_qv"),
        F.col(query_label).alias("_ql"),
    )
    # Fail-fast cardinality guard (same contract as ann._collect_query_rows):
    # the query side is broadcast, so an unbounded query frame would OOM
    # executors silently instead of raising.  limit(max+1) bounds the probe.
    n_q = q.limit(max_query_rows + 1).count()
    if n_q > max_query_rows:
        raise ValueError(
            f"query set exceeds max_query_rows={max_query_rows}: the query "
            f"side is broadcast to every executor. Chunk the query DataFrame "
            f"and call once per chunk, or raise max_query_rows if executor "
            f"memory allows."
        )
    c = ensure_parallelism(corpus).select(
        F.col(corpus_id).alias("vec_id"),
        F.col(corpus_vec).alias("_cv"),
        F.col(corpus_label).alias("_cl"),
    )
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        # positives drop BEFORE ranking: NULL-safe in the keep
        # direction (any NULL label keeps the row)
        .filter(
            F.col("_ql").isNull()
            | F.col("_cl").isNull()
            | (F.col("_ql") != F.col("_cl"))
        )
        .select(
            "query_id",
            "vec_id",
            F.round(V.cosine(F.col("_qv"), F.col("_cv")), 6).alias(
                "cosine"
            ),
        )
    )
    return _topk_two_level(scored, k, n_salts)
