"""Approximate-nearest-neighbor search over embedding columns.

* ``cosine_topk``   — exact brute force: broadcast the (small) query set
  against the corpus, window top-k per query.  The correctness baseline;
  cost O(|Q|·|C|) but the corpus is never shuffled — only scanned once.
* ``srp_topk``      — scale path: signed-random-projection buckets with
  multi-probe (hamming-1 neighbors), exact cosine re-rank inside the
  probed buckets.  At 10^9+ vectors the probe list bounds the candidate
  set per query to a tiny fraction of the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions import similarity as V
from ._util import ensure_parallelism


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    *,
    query_id: str = "query_id",
    corpus_id: str = "vec_id",
    query_vec: str = "embedding",
    corpus_vec: str = "embedding",
    k: int = 10,
    n_salts: int = 64,
) -> DataFrame:
    """Exact top-k by cosine: (query_id, vec_id, cosine, rank).

    Two-level salted reduction: a single window partitioned by query_id
    would funnel EVERY scored corpus row for a query through one reducer
    (|C| rows each — the hot-reducer scale-killer).  Instead level 1
    ranks within (query_id, salt) — |Q|·n_salts reducers, each seeing
    ~|C|/n_salts rows — and level 2 ranks the surviving |Q|·n_salts·k
    rows globally.  The union of per-salt top-ks contains the global
    top-k, so results are identical to the naive form."""
    q = queries.select(F.col(query_id).alias("query_id"), F.col(query_vec).alias("_qv"))
    c = ensure_parallelism(corpus).select(F.col(corpus_id).alias("vec_id"), F.col(corpus_vec).alias("_cv"))
    scored = F.broadcast(q).crossJoin(c).select(
        "query_id",
        "vec_id",
        F.round(V.cosine(F.col("_qv"), F.col("_cv")), 6).alias("cosine"),
    )
    return _topk_two_level(scored, k, n_salts)



_MAX_DRIVER_QUERY_ROWS = 100_000


def _topk_two_level(scored: DataFrame, k: int, n_salts: int = 64) -> DataFrame:
    """Global top-k per query from a (query_id, vec_id, cosine) score set
    without funneling a query's whole candidate set through one reducer:
    rank within (query_id, salt-of-vec_id) first, keep k per salt, then
    rank the |Q|·n_salts·k survivors globally.  Identical results to a
    single window (each salt group's top-k covers its members)."""
    w1 = Window.partitionBy("query_id", "_salt").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    local = (
        scored.withColumn("_salt", F.pmod(F.xxhash64(F.col("vec_id")), n_salts))
        .withColumn("_r1", F.row_number().over(w1))
        .filter(F.col("_r1") <= k)
        .drop("_r1", "_salt")
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        local.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
    )


def _collect_query_rows(queries: DataFrame, cols: list[str], max_rows: int):
    """Collect the query set with a fail-fast cardinality guard.

    ivf_query / cosine_topk_arrow ship query vectors driver-side (task
    closure) — correct for search-style batches, an OOM for a 10M-row
    "query set".  limit(max+1) bounds the collect itself, so even the
    failing path never materializes the full set."""
    rows = queries.select(*cols).limit(max_rows + 1).collect()
    if len(rows) > max_rows:
        raise ValueError(
            f"query set exceeds max_query_rows={max_rows}: query vectors are "
            f"collected to the driver and shipped in task closures. Chunk the "
            f"query DataFrame and call once per chunk, or raise max_query_rows "
            f"if driver memory allows."
        )
    return rows


def _stack(series):
    """Arrow->pandas gives each array cell as np.ndarray; np.stack is a
    single C-level copy.  Fall back to the per-row path for plain lists."""
    import numpy as np

    vals = series.to_numpy()
    try:
        return np.stack(vals).astype(float, copy=False)
    except Exception:
        return np.asarray([list(map(float, v)) for v in vals])


def _train_sample_matrix(corpus, corpus_id, corpus_vec, train_sample, seed):
    """Bounded k-means training sample in ONE job (no ``corpus.count()``).

    ``orderBy(xxhash64(id, seed)).limit(n)`` plans as
    TakeOrderedAndProject: each task keeps an n-row heap over the hash
    of the row id and the driver merges heaps — a deterministic,
    partitioning-independent pseudo-random sample that never
    materializes more than ``train_sample`` rows anywhere, and drops
    the extra count() job the old frac-based ``sample()`` needed to
    size its fraction (one job per index build instead of two)."""
    import numpy as np

    rows = (
        corpus.select(
            F.col(corpus_vec).alias("_v"),
            F.xxhash64(F.col(corpus_id).cast("string"), F.lit(seed)).alias("_h"),
        )
        .orderBy("_h")
        .limit(train_sample)
        .collect()
    )
    return np.asarray([list(map(float, r["_v"])) for r in rows])


def _spherical_kmeans(X, nlist: int, iters: int, seed: int):
    """Driver-side spherical k-means on a (sampled) vector matrix —
    deterministic (hash-seeded init, fixed iteration count).  This is the
    FAISS-style IVF training step: the training set is a SAMPLE, so
    driver memory is bounded no matter the corpus size."""
    import numpy as np

    Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    rng = np.random.RandomState(seed)
    cent = Xn[rng.choice(len(Xn), size=min(nlist, len(Xn)), replace=False)]
    for _ in range(iters):
        sims = Xn @ cent.T
        assign = sims.argmax(axis=1)
        new = np.zeros_like(cent)
        for c in range(len(cent)):
            members = Xn[assign == c]
            new[c] = members.mean(axis=0) if len(members) else cent[c]
        cent = new / np.maximum(np.linalg.norm(new, axis=1, keepdims=True), 1e-12)
    return cent


def ivf_build(
    corpus: DataFrame,
    *,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    nlist: int = 16,
    train_sample: int = 100_000,
    iters: int = 10,
    seed: int = 42,
):
    """Build the IVF index: (listed_df, centroids).

    The index build is the expensive pass (k-means training on a bounded
    sample + one Arrow-matmul assignment scan of the corpus); persist or
    WRITE ``listed_df`` partitioned by ``_list`` and reuse it across query
    batches — that amortization is where IVF beats per-query brute force.
    """
    import numpy as np

    X = _train_sample_matrix(corpus, corpus_id, corpus_vec, train_sample, seed)
    cent = _spherical_kmeans(X, nlist, iters, seed)

    def assign(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            C = _stack(pdf[corpus_vec])
            Cn = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)
            pdf = pdf.rename(columns={corpus_id: "vec_id", corpus_vec: "_cv"})
            pdf["_list"] = (Cn @ cent.T).argmax(axis=1).astype("int32")
            yield pdf[["vec_id", "_list", "_cv"]]

    listed = corpus.select(corpus_id, corpus_vec).mapInPandas(
        assign, "vec_id long, _list int, _cv array<double>"
    )
    return listed, cent


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    *,
    query_id: str = "query_id",
    corpus_id: str = "vec_id",
    query_vec: str = "embedding",
    corpus_vec: str = "embedding",
    k: int = 10,
    nlist: int = 16,
    nprobe: int = 4,
    train_sample: int = 100_000,
    iters: int = 10,
    seed: int = 42,
) -> DataFrame:
    """One-shot convenience: ivf_build + ivf_query.  For repeated query
    batches, build once and call ivf_query against the persisted index.

    Scale shape: assignment is one mapInPandas pass over the corpus (the
    list id is a small int persisted alongside the vector); each query
    then touches ~nprobe/nlist of the corpus via an equi-join on list id
    — no cross join anywhere.  Output schema matches cosine_topk.
    """
    listed, cent = ivf_build(
        corpus, corpus_id=corpus_id, corpus_vec=corpus_vec, nlist=nlist,
        train_sample=train_sample, iters=iters, seed=seed,
    )
    return ivf_query(queries, listed, cent, query_id=query_id,
                     query_vec=query_vec, k=k, nprobe=nprobe)


def ivf_query(
    queries: DataFrame,
    listed: DataFrame,
    cent,
    *,
    query_id: str = "query_id",
    query_vec: str = "embedding",
    k: int = 10,
    nprobe: int = 4,
    max_query_rows: int = _MAX_DRIVER_QUERY_ROWS,
) -> DataFrame:
    """Query a prebuilt IVF index (probe nprobe lists, matmul re-rank)."""
    import numpy as np
    import pandas as pd

    qrows = _collect_query_rows(queries, [query_id, query_vec], max_query_rows)
    qvecs = {}
    probe_rows = []
    for r in qrows:
        q = np.asarray(list(map(float, r[1])))
        qn = q / max(np.linalg.norm(q), 1e-12)
        qvecs[r[0]] = qn
        for li in np.argsort(-(cent @ qn))[:nprobe]:
            probe_rows.append((r[0], int(li)))
    probes = queries.sparkSession.createDataFrame(
        probe_rows, "query_id long, _list int"
    )

    # only (query_id, vec_id, _cv) cross the join — query vectors travel
    # once in the task closure, not once per candidate row
    joined = F.broadcast(probes).join(listed, on="_list").select(
        "query_id", "vec_id", "_cv"
    )

    def rerank(batches):
        # per-query matmul over the candidate block — vectorized numpy,
        # not per-row HOF cosine
        for pdf in batches:
            if pdf.empty:
                continue
            C = _stack(pdf["_cv"])
            Cn = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)
            cos = np.empty(len(pdf))
            for qid, idx in pdf.groupby("query_id").indices.items():
                cos[idx] = Cn[idx] @ qvecs[qid]
            yield pd.DataFrame({
                "query_id": pdf["query_id"],
                "vec_id": pdf["vec_id"],
                "cosine": np.round(cos, 6),
            })

    scored = joined.mapInPandas(rerank, "query_id long, vec_id long, cosine double")
    return _topk_two_level(scored, k)


def _pq_train(Xn, m: int, ksub: int, iters: int, seed: int):
    """Train product-quantization codebooks on a (sampled, normalized)
    matrix: split the d dims into m contiguous subspaces and run plain
    Lloyd k-means (ksub centroids, hash-seeded init, fixed iterations —
    deterministic) independently per subspace.  Returns an (m, ksub,
    d//m) ndarray.  PQ here quantizes the NORMALIZED vector directly
    (IVF-flat list assignment + PQ codes), not the FAISS residual form —
    simpler, and the exact re-rank step absorbs the quantization error."""
    import numpy as np

    d = Xn.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m} subspaces")
    dsub = d // m
    rng = np.random.RandomState(seed)
    books = np.empty((m, ksub, dsub))
    for s in range(m):
        sub = Xn[:, s * dsub : (s + 1) * dsub]
        k = min(ksub, len(sub))
        cent = sub[rng.choice(len(sub), size=k, replace=False)]
        for _ in range(iters):
            # squared L2 via the expansion trick — one matmul per iter
            d2 = (sub * sub).sum(1)[:, None] - 2.0 * (sub @ cent.T) + (cent * cent).sum(1)[None, :]
            assign = d2.argmin(axis=1)
            for c in range(k):
                members = sub[assign == c]
                if len(members):
                    cent[c] = members.mean(axis=0)
        if k < ksub:  # tiny training set: pad by repeating (stable codes)
            cent = np.vstack([cent, np.repeat(cent[:1], ksub - k, axis=0)])
        books[s] = cent
    return books


def _pq_encode(Cn, books):
    """Assign each subvector to its nearest codeword → (n, m) uint8."""
    import numpy as np

    m, ksub, dsub = books.shape
    codes = np.empty((len(Cn), m), dtype=np.int64)
    for s in range(m):
        sub = Cn[:, s * dsub : (s + 1) * dsub]
        d2 = (sub * sub).sum(1)[:, None] - 2.0 * (sub @ books[s].T) + (books[s] * books[s]).sum(1)[None, :]
        codes[:, s] = d2.argmin(axis=1)
    return codes


def ivf_pq_build(
    corpus: DataFrame,
    *,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    nlist: int = 16,
    m: int = 8,
    ksub: int = 256,
    train_sample: int = 100_000,
    iters: int = 10,
    seed: int = 42,
):
    """Build a product-quantized IVF index: (encoded_df, centroids, books).

    This is the MEMORY tier beyond ivf_build: the encoded index stores
    only (vec_id, _list, _code[m]) — m bytes of code per vector instead
    of 8·d bytes of raw floats (768-d float64 → 6144 B vs m=8 B, a 768×
    shrink), so 10⁹ vectors fit a modest cluster where IVF-flat's raw
    executor-resident vectors would need TBs.  Raw vectors stay in the
    source table and are fetched by id ONLY for the shortlist re-rank.
    Training (IVF centroids + m sub-codebooks) runs driver-side on a
    bounded sample; encoding is one Arrow mapInPandas pass."""
    import numpy as np

    X = _train_sample_matrix(corpus, corpus_id, corpus_vec, train_sample, seed)
    Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    cent = _spherical_kmeans(X, nlist, iters, seed)
    books = _pq_train(Xn, m, ksub, iters, seed)

    def encode(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            C = _stack(pdf[corpus_vec])
            Cn = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)
            out = pdf.rename(columns={corpus_id: "vec_id"})[["vec_id"]].copy()
            out["_list"] = (Cn @ cent.T).argmax(axis=1).astype("int32")
            out["_code"] = list(_pq_encode(Cn, books))
            yield out

    encoded = corpus.select(corpus_id, corpus_vec).mapInPandas(
        encode, "vec_id long, _list int, _code array<smallint>"
    )
    return encoded, cent, books


def ivf_pq_topk(
    queries: DataFrame,
    corpus: DataFrame,
    *,
    query_id: str = "query_id",
    corpus_id: str = "vec_id",
    query_vec: str = "embedding",
    corpus_vec: str = "embedding",
    k: int = 10,
    nlist: int = 16,
    nprobe: int = 4,
    m: int = 8,
    ksub: int = 256,
    shortlist: int = 64,
    train_sample: int = 100_000,
    iters: int = 10,
    seed: int = 42,
) -> DataFrame:
    """One-shot IVF-PQ search (build + query).  Output schema matches
    cosine_topk: (query_id, vec_id, cosine, rank) with EXACT cosines —
    the quantized scores only pick the shortlist; the final ranking is an
    exact re-rank over raw vectors fetched by id.  For repeated batches,
    build once (ivf_pq_build) and reuse the persisted encoded index."""
    encoded, cent, books = ivf_pq_build(
        corpus, corpus_id=corpus_id, corpus_vec=corpus_vec, nlist=nlist,
        m=m, ksub=ksub, train_sample=train_sample, iters=iters, seed=seed,
    )
    return ivf_pq_query(
        queries, encoded, cent, books, corpus,
        query_id=query_id, corpus_id=corpus_id, query_vec=query_vec,
        corpus_vec=corpus_vec, k=k, nprobe=nprobe, shortlist=shortlist,
    )


def ivf_pq_query(
    queries: DataFrame,
    encoded: DataFrame,
    cent,
    books,
    corpus: DataFrame,
    *,
    query_id: str = "query_id",
    corpus_id: str = "vec_id",
    query_vec: str = "embedding",
    corpus_vec: str = "embedding",
    k: int = 10,
    nprobe: int = 4,
    shortlist: int = 64,
    max_query_rows: int = _MAX_DRIVER_QUERY_ROWS,
) -> DataFrame:
    """Query a prebuilt IVF-PQ index.

    Scale shape (the 100 TB path):
      1. probe — broadcast (query_id, _list) pairs equi-join the encoded
         index: each query touches ~nprobe/nlist of the CODES, never a
         raw vector;
      2. ADC — asymmetric distance via per-query lookup tables
         (m × ksub inner products rebuilt executor-side from the small
         codebooks + the query vector, cached per task — only |Q| x d
         query floats ship in the closure): scoring a candidate is m
         table lookups, no float vector in sight;
      3. shortlist — salted two-level top-``shortlist`` per query bounds
         what leaves the codes stage to |Q|·shortlist rows;
      4. exact re-rank — ONLY the shortlist joins raw vectors back by id
         (|Q|·shortlist-row shuffle against the source table) and gets
         exact cosine + final top-k.
    """
    import numpy as np
    import pandas as pd

    m, ksub, dsub = books.shape
    qrows = _collect_query_rows(queries, [query_id, query_vec], max_query_rows)
    # ship only the normalized query vectors (|Q| x d floats, same
    # footprint as ivf_query) — each executor rebuilds a query's
    # m x ksub ADC lookup table from `books` in ~m*ksub*dsub flops,
    # instead of pickling |Q| 16 KB LUTs into every task closure
    qns = {}
    probe_rows = []
    for r in qrows:
        q = np.asarray(list(map(float, r[1])))
        qn = q / max(np.linalg.norm(q), 1e-12)
        qns[r[0]] = qn
        for li in np.argsort(-(cent @ qn))[:nprobe]:
            probe_rows.append((r[0], int(li)))
    probes = queries.sparkSession.createDataFrame(
        probe_rows, "query_id long, _list int"
    )

    cand = F.broadcast(probes).join(encoded, on="_list").select(
        "query_id", "vec_id", "_code"
    )

    def adc(batches):
        # LUT[s][c] = <q_s, codeword_c>; ADC(code) = Σ_s LUT[s][code[s]]
        lut_cache = {}
        cols = np.arange(m)
        for pdf in batches:
            if pdf.empty:
                continue
            codes = np.stack(pdf["_code"].to_numpy()).astype(np.int64)
            score = np.zeros(len(pdf))
            for qid, idx in pdf.groupby("query_id").indices.items():
                lut = lut_cache.get(qid)
                if lut is None:
                    qn = qns[qid]
                    lut = np.stack(
                        [books[s] @ qn[s * dsub : (s + 1) * dsub]
                         for s in range(m)]
                    )
                    lut_cache[qid] = lut
                score[idx] = lut[cols, codes[idx]].sum(axis=1)
            yield pd.DataFrame({
                "query_id": pdf["query_id"],
                "vec_id": pdf["vec_id"],
                "cosine": np.round(score, 6),  # quantized score, shortlist only
            })

    scored = cand.mapInPandas(adc, "query_id long, vec_id long, cosine double")
    short = _topk_two_level(scored, shortlist).select("query_id", "vec_id")

    raw = corpus.select(
        F.col(corpus_id).alias("vec_id"), F.col(corpus_vec).alias("_cv")
    )
    rerank_in = short.join(raw, on="vec_id").select("query_id", "vec_id", "_cv")

    def rerank(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            C = _stack(pdf["_cv"])
            Cn = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)
            cos = np.empty(len(pdf))
            for qid, idx in pdf.groupby("query_id").indices.items():
                cos[idx] = Cn[idx] @ qns[qid]
            yield pd.DataFrame({
                "query_id": pdf["query_id"],
                "vec_id": pdf["vec_id"],
                "cosine": np.round(cos, 6),
            })

    exact = rerank_in.mapInPandas(
        rerank, "query_id long, vec_id long, cosine double"
    )
    return _topk_two_level(exact, k)


def _det_topk(scores, ids, top):
    """Indices of the top-``top`` by ``(-score, id)`` — deterministic
    under ties: argpartition finds the k-th value, then ALL indices at
    or above it are ordered by (-score, id) and truncated, so the
    id-smallest tied candidates win exactly as the global window's
    ``order by cosine desc, vec_id asc`` would pick them."""
    import numpy as np

    n = scores.shape[0]
    if top >= n:
        cand = np.arange(n)
    else:
        part = np.argpartition(-scores, top - 1)[:top]
        thr = scores[part].min()
        cand = np.flatnonzero(scores >= thr)
    order = np.lexsort((ids[cand], -scores[cand]))
    return cand[order][:top]


def cosine_topk_arrow(
    queries: DataFrame,
    corpus: DataFrame,
    *,
    query_id: str = "query_id",
    corpus_id: str = "vec_id",
    query_vec: str = "embedding",
    corpus_vec: str = "embedding",
    k: int = 10,
    max_query_rows: int = _MAX_DRIVER_QUERY_ROWS,
) -> DataFrame:
    """Exact top-k like :func:`cosine_topk` but the dot products run as a
    numpy matmul inside mapInPandas (Arrow batches) — wins over the
    expression-HOF form at high dimensionality (768+), where interpreted
    per-element lambdas dominate.  Two-level top-k: each Arrow batch
    emits its local top-k per query, one window reduces to the global
    top-k; shuffled data is O(batches x |Q| x k), never the corpus."""
    import numpy as np
    import pandas as pd

    qrows = _collect_query_rows(queries, [query_id, query_vec], max_query_rows)
    if not qrows:
        raise ValueError("empty query set")
    qids = [r[0] for r in qrows]
    Q = np.asarray([list(map(float, r[1])) for r in qrows])
    Qn = Q / np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-12)

    def run(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            C = _stack(pdf[corpus_vec])
            Cn = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)
            sims = Cn @ Qn.T  # (n_batch, n_queries)
            ids = pdf[corpus_id].to_numpy()
            out_q, out_c, out_s = [], [], []
            top = min(k, sims.shape[0])
            for qi, qid in enumerate(qids):
                # 6dp-rounded scores tie often (near-dups, planted
                # copies); bare argpartition keeps an ARBITRARY tied
                # subset, which can drop the (cosine, id)-ordered
                # winner at batch level before the global window sees
                # it.  Deterministic batch top-k by the SAME
                # (-cosine, id) order the global window uses makes the
                # union provably contain the global top-k.
                sel = _det_topk(np.round(sims[:, qi], 6), ids, top)
                out_q.extend([qid] * len(sel))
                out_c.extend(ids[sel])
                out_s.extend(np.round(sims[sel, qi], 6))
            yield pd.DataFrame(
                {"query_id": out_q, "vec_id": out_c, "cosine": out_s}
            )

    batch_topk = corpus.select(corpus_id, corpus_vec).mapInPandas(
        run, "query_id long, vec_id long, cosine double"
    )
    # batch-level top-k already bounds rows to O(batches·|Q|·k); the salted
    # two-level reduction removes the per-query hot reducer on top of that
    return _topk_two_level(batch_topk, k)


def _bucket_expr(vec_col, planes):
    sig = V.srp_signature(vec_col, planes)
    return F.concat_ws(
        "", *[F.element_at(sig, i + 1).cast("string") for i in range(len(planes))]
    )


def _probe_buckets(bucket: str) -> list[str]:
    """The bucket itself plus all hamming-1 neighbors (multi-probe)."""
    out = [bucket]
    for i, ch in enumerate(bucket):
        out.append(bucket[:i] + ("1" if ch == "0" else "0") + bucket[i + 1 :])
    return out


def srp_topk(
    queries: DataFrame,
    corpus: DataFrame,
    *,
    query_id: str = "query_id",
    corpus_id: str = "vec_id",
    query_vec: str = "embedding",
    corpus_vec: str = "embedding",
    k: int = 10,
    n_planes: int = 8,
    dim: int | None = None,
) -> DataFrame:
    """LSH-bucketed approximate top-k (same output schema as cosine_topk).

    Corpus is bucketed once by SRP signature; each query probes its own
    bucket plus hamming-1 neighbors.  Recall rises with fewer planes /
    more probes; 8 planes + multi-probe ≈ high recall at ~1/2^5 of the
    corpus scanned per query.
    """
    if dim is None:
        dim = int(corpus.select(F.size(corpus_vec).alias("d")).first()["d"])
    planes = V.deterministic_planes(n_planes, dim)

    c = ensure_parallelism(corpus).select(
        F.col(corpus_id).alias("vec_id"),
        F.col(corpus_vec).alias("_cv"),
        _bucket_expr(F.col(corpus_vec), planes).alias("_bkt"),
    )
    q = queries.select(
        F.col(query_id).alias("query_id"),
        F.col(query_vec).alias("_qv"),
        _bucket_expr(F.col(query_vec), planes).alias("_qbkt"),
    )
    # multi-probe list: own bucket + every hamming-1 neighbor, in SQL
    probe_list = F.array(
        F.col("_qbkt"),
        *[
            F.concat(
                F.substring("_qbkt", 1, i),
                F.when(F.substring("_qbkt", i + 1, 1) == "0", "1").otherwise("0"),
                F.substring("_qbkt", i + 2, n_planes - i - 1),
            )
            for i in range(n_planes)
        ],
    )
    q_probed = q.select(
        "query_id", "_qv", F.explode(probe_list).alias("_bkt")
    )

    scored = F.broadcast(q_probed).join(c, on="_bkt").select(
        "query_id",
        "vec_id",
        F.round(V.cosine(F.col("_qv"), F.col("_cv")), 6).alias("cosine"),
    ).dropDuplicates(["query_id", "vec_id"])

    return _topk_two_level(scored, k)
