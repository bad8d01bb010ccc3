"""BM25 keyword retrieval over a tokenized corpus — the search view of
a code/text table (find the files for a query, rank the corpus for a
mixture probe, pull positives for classifier bootstrapping).

Reference anchor: the reference has no retrieval surface
(schema-validator validates structs); search is part of the
engine-extension suite SURVEY §2.9 mandates for the corpus table.

Scale shape — zero shuffles on the corpus: per-term tf is an array
filter over the (materialized-once) token array, so the whole score is
ONE codegen projection; the corpus statistics BM25 needs (N, avgdl,
per-term document frequencies) are ONE map-side-combinable agg row
broadcast back; the optional global top-k is the salted two-level
reduction (rank within hash-salt groups first, then rank the
n_salts·k survivors) so no single reducer sees the corpus.

Engine-reproducible scoring: each term's contribution is rounded to
6dp and scaled to an exact ``bigint`` BEFORE summing — integer
addition is order-independent, so any engine replaying the arithmetic
(the DuckDB oracle) reproduces ``score_e6`` bit-exactly regardless of
its summation order.  ``score`` is score_e6 / 1e6 for human use.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def bm25_search(
    df: DataFrame,
    id_col: str,
    tokens: Column,
    query_terms: list[str],
    *,
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int | None = None,
    n_salts: int = 64,
) -> DataFrame:
    """Score every document against ``query_terms`` with BM25
    (Robertson idf: ln((N - n + 0.5)/(n + 0.5) + 1)).

    ``tokens`` is the tokenization as a Column over ``df`` (pass
    ``codedup.code_tokens(F.col("content"))`` for code,
    ``text.tokens(F.col("text"))`` for prose) — search and indexing
    share one definition by construction.  Terms are matched exactly
    (lowercase your terms to match a lowercasing tokenizer).

    Returns ``(id_col, matched_terms, score_e6, score)`` for documents
    matching ≥ 1 term; with ``top_k`` adds ``rank`` and keeps the global
    top k (ties broken by id ascending — deterministic)."""
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    if len(set(query_terms)) != len(query_terms):
        raise ValueError("query_terms must be distinct")
    if k1 <= 0 or not 0 <= b <= 1:
        raise ValueError("need k1 > 0 and 0 <= b <= 1")

    base = df.select(F.col(id_col), tokens.alias("_tk")).withColumn(
        "_dl", F.size("_tk")
    )
    # tf as size-delta of array_remove, NOT a lambda F.filter: HOFs are
    # CodegenFallback, so if CollapseProject inlines `tokens` into the
    # per-term columns a HOF form re-tokenizes once PER TERM per row
    # (measured 5x on a 3-term query); the all-codegen form keeps every
    # inlined copy eligible for codegen subexpression elimination.
    tf_cols = [
        (F.size("_tk") - F.size(F.array_remove("_tk", t)))
        .alias(f"_tf{i}")
        for i, t in enumerate(query_terms)
    ]
    # The tf frame feeds TWO consumers (the corpus-stats aggregate and
    # the scoring join), so left lazy the scan + tokenization would run
    # twice end-to-end (measured ~8x tokenization cost with the HOF
    # form).  Materialize the NARROW (id, _dl, _tf*) frame once — no
    # content column, ~30 B/row — the same discipline as the CC edge
    # materialization (cluster_pairs, 7.2x).
    tfd = base.select(id_col, "_dl", *tf_cols).localCheckpoint()

    stats = tfd.agg(
        F.count(F.lit(1)).alias("_N"),
        F.sum("_dl").alias("_sumdl"),
        *[
            F.sum((F.col(f"_tf{i}") > 0).cast("long")).alias(f"_df{i}")
            for i in range(len(query_terms))
        ],
    )
    scored = tfd.join(F.broadcast(stats))

    avgdl = F.col("_sumdl") / F.col("_N")
    contribs = []
    for i in range(len(query_terms)):
        tf = F.col(f"_tf{i}").cast("double")
        n = F.col(f"_df{i}").cast("double")
        idf = F.log(
            (F.col("_N") - n + F.lit(0.5)) / (n + F.lit(0.5)) + F.lit(1.0)
        )
        denom = tf + F.lit(k1) * (
            F.lit(1.0 - b) + F.lit(b) * F.col("_dl") / avgdl
        )
        c = idf * tf * F.lit(k1 + 1.0) / denom
        contribs.append(
            F.when(
                F.col(f"_tf{i}") > 0,
                F.round(c * F.lit(1e6)).cast("long"),
            ).otherwise(F.lit(0).cast("long"))
        )
    score_e6 = sum(contribs[1:], contribs[0])
    matched = sum(
        ((F.col(f"_tf{i}") > 0).cast("int") for i in range(1, len(query_terms))),
        (F.col("_tf0") > 0).cast("int"),
    )
    out = scored.select(
        F.col(id_col),
        matched.alias("matched_terms"),
        score_e6.alias("score_e6"),
        (score_e6 / F.lit(1e6)).alias("score"),
    ).filter(F.col("matched_terms") > 0)
    if top_k is None:
        return out
    if top_k <= 0:
        raise ValueError("top_k must be positive")
    w1 = Window.partitionBy("_salt").orderBy(
        F.col("score_e6").desc(), F.col(id_col).asc()
    )
    local = (
        out.withColumn("_salt", F.pmod(F.xxhash64(F.col(id_col)), n_salts))
        .withColumn("_r1", F.row_number().over(w1))
        .filter(F.col("_r1") <= top_k)
        .drop("_r1", "_salt")
    )
    w2 = Window.orderBy(F.col("score_e6").desc(), F.col(id_col).asc())
    return (
        local.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= top_k)
    )


def bm25_score_py(
    corpus: dict, query_terms: list[str], *, k1: float = 1.2, b: float = 0.75
) -> dict:
    """First-principles serial replay for tests: ``corpus`` maps id →
    token list; returns id → score_e6 for ids matching ≥ 1 term.  Same
    per-term 6dp-scaled integer contributions as :func:`bm25_search`."""
    N = len(corpus)
    if N == 0:
        return {}
    avgdl = sum(len(t) for t in corpus.values()) / N
    dfs = {
        t: sum(1 for toks in corpus.values() if t in toks)
        for t in query_terms
    }
    out = {}
    for i, toks in corpus.items():
        s = 0
        for t in query_terms:
            tf = sum(1 for x in toks if x == t)
            if tf == 0:
                continue
            idf = math.log((N - dfs[t] + 0.5) / (dfs[t] + 0.5) + 1.0)
            c = (
                idf
                * tf
                * (k1 + 1.0)
                / (tf + k1 * (1.0 - b + b * len(toks) / avgdl))
            )
            # HALF_UP like Spark's F.round (c is always positive here);
            # Python round() is half-even and differs on exact .5 ties
            s += int(math.floor(c * 1e6 + 0.5))
        if s or any(t in toks for t in query_terms):
            out[i] = s
    return out
