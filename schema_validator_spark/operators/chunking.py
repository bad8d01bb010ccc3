"""Document chunking for retrieval / context windows — fixed-size token
windows with overlap and full provenance, the step between the curation
funnel's survivors and an embedding / RAG index.  packing.pack_sequences
concatenates docs ACROSS boundaries for pretraining; this splits WITHIN
a doc and never mixes documents.

Chunk i covers tokens [i·stride, i·stride + chunk_tokens) with
stride = chunk_tokens - overlap; the last chunk is the remainder (never
empty, never past the end), and a doc shorter than one chunk yields
exactly one chunk.  Chunk ids, token offsets, and the doc id make every
chunk re-traceable to its source span.

Scale shape: pure per-row codegen — tokenize once (shared helper),
``sequence`` over chunk starts, ``transform`` + ``slice`` to cut
windows, one ``posexplode``.  Zero shuffles, zero Python; output size
is input tokens × (1 + overlap/stride), known in advance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    chunk_tokens: int,
    overlap: int = 0,
) -> DataFrame:
    """``(doc_id, chunk_id, start_tok, n_tokens, chunk_text)`` — one row
    per chunk, whitespace tokens, ``chunk_text`` re-joined with single
    spaces.  Docs with zero tokens (NULL / empty / whitespace text) are
    excluded."""
    if chunk_tokens <= 0:
        raise ValueError("chunk_tokens must be positive")
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("overlap must be in [0, chunk_tokens)")
    stride = chunk_tokens - overlap
    base = df.select(
        F.col(id_col).alias("doc_id"),
        tokens(F.coalesce(F.col(text_col), F.lit(""))).alias("_toks"),
    ).filter(F.size("_toks") > 0)
    # number of chunks: ceil(max(n - overlap, 1) / stride)
    n = F.size("_toks")
    n_chunks = F.ceil(F.greatest(n - F.lit(overlap), F.lit(1)) / F.lit(stride))
    starts = F.sequence(F.lit(0), (n_chunks - 1) * F.lit(stride), F.lit(stride))
    chunks = F.transform(
        starts,
        lambda s: F.struct(
            s.alias("start_tok"),
            F.slice(F.col("_toks"), s + 1, F.lit(chunk_tokens)).alias("_w"),
        ),
    )
    return (
        base.select("doc_id", F.posexplode(chunks).alias("chunk_id", "_c"))
        .select(
            "doc_id",
            F.col("chunk_id").cast("long").alias("chunk_id"),
            F.col("_c.start_tok").cast("long").alias("start_tok"),
            F.size("_c._w").cast("long").alias("n_tokens"),
            F.array_join("_c._w", " ").alias("chunk_text"),
        )
    )
