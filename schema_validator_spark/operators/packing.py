"""Sequence packing for LLM pretraining batches.

``pack_sequences`` implements the standard concat-and-chunk packing used
by GPT/LLaMA-style pretraining: documents are laid end-to-end in a
deterministic order and the resulting token stream is cut into
fixed-length training sequences of ``seq_len`` tokens.  The output is
the *packing manifest*: one row per (sequence, document-slice), telling
a downstream tokenizer exactly which token range of which document lands
where in which training sequence.  A document longer than ``seq_len``
spans several sequences; a short document shares its sequence with
neighbours — that is the whole point of packing (near-zero padding).

Reference scope: the reference library (weilence/schema-validator) stops
at struct validation; packing is part of this repo's LLM-curation
extension suite (SURVEY.md §2.9), downstream of token-budget sampling.

Determinism: document order is the md5(id || salt) rank used by every
sampling operator here — no RNG state, so any engine (the DuckDB oracle
included) reproduces the identical packing.

Scale shape — distributed prefix sum, NO global sort: the md5 rank's
first byte splits the corpus into 256 ordered ranges (the byte is a
prefix of the rank, so (range, rank) order == rank order).  Pass 1
aggregates per-range token sums (map-side combinable, 256 output rows)
and turns them into running offsets with one tiny window; pass 2
broadcast-joins the offsets back and cumsums WITHIN each range — a
10^10-document corpus cumsums as 256 parallel tasks, not one.  The
explode that maps a document onto its sequences emits at most
n_tokens/seq_len + 1 rows per document, so output size is bounded by
corpus_tokens/seq_len + n_docs regardless of skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .sampling import _hash_key


def _stream_offsets(
    df: DataFrame, id_col: str, amount_col: str, salt: str
) -> DataFrame:
    """``(id_col, _n, _g, ...)``: each row's exclusive prefix-sum offset
    ``_g`` of ``_n = cast(amount_col as long)`` in the deterministic
    md5(id || salt)-rank stream order — the shared 256-range distributed
    prefix sum (see module docstring).  Rows with NULL / non-positive
    amounts are excluded.  Single source for pack_sequences and
    assign_shards so the two manifests can never diverge from the same
    stream order."""
    h = _hash_key(id_col, salt)
    rng = F.conv(F.substring(h, 1, 2), 16, 10).cast("int")
    docs = (
        df.select(
            F.col(id_col),
            F.coalesce(F.col(amount_col), F.lit(0)).cast("long").alias("_n"),
        )
        .filter(F.col("_n") > 0)
        .withColumn("_h", h)
        .withColumn("_rng", rng)
    )

    # Pass 1: per-range totals -> exclusive running offsets (256 rows).
    bucket_sums = docs.groupBy("_rng").agg(F.sum("_n").alias("_bsum"))
    w_off = (
        Window.orderBy(F.col("_rng").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = bucket_sums.select(
        "_rng", F.coalesce(F.sum("_bsum").over(w_off), F.lit(0)).alias("_roff")
    )

    # Pass 2: local cumsum within each range + broadcast range offset.
    w_local = Window.partitionBy("_rng").orderBy(
        F.col("_h").asc(), F.col(id_col).asc()
    )
    cum_incl = F.sum("_n").over(
        w_local.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        docs.join(F.broadcast(offsets), "_rng")
        .withColumn("_g", F.col("_roff") + cum_incl - F.col("_n"))
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    token_col: str,
    seq_len: int,
    *,
    salt: str = "v1",
    drop_partial_tail: bool = False,
) -> DataFrame:
    """Pack documents into fixed-length training sequences.

    Returns one row per (sequence, document-slice):

    * ``seq_id``    — 0-based training-sequence index
    * ``<id_col>``  — the document supplying this slice
    * ``begin_tok`` — first token of the slice, 0-based WITHIN the doc
    * ``end_tok``   — exclusive end token of the slice within the doc
    * ``seq_off``   — where the slice starts WITHIN the sequence

    Every kept document's tokens are covered exactly once
    (sum(end_tok - begin_tok) over the doc == its token count) and every
    sequence is exactly ``seq_len`` tokens except possibly the last.
    Documents with a non-positive/NULL token count are excluded (they
    contribute nothing to the stream).

    ``drop_partial_tail=True`` drops the final partial sequence (the
    usual choice for training, where ragged batches are useless).
    """
    if seq_len <= 0:
        raise ValueError("seq_len must be positive")

    docs = _stream_offsets(df, id_col, token_col, salt)
    placed = docs

    # A doc occupying global tokens [_g, _g + _n) touches sequences
    # _g div L .. (_g + _n - 1) div L; slice arithmetic is exact long
    # `div`, never floating point.
    L = int(seq_len)
    placed = placed.withColumn(
        "seq_id",
        F.explode(
            F.sequence(
                F.expr(f"_g div {L}"), F.expr(f"(_g + _n - 1) div {L}")
            )
        ),
    )
    slice_begin = F.greatest(F.col("_g"), F.col("seq_id") * L)
    slice_end = F.least(F.col("_g") + F.col("_n"), (F.col("seq_id") + 1) * L)
    out = placed.select(
        F.col("seq_id"),
        F.col(id_col),
        (slice_begin - F.col("_g")).alias("begin_tok"),
        (slice_end - F.col("_g")).alias("end_tok"),
        (slice_begin - F.col("seq_id") * L).alias("seq_off"),
    )
    if drop_partial_tail:
        total = docs.agg(F.sum("_n").alias("t"))
        out = out.join(
            F.broadcast(total),
            out["seq_id"] < F.expr(f"t div {L}"),
            "left_semi",
        )
    return out


def assign_shards(
    df: DataFrame,
    id_col: str,
    size_col: str,
    *,
    shard_bytes: int | None = None,
    num_shards: int | None = None,
    salt: str = "v1",
) -> DataFrame:
    """Deterministic training-shard assignment — the export manifest:
    each file goes WHOLE to the shard its global stream offset falls
    in.  Returns ``(id_col, shard_id, offset, size)`` where ``offset``
    is the file's exclusive byte prefix in the md5-rank stream order
    and ``shard_id = offset div shard_bytes``.

    Give exactly one of ``shard_bytes`` (fixed-size shards, count
    floats) or ``num_shards`` (fixed count: shard_bytes = ceil(total /
    num_shards) from one tiny agg, so shard_id < num_shards always).

    Whole-file granularity means a shard can overflow its target by up
    to one file (and a file BIGGER than shard_bytes overflows it by
    itself) — the standard manifest trade; use :func:`pack_sequences`
    when slices may split.  Same scale shape as packing: 256-range
    distributed prefix sum, no global sort, nothing collected; rows
    with NULL/non-positive size are excluded."""
    if (shard_bytes is None) == (num_shards is None):
        raise ValueError("give exactly one of shard_bytes / num_shards")
    if shard_bytes is not None and shard_bytes <= 0:
        raise ValueError("shard_bytes must be positive")
    if num_shards is not None and num_shards <= 0:
        raise ValueError("num_shards must be positive")

    placed = _stream_offsets(df, id_col, size_col, salt)
    if shard_bytes is not None:
        placed = placed.withColumn(
            "_sb", F.lit(int(shard_bytes)).cast("long")
        )
    else:
        total = placed.agg(F.sum("_n").alias("_t"))
        placed = placed.join(F.broadcast(total)).withColumn(
            # ceil(total / num_shards) in exact long arithmetic
            "_sb",
            F.expr(f"(_t + {int(num_shards)} - 1) div {int(num_shards)}"),
        )
    return placed.select(
        F.col(id_col),
        # exact long division — never float at stream-offset magnitudes
        F.expr("_g div _sb").alias("shard_id"),
        F.col("_g").cast("long").alias("offset"),
        F.col("_n").alias("size"),
    )


def shard_leakage(
    pairs: DataFrame,
    shards: DataFrame,
    *,
    id_col: str,
    pair_a: str = "id_a",
    pair_b: str = "id_b",
    shard_col: str = "shard_id",
) -> DataFrame:
    """Cross-shard contamination audit: given near/exact-duplicate
    ``pairs`` and a shard ``manifest`` (:func:`assign_shards` output or
    any ``(id, shard_id)`` frame), count duplicate pairs whose members
    landed in DIFFERENT shards — the train/eval leakage a
    shard-sampled split inherits when dedup ran after sharding (or not
    at all).

    Returns one row per unordered shard pair: ``(shard_a, shard_b,
    n_pairs, n_docs_a, n_docs_b)`` with ``shard_a < shard_b``;
    ``n_docs_a``/``n_docs_b`` are the distinct documents on each side.
    Same-shard pairs are benign for split integrity and are excluded.

    Scale shape: two keyed joins of the pair frame (near-dup-pair
    scale — orders of magnitude below corpus scale after any dedup
    tier) against the manifest on the id, then ONE map-side-combinable
    groupBy over the tiny shard-pair vocabulary.  Pairs whose member
    is absent from the manifest (zero-size files are excluded by
    assign_shards) drop via the inner joins — absent docs cannot leak.
    """
    a = shards.select(
        F.col(id_col).alias(pair_a), F.col(shard_col).alias("_sa")
    )
    b = shards.select(
        F.col(id_col).alias(pair_b), F.col(shard_col).alias("_sb")
    )
    j = (
        pairs.select(pair_a, pair_b)
        .join(a, pair_a)
        .join(b, pair_b)
        .filter(F.col("_sa") != F.col("_sb"))
    )
    swap = F.col("_sa") > F.col("_sb")
    norm = j.select(
        F.when(swap, F.col("_sb")).otherwise(F.col("_sa")).alias("shard_a"),
        F.when(swap, F.col("_sa")).otherwise(F.col("_sb")).alias("shard_b"),
        F.when(swap, F.col(pair_b)).otherwise(F.col(pair_a)).alias("_da"),
        F.when(swap, F.col(pair_a)).otherwise(F.col(pair_b)).alias("_db"),
    )
    return norm.groupBy("shard_a", "shard_b").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.count_distinct("_da").alias("n_docs_a"),
        F.count_distinct("_db").alias("n_docs_b"),
    )


def pack_sweep(
    df: DataFrame,
    token_count_col: str,
    max_lens: list[int] | None = None,
) -> DataFrame:
    """Context-length planning sweep: for each candidate sequence
    length L, the cost of training at L under the two standard
    layouts — per-document truncate-and-pad (one doc per sequence)
    and concat-and-chunk packing (``pack_sequences``) — in ONE pass:
    ``(max_len, n_docs, docs_truncated, tokens_lost, pad_tokens,
    n_packed_seqs, utilization_e6)``.

    ``tokens_lost`` = tokens cut by truncation; ``pad_tokens`` = pad
    waste when each (truncated) doc is padded to L;
    ``utilization_e6`` = kept / (n_docs * L) at 6dp — the number that
    actually decides L.  ``n_packed_seqs`` = ceil(total_tokens / L),
    the packed alternative's sequence count (packing wastes at most
    one tail sequence, which is why long-context training packs).

    Scale shape: ZERO row multiplication — |max_lens| * 4 conditional
    aggregates in ONE map-side-combined pass over the corpus, then a
    constant-size stack unpivot of the single result row (the repo's
    per-column-scan -> stack pattern).  NULL token counts count 0.
    """
    if max_lens is None:
        max_lens = [512, 1024, 2048, 4096, 8192]
    if not max_lens or any(l < 1 for l in max_lens):
        raise ValueError("max_lens must be non-empty positive ints")
    if len(set(max_lens)) != len(max_lens):
        raise ValueError("duplicate max_lens")
    n = F.coalesce(F.col(token_count_col), F.lit(0)).cast("long")
    aggs = [
        F.count(F.lit(1)).alias("_nd"),
        F.sum(n).alias("_tot"),
    ]
    for L in max_lens:
        kept = F.least(n, F.lit(L))
        aggs += [
            F.sum((n > L).cast("long")).alias(f"_tr_{L}"),
            F.sum(n - kept).alias(f"_lost_{L}"),
            F.sum(F.lit(L) - kept).alias(f"_pad_{L}"),
            F.sum(kept).alias(f"_kept_{L}"),
        ]
    row = df.agg(*aggs)
    stack = ", ".join(
        f"{L}L, _tr_{L}, _lost_{L}, _pad_{L}, _kept_{L}"
        for L in max_lens
    )
    un = row.selectExpr(
        "_nd", "_tot",
        f"stack({len(max_lens)}, {stack}) as "
        "(max_len, docs_truncated, tokens_lost, pad_tokens, _kept)",
    )
    return un.select(
        F.col("max_len"),
        F.col("_nd").alias("n_docs"),
        F.col("docs_truncated"),
        F.col("tokens_lost"),
        F.col("pad_tokens"),
        F.ceil(F.col("_tot") / F.col("max_len")).cast("long").alias(
            "n_packed_seqs"
        ),
        F.round(
            F.col("_kept") * 1e6 / (F.col("_nd") * F.col("max_len"))
        ).cast("long").alias("utilization_e6"),
    )
