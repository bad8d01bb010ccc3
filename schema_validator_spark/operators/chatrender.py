"""Chat-template rendering + assistant loss-mask spans — the step
after :mod:`chatlint` in an SFT pipeline: turn a validated
``messages`` JSON into the flat training text AND the character spans
of assistant content, so the tokenizer stage can mask loss to
assistant turns (the standard instruction-tuning recipe; the span is
what ``ignore_index`` masking is derived from).

Template (deterministic, byte-exact replayable):
``<|role|>\\n{content}\\n`` per message, concatenated in order.  The
span of an assistant message covers exactly its ``content`` substring
(0-based start, end exclusive) inside the rendered text.

Reference anchor: pure-function rendering mirrors the reference's
side-effect-free rule evaluation; part of the engine-extension
surface SURVEY §2.9 mandates for training-data preparation.

Scale shape: ZERO shuffles, zero Python.  ``from_json`` is bound ONCE
as a lambda variable (interpreted HOFs get no CSE — chatlint._bound);
offsets come from ONE O(n_turns) ``aggregate`` pass carrying a
``(pos, spans)`` struct accumulator, not an O(n²) per-span re-sum.
Span rows are emitted via ``explode`` (the violation-emission shape,
engine.py) — output cardinality = number of assistant turns, each row
carrying ``span_text`` sliced back out of the rendered string so an
oracle can verify offsets independently of the renderer.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .chatlint import MESSAGES_SCHEMA, _bound


def _render_one(p: Column) -> Column:
    """``struct(rendered, spans)`` from a bound parsed array."""
    rendered = F.aggregate(
        p,
        F.lit(""),
        lambda acc, m: F.concat(
            acc,
            F.lit("<|"),
            F.coalesce(m["role"], F.lit("")),
            F.lit("|>\n"),
            F.coalesce(m["content"], F.lit("")),
            F.lit("\n"),
        ),
    )
    spans = F.aggregate(
        p,
        F.struct(
            F.lit(0).cast("long").alias("pos"),
            F.array().cast(
                "array<struct<start_char:long,end_char:long>>"
            ).alias("spans"),
        ),
        lambda acc, m: F.struct(
            (
                acc["pos"]
                # <| role |>\n  content \n
                + F.length(F.coalesce(m["role"], F.lit(""))) + 5
                + F.length(F.coalesce(m["content"], F.lit(""))) + 1
            ).alias("pos"),
            F.when(
                m["role"] == "assistant",
                F.concat(
                    acc["spans"],
                    F.array(
                        F.struct(
                            (
                                acc["pos"]
                                + F.length(
                                    F.coalesce(m["role"], F.lit(""))
                                )
                                + 5
                            ).alias("start_char"),
                            (
                                acc["pos"]
                                + F.length(
                                    F.coalesce(m["role"], F.lit(""))
                                )
                                + 5
                                + F.length(
                                    F.coalesce(m["content"], F.lit(""))
                                )
                            ).alias("end_char"),
                        )
                    ),
                ),
            ).otherwise(acc["spans"]).alias("spans"),
        ),
        lambda acc: acc["spans"],
    )
    return F.struct(rendered.alias("rendered"), spans.alias("spans"))


def render_chat(
    df: DataFrame,
    id_cols: list[str],
    conv_col: str,
) -> DataFrame:
    """One row PER ASSISTANT TURN: ``(ids..., rendered_md5, n_chars,
    span_idx, start_char, end_char, span_text)``.

    ``span_text`` is sliced back out of the rendered string at the
    reported offsets — equality with the message's content is a
    self-check any independent replay exercises for free.
    Conversations with no assistant turn emit no rows (render the
    corpus through :func:`chatlint.filter_valid_chats` first; a valid
    conversation always ends with one).  NULL roles/contents render
    as empty strings — lint rejects them upstream, rendering must
    still be total.
    """
    for c in ("_r", "_sp", "_rtext"):
        if c in df.columns:
            raise ValueError(f"reserved temp column {c!r} present in input")
    out_cols = ["rendered_md5", "n_chars", "span_idx", "start_char",
                "end_char", "span_text"]
    clash = [c for c in out_cols + ["_rtext"] if c in id_cols]
    if clash:
        raise ValueError(f"id_cols collide with output column(s) {clash}")
    parsed = F.from_json(F.col(conv_col), MESSAGES_SCHEMA)
    r = _bound(
        F.coalesce(parsed, F.from_json(F.lit("[]"), MESSAGES_SCHEMA)),
        _render_one,
    )
    rendered = F.col("_r")["rendered"]
    return (
        df.withColumn("_r", r)
        .select(
            *[F.col(c) for c in id_cols],
            F.md5(rendered).alias("rendered_md5"),
            F.length(rendered).alias("n_chars"),
            rendered.alias("_rtext"),
            F.posexplode(F.col("_r")["spans"]).alias("span_idx", "_sp"),
        )
        .select(
            *[F.col(c) for c in id_cols],
            "rendered_md5",
            "n_chars",
            F.col("span_idx").cast("long").alias("span_idx"),
            F.col("_sp")["start_char"].alias("start_char"),
            F.col("_sp")["end_char"].alias("end_char"),
            F.substring(
                F.col("_rtext"),
                (F.col("_sp")["start_char"] + 1).cast("int"),
                (F.col("_sp")["end_char"] - F.col("_sp")["start_char"])
                .cast("int"),
            ).alias("span_text"),
        )
    )
