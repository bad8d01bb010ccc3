"""Markdown fenced-code extraction → (prose, code) instruction pairs.

README/docs files are the richest natural source of aligned
natural-language ↔ code examples outside notebooks: a fenced code
block almost always follows the paragraph that explains it.  This is
the Markdown analog of functions/notebook.py's Jupyter md→code pairs
(CodeSearchNet / StarCoder-style instruction mining), over the north
rule's (repo, path, commit, lang, content) table filtered to markdown
paths.

Reference anchor: the reference validates per-record fields only
(schema-validator rule/*.go); pair mining is part of the
engine-extension surface SURVEY §2.9 mandates for training-data
construction (same family as operators/docpairs.py).

Scale shape: ZERO shuffles — one literal split materialized ONCE
(the house rule: interpreted HOFs never CSE, so `_parts` is an
explicit column), fence accounting and prose/info/code slicing are
pure codegen HOFs riding the scan, pairs leave via one narrow
posexplode.  Per-row cost is O(content length).

Fence semantics (kept deliberately simple and engine-replayable):
blocks are delimited by literal ``````` runs; after
splitting on the fence token, even 1-based positions are inside a
fence.  A trailing UNCLOSED fence (even part count) is dropped.  The
info string is the block's first line; the prose context is the last
blank-line-separated paragraph of the preceding segment.  Nested or
indented fences and tilde fences are out of scope (documented).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Whitespace set for trimming (F.trim strips SPACES only; btrim with
#: this set matches DuckDB's trim(s, chars) for the oracle replay).
WS = " \t\r\n"

#: Literal fence token (split pattern — backticks are regex-inert).
FENCE = "```"

#: Paragraph separator inside the preceding prose segment.  Explicit
#: ``[ \t]*`` instead of ``\s`` — Java's \s includes \x0B, RE2's does
#: not, and the oracle replays this in DuckDB.
PARA_SEP_RE = r"\n[ \t]*\n"


def markdown_code_pairs(
    df: DataFrame,
    id_cols: list[str],
    content_col: str,
    *,
    min_code_chars: int = 1,
    min_prose_chars: int = 1,
) -> DataFrame:
    """One row per closed fenced code block:
    ``(id_cols..., pair_index, info, prose, code)``.

    - ``pair_index`` — 1-based block order within the document.
    - ``info`` — trimmed fence info string (first line of the block;
      e.g. ``python``), empty when absent.
    - ``prose`` — trimmed last paragraph of the text preceding the
      fence (the explanation a pair miner wants).
    - ``code`` — block body after the info line, trailing newline
      trimmed of surrounding whitespace ONLY via the filter gates
      (the code text itself is preserved byte-exactly).

    Blocks whose trimmed code is shorter than ``min_code_chars`` or
    whose prose context is shorter than ``min_prose_chars`` are
    dropped — fences without explanation are not instruction pairs.
    """
    if "_parts" in df.columns:
        raise ValueError("markdown_code_pairs reserves column '_parts'")
    s = F.coalesce(F.col(content_col), F.lit(""))
    with_parts = df.select(
        *id_cols, F.split(s, FENCE, -1).alias("_parts")
    )
    parts = F.col("_parts")
    n = F.size(parts)
    # even 1-based positions are fenced; an unclosed trailing fence
    # (p == n when n is even) never yields a block because p < n.
    block_pos = F.filter(
        F.sequence(F.lit(2), F.greatest(n, F.lit(2)), F.lit(2)),
        lambda p: p < n,
    )
    raw = lambda p: F.element_at(parts, p)  # noqa: E731
    info = lambda p: F.btrim(F.substring_index(raw(p), "\n", 1), F.lit(WS))  # noqa: E731
    code = lambda p: F.when(  # noqa: E731
        F.instr(raw(p), "\n") > 0,
        F.substr(raw(p), F.instr(raw(p), "\n") + 1, F.length(raw(p))),
    ).otherwise(F.lit(""))
    # last NON-EMPTY paragraph of the preceding segment (the segment
    # almost always ends with the blank line before the fence, so the
    # raw last split piece is empty); try_element_at because the array
    # can be empty and ANSI mode would make element_at throw.
    prose = lambda p: F.coalesce(  # noqa: E731
        F.try_element_at(
            F.filter(
                F.transform(
                    F.split(raw(p - 1), PARA_SEP_RE, -1),
                    lambda seg: F.btrim(seg, F.lit(WS)),
                ),
                lambda seg: F.length(seg) > 0,
            ),
            F.lit(-1),
        ),
        F.lit(""),
    )
    pairs = F.transform(
        block_pos,
        lambda p: F.struct(
            (p / 2).cast("int").alias("pair_index"),
            info(p).alias("info"),
            prose(p).alias("prose"),
            code(p).alias("code"),
        ),
    )
    kept = F.filter(
        pairs,
        lambda q: (F.length(F.btrim(q["code"], F.lit(WS))) >= min_code_chars)
        & (F.length(q["prose"]) >= min_prose_chars),
    )
    return with_parts.select(
        *id_cols, F.explode(kept).alias("_p")
    ).select(
        *id_cols,
        F.col("_p.pair_index").alias("pair_index"),
        F.col("_p.info").alias("info"),
        F.col("_p.prose").alias("prose"),
        F.col("_p.code").alias("code"),
    )
