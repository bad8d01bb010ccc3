"""Halstead software-science metrics over the (repo, path, commit,
lang, content) source-code table (Halstead 1977) — the volume /
difficulty / effort companions to operators/complexity.py's McCabe
proxy; together they are the classic maintainability-index inputs a
corpus-quality gate thresholds on.

Lexical tier, same trade as complexity.py (documented): no parser, so
tokens inside strings/comments count.  Classification:

- **operands** — identifier tokens not in the lang's keyword stop-list
  (single-sourced from functions/identifiers.KEYWORDS) plus numeric
  digit-run tokens;
- **operators** — keyword tokens plus each occurrence of a punctuation
  operator character from a fixed charset (``+ - * / % = < > ! & | ^ ~
  ? : . , ; ( ) [ ] { }``), counted per character — the standard
  lexical approximation (multi-char operators like ``==`` count as two
  ``=``; deterministic and engine-reproducible, which matters more
  here than operator-grammar fidelity).

Derived measures (0 where a denominator vanishes):
``vocabulary n = n1 + n2``, ``length N = N1 + N2``,
``volume V = N * log2(n)``, ``difficulty D = (n1/2) * (N2/n2)``,
``effort E = D * V``.

Scale shape: one full-coverage tokenization (dobf.TOKEN_RE) + one
operator-char extraction, both materialized ONCE as explicit columns
(interpreted HOFs never CSE — CLAUDE.md), then pure size /
array_distinct / arithmetic expressions riding the scan — zero
shuffles, zero joins, zero Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.identifiers import KEYWORDS
from .dobf import TOKEN_RE, _keyword_array

#: punctuation operator charset (single source of truth for the
#: oracle); leading '-' keeps the class literal under Java and RE2
OPERATOR_CHAR_RE = r"[-+*/%=<>!&|^~?:.,;()\[\]{}]"


def halstead_metrics(
    df: DataFrame,
    id_cols: list[str],
    content_col: str,
    lang_col: str,
    *,
    keywords: dict[str, tuple[str, ...]] | None = None,
) -> DataFrame:
    """Adds per-row Halstead columns: ``n1``/``n2`` (distinct
    operators/operands), ``big_n1``/``big_n2`` (total occurrences),
    ``volume``/``difficulty``/``effort`` (doubles, 0.0 for empty
    files)."""
    kw = KEYWORDS if keywords is None else keywords
    content = F.coalesce(F.col(content_col), F.lit(""))

    d = df.withColumn("_kw", _keyword_array(F.col(lang_col), kw))
    d = d.withColumn("_toks", F.regexp_extract_all(content, F.lit(TOKEN_RE), 0))
    # word tokens split by keyword membership; digit runs are operands
    d = d.withColumn(
        "_operands",
        F.filter(
            "_toks",
            lambda t: t.rlike(r"^[A-Za-z0-9_]")
            & ~F.array_contains(F.col("_kw"), t),
        ),
    )
    d = d.withColumn(
        "_kw_toks",
        F.filter(
            "_toks",
            lambda t: t.rlike(r"^[A-Za-z_]")
            & F.array_contains(F.col("_kw"), t),
        ),
    )
    d = d.withColumn(
        "_op_chars", F.regexp_extract_all(content, F.lit(OPERATOR_CHAR_RE), 0)
    )
    n1 = F.size(F.array_distinct("_kw_toks")) + F.size(
        F.array_distinct("_op_chars")
    )
    n2 = F.size(F.array_distinct("_operands"))
    big_n1 = F.size("_kw_toks") + F.size("_op_chars")
    big_n2 = F.size("_operands")
    d = (
        d.withColumn("n1", n1.cast("long"))
        .withColumn("n2", n2.cast("long"))
        .withColumn("big_n1", big_n1.cast("long"))
        .withColumn("big_n2", big_n2.cast("long"))
    )
    vocab = F.col("n1") + F.col("n2")
    length = F.col("big_n1") + F.col("big_n2")
    volume = F.when(vocab > 0, length.cast("double") * F.log2(vocab)).otherwise(
        F.lit(0.0)
    )
    d = d.withColumn("volume", volume)
    difficulty = F.when(
        F.col("n2") > 0,
        (F.col("n1") / F.lit(2.0)) * (F.col("big_n2") / F.col("n2")),
    ).otherwise(F.lit(0.0))
    d = d.withColumn("difficulty", difficulty)
    d = d.withColumn("effort", F.col("difficulty") * F.col("volume"))
    return d.drop("_kw", "_toks", "_operands", "_kw_toks", "_op_chars")
