"""NL-PL pair extraction: (function, docstring) pairs from Python
chunks — the CodeSearchNet / CodeT5 training-data construction step
that pairs natural-language intent with its implementation.

Operates on the output of operators/codechunk.chunk_functions (one row
per top-level unit, decorators attached).  A pair is emitted when the
chunk opens with a (possibly decorated, possibly async) ``def`` whose
suite begins with a string literal — the docstring.  Extraction is
anchored at the chunk start (``\\A``) so nested defs deeper in the
chunk can never contribute a second, ambiguous match, and the two
quote styles are two separate RE2-safe patterns (NO backreferences —
the DuckDB oracle replays them verbatim; at one anchor position at
most one style can match).

Documented lexical limits (no parser): a multi-line signature
(``def f(\\n  x\\n):``) or a comment line between the def and its
docstring yields no pair — the function simply isn't sampled, never
mis-sampled; a raw/bytes prefix up to two chars (r/b/u combinations
before the triple quote) is accepted; the docstring text is returned
exactly as written (no dedent).

Scale shape: ZERO shuffles — a fixed count of regex passes per chunk
(2 anchored probes + 3 anchored extracts), each linear in the chunk
prefix it inspects thanks to the ``\\A`` anchor; the lang filter runs
BEFORE chunking in ``extract_nlpl_pairs`` so non-Python rows never pay
the chunker.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: chunk-start prefix: optional decorator stack, optional async, def
_PY_HEAD = r"\A(?:@[^\n]*\n)*(?:async\s+)?def"

#: first capture = function name
PY_NAME_RE = _PY_HEAD + r"\s+([A-Za-z_][A-Za-z0-9_]*)"

#: first capture = the full def line (the signature; multi-line
#: signatures fall outside the lexical tier, see module docstring)
PY_SIG_RE = r"\A(?:@[^\n]*\n)*((?:async\s+)?def[^\n]*)"


def py_doc_re(quote: str) -> str:
    """Anchored docstring pattern for one triple-quote style
    (``'\"\"\"'`` or ``\"'''\"``): def line ending in ``:``, then the
    suite's first statement is a string literal with an optional
    raw/bytes prefix.  First capture = the docstring body."""
    q = quote * 3
    return (
        r"(?s)" + _PY_HEAD + r"[^\n]*:[ \t]*\n\s*[rRbBuU]{0,2}"
        + q + r"(.*?)" + q
    )


def docstring_pairs(
    df: DataFrame,
    id_cols: list[str],
    chunk_col: str,
) -> DataFrame:
    """``(id_cols..., func_name, signature, docstring)`` — one row per
    chunk whose leading unit is a def with a docstring; other chunks
    are dropped.  ``docstring`` is the literal body (may be ``''`` for
    an empty docstring — still a pair)."""
    c = F.coalesce(F.col(chunk_col), F.lit(""))
    d1, d2 = py_doc_re('"'), py_doc_re("'")
    doc = (
        F.when(c.rlike(d1), F.regexp_extract(c, d1, 1))
        .when(c.rlike(d2), F.regexp_extract(c, d2, 1))
    )
    return (
        df.select(
            *id_cols,
            F.regexp_extract(c, PY_NAME_RE, 1).alias("func_name"),
            F.regexp_extract(c, PY_SIG_RE, 1).alias("signature"),
            doc.alias("docstring"),
        )
        .filter(F.col("docstring").isNotNull())
    )


def docstring_coverage(
    df: DataFrame,
    repo_col: str,
    content_col: str,
    lang_col: str,
) -> DataFrame:
    """Per-repo documentation coverage ``(repo, n_functions,
    n_documented, doc_coverage)`` over Python function chunks — the
    CodeSearchNet-style corpus-quality metric (what share of the
    repo's API carries NL intent).  ``doc_coverage`` rounded 6dp;
    repos with Python files but zero function chunks don't appear.

    Scale shape: the chunker's zero-shuffle plan plus ONE map-side-
    combinable groupBy at repo scale."""
    from schema_validator_spark.operators.codechunk import chunk_functions

    py = df.filter(
        F.lower(F.coalesce(F.col(lang_col), F.lit(""))) == "py"
    )
    chunks = chunk_functions(
        py, [repo_col], content_col, lang_col, with_sha=False
    )
    c = F.coalesce(F.col("chunk_text"), F.lit(""))
    d1, d2 = py_doc_re('"'), py_doc_re("'")
    is_def = c.rlike(_PY_HEAD).cast("int")
    has_doc = (c.rlike(d1) | c.rlike(d2)).cast("int")
    out = (
        chunks.groupBy(repo_col)
        .agg(
            F.sum(is_def).alias("n_functions"),
            F.sum(is_def * has_doc).alias("n_documented"),
        )
        .filter(F.col("n_functions") > 0)
    )
    return out.select(
        repo_col,
        "n_functions",
        "n_documented",
        F.round(
            F.col("n_documented") / F.col("n_functions"), 6
        ).alias("doc_coverage"),
    )


def extract_nlpl_pairs(
    df: DataFrame,
    id_cols: list[str],
    content_col: str,
    lang_col: str,
) -> DataFrame:
    """File table in, pair table out: filter to Python (BEFORE the
    chunker — predicate pushdown to the scan), chunk into top-level
    units, extract ``(id_cols..., chunk_idx, chunk_sha, func_name,
    signature, docstring)``.  ``chunk_sha`` pins the PL side
    byte-exactly (sha256 of the chunk text) for joining back to the
    chunk table or feeding pair-level dedup."""
    from schema_validator_spark.operators.codechunk import chunk_functions

    py = df.filter(
        F.lower(F.coalesce(F.col(lang_col), F.lit(""))) == "py"
    )
    chunks = chunk_functions(
        py, id_cols, content_col, lang_col, with_sha=True
    )
    return docstring_pairs(
        chunks, [*id_cols, "chunk_idx", "chunk_sha"], "chunk_text"
    )
