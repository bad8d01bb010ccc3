"""Function-level chunking of source code — the unit extractor for
function-granularity dedup and training-sample construction
(CodeParrot / PolyCoder / StarCoder pipelines dedup and pack at the
function level, not the file level; the reference's per-struct
validation unit is the analogous granularity, validators.go's
struct-walk).

A chunk is a top-level unit: everything from one boundary line up to
the next boundary line, plus a preamble chunk (imports, module
docstring) when the file doesn't open with a boundary.  A boundary is
a column-0 ``def``/``func``/``function``/``class`` line per the
lang's registered regex — or, for langs with a registered ATTACHMENT
regex (Python decorators), the first line of the decorator stack
above it, so ``@staticmethod`` travels with its function and
decorated/undecorated twins get different ``chunk_sha``.  The
boundary predicate is pairwise — it reads only the line and the line
above — which keeps the whole operator linear.  Nested definitions
stay inside their parent chunk (boundaries anchor at column 0), and
langs with no registered regex yield the whole file as one chunk —
nothing is ever dropped: ``concat_ws(chr(10), chunks)`` reconstructs
the file byte-exactly.  Doc comments directly above a unit stay with
the PREVIOUS chunk (cosmetic-only divergence, documented; unlike
decorators they don't change behavior).

Scale shape: ZERO shuffles and LINEAR per-row work.  The line array
and the boundary-index array are materialized as explicit columns
BEFORE the slicing transform — lambda-containing trees are excluded
from Spark subexpression elimination, so referencing the raw
expressions inside the transform would re-run split + the per-line
regex scan once per chunk (measured 142x slowdown at 200 defs/file;
CLAUDE.md: share heavy derivations through an explicit column).  With
the columns bound, boundary detection is one pass, the next-boundary
lookup is positional ``get``, and total sliced chars = file size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: lang -> line-start boundary regex (RE2-safe: no lookaround, no
#: backreferences — the DuckDB oracle replays them verbatim).  Single
#: source of truth for the oracle.
BOUNDARY_RES: dict[str, str] = {
    # top-level (column-0) defs/classes; indented methods stay inside
    "py": r"^(async\s+def|def|class)\b",
    # functions, methods, and type declarations all start units in Go
    "go": r"^(func|type)\b",
    # function/class declarations, optionally exported / default /
    # async — `export default function App()` is the dominant
    # ES-module pattern and must start a unit
    "js": r"^(export\s+)?(default\s+)?(async\s+)?(function|class)\b",
}
BOUNDARY_RES["ts"] = BOUNDARY_RES["js"]

#: lang -> attachment regex: column-0 lines that BELONG TO the unit
#: below them.  A boundary moves to the first line of a maximal
#: attachment run (pairwise rule: a def preceded by an attachment is
#: not a boundary; an attachment preceded by a non-attachment is).
#: Python decorators are semantic (``@property`` changes behavior) so
#: they must stay inside the chunk_sha.  The shape is strict — a bare
#: ``@name``, dotted path, or call-opening ``@name(...`` ONLY — so
#: docstring tag lines (``@author: jane``, ``@param x ...``) never
#: become boundaries.  Known line-regex limits (documented, not
#: parsed): a MULTI-LINE decorator call or a blank line inside the
#: stack breaks pairwise contiguity, so the following def starts its
#: own unit (the decorator lands in the unit above — the pre-feature
#: behavior, never a crash); comment attachment is deliberately not
#: attempted (a bare comment block would falsely start a unit).
ATTACH_RES: dict[str, str] = {
    "py": r"^@[A-Za-z_][A-Za-z0-9_.]*(\(.*)?\s*$",
}


def chunk_functions(
    df: DataFrame,
    id_cols: list[str],
    content_col: str,
    lang_col: str,
    *,
    boundary_res: dict[str, str] | None = None,
    attach_res: dict[str, str] | None = None,
    with_sha: bool = True,
) -> DataFrame:
    """``(id_cols..., chunk_idx, chunk_text[, chunk_sha])`` — one row
    per top-level unit, ``chunk_idx`` 0-based in file order.  Feed
    ``chunk_sha`` (sha256 of the chunk text) to an exact-dedup groupBy
    for function-level dedup."""
    res = boundary_res if boundary_res is not None else BOUNDARY_RES
    att = attach_res if attach_res is not None else ATTACH_RES
    if not res:
        raise ValueError("empty boundary-regex map")
    clash = sorted({"_cf_lines", "_cf_b"} & set(df.columns))
    if clash:
        raise ValueError(
            "chunk_functions reserves these column names; rename the "
            f"input columns: {clash}"
        )
    s = F.coalesce(F.col(content_col), F.lit(""))
    lang = F.lower(F.coalesce(F.col(lang_col), F.lit("")))
    tmp = df.withColumn("_cf_lines", F.split(s, "\n", -1))
    lines = F.col("_cf_lines")

    def boundaries(def_pat: str, att_pat: str | None) -> Column:
        # 0-based indices of boundary lines (pairwise predicate:
        # current line + the line above, each an O(1) positional get)
        def is_boundary(l: Column, i: Column) -> Column:
            if att_pat is None:
                return l.rlike(def_pat)
            prev_att = F.coalesce(
                F.get(lines, i - 1).rlike(att_pat), F.lit(False)
            )
            return (l.rlike(def_pat) | l.rlike(att_pat)) & ~prev_att

        return F.filter(
            F.transform(
                lines,
                lambda l, i: F.when(
                    is_boundary(l, i), i
                ).otherwise(F.lit(-1)),
            ),
            lambda x: x >= 0,
        )

    chain = None
    for lg, pat in sorted(res.items()):
        cond = lang == lg
        arr = boundaries(pat, att.get(lg))
        chain = F.when(cond, arr) if chain is None else chain.when(cond, arr)
    b = chain.otherwise(F.array().cast("array<int>"))
    # prepend the preamble start unless the file opens with a boundary
    b2 = F.when(
        (F.size(b) > 0) & (F.element_at(b, 1) == 0), b
    ).otherwise(F.concat(F.array(F.lit(0)), b))
    tmp = tmp.withColumn("_cf_b", b2)
    bc = F.col("_cf_b")
    n_lines = F.size(lines)
    chunks = F.transform(
        bc,
        lambda st, j: F.array_join(
            F.slice(
                lines,
                st + 1,
                F.coalesce(F.get(bc, j + 1), n_lines) - st,
            ),
            "\n",
        ),
    )
    out = tmp.select(
        *id_cols,
        F.posexplode(chunks).alias("chunk_idx", "chunk_text"),
    )
    if with_sha:
        out = out.withColumn("chunk_sha", F.sha2("chunk_text", 256))
    return out


def function_dedup_stats(
    df: DataFrame,
    id_cols: list[str],
    content_col: str,
    lang_col: str,
    *,
    boundary_res: dict[str, str] | None = None,
    attach_res: dict[str, str] | None = None,
) -> DataFrame:
    """Function-level exact-dup profile: one row —
    ``(n_chunks, n_distinct_chunks, n_dup_chunks, dup_frac)`` where
    ``n_dup_chunks`` counts chunk instances beyond the first of each
    sha (what function-level dedup would remove).  One
    map-side-combinable groupBy at chunk-sha scale."""
    ch = chunk_functions(
        df,
        id_cols,
        content_col,
        lang_col,
        boundary_res=boundary_res,
        attach_res=attach_res,
    )
    per_sha = ch.groupBy("chunk_sha").agg(F.count(F.lit(1)).alias("n"))
    return per_sha.agg(
        F.sum("n").alias("n_chunks"),
        F.count(F.lit(1)).alias("n_distinct_chunks"),
        (F.sum("n") - F.count(F.lit(1))).alias("n_dup_chunks"),
        F.round(
            (F.sum("n") - F.count(F.lit(1))) / F.sum("n"), 6
        ).alias("dup_frac"),
    )
