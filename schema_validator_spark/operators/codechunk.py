"""Function-level chunking of source code — the unit extractor for
function-granularity dedup and training-sample construction
(CodeParrot / PolyCoder / StarCoder pipelines dedup and pack at the
function level, not the file level; the reference's per-struct
validation unit is the analogous granularity, validators.go's
struct-walk).

A chunk is a top-level unit: everything from one boundary line (a
line-start ``def``/``func``/``function``/``class`` per the lang's
registered regex) up to the next boundary line, plus a preamble chunk
(imports, module docstring) when the file doesn't open with a
boundary.  Nested definitions stay inside their parent chunk — the
boundary regexes anchor at column 0, so an indented ``def`` never
splits its class.  Langs with no registered regex yield the whole file
as one chunk (chunk 0) — nothing is ever dropped, and
``concat_ws(chr(10), chunks)`` reconstructs the file byte-exactly.

Scale shape: ZERO shuffles — boundary detection, index arithmetic, and
slicing are JVM higher-order functions over the per-row line array
(linear: total sliced chars = file size; no quadratic membership scans
— the next-boundary lookup is positional ``get``), and the final
``posexplode`` rides the scan.  The quadratic-HOF hazard documented in
CLAUDE.md does not apply: no per-element scan over another array.
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
    # function/class declarations, optionally exported/async
    "js": r"^(export\s+)?(async\s+)?(function|class)\b",
}
BOUNDARY_RES["ts"] = BOUNDARY_RES["js"]


def chunk_functions(
    df: DataFrame,
    id_cols: list[str],
    content_col: str,
    lang_col: str,
    *,
    boundary_res: dict[str, str] | None = None,
    with_sha: bool = True,
) -> DataFrame:
    """``(id_cols..., chunk_idx, chunk_text[, chunk_sha])`` — one row
    per top-level unit, ``chunk_idx`` 0-based in file order.  Feed
    ``chunk_sha`` (sha256 of the chunk text) to an exact-dedup groupBy
    for function-level dedup."""
    res = boundary_res if boundary_res is not None else BOUNDARY_RES
    if not res:
        raise ValueError("empty boundary-regex map")
    s = F.coalesce(F.col(content_col), F.lit(""))
    lang = F.lower(F.coalesce(F.col(lang_col), F.lit("")))
    lines = F.split(s, "\n", -1)

    def boundaries(pat: str) -> Column:
        # 0-based indices of boundary lines
        return F.filter(
            F.transform(
                lines,
                lambda l, i: F.when(l.rlike(pat), i).otherwise(F.lit(-1)),
            ),
            lambda x: x >= 0,
        )

    chain = None
    for lg, pat in sorted(res.items()):
        cond = lang == lg
        arr = boundaries(pat)
        chain = F.when(cond, arr) if chain is None else chain.when(cond, arr)
    b = chain.otherwise(F.array().cast("array<int>"))
    # prepend the preamble start unless the file opens with a boundary
    b2 = F.when(
        (F.size(b) > 0) & (F.element_at(b, 1) == 0), b
    ).otherwise(F.concat(F.array(F.lit(0)), b))
    n_lines = F.size(lines)
    chunks = F.transform(
        b2,
        lambda st, j: F.array_join(
            F.slice(
                lines,
                st + 1,
                F.coalesce(F.get(b2, j + 1), n_lines) - st,
            ),
            "\n",
        ),
    )
    out = df.select(
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
) -> DataFrame:
    """Function-level exact-dup profile: one row —
    ``(n_chunks, n_distinct_chunks, n_dup_chunks, dup_frac)`` where
    ``n_dup_chunks`` counts chunk instances beyond the first of each
    sha (what function-level dedup would remove).  One
    map-side-combinable groupBy at chunk-sha scale."""
    ch = chunk_functions(
        df, id_cols, content_col, lang_col, boundary_res=boundary_res
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
