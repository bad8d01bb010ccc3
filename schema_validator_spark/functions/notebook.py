"""Jupyter-notebook code-cell extraction — .ipynb files are JSON, and
a code-corpus pipeline wants the CODE inside them, not the wrapper
(The Stack ships Jupyter as both raw JSON and converted scripts;
Kocetkov et al. 2022 §3.1).  This lifts nbformat's stable core
(``cells[].cell_type`` + ``cells[].source``) with ``from_json`` and
explodes code cells to one row each, preserving cell position as
provenance.

Scale shape: ``from_json`` + ``posexplode`` ride the scan — per-row
codegen/generated iterators, zero shuffles, zero Python; output rows
∝ code cells.  Files that don't parse as notebooks yield NO rows here
by design (``from_json`` PERMISSIVE -> NULL struct) — corrupt-input
ACCOUNTING is operators/jsonspec.py's job; composing both gives the
quarantine view.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: nbformat core: the two fields every notebook version carries per
#: cell.  `source` is a list of line strings (nbformat also allows a
#: single string; that variant parses as NULL source and is skipped —
#: modern exporters always write the list form).
NB_SCHEMA = (
    "STRUCT<cells: ARRAY<STRUCT<cell_type: STRING, source: ARRAY<STRING>>>>"
)


def extract_code_cells(
    df: DataFrame,
    id_cols: list[str],
    nb_col: str,
    *,
    cell_types: tuple[str, ...] = ("code",),
) -> DataFrame:
    """``(id_cols..., cell_index, cell_type, code, n_lines)`` — one row
    per kept cell; ``cell_index`` is the cell's position among ALL
    cells (0-based, provenance back into the notebook), ``code`` the
    source lines joined verbatim (nbformat keeps ``\\n`` inside the
    line strings), ``n_lines`` the source-line count."""
    parsed = df.select(
        *id_cols,
        F.from_json(F.col(nb_col), NB_SCHEMA).alias("_nb"),
    )
    cells = parsed.select(
        *id_cols,
        F.posexplode("_nb.cells").alias("cell_index", "_cell"),
    )
    return (
        cells.filter(
            F.col("_cell.cell_type").isin(list(cell_types))
            & F.col("_cell.source").isNotNull()
        )
        .select(
            *id_cols,
            "cell_index",
            F.col("_cell.cell_type").alias("cell_type"),
            F.concat_ws("", F.col("_cell.source")).alias("code"),
            F.size("_cell.source").alias("n_lines"),
        )
    )


def notebook_stats(
    df: DataFrame, id_cols: list[str], nb_col: str
) -> DataFrame:
    """Per-notebook rollup without exploding: ``(id_cols..., n_cells,
    n_code_cells, n_code_lines, parsed)`` — one aggregate-HOF pass,
    zero shuffles; ``parsed=false`` rows (corrupt JSON / non-notebook / no cells array)
    are kept with NULL counts so the corpus accounting stays exact."""
    parsed = df.select(
        *id_cols, F.from_json(F.col(nb_col), NB_SCHEMA).alias("_nb")
    )
    cells = F.col("_nb.cells")
    code = F.filter(cells, lambda c: c.cell_type == F.lit("code"))
    return parsed.select(
        *id_cols,
        F.size(cells).alias("n_cells"),
        F.size(code).alias("n_code_cells"),
        F.aggregate(
            code,
            F.lit(0),
            lambda acc, c: acc + F.coalesce(F.size(c.source), F.lit(0)),
        ).alias("n_code_lines"),
        # PERMISSIVE from_json yields a struct with NULL fields (not a
        # NULL struct) for corrupt JSON, so "parsed as a notebook" keys
        # on the cells field itself
        cells.isNotNull().alias("parsed"),
    )


#: pair-array element type for markdown_code_pairs' aggregate state
_PAIR_T = (
    "array<struct<cell_index:int,n_md_cells:int,"
    "markdown:string,code:string>>"
)


def markdown_code_pairs(
    df: DataFrame, id_cols: list[str], nb_col: str
) -> DataFrame:
    """(markdown, code) instruction pairs from notebooks — the
    "Jupyter-structured" StarCoder recipe (Li et al. 2023 §3): each
    code cell pairs with the run of markdown cells IMMEDIATELY
    preceding it (consecutive markdown joined with a newline between
    cells).  Returns ``(id_cols..., cell_index, n_md_cells, markdown,
    code)``; ``cell_index`` is the CODE cell's position among all
    cells.  A code cell with no adjacent markdown yields no pair, and
    any non-markdown cell (including a code cell) resets the run —
    prose two cells back is context for the cell between, not this
    one.  Cells whose ``source`` parses as NULL (the legacy
    string-form variant) reset the run and never pair, same contract
    as extract_code_cells.  Unparseable notebooks yield no rows.

    Scale shape: ONE forward ``aggregate`` pass per notebook carrying
    (markdown-run buffer, emitted pairs) as HOF state — linear in
    cells (never the quadratic scan-the-prefix-per-code-cell shape),
    riding the scan: zero shuffles, zero Python."""
    parsed = df.select(
        *id_cols,
        F.from_json(F.col(nb_col), NB_SCHEMA).alias("_nb"),
    )
    indexed = F.transform(
        F.col("_nb.cells"),
        lambda c, i: F.struct(c.alias("c"), i.alias("i")),
    )

    def merge(acc, ci):
        c = ci["c"]
        src_ok = c["source"].isNotNull()
        text = F.concat_ws("", c["source"])
        is_md = (c["cell_type"] == "markdown") & src_ok
        is_code = (c["cell_type"] == "code") & src_ok
        buf = acc["buf"]
        pair = F.struct(
            ci["i"].cast("int").alias("cell_index"),
            F.size(buf).alias("n_md_cells"),
            F.array_join(buf, "\n").alias("markdown"),
            text.alias("code"),
        )
        new_pairs = F.when(
            is_code & (F.size(buf) > 0),
            F.concat(acc["pairs"], F.array(pair)),
        ).otherwise(acc["pairs"])
        new_buf = F.when(
            is_md, F.concat(buf, F.array(text))
        ).otherwise(F.array().cast("array<string>"))
        return F.struct(new_buf.alias("buf"), new_pairs.alias("pairs"))

    pairs = F.aggregate(
        indexed,
        F.struct(
            F.array().cast("array<string>").alias("buf"),
            F.array().cast(_PAIR_T).alias("pairs"),
        ),
        merge,
        lambda acc: acc["pairs"],
    )
    return parsed.select(
        *id_cols, F.explode(pairs).alias("_p")
    ).select(
        *id_cols,
        F.col("_p.cell_index").alias("cell_index"),
        F.col("_p.n_md_cells").alias("n_md_cells"),
        F.col("_p.markdown").alias("markdown"),
        F.col("_p.code").alias("code"),
    )
